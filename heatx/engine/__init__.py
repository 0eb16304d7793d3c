"""Device-side marching engine (reference layers L3-L4)."""

from heatx.engine import state, step, surface, zone  # noqa: F401
