"""Scale-out over device meshes (surface-axis sharding, GSPMD collectives)."""

from heatx.parallel import sharding  # noqa: F401
