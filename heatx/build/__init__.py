"""Host-side building compiler (reference layer L2 + the build half of L3/L4)."""

from heatx.build import discretize, layout  # noqa: F401
