"""Low-level numerical ops (batched tridiagonal kernels, Pallas kernels)."""

from heatx.ops import tridiag  # noqa: F401
