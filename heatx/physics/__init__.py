"""L1 physics kernels: convection, gas properties, cavities, glazing optics.

These are the pure functions at the bottom of the stack (reference layer L1,
SURVEY.md section 1): no state, no model objects — just math, vectorized for
the TPU's VPU.
"""

from heatx.physics import cavity, convection, gas, glazing  # noqa: F401
