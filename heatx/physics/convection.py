"""TARP convection correlations (EnergyPlus formulation), vectorized.

TPU-native re-design of /root/reference/src/convection.rs.  The reference
computes one scalar ``h`` per surface face inside a serial loop; here the same
correlations are pure elementwise array math over a whole batch of faces so a
building's worth of coefficients evaluates in one fused VPU pass.
"""

from __future__ import annotations

import jax.numpy as jnp

from heatx.constants import MIN_H

# R_f roughness multipliers, index 0 = Very Rough .. 5 = Very Smooth
# (convection.rs:157).
ROUGHNESS_COEFFICIENTS = (2.17, 1.67, 1.52, 1.13, 1.11, 1.0)


def tarp_natural_coeffs(cos_surface_tilt):
    """Static per-face TARP branch coefficients (9.482/(7.238-|cos|),
    1.81/(1.382+|cos|)) — they depend only on geometry, so hoisting them
    replaces two full-width divisions per natural-h evaluation with
    multiplies (the Pallas hour body computes them once per hour; |cos| is
    tilt-flip invariant, so one pair serves both faces)."""
    abs_cos = jnp.abs(cos_surface_tilt)
    return 9.482 / (7.238 - abs_cos), 1.81 / (1.382 + abs_cos)


def tarp_natural_convection_coefficient(
    air_temperature, surface_temperature, cos_surface_tilt, mosaic_compat=False,
    coeffs=None,
):
    """Natural (indoor) TARP h (convection.rs:87-110).

    Three cases keyed on the sign of ``delta_t * cos(tilt)``:

    * either magnitude ~ 0:          ``h = 1.31 |dT|^(1/3)``
    * same sign (enhanced/buoyant):  ``h = 9.482 |dT|^(1/3) / (7.238 - |cos|)``
    * opposite sign (stable):        ``h = 1.81 |dT|^(1/3) / (1.382 + |cos|)``

    floored at ``MIN_H`` (convection.rs:22,105-109).  ``coeffs`` passes
    precomputed :func:`tarp_natural_coeffs` (hoisted loop-invariants).
    """
    delta_t = air_temperature - surface_temperature
    abs_dt = jnp.abs(delta_t)
    abs_cos = jnp.abs(cos_surface_tilt)
    if mosaic_compat:
        # Inside the Pallas kernel: jnp.cbrt has no Mosaic lowering, so use
        # pow with the argument clamped away from zero (a -inf intermediate
        # from log(0) hits a VPU slow path; the clamp is value-exact because
        # 1.31*cbrt(1e-30) is far below the MIN_H floor anyway).
        cbrt = jnp.maximum(abs_dt, 1e-30) ** (1.0 / 3.0)
    else:
        # XLA path: the dedicated cbrt lowering is fast for all inputs (the
        # pow form takes data-dependent slow paths near |dT| ~ 0).  The
        # double-where keeps reverse-mode AD finite at |dT| = 0 exactly
        # (cbrt' -> inf there, and a face sitting at its air temperature is
        # routine — e.g. any equilibrium start), pinning the subgradient to
        # 0 without changing the value (cbrt(0) = 0).
        nz = abs_dt > 0.0
        cbrt = jnp.where(nz, jnp.cbrt(jnp.where(nz, abs_dt, 1.0)), 0.0)

    return tarp_natural_from_cbrt(
        delta_t, abs_dt, abs_cos, cos_surface_tilt, cbrt, coeffs
    )


def tarp_natural_from_cbrt(
    delta_t, abs_dt, abs_cos, cos_surface_tilt, cbrt, coeffs=None
):
    """The TARP three-branch select + MIN_H floor, given |dT|^(1/3) (and the
    absolute values, to avoid re-deriving them in-kernel) already computed.
    Single home for the branch logic — the ablation harness substitutes
    experimental cbrt evaluations through this entry point."""
    near_zero = (abs_dt < 1e-3) | (abs_cos < 1e-3)
    same_sign = delta_t * cos_surface_tilt > 0.0
    if coeffs is not None:
        # Select the branch coefficient first, multiply once: bit-identical
        # to selecting among per-branch products (each lane sees the same
        # single rounding c * cbrt) but 2 fewer full-width multiplies.
        c_same, c_opp = coeffs
        coef = jnp.where(
            near_zero, 1.31, jnp.where(same_sign, c_same, c_opp)
        )
        return jnp.maximum(coef * cbrt, MIN_H)

    h_zero = 1.31 * cbrt
    h_same = 9.482 * cbrt / (7.238 - abs_cos)
    h_opposite = 1.81 * cbrt / (1.382 + abs_cos)
    h = jnp.where(near_zero, h_zero, jnp.where(same_sign, h_same, h_opposite))
    return jnp.maximum(h, MIN_H)


def tarp_convection_coefficient(
    air_temperature,
    surface_temperature,
    cos_surface_tilt,
    air_speed,
    area,
    perimeter,
    windward,
    roughness_index=1,
    mosaic_compat=False,
):
    """Exterior TARP h = forced + natural (convection.rs:151-168).

    ``windward`` is boolean (W_f = 1.0 windward, 0.5 leeward); the roughness
    multiplier table mirrors convection.rs:157 (the reference always passes
    roughness_index=1, i.e. R_f = 1.67).
    """
    rf = jnp.asarray(ROUGHNESS_COEFFICIENTS)[roughness_index]
    wf = jnp.where(windward, 1.0, 0.5)
    # Double-where around the sqrt: at P*v/A = 0 exactly (calm air, padded
    # lanes with perimeter 0) sqrt' -> inf and reverse-mode AD would turn a
    # zero cotangent into NaN (0 * inf) that poisons the area/perimeter
    # gradients.  Value-identical: sqrt(0) = 0 either way.
    pva = perimeter * air_speed / area
    nz = pva > 0.0
    forced = 2.537 * wf * rf * jnp.where(
        nz, jnp.sqrt(jnp.where(nz, pva, 1.0)), 0.0
    )
    natural = tarp_natural_convection_coefficient(
        air_temperature, surface_temperature, cos_surface_tilt, mosaic_compat
    )
    return forced + natural


def is_windward(wind_direction, cos_tilt, normal_x, normal_y):
    """Whether a surface faces the wind (surface.rs:37-46).

    ``wind_direction`` in radians.  Horizontal surfaces (|cos_tilt| >= 0.98)
    are always windward.
    """
    dot = normal_x * jnp.sin(wind_direction) + normal_y * jnp.cos(wind_direction)
    # Pure boolean algebra (equivalent to where(tilted, dot>0, True); a bool
    # select with a scalar literal has no Mosaic lowering).
    return (jnp.abs(cos_tilt) >= 0.98) | (dot > 0.0)
