"""Zone (space air) energy balance: ABC assembly + analytical update.

TPU-native re-design of model.rs:489-675 and zone.rs.  The reference loops
over HVACs, luminaires and surfaces accumulating per-zone A/B coefficients;
here those loops are ``segment_sum`` scatter-adds over the batched surface
axis — the only cross-surface data dependency in the whole model (SURVEY.md
section 2.2), which under sharding becomes a partial segment-sum plus an
all-reduce over the mesh.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from heatx.constants import KELVIN
from heatx.build.layout import B_SPACE, CompiledBuilding
from heatx.physics import gas


def zone_abc(
    building: CompiledBuilding,
    zone_T,
    h_front,
    h_back,
    surf_T_front,
    surf_T_back,
    inputs,
):
    """Per-zone A, B, C coefficients (model.rs:489-597 calculate_zones_abc).

    A collects gains (HVAC, luminaires, infiltration/ventilation enthalpy,
    surface convective h*A*T); B collects the temperature-proportional loss
    terms; C is the zone air capacitance V*rho(T)*cp(T) (zone.rs:59-65).
    """
    sb = building.surfaces
    Z = building.n_zones
    dtype = zone_T.dtype

    a = jnp.zeros((Z,), dtype)
    b = jnp.zeros((Z,), dtype)

    # HVAC gains (heating_cooling.rs:96-142): power already resolved per
    # (unit -> space) pair.
    if building.hvac_pair_unit.size:
        a = a + jax.ops.segment_sum(
            inputs.hvac_power[building.hvac_pair_unit],
            building.hvac_pair_space,
            num_segments=Z,
        )

    # Luminaire gains (model.rs:509-516).
    if building.lum_space.size:
        a = a + jax.ops.segment_sum(
            inputs.lum_power, building.lum_space, num_segments=Z
        )

    # Infiltration & ventilation with temperature-dependent rho*cp
    # (model.rs:524-544).
    def air_exchange(a, b, vol, temp, mask):
        t_k = temp + KELVIN
        cp = gas.heat_capacity(gas.AIR, t_k)
        rho = gas.density(gas.AIR, t_k)
        term = jnp.where(mask, rho * vol * cp, 0.0)
        # Mask the PRODUCT too: a masked-off channel may carry NaN in its
        # temperature (the natural 'no infiltration' encoding) and
        # 0 * NaN = NaN would poison the zone gains.
        return a + jnp.where(mask, term * temp, 0.0), b + term

    a, b = air_exchange(a, b, inputs.inf_vol, inputs.inf_temp, inputs.inf_mask)
    a, b = air_exchange(a, b, inputs.vent_vol, inputs.vent_temp, inputs.vent_mask)

    # Inter-zone air mixing (heatx extension; the reference leaves it
    # unimplemented, model.rs:546, 592-593): ventilation whose inlet
    # temperature is the source zone's current air temperature.
    if building.mix_src.size:
        vol = inputs.mix_vol if inputs.mix_vol is not None else jnp.asarray(
            building.mix_vol, dtype
        )
        t_src = zone_T[building.mix_src]
        t_k = t_src + KELVIN
        term = gas.density(gas.AIR, t_k) * vol * gas.heat_capacity(gas.AIR, t_k)
        a = a + jax.ops.segment_sum(term * t_src, building.mix_dst, num_segments=Z)
        b = b + jax.ops.segment_sum(term, building.mix_dst, num_segments=Z)

    # Surface convective coupling Sum h*A*T / Sum h*A into the adjacent zones
    # (model.rs:556-590).  Faces not bounding a space scatter into a dump slot.
    def face(a, b, code, space, h, t_s):
        idx = jnp.where(code == B_SPACE, space, Z).astype(jnp.int32)
        ha = h * sb.area
        a = a + jax.ops.segment_sum(ha * t_s, idx, num_segments=Z + 1)[:Z]
        b = b + jax.ops.segment_sum(ha, idx, num_segments=Z + 1)[:Z]
        return a, b

    a, b = face(a, b, sb.front_code, sb.front_space, h_front, surf_T_front)
    a, b = face(a, b, sb.back_code, sb.back_space, h_back, surf_T_back)

    # Capacitance (zone.rs:59-65).
    t_k = zone_T + KELVIN
    volume = jnp.asarray(building.zone_volume, dtype=dtype)
    c = volume * gas.density(gas.AIR, t_k) * gas.heat_capacity(gas.AIR, t_k)
    return a, b, c


def future_zone_temperatures(zone_T, a, b, c, dt):
    """Exact exponential update T(t) = A/B + (T0 - A/B) e^(-Bt/C)
    (model.rs:650-674), in the expm1 form T0 - (A/B - T0)*expm1(-Bt/C) which
    is exact in the same way but loses no precision when B*dt/C << 1 (the
    common case, important for float32 on TPU).  Zones with |B| ~ 0 hold
    their temperature (model.rs:662-670)."""
    safe_b = jnp.where(jnp.abs(b) > 1e-9, b, 1.0)
    ratio = a / safe_b
    t_new = zone_T - (ratio - zone_T) * jnp.expm1(-safe_b * dt / c)
    return jnp.where(jnp.abs(b) > 1e-9, t_new, zone_T)


def zone_update(building: CompiledBuilding, zone_T, a, b, c, dt,
                heat_sp=None, cool_sp=None):
    """Analytical zone update, plus setpoint-driven ideal-loads control when
    the building has thermostatic units (heatx extension; the reference's
    IdealHeaterCooler is ``todo!()``, heating_cooling.rs:66-90).

    Returns ``(zone_T_new, ideal_load)`` with ``ideal_load`` the [Z] power
    (W, heating positive / cooling negative) injected this sub-step, or
    ``None`` for uncontrolled buildings (zero traced overhead).

    Control law (the EnergyPlus ideal-loads pattern, applied to the exact
    exponential solution model.rs:650-674): predict the free-float
    temperature; if it crosses a setpoint, solve the closed form for the
    exact power that lands T(t+dt) ON the setpoint —

        T1 = A/B + (T0 - A/B) e^{-B dt/C}   =>
        P  = B (T0 (1+em) - T_set) / em - A,   em = expm1(-B dt/C)

    (B ~ 0: P = C (T_set - T0)/dt - A) — then clamp to the unit's capacity.
    At the capacity limit the zone lands wherever ``A + P`` puts it, between
    the free-float value and the setpoint (exactly an ElectricHeater at max
    power).  Inside the deadband the load is zero and the update is
    bit-identical to the uncontrolled one."""
    if not building.has_ideal_hvac:
        return future_zone_temperatures(zone_T, a, b, c, dt), None

    dtype = zone_T.dtype
    t_free = future_zone_temperatures(zone_T, a, b, c, dt)

    smallb = jnp.abs(b) <= 1e-9
    safe_b = jnp.where(smallb, 1.0, b)
    em = jnp.expm1(-safe_b * dt / c)

    def a_required(t_set):
        a_gen = safe_b * (zone_T * (1.0 + em) - t_set) / em
        a_lin = c * (t_set - zone_T) / dt
        return jnp.where(smallb, a_lin, a_gen)

    # Scheduled setpoints (StepInputs.heat_sp/cool_sp) override the compiled
    # per-zone values; uncontrolled zones keep their sentinels either way
    # (a schedule on a zone with zero capacity still does nothing).
    heat_sp = jnp.asarray(
        building.ctl_heat_sp if heat_sp is None else heat_sp, dtype
    )
    cool_sp = jnp.asarray(
        building.ctl_cool_sp if cool_sp is None else cool_sp, dtype
    )
    max_heat = jnp.asarray(building.ctl_max_heat, dtype)
    max_cool = jnp.asarray(building.ctl_max_cool, dtype)

    load = jnp.where(
        t_free < heat_sp,
        jnp.clip(a_required(heat_sp) - a, 0.0, max_heat),
        jnp.where(
            t_free > cool_sp,
            jnp.clip(a_required(cool_sp) - a, -max_cool, 0.0),
            jnp.zeros_like(a),
        ),
    )
    # |B| ~ 0 zones HOLD their temperature (the reference's degenerate-ODE
    # rule, model.rs:662-670, which ignores all gains) — reporting a load
    # there would book energy with no thermal effect, so control stands
    # down too.
    load = jnp.where(smallb, 0.0, load)
    zone_T_new = jnp.where(
        load == 0.0, t_free, future_zone_temperatures(zone_T, a + load, b, c, dt)
    )
    return zone_T_new, load


def mean_future_zone_temperatures(zone_T, a, b, c, dt):
    """Average temperature over the next dt (model.rs:617-644; dead code in
    the reference but part of its public math, exposed for parity)."""
    safe_b = jnp.where(jnp.abs(b) > 1e-9, b, 1.0)
    ratio = a / safe_b
    t_mean = ratio - (c * (zone_T - ratio) / (dt * safe_b)) * jnp.expm1(-safe_b * dt / c)
    return jnp.where(jnp.abs(b) > 1e-9, t_mean, zone_T)
