"""Time marching: sub-step, main step (hour fraction), and multi-step runs.

TPU-native re-design of ThermalModel::march (model.rs:359-427).  The
reference's "one main timestep = dt_subdivisions serial sub-steps" loop
becomes a ``lax.scan`` whose carry is the :class:`~heatx.engine.state.SimState`
pytree; a whole run is a second scan over main steps with the exogenous
inputs (weather, irradiance, gains) as scanned xs.  One compiled XLA call
therefore marches the entire building for as many hours as you ask.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from heatx.build.layout import CompiledBuilding
from heatx.engine import surface as surf_mod
from heatx.engine import zone as zone_mod
from heatx.engine.state import SimState, StepInputs


def apply_zone_shading(
    building: CompiledBuilding, state: SimState, inputs: StepInputs
) -> StepInputs:
    """In-run window-shading deployment (heatx extension; EnergyPlus's
    zone-state-dependent WindowShadingControl family): scale each
    controlled pane's incident front solar by its deployed-device
    transmittance while the controlling zone's air temperature — read
    from the marching state at main-step start, i.e. the previous
    timestep's value, EnergyPlus's own control convention — exceeds the
    setpoint.  The optional ``inputs.shade_sp`` channel overrides the
    compiled setpoints for this step (schedule gates pass +1e9 on
    blocked hours).  A no-op (zero traced ops) on buildings without
    zone-shading controls."""
    if not building.has_zone_shading:
        return inputs
    zi = building.shade_zone
    sp = inputs.shade_sp if inputs.shade_sp is not None else building.shade_sp
    t_zone = jnp.take(state.zone_T, jnp.maximum(zi, 0))
    deploy = (zi >= 0) & (t_zone > sp)
    mult = jnp.where(deploy, building.shade_tau, 1.0)
    return inputs._replace(sol_front=inputs.sol_front * mult)


def apply_vent_gates(
    building: CompiledBuilding, state: SimState, inputs: StepInputs
) -> StepInputs:
    """In-run ventilation temperature gates (heatx extension; EnergyPlus's
    ZoneVentilation:DesignFlowRate limit fields): mask each controlled
    zone's ventilation channel off for this main step unless ALL gates
    pass — min_indoor < T_zone < max_indoor, T_zone - T_out > delta,
    min_outdoor < T_out < max_outdoor, wind < max_wind.  The zone
    temperature is read from the marching state at main-step start (the
    previous timestep's value, EnergyPlus's own control convention); the
    outdoor conditions are the step means (weather may vary per
    sub-step).  Infiltration is never gated.  A no-op (zero traced ops)
    on buildings without ventilation controls."""
    if not building.has_vent_gates:
        return inputs
    t_out = jnp.mean(jnp.asarray(inputs.t_out))
    wind = jnp.mean(jnp.asarray(inputs.wind_speed))
    zT = state.zone_T
    on = (
        (zT > building.vent_min_tin)
        & (zT < building.vent_max_tin)
        & (zT - t_out > building.vent_delta)
        & (t_out > building.vent_min_tout)
        & (t_out < building.vent_max_tout)
        & (wind < building.vent_max_wind)
    )
    return inputs._replace(vent_mask=inputs.vent_mask & on)


def apply_state_controls(
    building: CompiledBuilding, state: SimState, inputs: StepInputs
) -> StepInputs:
    """All in-run zone-state controls, evaluated once at main-step start:
    window-shading deployment and ventilation temperature gates."""
    inputs = apply_zone_shading(building, state, inputs)
    return apply_vent_gates(building, state, inputs)


def substep(
    building: CompiledBuilding,
    state: SimState,
    t_out,
    wind_speed,
    wind_direction,
    inputs: StepInputs,
    mrt_static=None,
) -> SimState:
    """One stability sub-step (the body of model.rs:369-424):

    1. resolve boundary air temperatures from the current zone temps;
    2. march every surface (no-mass solve + massive RK4);
    3. write back the post-march convection coefficients and convective heat
       flows (iterate_surfaces, model.rs:140-169);
    4. update zone temperatures analytically (model.rs:410-423).
    """
    sb = building.surfaces
    cfg = building.config
    dt = building.dt

    t_front, t_back = surf_mod.boundary_temperatures(sb, state.zone_T, t_out)

    # Interior longwave exchange (config.interior_mrt, heatx extension):
    # evaluated from the step-start state snapshot, like every other
    # coefficient of this sub-step.
    mrt = None
    if cfg.interior_mrt:
        mrt = surf_mod.interior_mrt(
            sb, state.node_T, state.zone_T, building.n_zones,
            mrt_static=mrt_static,
        )

    node_T = surf_mod.march_surfaces(
        sb,
        state.node_T,
        t_front,
        t_back,
        wind_direction,
        wind_speed,
        inputs.sol_front,
        inputs.sol_back,
        inputs.ir_front,
        inputs.ir_back,
        dt,
        cfg,
        has_massive=sb.has_massive,
        mrt=mrt,
    )

    # Post-march conditions with the *updated* node temperatures
    # (model.rs:145-169: temperatures are written to state first, then h and
    # the convective flows are recomputed from them).
    env_f, env_b = surf_mod.border_conditions(
        sb,
        node_T,
        t_front,
        t_back,
        wind_direction,
        wind_speed,
        inputs.ir_front,
        inputs.ir_back,
        cfg,
    )
    ts_front = node_T[0]
    ts_back = surf_mod._last_node(sb, node_T)
    q_front = (ts_front - t_front) * env_f.h
    q_back = (ts_back - t_back) * env_b.h

    a, b, c = zone_mod.zone_abc(
        building, state.zone_T, env_f.h, env_b.h, ts_front, ts_back, inputs
    )
    zone_T, ideal_load = zone_mod.zone_update(building, state.zone_T, a, b, c, dt, heat_sp=inputs.heat_sp, cool_sp=inputs.cool_sp)

    return SimState(
        node_T=node_T,
        zone_T=zone_T,
        h_front=env_f.h,
        h_back=env_b.h,
        q_front=q_front,
        q_back=q_back,
        ideal_load=ideal_load,
    )


def _per_substep_weather(building: CompiledBuilding, value):
    """Broadcast a scalar (constant weather, like SyntheticWeather) to one
    value per sub-step, or pass through a [dt_subdivisions] array."""
    value = jnp.asarray(value)
    if value.ndim == 0:
        return jnp.broadcast_to(value, (building.dt_subdivisions,))
    assert value.shape[0] == building.dt_subdivisions
    return value


def march(
    building: CompiledBuilding,
    state: SimState,
    inputs: StepInputs,
    mrt_static=None,
) -> SimState:
    """One main timestep = ``dt_subdivisions`` sub-steps (model.rs:359-427).

    Equivalent to one ``ThermalModel::march`` call: weather may vary per
    sub-step; irradiance and gains are held for the whole main step.
    """
    inputs = apply_state_controls(building, state, inputs)
    t_out = _per_substep_weather(building, inputs.t_out)
    ws = _per_substep_weather(building, inputs.wind_speed)
    wd = _per_substep_weather(building, inputs.wind_direction)

    # Hoist the Carroll network's static prefix (participation / view
    # factors / effective emissivities) out of the sub-step scan.
    if building.config.interior_mrt and mrt_static is None:
        mrt_static = surf_mod.mrt_statics(building.surfaces, building.n_zones)

    collect_load = building.has_ideal_hvac

    def body(carry, xs):
        t_o, w_s, w_d = xs
        new = substep(building, carry, t_o, w_s, w_d, inputs, mrt_static)
        return new, (new.ideal_load if collect_load else None)

    state, loads = jax.lax.scan(body, state, (t_out, ws, wd))
    if collect_load:
        # Report the MEAN ideal power over the main step (energy-consistent;
        # the carry otherwise holds only the last sub-step's instantaneous W).
        state = state._replace(ideal_load=jnp.mean(loads, axis=0))
    return state


def make_march_fn(building: CompiledBuilding, donate: bool = False):
    """jit-compiled ``(state, inputs) -> state`` main-step function.

    The building is passed to the jitted function as a traced pytree argument
    (not a baked constant), so compilation cost is independent of building
    size and one executable serves all same-shaped buildings.  Donation
    defaults off: on some remote-TPU runtimes donated buffers serialize
    execution.
    """
    jitted = jax.jit(march, donate_argnums=(1,) if donate else ())

    def fn(state, inputs):
        return jitted(building, state, inputs)

    return fn


def _with_time_axis_mix(inputs_seq: StepInputs) -> StepInputs:
    """Broadcast static optional leaves (mixing rates, setpoint schedules)
    over the scanned time axis; None leaves stay absent.

    * ``mix_vol``: a [M] constant becomes [T, M] (schedules pass [T, M]).
    * ``shade_sp``: a [S] constant becomes [T, S] (schedule gates pass
      [T, S]).
    * ``heat_sp``/``cool_sp``: a scalar or [Z] constant becomes [T, ...];
      a 1-D array of length T is a per-step SCALAR schedule (one setpoint
      for all zones each step) and becomes [T, 1] — the natural single-zone
      setback form.  When T happens to equal n_zones the time-series
      reading wins; pass [T, Z] (or [1, Z]) to be explicit.
    """
    T = jnp.asarray(inputs_seq.t_out).shape[0]
    upd = {}
    for name in ("mix_vol", "shade_sp"):
        mv = getattr(inputs_seq, name)
        if mv is not None:
            mv = jnp.asarray(mv)
            upd[name] = (
                jnp.broadcast_to(mv, (T,) + mv.shape) if mv.ndim == 1 else mv
            )
    for name in ("heat_sp", "cool_sp"):
        v = getattr(inputs_seq, name)
        if v is None:
            continue
        v = jnp.asarray(v)
        if v.ndim == 1 and v.shape[0] == T:
            upd[name] = v[:, None]  # [T] per-step scalar schedule
        elif v.ndim <= 1:
            upd[name] = jnp.broadcast_to(v, (T,) + v.shape)
        else:
            upd[name] = v
    return inputs_seq._replace(**upd) if upd else inputs_seq


def run(
    building: CompiledBuilding,
    state: SimState,
    inputs_seq: StepInputs,
    collect_zone_T: bool = True,
    collect_loads: bool = False,
    collect_operative: bool = False,
    march_fn=None,
) -> Tuple[SimState, Optional[jnp.ndarray]]:
    """March over a whole sequence of main steps in one XLA call.

    ``march_fn(building, state, step_inputs) -> state`` overrides the
    per-main-step integrator (default: the reference-parity :func:`march`)
    — pass a fast-mode march (``engine.implicit.imp_march`` /
    ``engine.exponential.exp_march`` partials) to scan a whole annual
    sequence through them instead of looping per step on the host.

    ``inputs_seq`` is a StepInputs pytree whose leaves carry a leading time
    axis [T_steps, ...] (weather leaves may be [T_steps] scalars-per-step or
    [T_steps, dt_subdivisions]).  Returns the final state and, optionally,
    the [T_steps, Z] zone-temperature history (the reference's observable
    output channel, zone.rs:45-49).  With ``collect_loads`` (buildings with
    setpoint-driven HVAC only) the history output becomes the tuple
    ``(zone_T_hist, ideal_load_hist)`` with the [T_steps, Z] per-main-step
    mean ideal powers — the heating/cooling demand series.
    ``collect_operative`` appends the [T_steps, Z] operative-temperature
    history ``(zone_T + zone_MRT) / 2`` (zone MRT = the Carroll exchange
    node of heatx.engine.surface.zone_mrt — a comfort observable,
    independent of whether ``config.interior_mrt`` drives the physics).
    """
    if collect_loads and not building.has_ideal_hvac:
        raise ValueError(
            "collect_loads requires setpoint-driven HVAC "
            "(IdealHeaterCooler with heat_setpoint/cool_setpoint)"
        )

    # One static-prefix evaluation per run, outside both scans (needed by
    # the parity physics under interior_mrt and by the operative-T
    # observable; a custom march_fn computes its own — imp_march/exp_march
    # hoist the Carroll prefix internally).
    mrt_static = None
    if (building.config.interior_mrt and march_fn is None) or collect_operative:
        mrt_static = surf_mod.mrt_statics(building.surfaces, building.n_zones)

    def body(carry, step_inputs):
        if march_fn is None:
            new_state = march(
                building, carry, step_inputs, mrt_static=mrt_static
            )
        else:
            new_state = march_fn(building, carry, step_inputs)
        out = new_state.zone_T if collect_zone_T else None
        if collect_loads:
            out = (out, new_state.ideal_load)
        if collect_operative:
            mrt = surf_mod.zone_mrt(
                building.surfaces, new_state.node_T, new_state.zone_T,
                building.n_zones, mrt_static=mrt_static,
            )
            t_op = (new_state.zone_T + mrt) / 2.0
            out = (out, t_op) if not collect_loads else (*out, t_op)
        return new_state, out

    return jax.lax.scan(body, state, _with_time_axis_mix(inputs_seq))


def make_run_fn(
    building: CompiledBuilding,
    collect_zone_T: bool = True,
    donate: bool = False,
    collect_loads: bool = False,
):
    jitted = jax.jit(
        partial(run, collect_zone_T=collect_zone_T, collect_loads=collect_loads),
        donate_argnums=(1,) if donate else (),
    )

    def fn(state, inputs_seq):
        return jitted(building, state, inputs_seq)

    return fn


def make_checked_run_fn(collect_zone_T: bool = True):
    """Whole-run scan with an IN-GRAPH finiteness guard.

    The reference asserts against NaN temperatures every sub-step
    (model.rs:416-419, surface.rs:704-707); a compiled annual scan would
    otherwise march 8760 h of garbage before anyone looked.  This variant
    checks zone and node temperatures after every main step inside the graph
    (``jax.experimental.checkify``) and reports the first offending step and
    zone on the host.  The building is a traced argument of the returned
    ``fn(building, state, inputs_seq)`` so host-side leaf edits between
    calls take effect without recompiling.

    Returns ``(state, zone_T_hist)``; raises ``checkify.JaxRuntimeError``
    on the first non-finite state.
    """
    from jax.experimental import checkify

    def run_fn(building, state, inputs_seq):
        mrt_static = None
        if building.config.interior_mrt:
            mrt_static = surf_mod.mrt_statics(
                building.surfaces, building.n_zones
            )

        def body(carry, xs):
            state, step_idx = carry
            step_inputs = xs
            new_state = march(building, state, step_inputs, mrt_static=mrt_static)
            zone_ok = jnp.isfinite(new_state.zone_T)
            node_ok = jnp.isfinite(
                jnp.where(building.surfaces.node_mask, new_state.node_T, 0.0)
            )
            checkify.check(
                jnp.all(zone_ok) & jnp.all(node_ok),
                "non-finite temperature at main step {step} (first bad zone {zone})",
                step=step_idx,
                zone=jnp.argmin(zone_ok.astype(jnp.int32)),
            )
            out = new_state.zone_T if collect_zone_T else None
            return (new_state, step_idx + 1), out

        (state, _), hist = jax.lax.scan(
            body, (state, jnp.asarray(0, jnp.int32)), _with_time_axis_mix(inputs_seq)
        )
        return state, hist

    checked = checkify.checkify(run_fn, errors=checkify.user_checks)
    jitted = jax.jit(checked)

    def fn(building, state, inputs_seq):
        err, out = jitted(building, state, inputs_seq)
        checkify.check_error(err)
        return out

    return fn
