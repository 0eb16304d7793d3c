"""Implicit fast mode: TR-BDF2 on the fully-coupled node system.

Same idea as :mod:`heatx.engine.exponential` — freeze the convection /
linearized-radiation coefficients and cavity U-values per main step
(EnergyPlus-style) so each surface's node chain becomes a linear
differential-algebraic system

    C dT/dt = K T + q        (C = 0 on no-mass rows)

— but integrate it with the one-step L-stable TR-BDF2 scheme instead of the
matrix exponential.  Why: on TPU the exponential's batched dense [S, N, N]
algebra maps poorly onto XLA (each tiny 25x25 matmul pads to full MXU
tiles), while TR-BDF2 needs only tridiagonal mat-vecs and two batched Thomas
solves per sub-step in the engine's native node-major [N, S] layout — the
exact ops the parity path and the Pallas hour kernel already use, at a tiny
fraction of the parity path's ~120-sub-step cost.

Properties:

* **A/L-stable**: no step-size limit from the thin-layer stiffness that
  forces the reference's ~30 s RK4 sub-steps (discretization.rs:410-544);
  the fast surface-skin modes are damped to their quasi-steady values, which
  is their physical behavior at these step sizes.
* **DAE-native**: rows with C = 0 (the reference's no-mass chunks,
  surface.rs:790-898) reduce to the exact algebraic balance K T + q = 0 at
  every stage — no relaxed fixed-point iterations, and the solution is the
  exact coupled steady state rather than the reference's chunk-decoupled
  frozen-Dirichlet approximation.
* **2nd-order accurate** on the slow bulk modes that carry the energy.

The scheme (Bank et al. 1985), gamma = 2 - sqrt(2), one step dt:

    stage 1 (trapezoidal to t + gamma*dt):
        (C - gamma*dt/2 K) T1 = (C + gamma*dt/2 K) T0 + gamma*dt q
    stage 2 (BDF2 to t + dt):
        (C - beta*dt K) T2 = c1 C T1 - c2 C T0 + beta*dt q
    beta = (1-gamma)/(2-gamma),  c1 = 1/(gamma(2-gamma)),
    c2 = (1-gamma)^2 / (gamma(2-gamma))

q is rebuilt each sub-step from the current zone-air temperatures (the
surface<->zone coupling stays explicit, exactly like EnergyPlus's
zone/surface split and this package's parity path).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from heatx.build.layout import CompiledBuilding
from heatx.engine import step as step_mod
from heatx.engine import surface as surf_mod
from heatx.engine import zone as zone_mod
from heatx.engine.exponential import _full_system_K, _substep_forcing
from heatx.engine.state import SimState, StepInputs
from heatx.ops import tridiag

GAMMA = 2.0 - math.sqrt(2.0)
BETA = (1.0 - GAMMA) / (2.0 - GAMMA)
C1 = 1.0 / (GAMMA * (2.0 - GAMMA))
C2 = (1.0 - GAMMA) ** 2 / (GAMMA * (2.0 - GAMMA))


class ImplicitOperators(NamedTuple):
    # Frozen full-system tridiagonal K [N, S] and capacity C [N, S]
    K: tuple
    C: jnp.ndarray
    # Pre-assembled stage matrices (C - a*dt*K) as tridiagonals
    M1: tuple
    M2: tuple
    env_f: surf_mod.FaceEnv
    env_b: surf_mod.FaceEnv
    rad_hs_f: jnp.ndarray
    rad_hs_b: jnp.ndarray
    statics: object


def _stage_matrix(sb, K, C, a_dt):
    """(C - a_dt * K) with identity rows on invalid (padded) nodes so one
    padded Thomas solve serves every surface."""
    lower, diag, upper = K
    one = jnp.ones_like(diag)
    m = sb.node_mask
    return (
        jnp.where(m, -a_dt * lower, 0.0),
        jnp.where(m, C - a_dt * diag, one),
        jnp.where(m, -a_dt * upper, 0.0),
    )


def build_operators(
    building: CompiledBuilding,
    state: SimState,
    t_out0,
    wind_speed0,
    wind_direction0,
    inputs: StepInputs,
    dt_sub,
    mrt_static=None,
):
    """Per-main-step precompute: freeze h / rad_hs / cavity U from the current
    state and assemble the two TR-BDF2 stage matrices."""
    sb = building.surfaces
    cfg = building.config
    statics = surf_mod.compute_statics(sb)

    t_front, t_back = surf_mod.boundary_temperatures(sb, state.zone_T, t_out0)
    env_f, env_b = surf_mod.border_conditions(
        sb, state.node_T, t_front, t_back, wind_direction0, wind_speed0,
        inputs.ir_front, inputs.ir_back, cfg, statics=statics,
    )
    # Interior longwave exchange (config.interior_mrt): frozen with the
    # rest of the coefficients for the main step.
    mrt = None
    if cfg.interior_mrt:
        mrt = surf_mod.interior_mrt(
            sb, state.node_T, state.zone_T, building.n_zones, statics,
            mrt_static=mrt_static,
        )
    env_f, env_b, rad_eps_f, rad_eps_b = surf_mod.apply_interior_mrt(
        sb, env_f, env_b, mrt
    )
    rad_hs_f = surf_mod.linearized_rad_coefficient(rad_eps_f, env_f)
    rad_hs_b = surf_mod.linearized_rad_coefficient(rad_eps_b, env_b)

    U = surf_mod.segment_u(sb, state.node_T, env_b.air)
    K = _full_system_K(sb, U, env_f, env_b, rad_hs_f, rad_hs_b, statics)
    C = jnp.where(sb.massive, sb.mass, 0.0)

    # With the L-stable gamma = 2 - sqrt(2), GAMMA/2 == BETA exactly (in
    # real arithmetic; they differ by 1 ulp as floats), so the two TR-BDF2
    # stage matrices are THE SAME matrix — build and factor it once and
    # alias both stages to it.  In the fused kernel this halves the
    # per-sub-step factorization work of refresh mode.
    M1 = _stage_matrix(sb, K, C, GAMMA * dt_sub / 2.0)
    return ImplicitOperators(
        K, C, M1, M1, env_f, env_b, rad_hs_f, rad_hs_b, statics
    )


def imp_substep(
    building: CompiledBuilding,
    ops: ImplicitOperators,
    state: SimState,
    t_out,
    inputs: StepInputs,
    dt_sub,
    solver=None,
):
    """One TR-BDF2 sub-step + analytical zone update.  h / rad_hs / U (and
    the stage matrices) stay frozen; q rebuilds from current air temps."""
    sb = building.surfaces
    st = ops.statics
    solve = solver if solver is not None else tridiag.solve

    t_front, t_back = surf_mod.boundary_temperatures(sb, state.zone_T, t_out)
    env_f = ops.env_f._replace(air=t_front)
    env_b = ops.env_b._replace(air=t_back)

    solar_q = surf_mod.absorbed_solar_q(sb, inputs.sol_front, inputs.sol_back)
    q = _substep_forcing(env_f, env_b, ops.rad_hs_f, ops.rad_hs_b, solar_q, st)

    T0 = state.node_T
    lower, diag, upper = ops.K
    KT0 = tridiag.matvec(lower, diag, upper, T0)

    # Stage 1: trapezoidal to t + gamma*dt
    half = GAMMA * dt_sub / 2.0
    rhs1 = ops.C * T0 + half * KT0 + GAMMA * dt_sub * q
    rhs1 = jnp.where(sb.node_mask, rhs1, T0)
    T1 = solve(*ops.M1, rhs1)

    # Stage 2: BDF2 to t + dt
    rhs2 = C1 * ops.C * T1 - C2 * ops.C * T0 + BETA * dt_sub * q
    rhs2 = jnp.where(sb.node_mask, rhs2, T0)
    T = solve(*ops.M2, rhs2)

    ts_front = T[0]
    ts_back = surf_mod._last_node(sb, T, st)
    q_front = (ts_front - t_front) * env_f.h
    q_back = (ts_back - t_back) * env_b.h

    a, b, c = zone_mod.zone_abc(
        building, state.zone_T, env_f.h, env_b.h, ts_front, ts_back, inputs
    )
    zone_T, ideal_load = zone_mod.zone_update(building, state.zone_T, a, b, c, dt_sub, heat_sp=inputs.heat_sp, cool_sp=inputs.cool_sp)

    return SimState(
        node_T=T,
        zone_T=zone_T,
        h_front=env_f.h,
        h_back=env_b.h,
        q_front=q_front,
        q_back=q_back,
        ideal_load=ideal_load,
    )


def imp_march(
    building: CompiledBuilding,
    state: SimState,
    inputs: StepInputs,
    substeps: int,
    refresh_h: bool = False,
    refresh_every: int = None,
):
    """One main step in implicit fast mode: freeze coefficients + stage
    matrices, then run ``substeps`` TR-BDF2 sub-steps (scanned).

    ``refresh_h=True`` re-evaluates the film coefficients / linearized
    radiation / cavity U and re-assembles the stage matrices EVERY sub-step
    (from the marching state and the per-sub-step weather) instead of
    freezing them for the hour — the parity path's coefficient cadence
    (surface.rs:596-717) at the fast mode's sub-step count.

    ``refresh_every=k`` is the hybrid cadence: coefficients re-evaluate at
    the start of every group of ``k`` consecutive sub-steps (k must divide
    ``substeps``).  k=1 is exactly ``refresh_h=True``; k=substeps is
    exactly the frozen default (both freeze from the main-step-start state
    and weather).  Within a group only the boundary air temperatures track
    the marching state, like the frozen mode."""
    if substeps < 1:
        raise ValueError(f"substeps must be >= 1, got {substeps}")
    if refresh_every is not None:
        if refresh_every < 1:
            raise ValueError(f"refresh_every must be >= 1, got {refresh_every}")
        if substeps % refresh_every:
            raise ValueError(
                f"refresh_every {refresh_every} must divide substeps {substeps}"
            )
        refresh_h = True  # group cadence reuses the per-group rebuild path
    elif refresh_h:
        refresh_every = 1
    # In-run zone-state controls (shading deployment + ventilation
    # gates): evaluated once per main step from the step-start zone
    # temperatures, frozen for the sub-steps (the same cadence as the
    # frozen film coefficients).
    inputs = step_mod.apply_state_controls(building, state, inputs)
    main_dt = 3600.0 / building.n_steps_per_hour
    dt_sub = main_dt / substeps

    t_out = jnp.asarray(inputs.t_out)
    t_out0 = t_out if t_out.ndim == 0 else t_out[0]
    ws = jnp.asarray(inputs.wind_speed)
    ws0 = ws if ws.ndim == 0 else ws[0]
    wd = jnp.asarray(inputs.wind_direction)
    wd0 = wd if wd.ndim == 0 else wd[0]

    # Hoist the Carroll network's static prefix out of the sub-step scan
    # (it only matters under refresh_h, where build_operators re-runs per
    # sub-step; computing it here is free either way).
    mrt_static = None
    if building.config.interior_mrt:
        mrt_static = surf_mod.mrt_statics(building.surfaces, building.n_zones)

    # Under refresh_h the scan body rebuilds the operators per sub-step and
    # this result would be dead (XLA DCEs it, but the full build — border
    # conditions, MRT fixed point, stage assembly — still costs trace time).
    ops = (
        None
        if refresh_h
        else build_operators(
            building, state, t_out0, ws0, wd0, inputs, dt_sub, mrt_static
        )
    )

    def _sub_seq(v, v0):
        """Per-sub-step series: a scalar holds for the main step; a 1-D
        series must have exactly [substeps] entries (the parity path's
        _per_substep_weather asserts the same — silently freezing a
        mismatched series to its first value hid real input errors)."""
        if v.ndim > 0:
            if v.shape[0] != substeps:
                raise ValueError(
                    f"per-sub-step weather series has length {v.shape[0]} "
                    f"but this march runs {substeps} sub-steps; pass a "
                    f"scalar or a [{substeps}] series"
                )
            return v
        return jnp.broadcast_to(v0, (substeps,))

    t_out_seq = _sub_seq(t_out, t_out0)
    # Wind enters only through build_operators, so a per-sub-step wind
    # series matters only under refresh_h (the fused kernel reads wind per
    # sub-step the same way, pallas_step._hour_body_imp).
    ws_seq = _sub_seq(ws, ws0)
    wd_seq = _sub_seq(wd, wd0)

    collect_load = building.has_ideal_hvac

    if refresh_h:
        # Grouped cadence: rebuild the operators from the carry state + the
        # group's first sub-step weather, then run ``refresh_every`` frozen
        # sub-steps on them (imp_substep re-reads the boundary air each
        # sub-step either way, so k=substeps reproduces the frozen mode
        # exactly and k=1 the classic every-sub-step refresh).
        k = refresh_every

        def grp(v):
            return v.reshape(substeps // k, k)

        def body(carry, x):
            t_g, ws_g, wd_g = x
            ops_g = build_operators(
                building, carry, t_g[0], ws_g[0], wd_g[0], inputs, dt_sub,
                mrt_static,
            )

            def inner(c, xi):
                new = imp_substep(building, ops_g, c, xi[0], inputs, dt_sub)
                return new, (new.ideal_load if collect_load else None)

            return jax.lax.scan(inner, carry, (t_g, ws_g, wd_g))

        state, loads = jax.lax.scan(
            body, state, (grp(t_out_seq), grp(ws_seq), grp(wd_seq))
        )
        if collect_load:
            state = state._replace(
                ideal_load=jnp.mean(loads, axis=(0, 1))
            )
        return state

    def body(carry, x):
        t_i, ws_i, wd_i = x
        new = imp_substep(building, ops, carry, t_i, inputs, dt_sub)
        return new, (new.ideal_load if collect_load else None)

    state, loads = jax.lax.scan(body, state, (t_out_seq, ws_seq, wd_seq))
    if collect_load:
        state = state._replace(ideal_load=jnp.mean(loads, axis=0))
    return state
