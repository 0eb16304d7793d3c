"""Exponential-integrator fast mode: exact DAE reduction + matrix exponential.

The reference's stability heuristic (discretization.rs:410-544) subdivides
every hour into ~120 RK4 sub-steps whenever a construction contains a thin
layer, because explicit RK4 must respect the stiffest node's time constant,
and iterates a relaxed fixed point for the massless nodes
(surface.rs:790-898).  Both costs disappear when the per-surface node system
is treated as what it is — a linear differential-algebraic system with
frozen coefficients:

    C_m dT_m/dt = K_mm T_m + K_mn T_n + q_m      (massive nodes)
    0           = K_nm T_m + K_nn T_n + q_n      (no-mass nodes, algebraic)

Eliminating the algebraic block (Schur complement) gives a plain linear ODE

    C_m dT_m/dt = (K_mm - K_mn K_nn^-1 K_nm) T_m + (q_m - K_mn K_nn^-1 q_n)

whose one-step solution is exact for any step size:

    T_m(t+dt) = E T_m + P q_eff,   E = exp(A dt),  P = phi1(A dt)

with T_n recovered algebraically.  Fast mode exploits this:

* convection coefficients, linearized radiation coefficients, and cavity
  U-values freeze per *main step* — the same practice EnergyPlus uses per
  timestep (the parity path refreshes them every ~30 s sub-step);
* E, P and the Schur operators are computed once per main step by batched
  dense [S, N, N] algebra (scaling-and-squaring exponential + one batched
  inverse) — N is tiny, the surface batch rides the MXU;
* unlike the parity path (and the reference), chunks are NOT decoupled with
  frozen-Dirichlet exchanges and the no-mass nodes need NO fixed-point
  iterations: the reduction solves the fully-coupled system exactly.  A
  naive per-sub-step explicit exchange between the no-mass solve and an
  exponential massive step is *unstable* for thin-skin walls at large
  sub-steps (the partitioned iteration's spectral radius exceeds 1) — the
  Schur reduction is what makes big steps safe;
* the hour advances in a handful of sub-steps (default 12 — enough to
  resolve the zone-air dynamics, which remain explicitly coupled exactly
  like EnergyPlus's zone/surface split) instead of ~120.

This mode trades the reference's step-for-step semantics (per-sub-step h,
per-sub-step chunk Dirichlet freezing) for speed; it is validated against
the reference-parity path in tests/test_exponential.py and is opt-in via
``ThermalModel.march_exp`` / bench ``--exp-path``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from heatx.build.layout import CompiledBuilding
from heatx.engine import surface as surf_mod
from heatx.engine import zone as zone_mod
from heatx.engine.state import SimState, StepInputs


def _tridiag_to_dense(lower, diag, upper):
    """[N, S] tridiagonals -> [S, N, N] dense (N is tiny).

    Row i: lower[i]*x[i-1] + diag[i]*x[i] + upper[i]*x[i+1]
    (tridiag.matvec convention), so lower[i] lands at A[i, i-1] — row-wise
    scaling of the shifted identities."""
    N = diag.shape[0]
    d = jnp.moveaxis(diag, 0, -1)  # [S, N]
    l = jnp.moveaxis(lower, 0, -1)
    u = jnp.moveaxis(upper, 0, -1)
    A = (
        d[..., :, None] * jnp.eye(N, dtype=diag.dtype)
        + l[..., :, None] * jnp.eye(N, k=-1, dtype=diag.dtype)
        + u[..., :, None] * jnp.eye(N, k=1, dtype=diag.dtype)
    )
    return A


def expm_phi1(A, order: int = 8, squarings: int = 6):
    """Batched exp(A) and phi1(A) by scaling-and-squaring Taylor series.

    ``squarings`` is static and conservative: the scaled matrix B = A/2^s has
    tiny norm for any A this model produces (|A| <~ dt/tau ~ 10), so an
    order-8 Taylor series is accurate to f32 round-off.  Doubling uses

        E(2B) = E(B) E(B)
        P(2B) = (E(B) P(B) + P(B)) / 2
    """
    dtype = A.dtype
    N = A.shape[-1]
    eye = jnp.eye(N, dtype=dtype)
    B = A / (2.0**squarings)

    # Taylor: E = sum B^k/k!,  P = sum B^k/(k+1)!
    E = eye + jnp.zeros_like(A)
    P = eye + jnp.zeros_like(A)
    term = eye + jnp.zeros_like(A)
    for k in range(1, order + 1):
        term = jnp.einsum(
            "snm,smk->snk", term, B, preferred_element_type=dtype, precision="highest"
        ) / k
        E = E + term
        P = P + term / (k + 1.0)

    for _ in range(squarings):
        EP = jnp.einsum("snm,smk->snk", E, P, preferred_element_type=dtype, precision="highest")
        P = (EP + P) / 2.0
        E = jnp.einsum("snm,smk->snk", E, E, preferred_element_type=dtype, precision="highest")
    return E, P


def _full_system_K(sb, U, env_f, env_b, rad_hs_f, rad_hs_b, st):
    """The fully-coupled tridiagonal K of one surface's whole node chain —
    assemble_K (surface.rs/discretization.rs:596-700 semantics) but with two
    differences that make the system a closed linear ODE/DAE:

    * adjacent nodes couple whenever both exist, across chunk boundaries
      (the parity path decouples chunks and exchanges frozen-Dirichlet
      sources per sub-step — see SurfaceStatics.couple_*);
    * the linearized radiation term rad_hs*(T_rad - T_s) moves its -T_s part
      onto the boundary diagonals (the parity path keeps it frozen in q).
    """
    U_left = jnp.concatenate([jnp.zeros_like(U[:1]), U[:-1]], axis=0)
    zero = jnp.zeros_like(U)

    def sel(mask, v):
        return jnp.where(mask, v, zero)

    diag = -(
        sel(st.left_exists, U_left)
        + sel(st.right_exists, U)
        + sel(st.is_first, env_f.h + rad_hs_f)
        + sel(st.is_last, env_b.h + rad_hs_b)
    )
    lower = sel(st.left_exists, U_left)
    upper = sel(st.right_exists, U)
    return lower, diag, upper


def _substep_forcing(env_f, env_b, rad_hs_f, rad_hs_b, solar_q, st):
    """Forcing q of the full system: solar + boundary convection/radiation
    sources.  Linear in the boundary air/radiant temperatures and entirely
    independent of the node temperatures (their coefficients live in K)."""
    zero = jnp.zeros_like(solar_q)
    q = solar_q
    q = q + jnp.where(st.is_first, env_f.air * env_f.h + rad_hs_f * env_f.rad, zero)
    q = q + jnp.where(st.is_last, env_b.air * env_b.h + rad_hs_b * env_b.rad, zero)
    return q


class ExpOperators(NamedTuple):
    E: jnp.ndarray  # [S, N, N] exp(A_schur * dt)         (massive rows)
    PMq: jnp.ndarray  # [S, N, N] phi1 @ diag(dt/C) @ Mq  (forcing -> massive)
    M2: jnp.ndarray  # [S, N, N] K_nn^-1 K_nm             (massive -> algebraic)
    M3: jnp.ndarray  # [S, N, N] K_nn^-1 on the algebraic block
    env_f: surf_mod.FaceEnv
    env_b: surf_mod.FaceEnv
    rad_hs_f: jnp.ndarray
    rad_hs_b: jnp.ndarray
    statics: object


def build_operators(
    building: CompiledBuilding,
    state: SimState,
    t_out0,
    wind_speed0,
    wind_direction0,
    inputs: StepInputs,
    dt_sub,
):
    """Per-main-step precompute: freeze h / rad_hs / cavity U from the current
    state, Schur-eliminate the algebraic (no-mass) nodes, and compute the
    exponential propagators of the reduced massive system."""
    sb = building.surfaces
    cfg = building.config
    statics = surf_mod.compute_statics(sb)
    dtype = state.node_T.dtype

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
            sb, state.node_T, state.zone_T, building.n_zones, statics
        )
    env_f, env_b, rad_eps_f, rad_eps_b = surf_mod.apply_interior_mrt(
        sb, env_f, env_b, mrt
    )
    rad_hs_f = surf_mod.linearized_rad_coefficient(rad_eps_f, env_f)
    rad_hs_b = surf_mod.linearized_rad_coefficient(rad_eps_b, env_b)

    U = surf_mod.segment_u(sb, state.node_T, env_b.air)
    lower, diag, upper = _full_system_K(
        sb, U, env_f, env_b, rad_hs_f, rad_hs_b, statics
    )
    Kd = _tridiag_to_dense(lower, diag, upper)  # [S, N, N]

    m = jnp.moveaxis(sb.massive, 0, -1).astype(dtype)  # [S, N] massive
    alg = jnp.moveaxis(sb.node_mask & ~sb.massive, 0, -1).astype(dtype)
    eyeN = jnp.eye(Kd.shape[-1], dtype=dtype)

    # K_nn padded to identity outside the algebraic block, so one batched
    # inverse serves every surface regardless of where its no-mass nodes sit.
    Knn = alg[:, :, None] * Kd * alg[:, None, :] + (1.0 - alg)[:, :, None] * eyeN
    # The batched inverse (and every einsum in this module) must run at full
    # f32 matmul precision: the TPU's default reduced-precision passes make
    # the scaling-and-squaring expm diverge (observed: zone temps blowing up
    # within hours at f32 while the same program is fine on CPU).
    with jax.default_matmul_precision("highest"):
        inv_nn = jnp.linalg.inv(Knn)
    K_mn = m[:, :, None] * Kd * alg[:, None, :]
    K_nm = alg[:, :, None] * Kd * m[:, None, :]

    mm = jnp.einsum("snm,smk->snk", K_mn, inv_nn, preferred_element_type=dtype, precision="highest")
    A_red = m[:, :, None] * Kd * m[:, None, :] - jnp.einsum(
        "snm,smk->snk", mm, K_nm, preferred_element_type=dtype, precision="highest"
    )
    # Mq maps the raw forcing q to the reduced forcing (q_m - K_mn K_nn^-1 q_n)
    Mq = m[:, :, None] * eyeN - mm * alg[:, None, :]

    mass = jnp.moveaxis(sb.mass, 0, -1)  # [S, N]
    scale = jnp.where(m > 0, dt_sub / jnp.where(m > 0, mass, 1.0), 0.0)
    E, P = expm_phi1(scale[:, :, None] * A_red)
    # phi1's identity rows on frozen nodes must not inject forcing there.
    PMq = jnp.einsum(
        "snm,smk->snk", P, scale[:, :, None] * Mq, preferred_element_type=dtype, precision="highest"
    )
    PMq = m[:, :, None] * PMq

    M2 = jnp.einsum("snm,smk->snk", inv_nn, K_nm, preferred_element_type=dtype, precision="highest")
    M2 = alg[:, :, None] * M2
    M3 = alg[:, :, None] * inv_nn * alg[:, None, :]

    return ExpOperators(E, PMq, M2, M3, env_f, env_b, rad_hs_f, rad_hs_b, statics)


def exp_substep(
    building: CompiledBuilding,
    ops: ExpOperators,
    state: SimState,
    t_out,
    inputs: StepInputs,
    dt_sub,
):
    """One fast sub-step: build the forcing from current air temperatures,
    propagate the massive nodes exactly, recover the algebraic nodes, update
    the zones analytically.  h / rad_hs / U (and the operators) stay frozen."""
    sb = building.surfaces
    st = ops.statics

    t_front, t_back = surf_mod.boundary_temperatures(sb, state.zone_T, t_out)
    # Frozen h / rad, current air temperatures (the parity path also mixes
    # frozen surface-derived coefficients with current air temps within a
    # sub-step).
    env_f = ops.env_f._replace(air=t_front)
    env_b = ops.env_b._replace(air=t_back)

    solar_q = surf_mod.absorbed_solar_q(sb, inputs.sol_front, inputs.sol_back)
    q = _substep_forcing(env_f, env_b, ops.rad_hs_f, ops.rad_hs_b, solar_q, st)
    qs = jnp.moveaxis(q, 0, -1)  # [S, N]
    Ts = jnp.moveaxis(state.node_T, 0, -1)

    dtype = Ts.dtype
    T_m = jnp.einsum("snm,sm->sn", ops.E, Ts, preferred_element_type=dtype, precision="highest")
    T_m = T_m + jnp.einsum("snm,sm->sn", ops.PMq, qs, preferred_element_type=dtype, precision="highest")
    massive = sb.massive
    T = jnp.where(massive, jnp.moveaxis(T_m, -1, 0), state.node_T)

    # Algebraic recovery: T_n = -K_nn^-1 (K_nm T_m + q_n), exact (the parity
    # path approximates this with the reference's relaxed fixed point).
    Ts2 = jnp.moveaxis(T, 0, -1)
    T_n = -(
        jnp.einsum("snm,sm->sn", ops.M2, Ts2, preferred_element_type=dtype, precision="highest")
        + jnp.einsum("snm,sm->sn", ops.M3, qs, preferred_element_type=dtype, precision="highest")
    )
    alg = sb.node_mask & ~massive
    T = jnp.where(alg, jnp.moveaxis(T_n, -1, 0), T)

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


def exp_march(
    building: CompiledBuilding,
    state: SimState,
    inputs: StepInputs,
    substeps: int,
):
    """One main step in fast mode: freeze coefficients + propagators, then run
    ``substeps`` exact sub-steps (scanned)."""
    from heatx.engine.step import apply_state_controls

    if substeps < 1:
        raise ValueError(f"substeps must be >= 1, got {substeps}")
    # In-run zone-state controls (shading deployment + ventilation
    # gates): step-start decision, frozen for the sub-steps (the
    # frozen-coefficient cadence).
    inputs = apply_state_controls(building, state, inputs)
    main_dt = 3600.0 / building.n_steps_per_hour
    dt_sub = main_dt / substeps

    t_out = jnp.asarray(inputs.t_out)
    t_out0 = t_out if t_out.ndim == 0 else t_out[0]
    ws = jnp.asarray(inputs.wind_speed)
    ws0 = ws if ws.ndim == 0 else ws[0]
    wd = jnp.asarray(inputs.wind_direction)
    wd0 = wd if wd.ndim == 0 else wd[0]

    ops = build_operators(building, state, t_out0, ws0, wd0, inputs, dt_sub)

    for v in (t_out, ws, wd):
        if v.ndim > 0 and v.shape[0] != substeps:
            # Same contract as the parity path's _per_substep_weather and
            # imp_march's _sub_seq: silently freezing a mismatched series
            # to its first value hides real input errors (wind enters only
            # through the frozen operators here, but a wrong-length series
            # is still a caller bug worth surfacing).
            raise ValueError(
                f"per-sub-step weather series has length {v.shape[0]} but "
                f"this march runs {substeps} sub-steps; pass a scalar or a "
                f"[{substeps}] series"
            )
    t_out_seq = (
        jnp.broadcast_to(t_out0, (substeps,)) if t_out.ndim == 0 else t_out
    )

    collect_load = building.has_ideal_hvac

    def body(carry, x):
        new = exp_substep(building, ops, carry, x, inputs, dt_sub)
        return new, (new.ideal_load if collect_load else None)

    state, loads = jax.lax.scan(body, state, t_out_seq)
    if collect_load:
        state = state._replace(ideal_load=jnp.mean(loads, axis=0))
    return state
