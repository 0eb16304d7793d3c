"""Exponential-integrator fast mode.

The reference's stability heuristic (discretization.rs:410-544) subdivides
every hour into ~120 RK4 sub-steps whenever a construction contains a thin
layer, because explicit RK4 must respect the stiffest node's time constant.
The sub-step ODE is *linear* with frozen coefficients

    dT = A T + q            (A = dt/C * K, the exact system RK4 integrates)

so it has an exact one-step solution

    T(t+dt) = E T + P q,    E = exp(A),  P = phi1(A) = A^{-1}(E - I)

with no stability limit at all.  Fast mode exploits this:

* convection coefficients (and therefore A) freeze per *main step* instead of
  per sub-step — the same practice EnergyPlus itself uses per timestep;
* E and P are computed once per main step by batched scaling-and-squaring
  (dense [S, N, N] matmuls on the MXU — N is tiny);
* the hour advances in a handful of sub-steps (enough to resolve the
  zone-air dynamics, default 12/hour) instead of ~120: per sub-step the
  massive nodes advance exactly via two batched mat-vecs, the no-mass solve
  and the analytical zone update run as usual.

Zero rows of A (no-mass / invalid nodes) make E the identity and P zero
there, which reproduces the reference's "frozen Dirichlet neighbor"
semantics exactly.

This mode intentionally trades step-for-step parity with the reference's RK4
for speed; it is validated against the same EnergyPlus replay suite (see
tests/test_exponential.py) and is opt-in via ``FastExpRunner`` / bench
``--exp-mode``.
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
    """[N, S] tridiagonals -> [S, N, N] dense (N is tiny)."""
    N = diag.shape[0]
    d = jnp.moveaxis(diag, 0, -1)  # [S, N]
    l = jnp.moveaxis(lower, 0, -1)
    u = jnp.moveaxis(upper, 0, -1)
    # Row i: lower[i]*x[i-1] + diag[i]*x[i] + upper[i]*x[i+1]
    # (tridiag.matvec convention), so lower[i] lands at A[i, i-1] — row-wise
    # scaling of the shifted identities.
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
            "snm,smk->snk", term, B, preferred_element_type=dtype
        ) / k
        E = E + term
        P = P + term / (k + 1.0)

    for _ in range(squarings):
        EP = jnp.einsum("snm,smk->snk", E, P, preferred_element_type=dtype)
        P = (EP + P) / 2.0
        E = jnp.einsum("snm,smk->snk", E, E, preferred_element_type=dtype)
    return E, P


class ExpOperators(NamedTuple):
    E: jnp.ndarray  # [S, N, N] exp(A)
    P: jnp.ndarray  # [S, N, N] phi1(A)
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
    """Per-main-step precompute: freeze h from the current state, assemble the
    dt-scaled massive system, and compute its exponential propagators."""
    sb = building.surfaces
    cfg = building.config
    statics = surf_mod.compute_statics(sb)

    t_front, t_back = surf_mod.boundary_temperatures(sb, state.zone_T, t_out0)
    env_f, env_b = surf_mod.border_conditions(
        sb, state.node_T, t_front, t_back, wind_direction0, wind_speed0,
        inputs.ir_front, inputs.ir_back, cfg, statics=statics,
    )
    rad_hs_f = surf_mod.linearized_rad_coefficient(sb.eps_front, env_f)
    rad_hs_b = surf_mod.linearized_rad_coefficient(sb.eps_back, env_b)

    U = surf_mod.segment_u(sb, state.node_T, env_b.air)
    lower, diag, upper = surf_mod.assemble_K(sb, U, env_f, env_b, statics)
    sel = sb.massive
    scale = jnp.where(sel, dt_sub / jnp.where(sel, sb.mass, 1.0), 0.0)
    A = _tridiag_to_dense(lower * scale, diag * scale, upper * scale)
    # zero rows for non-massive nodes -> E=I, P has 1 on those diagonals from
    # the series (term k=0); zero P's frozen rows so q does not move them.
    E, P = expm_phi1(A)
    sel_s = jnp.moveaxis(sel, 0, -1)  # [S, N]
    P = jnp.where(sel_s[..., None], P, 0.0)
    return ExpOperators(E, P, env_f, env_b, rad_hs_f, rad_hs_b, statics)


def exp_substep(
    building: CompiledBuilding,
    ops: ExpOperators,
    state: SimState,
    t_out,
    inputs: StepInputs,
    dt_sub,
):
    """One fast sub-step: no-mass algebraic solve, exact massive propagation,
    analytical zone update.  h (and the propagators) stay frozen."""
    sb = building.surfaces
    cfg = building.config
    statics = ops.statics

    t_front, t_back = surf_mod.boundary_temperatures(sb, state.zone_T, t_out)
    # Frozen h, current air temperatures (the reference also mixes frozen
    # surface-derived h with current air temps within a sub-step).
    env_f = ops.env_f._replace(air=t_front)
    env_b = ops.env_b._replace(air=t_back)

    sol_f = jnp.where(jnp.isnan(inputs.sol_front) | (inputs.sol_front < 0.0), 0.0, inputs.sol_front)
    sol_b = jnp.where(jnp.isnan(inputs.sol_back), 0.0, inputs.sol_back)
    solar_q = sb.front_alphas * sol_f + sb.back_alphas * sol_b

    T = state.node_T
    if sb.has_nomass:
        T = surf_mod.march_nomass(
            sb, T, env_f, env_b, ops.rad_hs_f, ops.rad_hs_b, solar_q, cfg,
            statics=statics,
        )

    if sb.has_massive:
        U = sb.seg_u if not sb.has_cavity else surf_mod.segment_u(sb, T, env_b.air)
        q = surf_mod.assemble_q(
            sb, T, U, env_f, env_b, ops.rad_hs_f, ops.rad_hs_b, solar_q, statics
        )
        sel = sb.massive
        qs = jnp.where(sel, dt_sub / jnp.where(sel, sb.mass, 1.0), 0.0) * q
        Ts = jnp.moveaxis(T, 0, -1)  # [S, N]
        qss = jnp.moveaxis(qs, 0, -1)
        T_new = jnp.einsum("snm,sm->sn", ops.E, Ts, preferred_element_type=T.dtype)
        T_new = T_new + jnp.einsum("snm,sm->sn", ops.P, qss, preferred_element_type=T.dtype)
        T = jnp.where(sel, jnp.moveaxis(T_new, -1, 0), T)

    ts_front = T[0]
    ts_back = surf_mod._last_node(sb, T, statics)
    q_front = (ts_front - t_front) * env_f.h
    q_back = (ts_back - t_back) * env_b.h

    a, b, c = zone_mod.zone_abc(
        building, state.zone_T, env_f.h, env_b.h, ts_front, ts_back, inputs
    )
    zone_T = zone_mod.future_zone_temperatures(state.zone_T, a, b, c, dt_sub)

    return SimState(
        node_T=T,
        zone_T=zone_T,
        h_front=env_f.h,
        h_back=env_b.h,
        q_front=q_front,
        q_back=q_back,
    )


def exp_march(
    building: CompiledBuilding,
    state: SimState,
    inputs: StepInputs,
    substeps: int,
):
    """One main step in fast mode: freeze h + propagators, then run
    ``substeps`` exact sub-steps (scanned)."""
    if substeps < 1:
        raise ValueError(f"substeps must be >= 1, got {substeps}")
    main_dt = 3600.0 / building.n_steps_per_hour
    dt_sub = main_dt / substeps

    t_out = jnp.asarray(inputs.t_out)
    t_out0 = t_out if t_out.ndim == 0 else t_out[0]
    ws = jnp.asarray(inputs.wind_speed)
    ws0 = ws if ws.ndim == 0 else ws[0]
    wd = jnp.asarray(inputs.wind_direction)
    wd0 = wd if wd.ndim == 0 else wd[0]

    ops = build_operators(building, state, t_out0, ws0, wd0, inputs, dt_sub)

    t_out_seq = jnp.broadcast_to(t_out0, (substeps,)) if t_out.ndim == 0 else (
        t_out if t_out.shape[0] == substeps else jnp.broadcast_to(t_out0, (substeps,))
    )

    def body(carry, x):
        return exp_substep(building, ops, carry, x, inputs, dt_sub), None

    state, _ = jax.lax.scan(body, state, t_out_seq)
    return state
