"""Batched per-surface march: border conditions, K/q assembly, no-mass
steady-state solve, and massive RK4 — for every surface of the building at
once.

TPU-native re-design of /root/reference/src/surface.rs (ThermalSurfaceData)
and the K/q assembly of discretization.rs:596-700.  The reference marches one
surface at a time, one chunk at a time, over ragged index ranges; here every
operation is a masked computation over padded node-major ``[N, S]`` arrays
(node axis on sublanes, the large surface batch on the 128-wide vector
lanes):

* chunk ranges (``get_chunks``) become a ``same_chunk`` coupling mask and a
  per-node no-mass ``chunk_id``;
* the per-chunk "adjacent node as Dirichlet source" rule
  (discretization.rs:667-674, 688-694) becomes mask-selected q terms;
* the per-chunk banded solves become ONE padded Thomas solve per surface with
  identity rows outside the chunks (chunks never couple directly, so the
  padded system block-decouples into exactly the reference's chunk systems);
* the data-dependent no-mass fixed point (surface.rs:808-896) becomes a
  ``lax.while_loop`` (or a statically unrolled fixed iteration count in
  performance mode) with per-chunk active masks reproducing the reference's
  convergence rules: error-increase break before update, averaged relaxation
  update, escalating tolerance after 100 iterations.

Per-surface scalars ([S] arrays: boundary data, h, areas) broadcast against
``[N, S]`` node arrays with no reshapes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from heatx.config import SimConfig
from heatx.constants import KELVIN, SIGMA
from heatx.build.layout import B_AMBIENT, B_OUTDOOR, B_SPACE, SurfaceBatch
from heatx.ops import tridiag
from heatx.physics.cavity import cavity_u_value
from heatx.physics.convection import (
    is_windward,
    tarp_natural_convection_coefficient,
)


class FaceEnv(NamedTuple):
    """ConvectionParams equivalent for one face of every surface
    (convection.rs:27-52) plus the resolved convection coefficient."""

    air: jnp.ndarray  # [S] air temperature, C
    rad: jnp.ndarray  # [S] radiant temperature, C
    surf: jnp.ndarray  # [S] surface temperature used for h / rad_hs, C
    h: jnp.ndarray  # [S] convection coefficient, W/m2.K


def boundary_temperatures(sb: SurfaceBatch, zone_T, t_out):
    """Air temperature on each side of each surface
    (model.rs:79-96 get_boundary_temperature)."""
    zone_padded = jnp.concatenate([zone_T, jnp.zeros((1,), zone_T.dtype)])

    def side(code, space, temp):
        t = jnp.where(code == B_OUTDOOR, t_out, 0.0)
        t = jnp.where(code == B_SPACE, zone_padded[space], t)
        t = jnp.where(code == B_AMBIENT, temp, t)
        return t

    t_front = side(sb.front_code, sb.front_space, sb.front_temp)
    t_back = side(sb.back_code, sb.back_space, sb.back_temp)
    return t_front, t_back


def _last_node(sb: SurfaceBatch, T):
    """T at each surface's last valid node: [S].

    Mask-reduce instead of a gather — dynamic gathers are slow on the TPU
    vector unit, a masked sum over the tiny node axis fuses for free.
    """
    valid = sb.node_mask
    next_valid = jnp.concatenate([valid[1:], jnp.zeros_like(valid[:1])], axis=0)
    is_last = valid & ~next_valid
    return jnp.sum(jnp.where(is_last, T, 0.0), axis=0)


def border_conditions(
    sb: SurfaceBatch,
    T,
    t_front,
    t_back,
    wind_direction,
    wind_speed,
    ir_front,
    ir_back,
    config: SimConfig,
):
    """Front/back ConvectionParams + h for every surface
    (surface.rs:596-717 calc_border_conditions).

    ``T`` is the *state* node-temperature array — the reference recomputes
    these conditions several times per sub-step but always from the same
    state snapshot, so heatx computes them once.

    Boundary semantics per face:

    * Space:   air = zone T, rad = zone T, natural convection only.
    * Ambient: air = fixed T, rad = fixed T, natural convection only.
    * Outdoor: air = outdoor T, rad from incident IR ((ir/sigma)^0.25 - 273.15),
      wind-driven forced + natural convection; the *front* face flips the
      tilt cosine (surface.rs:652), the back face does not.

    When ``config.replicate_ambient_back_bug`` (default), a back-side Ambient
    boundary reuses the *front* surface temperature and the *front* boundary
    temperature as radiant temperature, exactly like surface.rs:672-686.
    """
    front_surf = T[0]
    back_surf = _last_node(sb, T)

    windward = is_windward(wind_direction, sb.cos_tilt, sb.normal[:, 0], sb.normal[:, 1])
    speed_out = wind_speed * sb.wind_mod

    f_out = sb.front_code == B_OUTDOOR
    b_out = sb.back_code == B_OUTDOOR
    b_amb = sb.back_code == B_AMBIENT

    eps_t = jnp.asarray(1e-30, T.dtype)
    rad_out_front = (jnp.maximum(ir_front, eps_t) / SIGMA) ** 0.25 - KELVIN
    rad_out_back = (jnp.maximum(ir_back, eps_t) / SIGMA) ** 0.25 - KELVIN

    # ---- front face -------------------------------------------------------
    front_air = t_front
    front_rad = jnp.where(f_out, rad_out_front, t_front)
    front_cos = jnp.where(f_out, -sb.cos_tilt, sb.cos_tilt)
    front_speed = jnp.where(f_out, speed_out, 0.0)

    # ---- back face --------------------------------------------------------
    back_air = t_back
    if config.replicate_ambient_back_bug:
        amb_rad = t_front
        amb_surf = front_surf
    else:
        amb_rad = t_back
        amb_surf = back_surf
    back_rad = jnp.where(b_out, rad_out_back, jnp.where(b_amb, amb_rad, t_back))
    back_surf_eff = jnp.where(b_amb, amb_surf, back_surf)
    back_cos = sb.cos_tilt
    back_speed = jnp.where(b_out, speed_out, 0.0)

    # h = natural + forced; forced vanishes where air speed is 0, so a single
    # fused expression covers all boundary kinds (convection.rs:151-168).
    wf = jnp.where(windward, 1.0, 0.5)

    def total_h(air, surf, cos_eff, speed):
        natural = tarp_natural_convection_coefficient(air, surf, cos_eff)
        forced = 2.537 * wf * sb.rf * jnp.sqrt(sb.perimeter * speed / sb.area)
        return natural + forced

    h_front = total_h(front_air, front_surf, front_cos, front_speed)
    h_back = total_h(back_air, back_surf_eff, back_cos, back_speed)

    # Debug/test override (surface.rs:374-381, 708-714).
    h_front = jnp.where(jnp.isnan(sb.fixed_h_front), h_front, sb.fixed_h_front)
    h_back = jnp.where(jnp.isnan(sb.fixed_h_back), h_back, sb.fixed_h_back)

    return (
        FaceEnv(front_air, front_rad, front_surf, h_front),
        FaceEnv(back_air, back_rad, back_surf_eff, h_back),
    )


def linearized_rad_coefficient(eps, env: FaceEnv):
    """rad_hs = 4 eps sigma (273.15 + (T_rad + T_s)/2)^3 (surface.rs:941-948)."""
    return 4.0 * eps * SIGMA * (KELVIN + (env.rad + env.surf) / 2.0) ** 3


def segment_u(sb: SurfaceBatch, T, back_air):
    """Per-segment U-value at the current working temperatures
    (UValue::u_value, discretization.rs:46-56).

    Segment i connects nodes i and i+1; for the last valid node the 'after'
    temperature falls back to the back air temperature (discretization.rs:627-632)
    — it only matters for cavity evaluation, which never sits at the edge.
    """
    if not sb.has_cavity:
        return sb.seg_u
    t_this = T
    t_next = jnp.concatenate([T[1:], jnp.zeros_like(T[:1])], axis=0)
    next_valid = jnp.concatenate(
        [sb.node_mask[1:], jnp.zeros_like(sb.node_mask[:1])], axis=0
    )
    t_next = jnp.where(next_valid, t_next, back_air)
    u_cav = cavity_u_value(
        sb.cav_gas,
        sb.cav_thickness,
        sb.cav_height,
        sb.cav_angle,
        sb.cav_ein,
        sb.cav_eout,
        t_this,
        t_next,
    )
    return jnp.where(sb.seg_is_cavity, u_cav, sb.seg_u)


def assemble_k_q(
    sb: SurfaceBatch,
    T,
    U,
    env_f: FaceEnv,
    env_b: FaceEnv,
    rad_hs_f,
    rad_hs_b,
    solar_q,
):
    """Tridiagonal K and forcing q for ALL nodes (discretization.rs:596-700),
    with cross-chunk couplings replaced by Dirichlet source terms in q.

    Returns (lower, diag, upper, q), each [N, S].  Rows of nodes outside any
    chunk of interest are filtered by the caller.
    """
    valid = sb.node_mask
    # left neighbor exists (node i-1 valid) / right neighbor exists
    left_exists = jnp.concatenate([jnp.zeros_like(valid[:1]), valid[:-1]], axis=0) & valid
    right_exists = (
        jnp.concatenate([valid[1:], jnp.zeros_like(valid[:1])], axis=0) & valid
    )
    is_first = valid & ~left_exists  # node 0
    is_last = valid & ~right_exists  # node n-1

    U_left = jnp.concatenate([jnp.zeros_like(U[:1]), U[:-1]], axis=0)
    same_left = jnp.concatenate(
        [jnp.zeros_like(sb.same_chunk[:1]), sb.same_chunk[:-1]], axis=0
    )
    couple_left = left_exists & same_left
    couple_right = right_exists & sb.same_chunk

    T_left = jnp.concatenate([jnp.zeros_like(T[:1]), T[:-1]], axis=0)
    T_right = jnp.concatenate([T[1:], jnp.zeros_like(T[:1])], axis=0)

    h_f = env_f.h
    h_b = env_b.h

    diag = (
        -U_left * left_exists
        - U * right_exists
        - h_f * is_first
        - h_b * is_last
    )
    lower = U_left * couple_left
    upper = U * couple_right

    q = (
        solar_q
        + is_first * (env_f.air * h_f + rad_hs_f * (env_f.rad - T))
        + is_last * (env_b.air * h_b + rad_hs_b * (env_b.rad - T))
        + (left_exists & ~couple_left) * U_left * T_left
        + (right_exists & ~couple_right) * U * T_right
    )
    return lower, diag, upper, q


def march_nomass(
    sb: SurfaceBatch,
    T0,
    env_f: FaceEnv,
    env_b: FaceEnv,
    rad_hs_f,
    rad_hs_b,
    solar_q,
    config: SimConfig,
):
    """Iterative steady-state solve of all no-mass chunks (surface.rs:790-898).

    Fixed point with relaxation T <- (T + T_solve)/2, per-chunk convergence on
    mean |dT| < 0.01 C (0.5 C after 100 iterations) and the reference's
    error-increase early break (the increasing update is discarded).
    Convection coefficients are constant during the loop (they derive from the
    state snapshot); cavity U-values and Dirichlet couplings re-evaluate each
    iteration.
    """
    sel = sb.node_mask & ~sb.massive  # [N, S]
    chunk_n = sb.nomass_chunk_count  # [S, C]
    C = chunk_n.shape[1]
    # Per-chunk one-hot masks [N, S, C]: C is tiny (1-4 runs per surface), so
    # chunk reductions/broadcasts are mask algebra, never gathers/scatters.
    onehot_bool = (
        sb.nomass_chunk_id[:, :, None] == jnp.arange(C, dtype=jnp.int32)[None, None, :]
    ) & sel[:, :, None]
    onehot = onehot_bool.astype(T0.dtype)

    big = jnp.asarray(99999.0, T0.dtype)

    def one_iteration(T):
        U = segment_u(sb, T, env_b.air)
        lower, diag, upper, q = assemble_k_q(
            sb, T, U, env_f, env_b, rad_hs_f, rad_hs_b, solar_q
        )
        # no-mass rows solve K x = -q; all other rows are identity x = T
        lower = jnp.where(sel, lower, 0.0)
        upper = jnp.where(sel, upper, 0.0)
        diag = jnp.where(sel, diag, 1.0)
        rhs = jnp.where(sel, -q, T)
        return tridiag.solve(lower, diag, upper, rhs)

    def cond(carry):
        _, _, _, active, it = carry
        return jnp.any(active) & (it < config.nomass_max_iter)

    def body(carry):
        T, old_err, count, active, it = carry
        T_sol = one_iteration(T)
        err_node = jnp.abs(T_sol - T) * sel
        err_chunk = jnp.einsum("nsc,ns->sc", onehot, err_node)  # [S, C]

        increase = err_chunk > old_err
        upd_chunk = active & ~increase  # [S, C]
        # Broadcast chunk decisions back to nodes via the one-hot masks
        # (a [S,C]-indexed gather would serialize on the VPU).
        upd_node = jnp.any(onehot_bool & upd_chunk[None, :, :], axis=-1)  # [N, S]
        T_new = jnp.where(upd_node, 0.5 * (T + T_sol), T)

        tol = jnp.where(
            count < config.nomass_escalate_after,
            config.nomass_tol,
            config.nomass_tol_escalated,
        ).astype(T.dtype)
        mean_err = err_chunk / jnp.maximum(chunk_n, 1.0)
        converged = mean_err < tol

        new_active = active & ~increase & ~converged
        new_old_err = jnp.where(upd_chunk, err_chunk, old_err)
        new_count = count + new_active.astype(count.dtype)
        return T_new, new_old_err, new_count, new_active, it + 1

    active0 = chunk_n > 0
    carry0 = (
        T0,
        jnp.full_like(chunk_n, big),
        jnp.zeros_like(chunk_n, dtype=jnp.int32),
        active0,
        jnp.asarray(0, jnp.int32),
    )
    if config.nomass_fixed_iters is not None:
        # Performance mode: statically unrolled fixed iteration count with
        # the same per-chunk update/convergence masking.
        carry = carry0
        for _ in range(config.nomass_fixed_iters):
            carry = body(carry)
        return carry[0]
    T_final, _, _, _, _ = jax.lax.while_loop(cond, body, carry0)
    return T_final


def march_massive(
    sb: SurfaceBatch,
    T,
    env_f: FaceEnv,
    env_b: FaceEnv,
    rad_hs_f,
    rad_hs_b,
    solar_q,
    dt,
):
    """RK4 march of all massive chunks (surface.rs:720-787 march_mass,
    rearrange_k at :168-187, rk4 at :228-308).

    K and q are frozen for the sub-step; rows are scaled by dt/C (rearrange_k)
    and four tridiagonal mat-vecs advance the temperatures.  Rows of
    non-massive nodes are zeroed, so their k-stages vanish and they stay
    frozen — which makes the cross-chunk couplings read the frozen neighbor
    temperatures in every stage, exactly like the reference's Dirichlet terms.
    """
    sel = sb.massive
    U = segment_u(sb, T, env_b.air)
    lower, diag, upper, q = assemble_k_q(
        sb, T, U, env_f, env_b, rad_hs_f, rad_hs_b, solar_q
    )
    scale = jnp.where(sel, dt / jnp.where(sel, sb.mass, 1.0), 0.0)
    lower = lower * scale
    diag = diag * scale
    upper = upper * scale
    q = q * scale

    T_new = rk4_apply(lower, diag, upper, q, T)
    return jnp.where(sel, T_new, T)


def rk4_apply(lower, diag, upper, q, T):
    """Classic RK4 update for dT = K'T + q' with K', q' pre-scaled by dt/C
    (surface.rs:228-308 rk4; the rearrange_k scaling is the caller's job)."""
    mv = partial(tridiag.matvec, lower, diag, upper)
    k1 = mv(T) + q
    k2 = mv(T + 0.5 * k1) + q
    k3 = mv(T + 0.5 * k2) + q
    k4 = mv(T + k3) + q
    return T + k1 / 6.0 + k2 / 3.0 + k3 / 3.0 + k4 / 6.0


def march_surfaces(
    sb: SurfaceBatch,
    node_T,
    t_front,
    t_back,
    wind_direction,
    wind_speed,
    sol_front,
    sol_back,
    ir_front,
    ir_back,
    dt,
    config: SimConfig,
    has_massive: bool = True,
):
    """One sub-step of every surface (surface.rs:902-1001 march):
    solar distribution -> no-mass chunks -> massive chunks.

    Returns the new node temperatures.  The final convection coefficients /
    heat flows (iterate_surfaces, model.rs:140-169) are computed by the caller
    from the returned temperatures.
    """
    env_f, env_b = border_conditions(
        sb, node_T, t_front, t_back, wind_direction, wind_speed, ir_front, ir_back, config
    )
    rad_hs_f = linearized_rad_coefficient(sb.eps_front, env_f)
    rad_hs_b = linearized_rad_coefficient(sb.eps_back, env_b)

    # Solar clamping quirks of surface.rs:916-923: the front irradiance is
    # zeroed when NaN or negative; the back one only when NaN (the reference's
    # second check tests the already-clamped front value — dead code).
    sol_f = jnp.where(jnp.isnan(sol_front) | (sol_front < 0.0), 0.0, sol_front)
    sol_b = jnp.where(jnp.isnan(sol_back), 0.0, sol_back)
    solar_q = sb.front_alphas * sol_f + sb.back_alphas * sol_b

    T = node_T
    if sb.has_nomass:
        T = march_nomass(sb, T, env_f, env_b, rad_hs_f, rad_hs_b, solar_q, config)
    if has_massive:
        T = march_massive(sb, T, env_f, env_b, rad_hs_f, rad_hs_b, solar_q, dt)
    return T
