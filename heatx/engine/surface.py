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
from heatx.build.layout import B_AMBIENT, B_GROUND, B_OUTDOOR, B_SPACE, SurfaceBatch
from heatx.ops import tridiag
from heatx.physics.cavity import cavity_u_value
from heatx.physics.convection import (
    is_windward,
    tarp_natural_coeffs,
    tarp_natural_convection_coefficient,
)


class FaceEnv(NamedTuple):
    """ConvectionParams equivalent for one face of every surface
    (convection.rs:27-52) plus the resolved convection coefficient."""

    air: jnp.ndarray  # [S] air temperature, C
    rad: jnp.ndarray  # [S] radiant temperature, C
    surf: jnp.ndarray  # [S] surface temperature used for h / rad_hs, C
    h: jnp.ndarray  # [S] convection coefficient, W/m2.K


def _shift_prev(mask):
    """mask[i-1] (False for i=0) — via a float shift: Mosaic miscompiles
    boolean-vector concatenates, float concat + compare is safe and XLA fuses
    it away."""
    f = jnp.where(mask, 1.0, 0.0)
    fs = jnp.concatenate([jnp.zeros_like(f[:1]), f[:-1]], axis=0)
    return fs > 0.5


def _shift_next(mask):
    """mask[i+1] (False for i=N-1)."""
    f = jnp.where(mask, 1.0, 0.0)
    fs = jnp.concatenate([f[1:], jnp.zeros_like(f[:1])], axis=0)
    return fs > 0.5


def boundary_temperatures(sb: SurfaceBatch, zone_T, t_out):
    """Air temperature on each side of each surface
    (model.rs:79-96 get_boundary_temperature)."""
    zone_padded = jnp.concatenate([zone_T, jnp.zeros((1,), zone_T.dtype)])

    def side(code, space, temp):
        t = jnp.where(code == B_OUTDOOR, t_out, 0.0)
        t = jnp.where(code == B_SPACE, zone_padded[space], t)
        t = jnp.where((code == B_AMBIENT) | (code == B_GROUND), temp, t)
        return t

    t_front = side(sb.front_code, sb.front_space, sb.front_temp)
    t_back = side(sb.back_code, sb.back_space, sb.back_temp)
    return t_front, t_back


class SurfaceStatics(NamedTuple):
    """Loop-invariant mask structure of the node network, hoisted out of the
    sub-step loop (XLA hoists these automatically out of a scan; the Pallas
    hour kernel computes them once before its fori_loop)."""

    left_exists: jnp.ndarray  # [N, S] node i-1 exists
    right_exists: jnp.ndarray  # [N, S] node i+1 exists
    is_first: jnp.ndarray  # [N, S] node 0 of its surface
    is_last: jnp.ndarray  # [N, S] last valid node of its surface
    couple_left: jnp.ndarray  # [N, S] coupled to node i-1 within its chunk
    couple_right: jnp.ndarray  # [N, S]
    dirichlet_left: jnp.ndarray  # [N, S] left neighbor is a frozen source
    dirichlet_right: jnp.ndarray  # [N, S]
    nomass_sel: jnp.ndarray  # [N, S] valid no-mass node
    chunk_masks: tuple  # C x [N, S] per-chunk node masks
    pair_head: jnp.ndarray  # [N, S] no-mass node coupled to node i+1
    pair_tail: jnp.ndarray  # [N, S] its partner
    nat_coeffs: tuple  # ([S], [S]) hoisted TARP branch coefficients
    # Sub-step-invariant pieces of the K/q assembly, available when U is
    # static (no gas cavities).  The tridiagonal couplings and the Dirichlet
    # source coefficients depend only on U + masks, and the RK4 row scale
    # dt/C only on the (static) masses — the reference recomputes them per
    # chunk march (discretization.rs:596-700, surface.rs:168-187), XLA
    # hoists them out of scan automatically, but Mosaic does NOT hoist out
    # of the Pallas hour kernel's fori_loop, so they are materialized here
    # once per hour.  All None when the surface batch has cavities or the
    # caller never passes dt.
    k_lower: jnp.ndarray = None  # [N, S] static K sub-diagonal
    k_upper: jnp.ndarray = None  # [N, S] static K super-diagonal
    k_diag_static: jnp.ndarray = None  # [N, S] -(U couplings) part of diag
    q_dl: jnp.ndarray = None  # [N, S] Dirichlet-left source coefficient
    q_dr: jnp.ndarray = None  # [N, S] Dirichlet-right source coefficient
    nm_lower: jnp.ndarray = None  # [N, S] k_lower filtered to no-mass rows
    nm_upper: jnp.ndarray = None  # [N, S]
    mass_scale: jnp.ndarray = None  # [N, S] dt/C on massive rows, else 0
    k_lower_scaled: jnp.ndarray = None  # [N, S] k_lower * mass_scale
    k_upper_scaled: jnp.ndarray = None  # [N, S]
    mass_scale_dt: float = None  # the dt the scale was built for (guard)


def compute_statics(sb: SurfaceBatch, dt=None) -> SurfaceStatics:
    valid = sb.node_mask
    left_exists = _shift_prev(valid) & valid
    right_exists = _shift_next(valid) & valid
    is_first = valid & ~left_exists
    is_last = valid & ~right_exists
    couple_left = left_exists & _shift_prev(sb.same_chunk)
    couple_right = right_exists & sb.same_chunk
    sel = valid & ~sb.massive
    C = sb.nomass_chunk_count.shape[0]
    chunk_masks = tuple((sb.nomass_chunk_id == c) & sel for c in range(C))
    # 2-node no-mass runs (couple_right stays within a chunk, and chunks are
    # homogeneous in massiveness, so `& sel` restricts to no-mass pairs).
    pair_head = couple_right & sel
    pair_tail = _shift_prev(pair_head)
    nat_coeffs = tarp_natural_coeffs(sb.cos_tilt)

    hoisted = {}
    if not sb.has_cavity:
        # Static-U hoists (bit-identical to the inline forms in assemble_K /
        # assemble_q / march_nomass: the same products and selects, just
        # evaluated once).
        U = sb.seg_u
        zero = jnp.zeros_like(U)
        U_left = jnp.concatenate([zero[:1], U[:-1]], axis=0)
        k_lower = jnp.where(couple_left, U_left, zero)
        k_upper = jnp.where(couple_right, U, zero)
        hoisted.update(
            k_lower=k_lower,
            k_upper=k_upper,
            k_diag_static=-(
                jnp.where(left_exists, U_left, zero)
                + jnp.where(right_exists, U, zero)
            ),
            q_dl=jnp.where(left_exists & ~couple_left, U_left, zero),
            q_dr=jnp.where(right_exists & ~couple_right, U, zero),
            nm_lower=jnp.where(sel, k_lower, 0.0),
            nm_upper=jnp.where(sel, k_upper, 0.0),
        )
        if dt is not None and isinstance(dt, (int, float)):
            # rearrange_k's dt/C row scale (surface.rs:168-187): masses are
            # static, so the scale — and its product with the static K
            # couplings — is too.  A traced dt (not a Python number) skips
            # the hoist gracefully instead of crashing on float(dt);
            # march_massive falls back to the inline scale.
            mass_scale = jnp.where(
                sb.massive, dt / jnp.where(sb.massive, sb.mass, 1.0), 0.0
            )
            hoisted.update(
                mass_scale=mass_scale,
                k_lower_scaled=k_lower * mass_scale,
                k_upper_scaled=k_upper * mass_scale,
                mass_scale_dt=float(dt),
            )
    return SurfaceStatics(
        **hoisted,
        left_exists=left_exists,
        right_exists=right_exists,
        is_first=is_first,
        is_last=is_last,
        couple_left=couple_left,
        couple_right=couple_right,
        dirichlet_left=left_exists & ~couple_left,
        dirichlet_right=right_exists & ~couple_right,
        nomass_sel=sel,
        chunk_masks=chunk_masks,
        pair_head=pair_head,
        pair_tail=pair_tail,
        nat_coeffs=nat_coeffs,
    )


def _last_node(sb: SurfaceBatch, T, statics: SurfaceStatics = None):
    """T at each surface's last valid node: [S].

    Mask-reduce instead of a gather — dynamic gathers are slow on the TPU
    vector unit, a masked sum over the tiny node axis fuses for free.
    """
    if statics is not None:
        is_last = statics.is_last
    else:
        valid = sb.node_mask
        is_last = valid & ~_shift_next(valid)
    return jnp.sum(jnp.where(is_last, T, 0.0), axis=0)


def radiant_out_temperatures(ir_front, ir_back, dtype):
    """Outdoor radiant temperatures from incident IR:
    (ir/sigma)^0.25 - 273.15 (surface.rs:611-702)."""
    eps_t = jnp.asarray(1e-30, dtype)
    rad_out_front = (jnp.maximum(ir_front, eps_t) / SIGMA) ** 0.25 - KELVIN
    rad_out_back = (jnp.maximum(ir_back, eps_t) / SIGMA) ** 0.25 - KELVIN
    return rad_out_front, rad_out_back


def forced_context(sb: SurfaceBatch, wind_direction, wind_speed):
    """Per-substep forced-convection terms, shared by BOTH border-condition
    evaluations of a sub-step (the in-march one and the post-march one use
    the same weather and air temperatures; only the surface temperature
    differs).  Returns (forced_front, forced_back), each [S].
    """
    if isinstance(sb.normal, tuple):
        normal_x, normal_y = sb.normal[0], sb.normal[1]  # kernel path
    else:
        normal_x, normal_y = sb.normal[:, 0], sb.normal[:, 1]
    windward = is_windward(wind_direction, sb.cos_tilt, normal_x, normal_y)
    wf = jnp.where(windward, 1.0, 0.5)
    # Keep the sqrt over the full product with the reference's association
    # (convection.rs:151-168); pre-factored variants (hoisted P*wind_mod/A,
    # scalar sqrt(v)) produced wrong lane-0 values under the sharded
    # interpret-mode kernel — see PERF.md "interpret-mode fusion sensitivity".
    # Double-where around the sqrt: at P*v/A = 0 exactly (calm air; padded
    # lanes carry perimeter 0) sqrt' -> inf, and reverse-mode AD (the
    # adjoint kernel differentiates through this) would turn the zero
    # cotangent into NaN (0 * inf) poisoning the area/perimeter gradients.
    # Value-identical: sqrt(0) = 0 either way, and the sqrt still sees the
    # full product in the reference's association.
    pva = sb.perimeter * (wind_speed * sb.wind_mod) / sb.area
    pnz = pva > 0.0
    base = 2.537 * wf * sb.rf * jnp.where(
        pnz, jnp.sqrt(jnp.where(pnz, pva, 1.0)), 0.0
    )
    zero = jnp.zeros_like(base)
    forced_front = jnp.where(sb.front_code == B_OUTDOOR, base, zero)
    forced_back = jnp.where(sb.back_code == B_OUTDOOR, base, zero)
    return forced_front, forced_back


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
    statics: SurfaceStatics = None,
    rad_out=None,
    forced=None,
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
    Ground faces (B_GROUND, a heatx extension) are exempt: they read the soil
    temperature for both air and radiant exchange on whichever side they sit.
    """
    front_surf = T[0]
    back_surf = _last_node(sb, T, statics)

    f_out = sb.front_code == B_OUTDOOR
    b_out = sb.back_code == B_OUTDOOR
    b_amb = sb.back_code == B_AMBIENT

    if rad_out is not None:
        # Hoisted by the caller: the incident IR is constant within the main
        # step, so the (ir/sigma)^0.25 radiant temperatures are loop-invariant
        # (the Pallas hour kernel computes them once per hour).
        rad_out_front, rad_out_back = rad_out
    else:
        rad_out_front, rad_out_back = radiant_out_temperatures(
            ir_front, ir_back, T.dtype
        )

    # ---- front face -------------------------------------------------------
    front_air = t_front
    front_rad = jnp.where(f_out, rad_out_front, t_front)
    front_cos = jnp.where(f_out, -sb.cos_tilt, sb.cos_tilt)

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

    # h = natural + forced; forced vanishes on windless faces, so a single
    # fused expression covers all boundary kinds (convection.rs:151-168).
    # The forced terms depend only on weather + geometry — shared between the
    # two evaluations of a sub-step via the ``forced`` argument.
    if forced is None:
        forced = forced_context(sb, wind_direction, wind_speed)
    forced_front, forced_back = forced

    nat_coeffs = statics.nat_coeffs if statics is not None else None

    def natural(air, surf, cos_eff):
        return tarp_natural_convection_coefficient(
            air, surf, cos_eff, mosaic_compat=config.kernel_mode,
            coeffs=nat_coeffs,
        )

    h_front = natural(front_air, front_surf, front_cos) + forced_front
    h_back = natural(back_air, back_surf_eff, back_cos) + forced_back

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


def carroll_view_factors(area, space, participating, n_zones, iters=20):
    """Carroll (1980) MRT-network view factors, one per participating face.

    ``F_i = 1 / (1 - A_i F_i / sum_{j in zone} A_j F_j)``, solved by the
    standard fixed point from ``F = 1`` (equal areas converge in one step:
    n faces give F = n/(n-1)).  A face whose weighted area approaches the
    zone total would diverge (a one-sided "enclosure" is outside the
    method's validity), so the denominator clamps at 0.05 — results stay
    finite and the dominant face simply saturates.  Non-participating faces
    return F = 0.
    """
    idx = jnp.where(participating, space, n_zones).astype(jnp.int32)
    F = jnp.ones_like(area)
    for _ in range(iters):
        af = jnp.where(participating, area * F, 0.0)
        tot = jax.ops.segment_sum(af, idx, num_segments=n_zones + 1)
        denom = 1.0 - af / jnp.maximum(tot[idx], 1e-30)
        F = 1.0 / jnp.maximum(denom, 0.05)
    return jnp.where(participating, F, 0.0)


def mrt_statics(sb: SurfaceBatch, n_zones):
    """Static prefix of the Carroll MRT network over the [2S] concatenated
    (front, back) faces: participation mask, zone index, and effective
    emissivity.  Depends only on static geometry (areas, boundary codes,
    emissivities) — the run/march entry points compute it ONCE outside
    their scans and pass it down (the 20-iteration view-factor fixed point
    is a segment-sum chain XLA's LICM is not guaranteed to hoist out of a
    scan body).  The fused kernel's numpy twin is
    pallas_step._mrt_static_blocked."""
    part = jnp.concatenate(
        [
            (sb.front_code == B_SPACE) & (sb.eps_front > 1e-6),
            (sb.back_code == B_SPACE) & (sb.eps_back > 1e-6),
        ]
    )
    area = jnp.concatenate([sb.area, sb.area])
    space = jnp.concatenate([sb.front_space, sb.back_space]).astype(jnp.int32)
    eps = jnp.concatenate([sb.eps_front, sb.eps_back])

    # An exchange network needs at least two faces in the zone.
    idx = jnp.where(part, space, n_zones).astype(jnp.int32)
    count = jax.ops.segment_sum(
        jnp.where(part, 1.0, 0.0), idx, num_segments=n_zones + 1
    )
    part = part & (count[idx] >= 1.5)
    idx = jnp.where(part, space, n_zones).astype(jnp.int32)

    F = carroll_view_factors(area, space, part, n_zones)
    # Guard the masked branch: F = eps = 0 on non-participating faces makes
    # the raw quotient 0/0, whose NaN would poison reverse-mode gradients
    # through the jnp.where (the classic where-NaN-VJP trap).
    den = jnp.where(part, F * (1.0 - eps) + eps, 1.0)
    eps_eff = jnp.where(part, eps * F / den, 0.0)
    return part, idx, eps_eff


def interior_mrt(
    sb: SurfaceBatch, node_T, zone_T, n_zones, statics=None, mrt_static=None
):
    """Interior longwave exchange context (``config.interior_mrt``).

    For every space-facing face, computes the zone's mean-radiant-
    temperature node (Carroll 1980 — the MRT network EnergyPlus offers as
    its geometry-free radiant-exchange option) from the CURRENT node
    temperatures, plus the face's effective emissivity toward that node:
    the surface resistance (1-eps)/eps in series with the Carroll view
    resistance 1/F, i.e. ``eps* = eps F / (F (1-eps) + eps)``.

    The MRT temperature is the balance point of the same linearized
    conductances the wall equations use (``rad_hs`` with midpoint
    ``(T_m + T_s)/2``; a short fixed point makes the two self-consistent),
    so the zone's radiant exchange sums to zero exactly at each coefficient
    evaluation — unlike the reference's zone-air radiant bath
    (surface.rs:611-640), which books the radiative flux nowhere.

    ``mrt_static`` passes a precomputed :func:`mrt_statics` result (hoisted
    outside the caller's scan); default computes it here.

    Returns ``(mask_f, tm_f, eps_f, mask_b, tm_b, eps_b)`` per-surface
    arrays; masks are False (and the caller keeps air-bath behavior) for
    non-space faces, eps ~ 0 faces, and zones with fewer than two
    participating faces.
    """
    part, idx, eps_eff, ts, tm, tm_face = _mrt_solve(
        sb, node_T, zone_T, n_zones, statics, mrt_static
    )
    S = sb.area.shape[0]
    return (
        part[:S], tm_face[:S], eps_eff[:S],
        part[S:], tm_face[S:], eps_eff[S:],
    )


def _mrt_solve(
    sb: SurfaceBatch, node_T, zone_T, n_zones, statics=None, mrt_static=None
):
    """The Carroll MRT network over the [2S] concatenated (front, back)
    faces; see :func:`interior_mrt`.  Returns ``(part, idx, eps_eff, ts,
    tm, tm_face)`` with ``tm`` the [Z+1] per-zone node temperatures
    (air-temperature fallback where the network is undefined)."""
    dtype = node_T.dtype
    ts = jnp.concatenate([node_T[0], _last_node(sb, node_T, statics)])
    if mrt_static is None:
        mrt_static = mrt_statics(sb, n_zones)
    part, idx, eps_eff = mrt_static
    area = jnp.concatenate([sb.area, sb.area])

    zpad = jnp.concatenate([zone_T, jnp.zeros((1,), dtype)])
    tm = zpad
    tm_face = zpad[idx]  # start the linearization at the zone air temp
    for _ in range(4):
        h = 4.0 * SIGMA * eps_eff * (KELVIN + (tm_face + ts) / 2.0) ** 3
        w = jnp.where(part, h * area, 0.0)
        num = jax.ops.segment_sum(w * ts, idx, num_segments=n_zones + 1)
        den = jax.ops.segment_sum(w, idx, num_segments=n_zones + 1)
        tm = jnp.where(den > 1e-30, num / jnp.maximum(den, 1e-30), zpad)
        tm_face = tm[idx]
    return part, idx, eps_eff, ts, tm, tm_face


def zone_mrt(
    sb: SurfaceBatch, node_T, zone_T, n_zones, statics=None, mrt_static=None
):
    """Per-zone mean radiant temperature [Z] from the current state — the
    Carroll exchange node of :func:`interior_mrt` — as an OBSERVABLE (it
    does not require ``config.interior_mrt``; under the air-bath model it
    is simply the comfort metric's MRT estimate).  Zones whose network is
    undefined (fewer than two participating faces) report the zone air
    temperature.  Operative temperature is ``(zone_T + zone_mrt) / 2``."""
    _, _, _, _, tm, _ = _mrt_solve(
        sb, node_T, zone_T, n_zones, statics, mrt_static
    )
    return tm[:n_zones]


def apply_interior_mrt(sb: SurfaceBatch, env_f: FaceEnv, env_b: FaceEnv, mrt):
    """Merge an :func:`interior_mrt` context into the face environments.

    Returns ``(env_f, env_b, eps_front, eps_back)`` — participating faces
    get the zone MRT as radiant temperature and their Carroll effective
    emissivity; everything else passes through unchanged (``mrt=None`` is
    the identity)."""
    if mrt is None:
        return env_f, env_b, sb.eps_front, sb.eps_back
    mf, tmf, ef, mb, tmb, eb = mrt
    env_f = env_f._replace(rad=jnp.where(mf, tmf, env_f.rad))
    env_b = env_b._replace(rad=jnp.where(mb, tmb, env_b.rad))
    eps_f = jnp.where(mf, ef, sb.eps_front)
    eps_b = jnp.where(mb, eb, sb.eps_back)
    return env_f, env_b, eps_f, eps_b


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
    t_next = jnp.where(_shift_next(sb.node_mask), t_next, back_air)
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


def assemble_K(sb: SurfaceBatch, U, env_f: FaceEnv, env_b: FaceEnv, statics=None):
    """The tridiagonal K of discretization.rs:596-700 for ALL nodes.

    Constant within a sub-step whenever U is (no gas cavities): the boundary
    h coefficients are frozen per sub-step, so callers hoist this out of the
    no-mass iteration and share it with the massive march.
    All masking via where-selects (bool*float arithmetic needs i1->f32 vector
    casts that the Mosaic backend miscompiles).
    """
    st = statics if statics is not None else compute_statics(sb)
    zero = jnp.zeros_like(U)

    def sel(mask, v):
        return jnp.where(mask, v, zero)

    if st.k_lower is not None and not sb.has_cavity and U is sb.seg_u:
        # Static-U fast path: couplings hoisted (bit-identical — negation
        # and subtraction commute with the original left-to-right sum).
        # Guarded on U *being* the static seg_u so a caller passing a
        # perturbed U (tests, sensitivity studies) gets the general path.
        diag = (
            st.k_diag_static
            - sel(st.is_first, env_f.h + zero)
            - sel(st.is_last, env_b.h + zero)
        )
        return st.k_lower, diag, st.k_upper

    U_left = jnp.concatenate([jnp.zeros_like(U[:1]), U[:-1]], axis=0)
    diag = -(
        sel(st.left_exists, U_left)
        + sel(st.right_exists, U)
        + sel(st.is_first, env_f.h + zero)
        + sel(st.is_last, env_b.h + zero)
    )
    lower = sel(st.couple_left, U_left)
    upper = sel(st.couple_right, U)
    return lower, diag, upper


def assemble_q(
    sb: SurfaceBatch,
    T,
    U,
    env_f: FaceEnv,
    env_b: FaceEnv,
    rad_hs_f,
    rad_hs_b,
    solar_q,
    statics=None,
):
    """The forcing q of discretization.rs:596-700: solar + boundary
    convection/linearized-radiation + frozen-Dirichlet couplings across chunk
    boundaries.  Depends on the current working temperatures."""
    st = statics if statics is not None else compute_statics(sb)
    T_left = jnp.concatenate([jnp.zeros_like(T[:1]), T[:-1]], axis=0)
    T_right = jnp.concatenate([T[1:], jnp.zeros_like(T[:1])], axis=0)
    zero = jnp.zeros_like(U)

    def sel(mask, v):
        return jnp.where(mask, v, zero)

    if st.q_dl is not None and not sb.has_cavity and U is sb.seg_u:
        # Static-U fast path: the Dirichlet source coefficients are hoisted
        # masked-U arrays (zero off the Dirichlet rows, where T_left/T_right
        # are finite, so coeff*T is bit-identical to the masked product).
        # Same U-identity guard as assemble_K.
        return (
            solar_q
            + sel(st.is_first, env_f.air * env_f.h + rad_hs_f * (env_f.rad - T))
            + sel(st.is_last, env_b.air * env_b.h + rad_hs_b * (env_b.rad - T))
            + st.q_dl * T_left
            + st.q_dr * T_right
        )

    U_left = jnp.concatenate([jnp.zeros_like(U[:1]), U[:-1]], axis=0)
    return (
        solar_q
        + sel(st.is_first, env_f.air * env_f.h + rad_hs_f * (env_f.rad - T))
        + sel(st.is_last, env_b.air * env_b.h + rad_hs_b * (env_b.rad - T))
        + sel(st.dirichlet_left, U_left * T_left)
        + sel(st.dirichlet_right, U * T_right)
    )


def assemble_k_q(
    sb: SurfaceBatch,
    T,
    U,
    env_f: FaceEnv,
    env_b: FaceEnv,
    rad_hs_f,
    rad_hs_b,
    solar_q,
    statics: SurfaceStatics = None,
):
    """Tridiagonal K and forcing q for ALL nodes (discretization.rs:596-700),
    with cross-chunk couplings replaced by Dirichlet source terms in q.

    Returns (lower, diag, upper, q), each [N, S].  Rows of nodes outside any
    chunk of interest are filtered by the caller.
    """
    st = statics if statics is not None else compute_statics(sb)
    lower, diag, upper = assemble_K(sb, U, env_f, env_b, st)
    q = assemble_q(sb, T, U, env_f, env_b, rad_hs_f, rad_hs_b, solar_q, st)
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
    solver=None,
    statics: SurfaceStatics = None,
    K=None,
):
    """Iterative steady-state solve of all no-mass chunks (surface.rs:790-898).

    Fixed point with relaxation T <- (T + T_solve)/2, per-chunk convergence on
    mean |dT| < 0.01 C (0.5 C after 100 iterations) and the reference's
    error-increase early break (the increasing update is discarded).
    Convection coefficients are constant during the loop (they derive from the
    state snapshot); cavity U-values and Dirichlet couplings re-evaluate each
    iteration.

    NOTE on ``solver``: when every no-mass run has <= 2 nodes
    (``sb.max_nomass_run``) the padded system decouples and the closed-form
    pair solve (tridiag.solve_runs2) is selected STATICALLY, taking
    precedence over a caller-supplied ``solver`` (which then only covers
    longer runs).  The two agree to fp rounding; set ``HEATX_NOMASS_PAIRS=0``
    to force the supplied/default sweep solver (ablation / bit-parity
    studies).
    """
    st = statics if statics is not None else compute_statics(sb)
    sel = st.nomass_sel  # [N, S]
    chunk_n = sb.nomass_chunk_count  # [C, S]
    C = chunk_n.shape[0]
    # Per-chunk masks (C is tiny: 1-4 runs per surface), kept as a static
    # tuple of [N, S] arrays — chunk reductions/broadcasts are pure mask
    # algebra, never gathers/scatters, and everything stays <= 2-D (which
    # also keeps this code lowerable inside a Pallas kernel).
    chunk_masks = st.chunk_masks

    big = jnp.asarray(99999.0, T0.dtype)

    # Ordinary constructions discretize their no-mass layers to 1-2 node
    # runs (discretization.rs:467-501): the padded steady-state system then
    # decouples into scalar divisions and 2x2 solves, replaced statically by
    # the closed-form pair solver (tridiag.solve_runs2) — the full-system
    # sweep was ~45% of the parity hour kernel (PERF.md).
    # HEATX_NOMASS_PAIRS=0 disables (ablation only).
    import os

    use_pairs = (
        0 < getattr(sb, "max_nomass_run", 10**9) <= 2
        and os.environ.get("HEATX_NOMASS_PAIRS", "1") != "0"
    )

    if solver is None:
        solver = tridiag.solve_pcr if config.kernel_mode else tridiag.solve
    if use_pairs:
        solver = partial(
            tridiag.solve_runs2, pair_head=st.pair_head, pair_tail=st.pair_tail
        )

    if K is not None and not sb.has_cavity:
        # K is frozen for the sub-step (static U, frozen h): filter the
        # identity rows once; only q re-evaluates per iteration.  The
        # off-diagonals are fully static — hoisted in SurfaceStatics.
        if st.nm_lower is not None and K[0] is st.k_lower:
            # (identity guard: a caller-modified K must not be shadowed by
            # the hoisted off-diagonals)
            nl, nu = st.nm_lower, st.nm_upper
        else:
            nl = jnp.where(sel, K[0], 0.0)
            nu = jnp.where(sel, K[2], 0.0)
        nd = jnp.where(sel, K[1], 1.0)
        U0 = sb.seg_u

        def one_iteration(T):
            q = assemble_q(
                sb, T, U0, env_f, env_b, rad_hs_f, rad_hs_b, solar_q, st
            )
            rhs = jnp.where(sel, -q, T)
            return solver(nl, nd, nu, rhs)

    else:

        def one_iteration(T):
            U = segment_u(sb, T, env_b.air)
            lower, diag, upper, q = assemble_k_q(
                sb, T, U, env_f, env_b, rad_hs_f, rad_hs_b, solar_q, statics=st
            )
            # no-mass rows solve K x = -q; all other rows are identity x = T
            lower = jnp.where(sel, lower, 0.0)
            upper = jnp.where(sel, upper, 0.0)
            diag = jnp.where(sel, diag, 1.0)
            rhs = jnp.where(sel, -q, T)
            return solver(lower, diag, upper, rhs)

    # Loop-carried chunk state is all-float ([C, S] f32: active flag as 0/1,
    # iteration count as float) — Mosaic miscompiles bool/int loop carries.
    # The scalar int iteration counter exists ONLY on the adaptive
    # while_loop path (its cond needs it); the fixed-iteration carries stay
    # int-free.
    def body(carry):
        T, old_err, count, active_f = carry
        active = active_f > 0.5
        T_sol = one_iteration(T)
        err_node = _ftz(jnp.where(sel, jnp.abs(T_sol - T), 0.0))
        err_chunk = jnp.stack(
            [jnp.sum(jnp.where(m, err_node, 0.0), axis=0) for m in chunk_masks],
            axis=0,
        )  # [C, S]

        increase = err_chunk > old_err
        upd_chunk = active & ~increase  # [C, S]
        upd_node = chunk_masks[0] & upd_chunk[0]
        for c in range(1, C):
            upd_node = upd_node | (chunk_masks[c] & upd_chunk[c])
        T_new = jnp.where(upd_node, 0.5 * (T + T_sol), T)

        tol = jnp.where(
            count < config.nomass_escalate_after,
            config.nomass_tol,
            config.nomass_tol_escalated,
        ).astype(T.dtype)
        mean_err = err_chunk / jnp.maximum(chunk_n, 1.0)
        converged = mean_err < tol

        new_active = active & ~increase & ~converged
        new_active_f = jnp.where(new_active, 1.0, 0.0).astype(T.dtype)
        new_old_err = jnp.where(upd_chunk, err_chunk, old_err)
        new_count = count + new_active_f
        return T_new, new_old_err, new_count, new_active_f

    if config.nomass_fixed_iters == 1:
        # One relaxed iteration is the whole loop: the convergence machinery
        # (error accumulators, escalating tolerance, increase-break) cannot
        # influence a single update — old_err starts at +big so the update is
        # always applied to every active chunk, i.e. every valid no-mass node.
        T_sol = one_iteration(T0)
        return jnp.where(sel, 0.5 * (T0 + T_sol), T0)

    active0 = jnp.where(chunk_n > 0, 1.0, 0.0).astype(T0.dtype)
    carry0 = (
        T0,
        jnp.full_like(chunk_n, big),
        jnp.zeros_like(chunk_n),
        active0,
    )
    if config.nomass_fixed_iters is not None:
        # Performance mode: fixed iteration count with the same per-chunk
        # update/convergence masking.  Loop form keeps the compiled body
        # small (important for Mosaic); unrolled form lets XLA fuse across
        # iterations.
        if config.kernel_mode and not config.unroll_fixed_loops:
            carry = jax.lax.fori_loop(
                0,
                config.nomass_fixed_iters,
                lambda _, c: body(c),
                carry0,
            )
        else:
            carry = carry0
            for _ in range(config.nomass_fixed_iters):
                carry = body(carry)
        return carry[0]

    def w_cond(carry):
        (_, _, _, active_f), it = carry
        return jnp.any(active_f > 0.5) & (it < config.nomass_max_iter)

    def w_body(carry):
        c4, it = carry
        return body(c4), it + 1

    (T_final, _, _, _), _ = jax.lax.while_loop(
        w_cond, w_body, (carry0, jnp.asarray(0, jnp.int32))
    )
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
    statics: SurfaceStatics = None,
    K=None,
    flush_tiny: bool = True,
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
    if K is not None and not sb.has_cavity:
        lower, diag, upper = K
        q = assemble_q(
            sb, T, sb.seg_u, env_f, env_b, rad_hs_f, rad_hs_b, solar_q, statics
        )
    else:
        U = segment_u(sb, T, env_b.air)
        lower, diag, upper, q = assemble_k_q(
            sb, T, U, env_f, env_b, rad_hs_f, rad_hs_b, solar_q, statics=statics
        )
    if (
        statics is not None
        and statics.mass_scale is not None
        and isinstance(dt, (int, float))
        # mass_scale_dt is a Python float when statics were built in the
        # same trace; across a jit boundary it arrives as a tracer leaf and
        # the == would force a concrete bool — the isinstance guard makes
        # that degrade to the inline path instead of crashing.
        and isinstance(statics.mass_scale_dt, (int, float))
        and float(dt) == statics.mass_scale_dt
        and lower is statics.k_lower
        and upper is statics.k_upper
    ):
        # Hoisted rearrange_k scale (and its static products with the K
        # couplings) — bit-identical to the inline forms below.  The
        # identity guards ensure a caller-supplied modified K is never
        # shadowed by the hoisted products.
        scale = statics.mass_scale
        lower = statics.k_lower_scaled
        upper = statics.k_upper_scaled
    else:
        scale = jnp.where(sel, dt / jnp.where(sel, sb.mass, 1.0), 0.0)
        lower = lower * scale
        upper = upper * scale
    diag = diag * scale
    q = q * scale

    T_new = rk4_apply(lower, diag, upper, q, T, flush_tiny=flush_tiny)
    return jnp.where(sel, T_new, T)


def _ftz(x, threshold=1e-25):
    """Flush tiny magnitudes to zero.  As a wall approaches equilibrium the
    RK4 stage values decay into the subnormal range, where the XLA substep
    path's fused vector loops drop onto a ~20x slow path; flushing below
    `threshold` (still ~13 orders below any meaningful temperature increment)
    keeps the fusions on the fast path with no effect on results.  Inside the
    Pallas kernel the hardware flushes subnormals, so callers skip this."""
    return jnp.where(jnp.abs(x) < threshold, 0.0, x)


def rk4_apply(lower, diag, upper, q, T, flush_tiny: bool = True):
    """Classic RK4 update for dT = K'T + q' with K', q' pre-scaled by dt/C
    (surface.rs:228-308 rk4; the rearrange_k scaling is the caller's job).

    (An incremental stage form ``k2 = k1 + 0.5*K'k1`` — 6 fewer vector ops
    per sub-step — measured wall-clock-neutral on hardware, so the textbook
    form stays for exact fp agreement with the reference's computation.)
    """
    mv = partial(tridiag.matvec, lower, diag, upper)
    ftz = _ftz if flush_tiny else (lambda x: x)
    k1 = ftz(mv(T) + q)
    k2 = ftz(mv(T + 0.5 * k1) + q)
    k3 = ftz(mv(T + 0.5 * k2) + q)
    k4 = ftz(mv(T + k3) + q)
    return T + k1 / 6.0 + k2 / 3.0 + k3 / 3.0 + k4 / 6.0


def absorbed_solar_q(sb: SurfaceBatch, sol_front, sol_back):
    """Per-node absorbed solar forcing, with the reference's clamping quirks
    (surface.rs:916-931): the front irradiance is zeroed when NaN or
    negative; the back one only when NaN (the reference's second check tests
    the already-clamped front value — dead code)."""
    sol_f = jnp.where(jnp.isnan(sol_front) | (sol_front < 0.0), 0.0, sol_front)
    sol_b = jnp.where(jnp.isnan(sol_back), 0.0, sol_back)
    return sb.front_alphas * sol_f + sb.back_alphas * sol_b


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
    skip_nomass: bool = False,
    solver=None,
    statics: SurfaceStatics = None,
    rad_out=None,
    envs=None,
    solar_q=None,
    mrt=None,
):
    """One sub-step of every surface (surface.rs:902-1001 march):
    solar distribution -> no-mass chunks -> massive chunks.

    Returns the new node temperatures.  The final convection coefficients /
    heat flows (iterate_surfaces, model.rs:140-169) are computed by the caller
    from the returned temperatures.

    ``envs`` passes precomputed (env_f, env_b) border conditions for the
    CURRENT state (the Pallas hour body builds them with a shared forced-
    convection context); default computes them here.  ``solar_q`` passes the
    precomputed per-node absorbed solar forcing — it is constant within the
    main step (irradiance changes hourly), so the Pallas hour body hoists it
    out of the sub-step loop; default computes it here (surface.rs:916-931).
    """
    if envs is not None:
        env_f, env_b = envs
    else:
        env_f, env_b = border_conditions(
            sb, node_T, t_front, t_back, wind_direction, wind_speed, ir_front,
            ir_back, config, statics=statics, rad_out=rad_out,
        )
    env_f, env_b, rad_eps_f, rad_eps_b = apply_interior_mrt(sb, env_f, env_b, mrt)
    rad_hs_f = linearized_rad_coefficient(rad_eps_f, env_f)
    rad_hs_b = linearized_rad_coefficient(rad_eps_b, env_b)

    if solar_q is None:
        solar_q = absorbed_solar_q(sb, sol_front, sol_back)

    # With no gas cavities, U is static and h is frozen per sub-step, so the
    # tridiagonal K is sub-step-constant: assemble once, share between the
    # no-mass iterations and the massive RK4 march.
    K = None
    if not sb.has_cavity:
        K = assemble_K(sb, sb.seg_u, env_f, env_b, statics)

    T = node_T
    if sb.has_nomass and not skip_nomass:
        T = march_nomass(
            sb, T, env_f, env_b, rad_hs_f, rad_hs_b, solar_q, config,
            solver=solver, statics=statics, K=K,
        )
    if has_massive:
        T = march_massive(
            sb, T, env_f, env_b, rad_hs_f, rad_hs_b, solar_q, dt,
            statics=statics, K=K, flush_tiny=config.flush_tiny,
        )
    return T
