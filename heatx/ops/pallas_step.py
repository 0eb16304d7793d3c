"""Fused Pallas hour-march kernel.

The XLA substep path re-reads the compiled building and the state from HBM on
every stability sub-step (~120 per hour for insulated constructions), which
caps throughput at memory bandwidth.  This kernel marches ONE HOUR (or a day,
``hours=24``) of sub-steps per invocation with everything resident in VMEM:

* the surface batch is partitioned into zone-closed blocks
  (heatx.build.blocking) — one Pallas grid cell per block;
* each cell loads its slice of the building + state once, runs all sub-steps
  in a ``fori_loop``, and writes the state back once;
* zone coupling (the only cross-surface dependency) happens in-kernel through
  small one-hot matmuls on the MXU: ``t_zone = oh @ zT`` to read boundary
  temperatures and ``a_z = (hA T) @ oh`` for the energy-balance reduction;
* per-sub-step weather rides in SMEM; per-hour gains/irradiance in VMEM;
* within each block, surfaces are *node-height split* (blocking.py): lanes
  holding few-node surfaces (windows, single-layer walls — usually the vast
  majority) are marched as a short ``[cut, W]`` sub-batch while only the tall
  lanes pay the full ``[N, W]`` node rows.  The kernel is VPU-throughput
  bound, so this cuts wall-clock nearly in proportion to the padded-row
  savings (~3x on typical building stock).

The kernel body *reuses the engine's physics* (march_surfaces and friends are
pure jnp on node-major arrays, deliberately kept <= 2-D and free of
gather/scatter/cbrt/expm1 so they lower through Mosaic).  Reference-parity
caveats of this path: fixed no-mass iteration count (config.nomass_fixed_iters,
validated against the EnergyPlus replay suite) — everything else is the same
arithmetic as the XLA path.
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from types import SimpleNamespace

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heatx.build.blocking import BlockedLayout, build_blocks
from heatx.build.layout import B_AMBIENT, B_OUTDOOR, B_SPACE, CompiledBuilding, SurfaceBatch
from heatx.config import SimConfig
from heatx.constants import KELVIN, SIGMA
from heatx.engine import surface as surf_mod
from heatx.physics import gas


@dataclass
class BlockedBuilding:
    """A compiled building permuted/padded into zone-closed blocks, ready for
    the Pallas hour kernel."""

    base: CompiledBuilding
    layout: BlockedLayout
    surfaces: SurfaceBatch  # node arrays [N, SP], scalars [SP] (SP = blocks*SB)
    front_oh: np.ndarray  # [SP, ZB]
    back_oh: np.ndarray  # [SP, ZB]
    zone_volume: np.ndarray  # [n_blocks, ZB] (1.0 in padded slots)
    zone_valid: np.ndarray  # [n_blocks, ZB]
    # Block-local inter-zone mixing matrix [NB*ZB, ZB] with
    # mix_wt[b*ZB + from_local, to_local] = vol m3/s, or None.  Mixed zones
    # always share a block (blocking joins them), so this is block-diagonal.
    mix_wt: np.ndarray = None
    # Setpoint-driven ideal-loads control (heatx extension; zone.zone_update):
    # (heat_sp, cool_sp, max_heat, max_cool) as [n_blocks, ZB] arrays, or
    # None when the building has no thermostatic units.
    ctl: tuple = None
    # Static Carroll MRT-network data (config.interior_mrt): effective
    # emissivities (eps_eff_front, eps_eff_back) as [SP] arrays, 0 for
    # non-participating faces; None when the option is off.
    mrt_eps: tuple = None
    # In-run zone-state window shading (heatx extension, engine.step.
    # apply_zone_shading): (shade_oh [SP, ZB] one-hot of the block-local
    # controlling zone, shade_tau [SP], shade_sp [SP]) — uncontrolled
    # lanes carry all-zero one-hot rows / tau 1 / setpoint +1e9, so their
    # panes march bit-identically.  None when the building has no
    # zone-shading controls.
    shade: tuple = None
    # In-run ventilation temperature gates (heatx extension, engine.step.
    # apply_vent_gates): (vent_min_tin, vent_max_tin) as [n_blocks, ZB]
    # arrays of indoor-temperature limits (EnergyPlus's no-op +-100 C
    # defaults on uncontrolled/padded slots).  The per-hour gated
    # ventilation A/B terms and the delta-gate threshold ride as extra
    # hour inputs (the caller pre-applies the weather-only outdoor/wind
    # gates host-side).  None when the building has no vent controls.
    vent: tuple = None

    @property
    def config(self) -> SimConfig:
        return self.base.config

    @property
    def n_blocks(self) -> int:
        return self.layout.n_blocks

    @property
    def block_size(self) -> int:
        return self.layout.block_size

    @property
    def zones_per_block(self) -> int:
        return self.layout.zones_per_block

    @property
    def max_nodes(self) -> int:
        return self.surfaces.max_nodes


def _mrt_static_blocked(sb: SurfaceBatch, front_oh, back_oh, n_blocks, zones_per_block):
    """Static Carroll MRT-network data for a blocked building (numpy).

    The participation filter, view-factor fixed point, and effective
    emissivities of engine.surface._mrt_solve depend only on static geometry
    (areas, boundary codes, emissivities), so they precompute at blocking
    time; only the 4-iteration linearized temperature fixed point runs
    in-kernel (_mrt_context).  Blocks are zone-closed, so the network is
    block-local and the zone axis is each block's ZB one-hot columns.

    Returns ``(eps_eff_front, eps_eff_back)`` as [SP] float64 arrays
    (0 = the face does not participate).
    """
    NB, ZB = n_blocks, zones_per_block
    area = np.asarray(sb.area, np.float64)
    SP = area.shape[0]
    part = _mrt_part_mask(sb, front_oh, back_oh, NB, ZB)
    out = mrt_eps_blocked_jnp(
        area, np.asarray(sb.eps_front, np.float64),
        np.asarray(sb.eps_back, np.float64),
        part, np.asarray(front_oh, np.float64),
        np.asarray(back_oh, np.float64), NB, ZB, xp=np,
    )
    return np.asarray(out[0]).reshape(SP), np.asarray(out[1]).reshape(SP)


def _mrt_part_mask(sb, front_oh, back_oh, n_blocks, zones_per_block):
    """STATIC participation mask [2, NB, SB] of the Carroll network: a face
    participates when it bounds a space, emits (eps > 1e-6), and its zone
    has >= 2 participating faces (engine.surface._mrt_solve).  Structural —
    derived from boundary codes, not calibrated values."""
    NB, ZB = n_blocks, zones_per_block
    oh = np.stack(
        [
            np.asarray(front_oh, np.float64).reshape(NB, -1, ZB),
            np.asarray(back_oh, np.float64).reshape(NB, -1, ZB),
        ]
    )  # [2, NB, SB, ZB]
    part = np.stack(
        [
            (np.asarray(sb.front_code) == B_SPACE) & (np.asarray(sb.eps_front) > 1e-6),
            (np.asarray(sb.back_code) == B_SPACE) & (np.asarray(sb.eps_back) > 1e-6),
        ]
    ).reshape(2, NB, -1)
    count = np.einsum("fnsz,fns->nz", oh, part.astype(np.float64))
    return part & (np.einsum("fnsz,nz->fns", oh, count) >= 1.5)


def mrt_eps_blocked_jnp(
    area, eps_front, eps_back, part, front_oh, back_oh, n_blocks,
    zones_per_block, xp=None,
):
    """Carroll view-factor fixed point + effective emissivities, written
    array-module-generically (``xp=np`` reproduces the blocking statics
    bit-for-bit; ``xp=jnp`` is DIFFERENTIABLE in area/eps_front/eps_back —
    FastRunner.chunk_grad pulls the adjoint kernel's mrt_eps cotangents
    back through this to close the interior-MRT calibration chain).

    ``area``/``eps_*`` are blocked [SP] arrays, ``part`` the static
    [2, NB, SB] participation mask (_mrt_part_mask).  Returns
    ``(eps_eff_front, eps_eff_back)`` as [SP] arrays (0 = face does not
    participate)."""
    if xp is None:
        import jax.numpy as xp  # noqa: PLC0415
    NB, ZB = n_blocks, zones_per_block
    oh = xp.stack(
        [
            xp.reshape(front_oh, (NB, -1, ZB)),
            xp.reshape(back_oh, (NB, -1, ZB)),
        ]
    )  # [2, NB, SB, ZB]
    a2 = xp.broadcast_to(xp.reshape(area, (1, NB, -1)), part.shape)

    # Carroll view-factor fixed point (engine.surface.carroll_view_factors).
    F = xp.ones_like(a2)
    for _ in range(20):
        af = xp.where(part, a2 * F, 0.0)
        tot = xp.einsum("fnsz,fns->nz", oh, af)
        denom = 1.0 - af / xp.maximum(xp.einsum("fnsz,nz->fns", oh, tot), 1e-30)
        F = 1.0 / xp.maximum(denom, 0.05)
    F = xp.where(part, F, 0.0)
    eps = xp.stack([eps_front, eps_back]).reshape(2, NB, -1)
    denom = xp.where(part, F * (1.0 - eps) + eps, 1.0)  # 0/0 on masked faces
    eps_eff = xp.where(part, eps * F / denom, 0.0)
    SP = np.shape(area)[0]
    return eps_eff[0].reshape(SP), eps_eff[1].reshape(SP)


def block_building(
    building: CompiledBuilding,
    block_size: int = 1024,
    node_split="auto",
    mrt_statics: bool = None,
) -> BlockedBuilding:
    """Permute + pad a compiled building into zone-closed blocks.

    ``node_split`` (see heatx.build.blocking.build_blocks): "auto" places
    few-node surfaces in dedicated lanes of each block so the kernel can
    march them as a short sub-batch — typically ~3x less padded node work.

    ``mrt_statics`` forces computing the static Carroll network data
    (needed by ``make_hour_march(collect_operative=True)`` on buildings
    that don't run ``config.interior_mrt`` physics); default: only when
    the config enables interior MRT."""
    layout = build_blocks(building, block_size=block_size, node_split=node_split)
    sb = building.surfaces

    def perm_nodes(a, fill=0.0):
        return layout.surfaces_to_blocked(np.asarray(a), fill)

    def perm_surf(a, fill=0.0):
        return layout.surfaces_to_blocked(np.asarray(a), fill)

    gas_fields = type(sb.cav_gas)(*[perm_nodes(f) for f in sb.cav_gas])
    new_sb = replace(
        sb,
        node_mask=perm_nodes(sb.node_mask, False),
        n_nodes=np.where(layout.surf_valid, perm_surf(sb.n_nodes, 1), 1).astype(np.int32),
        mass=perm_nodes(sb.mass),
        massive=perm_nodes(sb.massive, False),
        seg_u=perm_nodes(sb.seg_u),
        seg_is_cavity=perm_nodes(sb.seg_is_cavity, False),
        cav_gas=gas_fields,
        cav_thickness=perm_nodes(sb.cav_thickness),
        cav_height=perm_nodes(sb.cav_height, 1.0),
        cav_angle=perm_nodes(sb.cav_angle),
        cav_ein=perm_nodes(sb.cav_ein),
        cav_eout=perm_nodes(sb.cav_eout),
        same_chunk=perm_nodes(sb.same_chunk, False),
        nomass_chunk_id=perm_nodes(sb.nomass_chunk_id, -1),
        nomass_chunk_count=perm_nodes(sb.nomass_chunk_count),  # [C, SP]
        front_alphas=perm_nodes(sb.front_alphas),
        back_alphas=perm_nodes(sb.back_alphas),
        area=perm_surf(sb.area, 1.0),  # pad 1 to keep P*v/A finite
        perimeter=perm_surf(sb.perimeter, 0.0),
        normal=np.ascontiguousarray(perm_nodes(np.ascontiguousarray(sb.normal.T)).T),
        cos_tilt=perm_surf(sb.cos_tilt),
        wind_mod=perm_surf(sb.wind_mod),
        eps_front=perm_surf(sb.eps_front),
        eps_back=perm_surf(sb.eps_back),
        rf=perm_surf(sb.rf, 1.0),
        front_code=np.where(
            layout.surf_valid, perm_surf(sb.front_code, B_AMBIENT), B_AMBIENT
        ).astype(np.int32),
        front_space=perm_surf(sb.front_space, 0).astype(np.int32),
        front_temp=np.where(layout.surf_valid, perm_surf(sb.front_temp), 22.0),
        back_code=np.where(
            layout.surf_valid, perm_surf(sb.back_code, B_AMBIENT), B_AMBIENT
        ).astype(np.int32),
        back_space=perm_surf(sb.back_space, 0).astype(np.int32),
        back_temp=np.where(layout.surf_valid, perm_surf(sb.back_temp), 22.0),
        fixed_h_front=perm_surf(sb.fixed_h_front, np.nan),
        fixed_h_back=perm_surf(sb.fixed_h_back, np.nan),
        is_fenestration=perm_surf(sb.is_fenestration, False),
    )

    zone_volume = layout.zones_to_blocked(np.asarray(building.zone_volume), fill=1.0)
    zone_volume = np.where(layout.zone_valid, zone_volume, 1.0)

    mix_wt = None
    if building.mix_src.size:
        ZB = layout.zones_per_block
        zone_local = {}
        zone_block = {}
        for bi in range(layout.n_blocks):
            for j, z in enumerate(layout.zone_table[bi]):
                if z >= 0:
                    zone_local[int(z)] = j
                    zone_block[int(z)] = bi
        W = np.zeros((layout.n_blocks, ZB, ZB))
        for s, d, v in zip(
            np.asarray(building.mix_src),
            np.asarray(building.mix_dst),
            np.asarray(building.mix_vol),
        ):
            bi = zone_block[int(s)]
            assert zone_block[int(d)] == bi, "mixed zones must share a block"
            W[bi, zone_local[int(s)], zone_local[int(d)]] += float(v)
        mix_wt = W.reshape(layout.n_blocks * ZB, ZB)

    ctl = None
    if building.has_ideal_hvac:
        # Thermostat parameters per blocked zone; padded slots get the
        # "never act" sentinels (zone.zone_update semantics in-kernel).
        def zb(v, fill):
            out = layout.zones_to_blocked(np.asarray(v), fill=fill)
            return np.where(layout.zone_valid, out, fill)

        ctl = (
            zb(building.ctl_heat_sp, -1e9),
            zb(building.ctl_cool_sp, 1e9),
            zb(building.ctl_max_heat, 0.0),
            zb(building.ctl_max_cool, 0.0),
        )

    mrt_eps = None
    if building.config.interior_mrt if mrt_statics is None else mrt_statics:
        mrt_eps = _mrt_static_blocked(
            new_sb, layout.front_oh, layout.back_oh,
            layout.n_blocks, layout.zones_per_block,
        )

    shade = None
    if building.has_zone_shading:
        # Deployment reads the controlling zone's temperature via a one-hot
        # gather (the same [ZB, W] row-matmul trick as the boundary temps).
        # Blocking unions the controlling zone into the pane's component
        # (build_blocks), so it is always block-local here.
        SPn = layout.padded_surfaces
        ZBn = layout.zones_per_block
        sz = layout.surfaces_to_blocked(
            np.asarray(building.shade_zone, np.int64), fill=-1
        )
        sz = np.where(layout.surf_valid, sz, -1)
        tau = np.where(
            sz >= 0, perm_surf(building.shade_tau, 1.0), 1.0
        ).astype(np.float64)
        sp = np.where(
            sz >= 0, perm_surf(building.shade_sp, 1e9), 1e9
        ).astype(np.float64)
        oh = np.zeros((SPn, ZBn), np.float64)
        zt = layout.zone_table
        for i in np.nonzero(sz >= 0)[0]:
            bi = i // layout.block_size
            loc = np.nonzero(zt[bi] == sz[i])[0]
            if loc.size == 0:  # defensive: blocking guarantees locality
                raise AssertionError(
                    f"zone-shading control zone {int(sz[i])} not in block "
                    f"{bi}'s zone table (blocking invariant violated)"
                )
            oh[i, loc[0]] = 1.0
        shade = (oh, tau, sp)

    vent = None
    if building.has_vent_gates:
        def zbv(v, fill):
            out = layout.zones_to_blocked(np.asarray(v), fill=fill)
            return np.where(layout.zone_valid, out, fill)

        vent = (
            zbv(building.vent_min_tin, -100.0),
            zbv(building.vent_max_tin, 100.0),
        )

    return BlockedBuilding(
        base=building,
        layout=layout,
        surfaces=new_sb,
        front_oh=layout.front_oh,
        back_oh=layout.back_oh,
        zone_volume=zone_volume,
        zone_valid=layout.zone_valid,
        mix_wt=mix_wt,
        ctl=ctl,
        mrt_eps=mrt_eps,
        shade=shade,
        vent=vent,
    )


def _make_ref_thomas(l_s, d_s, u_s, bx_s, c_s, n):
    """Thomas solver over VMEM scratch refs with fori sweeps.

    Inside the kernel neither the unrolled solver (explodes Mosaic compile
    time) nor a lax.scan with xs (no Mosaic lowering) works; sequential
    dynamic row updates must go through refs (value-level dynamic_update_slice
    lowers to an unsupported scatter).  Result overwrites bx_s.
    """

    def solver(lower, diag, upper, rhs):
        l_s[...] = lower
        d_s[...] = diag
        u_s[...] = upper
        bx_s[...] = rhs
        inv0 = 1.0 / d_s[0:1, :]
        c_s[0:1, :] = u_s[0:1, :] * inv0
        bx_s[0:1, :] = bx_s[0:1, :] * inv0

        def fwd(i, carry):
            li = l_s[pl.ds(i, 1), :]
            di = d_s[pl.ds(i, 1), :]
            ui = u_s[pl.ds(i, 1), :]
            bi = bx_s[pl.ds(i, 1), :]
            cp = c_s[pl.ds(i - 1, 1), :]
            dp = bx_s[pl.ds(i - 1, 1), :]
            inv = 1.0 / (di - li * cp)
            c_s[pl.ds(i, 1), :] = ui * inv
            bx_s[pl.ds(i, 1), :] = (bi - li * dp) * inv
            return carry

        jax.lax.fori_loop(1, n, fwd, 0)

        def bwd(j, carry):
            i = n - 2 - j
            xn = bx_s[pl.ds(i + 1, 1), :]
            bx_s[pl.ds(i, 1), :] = (
                bx_s[pl.ds(i, 1), :] - c_s[pl.ds(i, 1), :] * xn
            )
            return carry

        jax.lax.fori_loop(0, n - 1, bwd, 0)
        return bx_s[...]

    return solver


def _expm1_neg(x):
    """expm1(-x) for x >= 0 without the expm1 primitive (no Mosaic lowering):
    series for small x (where exp loses the digits), exp otherwise."""
    small = x < 1e-2
    xs = jnp.where(small, x, 0.0)
    series = -xs * (1.0 - xs / 2.0 * (1.0 - xs / 3.0))
    return jnp.where(small, series, jnp.exp(-jnp.where(small, 1.0, x)) - 1.0)


def _boundary_temps(sb_vals, p, zT, t_out, f32):
    """Boundary air temperatures of one sub-batch.

    ``zT`` is a 2-D ``[1, ZB]`` row (zone vectors stay rank-2 throughout the
    kernel: rank-1 vectors beyond one vector register CHECK-crash Mosaic's
    VectorLayoutInferer, see PERF.md).  Zone reads are vector-matrix gathers
    ``zT_row @ ohT`` — the transposed form matters: Mosaic lowers M=1
    matmuls efficiently, while the matrix-vector form ``oh @ zT_col``
    (result width 1) measured ~10x slower and dominated the whole kernel.
    Faces that bound no zone anywhere in the sub-batch (static: their
    one-hot is all zero) skip the gather entirely.
    """
    if p.front_any:
        t_zone_f = jnp.dot(zT, p.front_ohT, preferred_element_type=f32)[0]
    else:
        t_zone_f = jnp.zeros_like(sb_vals.front_temp)
    if p.back_any:
        t_zone_b = jnp.dot(zT, p.back_ohT, preferred_element_type=f32)[0]
    else:
        t_zone_b = jnp.zeros_like(sb_vals.back_temp)
    t_front = jnp.where(
        sb_vals.front_code == B_OUTDOOR,
        t_out,
        jnp.where(sb_vals.front_code == B_SPACE, t_zone_f, sb_vals.front_temp),
    )
    t_back = jnp.where(
        sb_vals.back_code == B_OUTDOOR,
        t_out,
        jnp.where(sb_vals.back_code == B_SPACE, t_zone_b, sb_vals.back_temp),
    )
    return t_front, t_back


def _zone_update(zT, a_z, b_z, zone_volume, dt):
    """Analytical zone temperature update (model.rs:650-674), [1, ZB] rows
    in/out (zone vectors stay rank-2 in-kernel, see _boundary_temps)."""
    t_k = zT + KELVIN
    c_z = zone_volume * gas.density(gas.AIR, t_k) * gas.heat_capacity(gas.AIR, t_k)
    safe_b = jnp.where(jnp.abs(b_z) > 1e-9, b_z, 1.0)
    ratio = a_z / safe_b
    zT_new = zT - (ratio - zT) * _expm1_neg(safe_b * dt / c_z)
    return jnp.where(jnp.abs(b_z) > 1e-9, zT_new, zT)


def _zone_update_ctl(zT, a_z, b_z, zone_volume, dt, ctl):
    """Zone update with setpoint-driven ideal-loads control — the in-kernel
    mirror of heatx.engine.zone.zone_update.  All [1, ZB] rows; returns
    ``(zT_new, load)`` with the injected power (W, heating +, cooling -).

    Pure elementwise select/clip arithmetic on zone rows, so the control
    costs a handful of vector ops per sub-step on top of the plain update.
    """
    heat_sp, cool_sp, max_heat, max_cool = ctl
    t_k = zT + KELVIN
    c_z = zone_volume * gas.density(gas.AIR, t_k) * gas.heat_capacity(gas.AIR, t_k)
    smallb = jnp.abs(b_z) <= 1e-9
    safe_b = jnp.where(smallb, 1.0, b_z)
    em = _expm1_neg(safe_b * dt / c_z)
    t_free = zT - (a_z / safe_b - zT) * em
    t_free = jnp.where(smallb, zT, t_free)

    def a_required(t_set):
        a_gen = safe_b * (zT * (1.0 + em) - t_set) / em
        a_lin = c_z * (t_set - zT) / dt
        return jnp.where(smallb, a_lin, a_gen)

    zero = jnp.zeros_like(a_z)
    load = jnp.where(
        t_free < heat_sp,
        jnp.clip(a_required(heat_sp) - a_z, zero, max_heat),
        jnp.where(
            t_free > cool_sp,
            jnp.clip(a_required(cool_sp) - a_z, -max_cool, zero),
            zero,
        ),
    )
    # |B| ~ 0 zones hold their temperature (model.rs:662-670 degenerate
    # rule); control stands down with them — see zone.zone_update.
    load = jnp.where(smallb, zero, load)
    a_ctl = a_z + load
    t_ctl = zT - (a_ctl / safe_b - zT) * em
    t_ctl = jnp.where(smallb, zT, t_ctl)
    return jnp.where(load == 0.0, t_free, t_ctl), load


def _row01(ab):
    """Rows 0 and 1 of a [2, Z] array as two [1, Z] rows, via masked
    reduces.  Plain row indexing (``ab[1]``) produces rank-1 multi-vreg
    vectors, which CHECK-crash Mosaic's VectorLayoutInferer for Z > 128
    (layout.h:320 ``arr.size() >= layout_rank``) — the block-2048 /
    100k-surface crash, minimized in PERF.md."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (2, 1), 0)
    r0 = jnp.sum(jnp.where(rows == 0, ab, 0.0), axis=0, keepdims=True)
    r1 = jnp.sum(jnp.where(rows == 1, ab, 0.0), axis=0, keepdims=True)
    return r0, r1


def _zone_dots(a_extra, b_extra, parts_env, f32):
    """Per-zone A/B accumulation over all sub-batches: segment-sum of
    h*A*T_face / h*A via one-hot matmuls (model.rs:489-597).  All-zero
    one-hots (faces that never bound a zone) are skipped statically; the A
    and B rows share one M=2 matmul per face (half the MXU passes of two
    M=1 dots)."""
    a_z = a_extra
    b_z = b_extra
    for (p, hf, hb, ts_f, ts_b) in parts_env:
        if p.front_any:
            ha_f = hf * p.sb.area
            ab = jnp.dot(
                jnp.stack([ha_f * ts_f, ha_f], axis=0), p.front_oh,
                preferred_element_type=f32,
            )
            r0, r1 = _row01(ab)
            a_z = a_z + r0
            b_z = b_z + r1
        if p.back_any:
            ha_b = hb * p.sb.area
            ab = jnp.dot(
                jnp.stack([ha_b * ts_b, ha_b], axis=0), p.back_oh,
                preferred_element_type=f32,
            )
            r0, r1 = _row01(ab)
            a_z = a_z + r0
            b_z = b_z + r1
    return a_z, b_z


def _mrt_context(parts, statics, Ts, tfbs, zT, f32):
    """In-kernel Carroll MRT network (engine.surface.interior_mrt).

    The participation masks, view factors, and effective emissivities are
    static (block_building._mrt_static_blocked precomputes them; a part side
    with no participating face carries ``mrt_ef``/``mrt_eb = None`` and is
    skipped at trace time).  What runs per coefficient evaluation is the
    same 4-iteration linearized fixed point as the XLA path
    (surface.py:_mrt_solve), expressed as one-hot row matmuls over the
    block's zones — the machinery _zone_dots already uses.

    ``tfbs`` are the parts' (t_front, t_back) boundary air temperatures
    (zone air for space faces — the fixed point's initial linearization,
    like _mrt_solve's ``zpad[idx]``).  Returns ``(contexts, tm)``: one
    ``(mask_f, tm_f, eps_f, mask_b, tm_b, eps_b)`` context per part
    (None where neither side participates), ready for
    surface.apply_interior_mrt, plus the converged ``[1, ZB]`` zone MRT
    node (air-temperature fallback where the network is undefined — the
    comfort observable).
    """
    faces = []  # (part, eps_eff, ts, oh, ohT) per participating side
    tm_face = []  # current linearization temperature per side
    for p, st, T, (t_front, t_back) in zip(parts, statics, Ts, tfbs):
        if p.mrt_ef is not None:
            faces.append((p, p.mrt_ef, T[0], p.front_oh, p.front_ohT))
            tm_face.append(t_front)
        if p.mrt_eb is not None:
            faces.append(
                (p, p.mrt_eb, surf_mod._last_node(p.sb, T, st), p.back_oh,
                 p.back_ohT)
            )
            tm_face.append(t_back)
    if not faces:
        return [None] * len(parts), zT

    tm = zT
    for _ in range(4):
        num = jnp.zeros_like(zT)
        den = jnp.zeros_like(zT)
        for (p, eps_eff, ts, oh, _), tmf in zip(faces, tm_face):
            h = 4.0 * SIGMA * eps_eff * (KELVIN + (tmf + ts) / 2.0) ** 3
            w = h * p.sb.area  # 0 for non-participating faces (eps_eff = 0)
            ab = jnp.dot(
                jnp.stack([w * ts, w], axis=0), oh, preferred_element_type=f32
            )
            r0, r1 = _row01(ab)
            num = num + r0
            den = den + r1
        tm = jnp.where(den > 1e-30, num / jnp.maximum(den, 1e-30), zT)
        tm_face = [
            jnp.dot(tm, ohT, preferred_element_type=f32)[0]
            for (_, _, _, _, ohT) in faces
        ]

    out = []
    fi = 0
    for p in parts:
        if p.mrt_ef is None and p.mrt_eb is None:
            out.append(None)
            continue
        zero = jnp.zeros_like(p.sb.area)
        false = zero > 1.0
        ef = p.mrt_ef if p.mrt_ef is not None else zero
        eb = p.mrt_eb if p.mrt_eb is not None else zero
        if p.mrt_ef is not None:
            mf, tmf = ef > 0.0, tm_face[fi]
            fi += 1
        else:
            mf, tmf = false, zero
        if p.mrt_eb is not None:
            mb, tmb = eb > 0.0, tm_face[fi]
            fi += 1
        else:
            mb, tmb = false, zero
        out.append((mf, tmf, ef, mb, tmb, eb))
    return out, tm


def _hour_body(
    cfg: SimConfig,
    parts,  # list of SimpleNamespace(sb, front_oh[T], back_oh[T], sol/ir, *_any)
    zone_volume,  # [ZB]
    a_extra,  # [ZB] per-hour zone gains (hvac+lum+infiltration A-terms)
    b_extra,  # [ZB]
    t_out_arr,  # [>= off+substeps] (SMEM refs read by the caller closure)
    wind_arr,
    wdir_arr,
    T0s,  # tuple of [rows_p, W_p]
    zT0,  # [ZB]
    substeps: int,
    dt: float,
    solver=None,
    off=0,  # weather offset (multi-hour kernels pass hour*substeps)
    mix_wt=None,  # [ZB, ZB] block-local inter-zone mixing matrix
    ctl=None,  # (heat_sp, cool_sp, max_heat, max_cool) [1, ZB] rows, or None
    unroll=False,  # Python loops instead of fori (reverse-differentiable)
):
    """One hour of reference-parity sub-steps for one block; pure jnp.

    Mirrors engine.step.substep + engine.zone per sub-step, marching every
    node-height sub-batch and accumulating their zone couplings together.
    ``unroll=True`` runs the same sub-steps as a Python loop — required by
    the parity adjoint kernel (fori_loop has no reverse-mode rule); the
    arithmetic is identical.
    """
    f32 = T0s[0].dtype
    # Hoist the loop-invariant network masks, the static K/q pieces and RK4
    # row scales (compute_statics(dt=...)), the per-hour radiant
    # temperatures, and the absorbed-solar forcing out of the sub-step loop
    # (Mosaic does not hoist out of fori_loop the way XLA hoists out of
    # scan; the (ir/sigma)^0.25 pows and the solar clamp+distribute were
    # otherwise paid on every sub-step).
    statics = [surf_mod.compute_statics(p.sb, dt=dt) for p in parts]
    rad_outs = [
        surf_mod.radiant_out_temperatures(p.ir_front, p.ir_back, f32)
        for p in parts
    ]
    solar_qs = [
        surf_mod.absorbed_solar_q(p.sb, p.sol_front, p.sol_back) for p in parts
    ]
    def substep(carry, t_out, wind_speed, wind_direction):
        Ts, zT = carry
        bts = [_boundary_temps(p.sb, p, zT, t_out, f32) for p in parts]
        # Interior longwave exchange (config.interior_mrt): evaluated from
        # the step-start state snapshot, like the XLA path (step.substep).
        mrts = (
            _mrt_context(parts, statics, Ts, bts, zT, f32)[0]
            if cfg.interior_mrt
            else [None] * len(parts)
        )
        new_Ts = []
        hqs = []
        envs = []
        for p, st, ro, sq, T, (t_front, t_back), mrt in zip(
            parts, statics, rad_outs, solar_qs, Ts, bts, mrts
        ):
            # Forced h + windward test depend only on this sub-step's weather:
            # computed once, shared by the in-march and post-march TARP
            # evaluations (they differ only in the surface temperature).
            forced = surf_mod.forced_context(p.sb, wind_direction, wind_speed)
            env_m = surf_mod.border_conditions(
                p.sb, T, t_front, t_back, wind_direction, wind_speed,
                p.ir_front, p.ir_back, cfg, statics=st, rad_out=ro,
                forced=forced,
            )
            T_new = surf_mod.march_surfaces(
                p.sb, T, t_front, t_back, wind_direction, wind_speed,
                p.sol_front, p.sol_back, p.ir_front, p.ir_back, dt, cfg,
                has_massive=p.sb.has_massive, solver=solver, statics=st,
                rad_out=ro, envs=env_m, solar_q=sq, mrt=mrt,
            )
            env_f, env_b = surf_mod.border_conditions(
                p.sb, T_new, t_front, t_back, wind_direction, wind_speed,
                p.ir_front, p.ir_back, cfg, statics=st, rad_out=ro,
                forced=forced,
            )
            ts_front = T_new[0]
            ts_back = surf_mod._last_node(p.sb, T_new, st)
            q_front = (ts_front - t_front) * env_f.h
            q_back = (ts_back - t_back) * env_b.h
            new_Ts.append(T_new)
            hqs.append((env_f.h, env_b.h, q_front, q_back))
            envs.append((p, env_f.h, env_b.h, ts_front, ts_back))

        a_z, b_z = _zone_dots(a_extra, b_extra, envs, f32)
        if mix_wt is not None:
            # Inter-zone mixing (heatx extension, model.rs:546): ventilation
            # sourced from the other zone's air, as an M=1 vector-matrix dot.
            t_k = zT + KELVIN
            s0 = gas.density(gas.AIR, t_k) * gas.heat_capacity(gas.AIR, t_k)
            a_z = a_z + jnp.dot(s0 * zT, mix_wt, preferred_element_type=f32)
            b_z = b_z + jnp.dot(s0, mix_wt, preferred_element_type=f32)
        if ctl is None:
            zT_new = _zone_update(zT, a_z, b_z, zone_volume, dt)
            load = None
        else:
            zT_new, load = _zone_update_ctl(zT, a_z, b_z, zone_volume, dt, ctl)
        return (tuple(new_Ts), zT_new), tuple(hqs), load

    hq0 = tuple(
        tuple(jnp.zeros_like(p.sol_front) for _ in range(4)) for p in parts
    )
    if ctl is None:

        def loop_body(i, carry):
            (Ts, zT), _ = carry
            st, hqs, _ = substep(
                (Ts, zT), t_out_arr[off + i], wind_arr[off + i], wdir_arr[off + i]
            )
            return st, hqs

        carry0 = ((T0s, zT0), hq0)
        if unroll:
            c = carry0
            for i in range(substeps):
                c = loop_body(i, c)
            (Ts, zT), hqs = c
        else:
            (Ts, zT), hqs = jax.lax.fori_loop(0, substeps, loop_body, carry0)
        return Ts, zT, hqs, None

    def loop_body(i, carry):
        (Ts, zT), _, lsum = carry
        st, hqs, load = substep(
            (Ts, zT), t_out_arr[off + i], wind_arr[off + i], wdir_arr[off + i]
        )
        return st, hqs, lsum + load

    carry0 = ((T0s, zT0), hq0, jnp.zeros_like(zT0))
    if unroll:
        c = carry0
        for i in range(substeps):
            c = loop_body(i, c)
        (Ts, zT), hqs, lsum = c
    else:
        (Ts, zT), hqs, lsum = jax.lax.fori_loop(
            0, substeps, loop_body, carry0
        )
    # Mean ideal power over the hour's sub-steps (energy-consistent).
    return Ts, zT, hqs, lsum / substeps


def _hour_body_imp(
    cfg: SimConfig,
    parts,
    zone_volume,
    a_extra,
    b_extra,
    t_out_arr,
    wind_arr,
    wdir_arr,
    T0s,
    zT0,
    substeps: int,
    dt_sub: float,
    solver=None,  # accepted for call-site compatibility; stages pre-factor
    off=0,
    mix_wt=None,  # [ZB, ZB] block-local inter-zone mixing matrix
    ctl=None,  # (heat_sp, cool_sp, max_heat, max_cool) [1, ZB] rows, or None
    refresh_h=False,
    refresh_every=None,
    unroll=False,  # Python loops instead of fori (reverse-differentiable)
):
    """One hour of TR-BDF2 fast-mode sub-steps for one block (see
    heatx.engine.implicit): coefficients freeze once per hour, each sub-step
    is one tridiagonal mat-vec + two Thomas solves + the analytical zone
    update.  ~10x fewer sub-steps than the parity body at the same in-VMEM
    cost structure.

    ``refresh_h=True`` (mode="trbdf2_refresh") re-evaluates the film
    coefficients / linearized radiation / cavity U and re-factors the stage
    matrices EVERY sub-step from the marching state and the per-sub-step
    weather — the parity path's coefficient cadence (surface.rs:596-717) at
    the fast mode's sub-step count (frozen-h is the fast mode's dominant
    error term: 0.33 K RMSE frozen vs 0.05 K refreshed on the 3-week
    regime-gate workload).

    ``refresh_every=k`` is the hybrid cadence between those extremes: the
    operators rebuild at the start of every group of ``k`` consecutive
    sub-steps (k must divide ``substeps``; k=1 is refresh_h, k=substeps is
    bit-identical to the frozen mode).  The accuracy/cost trade is measured
    in PERF.md's cadence ablation."""
    from heatx.engine import implicit as imp_mod
    from heatx.engine.exponential import _full_system_K, _substep_forcing
    from heatx.ops import tridiag

    f32 = T0s[0].dtype
    statics = [surf_mod.compute_statics(p.sb) for p in parts]
    # Stage solves: PCR when the kernel's solver choice is PCR (no pivot
    # chain; measured faster than the pre-factored sequential sweeps),
    # otherwise the division-free factored sweeps.
    use_pcr = solver is tridiag.solve_pcr

    solar_qs = [
        surf_mod.absorbed_solar_q(p.sb, p.sol_front, p.sol_back) for p in parts
    ]

    def build_ops(Ts_c, zT_c, t_out_c, ws_c, wd_c):
        """Operators from the given state + weather (implicit.build_operators,
        in-kernel): border conditions, linearized radiation, cavity U, the
        full-system K, and the two PRE-FACTORED TR-BDF2 stage matrices.
        Called once per hour (frozen mode — Mosaic does not hoist
        loop-invariant chains out of the fori_loop, so the hoist is manual)
        or once per sub-step (refresh mode)."""
        bts = [_boundary_temps(p.sb, p, zT_c, t_out_c, f32) for p in parts]
        # Interior longwave exchange (config.interior_mrt): frozen with the
        # rest of the coefficients, exactly like the XLA implicit path
        # (implicit.py build_operators).
        mrts = (
            _mrt_context(parts, statics, Ts_c, bts, zT_c, f32)[0]
            if cfg.interior_mrt
            else [None] * len(parts)
        )
        ops = []
        for p, st, T0, solar_q, (t_front0, t_back0), mrt in zip(
            parts, statics, Ts_c, solar_qs, bts, mrts
        ):
            env_f0, env_b0 = surf_mod.border_conditions(
                p.sb, T0, t_front0, t_back0, wd_c, ws_c, p.ir_front,
                p.ir_back, cfg, statics=st,
            )
            env_f0, env_b0, rad_eps_f, rad_eps_b = surf_mod.apply_interior_mrt(
                p.sb, env_f0, env_b0, mrt
            )
            rad_hs_f = surf_mod.linearized_rad_coefficient(rad_eps_f, env_f0)
            rad_hs_b = surf_mod.linearized_rad_coefficient(rad_eps_b, env_b0)
            U = surf_mod.segment_u(p.sb, T0, env_b0.air)
            K = _full_system_K(p.sb, U, env_f0, env_b0, rad_hs_f, rad_hs_b, st)
            C = jnp.where(p.sb.massive, p.sb.mass, jnp.zeros_like(p.sb.mass))
            # gamma = 2 - sqrt(2) makes GAMMA/2 == BETA: both TR-BDF2 stage
            # matrices are the same matrix (heatx.engine.implicit
            # build_operators) — one build, ONE factorization per (sub-)step.
            M1 = imp_mod._stage_matrix(p.sb, K, C, imp_mod.GAMMA * dt_sub / 2.0)
            M2 = M1
            if use_pcr:
                lv1, invb1 = tridiag.pcr_factor(*M1)
                lv2, invb2 = lv1, invb1
                cs1 = inv1 = cs2 = inv2 = None
            else:
                cs1, inv1 = tridiag.factor(*M1)
                cs2, inv2 = cs1, inv1
                lv1 = invb1 = lv2 = invb2 = None
            ops.append(
                SimpleNamespace(
                    env_f0=env_f0, env_b0=env_b0, rad_hs_f=rad_hs_f,
                    rad_hs_b=rad_hs_b, K=K, C=C, M1=M1, M2=M2,
                    cs1=cs1, inv1=inv1, cs2=cs2, inv2=inv2,
                    lv1=lv1, invb1=invb1, lv2=lv2, invb2=invb2,
                    solar_q=solar_q,
                )
            )
        return ops

    if refresh_h and refresh_every is None:
        refresh_every = 1
    if refresh_every is not None and substeps % refresh_every:
        raise ValueError(
            f"refresh_every {refresh_every} must divide substeps {substeps}"
        )

    def substep(carry, i, fzs):
        Ts, zT = carry
        t_out = t_out_arr[off + i]
        new_Ts = []
        hqs = []
        envs = []
        for p, st, fz, T in zip(parts, statics, fzs, Ts):
            t_front, t_back = _boundary_temps(p.sb, p, zT, t_out, f32)
            # Boundary air tracks the marching state every sub-step; the
            # film coefficients / stage factorizations stay at the ops'
            # cadence.  (When fzs was just rebuilt from this very state the
            # replace is a bit-exact no-op — build_ops evaluated the same
            # _boundary_temps — so one code path serves every cadence.)
            env_f = fz.env_f0._replace(air=t_front)
            env_b = fz.env_b0._replace(air=t_back)
            q = _substep_forcing(env_f, env_b, fz.rad_hs_f, fz.rad_hs_b, fz.solar_q, st)

            lower, diag, upper = fz.K
            KT0 = tridiag.matvec(lower, diag, upper, T)
            half = imp_mod.GAMMA * dt_sub / 2.0
            rhs1 = fz.C * T + half * KT0 + imp_mod.GAMMA * dt_sub * q
            rhs1 = jnp.where(p.sb.node_mask, rhs1, T)
            if use_pcr:
                T1 = tridiag.pcr_apply(fz.lv1, fz.invb1, rhs1)
            else:
                T1 = tridiag.solve_factored(fz.M1[0], fz.cs1, fz.inv1, rhs1)

            rhs2 = imp_mod.C1 * fz.C * T1 - imp_mod.C2 * fz.C * T + imp_mod.BETA * dt_sub * q
            rhs2 = jnp.where(p.sb.node_mask, rhs2, T)
            if use_pcr:
                T_new = tridiag.pcr_apply(fz.lv2, fz.invb2, rhs2)
            else:
                T_new = tridiag.solve_factored(fz.M2[0], fz.cs2, fz.inv2, rhs2)

            ts_front = T_new[0]
            ts_back = surf_mod._last_node(p.sb, T_new, st)
            q_front = (ts_front - t_front) * fz.env_f0.h
            q_back = (ts_back - t_back) * fz.env_b0.h
            new_Ts.append(T_new)
            hqs.append((fz.env_f0.h, fz.env_b0.h, q_front, q_back))
            envs.append((p, fz.env_f0.h, fz.env_b0.h, ts_front, ts_back))

        a_z, b_z = _zone_dots(a_extra, b_extra, envs, f32)
        if mix_wt is not None:
            # Inter-zone mixing (heatx extension, model.rs:546): ventilation
            # sourced from the other zone's air, as an M=1 vector-matrix dot.
            t_k = zT + KELVIN
            s0 = gas.density(gas.AIR, t_k) * gas.heat_capacity(gas.AIR, t_k)
            a_z = a_z + jnp.dot(s0 * zT, mix_wt, preferred_element_type=f32)
            b_z = b_z + jnp.dot(s0, mix_wt, preferred_element_type=f32)
        if ctl is None:
            zT_new = _zone_update(zT, a_z, b_z, zone_volume, dt_sub)
            load = None
        else:
            zT_new, load = _zone_update_ctl(zT, a_z, b_z, zone_volume, dt_sub, ctl)
        return (tuple(new_Ts), zT_new), tuple(hqs), load

    hq0 = tuple(
        tuple(jnp.zeros_like(p.sol_front) for _ in range(4)) for p in parts
    )
    lsum0 = None if ctl is None else jnp.zeros_like(zT0)
    carry0 = ((T0s, zT0), hq0, lsum0)

    def inner_loop(carry, i0, n, fzs):
        """n consecutive sub-steps starting at global sub-step i0, all on
        the same (frozen) operator set.  ``unroll=True`` runs the same
        sub-steps as a Python loop — required by the adjoint kernel, which
        reverse-differentiates the hour with ``jax.vjp`` (fori_loop has no
        reverse-mode rule); the arithmetic is identical."""

        def body(j, c):
            (Ts, zT), _, lsum = c
            st, hqs, load = substep((Ts, zT), i0 + j, fzs)
            return st, hqs, (None if lsum is None else lsum + load)

        if unroll:
            c = carry
            for j in range(n):
                c = body(j, c)
            return c
        return jax.lax.fori_loop(0, n, body, carry)

    if refresh_every is None:
        # -- per-hour frozen operators (mode="trbdf2") ------------------------
        frozen = build_ops(
            T0s, zT0, t_out_arr[off], wind_arr[off], wdir_arr[off]
        )
        (Ts, zT), hqs, lsum = inner_loop(carry0, 0, substeps, frozen)
    else:
        # -- grouped refresh (mode="trbdf2_refresh", every k sub-steps) -------
        k = refresh_every

        def group_body(g, c):
            (Ts, zT), _, _ = c
            i0 = g * k
            fzs = build_ops(
                Ts, zT, t_out_arr[off + i0], wind_arr[off + i0],
                wdir_arr[off + i0],
            )
            return inner_loop(c, i0, k, fzs)

        if unroll:
            c = carry0
            for g in range(substeps // k):
                c = group_body(g, c)
            (Ts, zT), hqs, lsum = c
        else:
            (Ts, zT), hqs, lsum = jax.lax.fori_loop(
                0, substeps // k, group_body, carry0
            )
    if ctl is None:
        return Ts, zT, hqs, None
    return Ts, zT, hqs, lsum / substeps


# Node-array field names passed per part (cavity fields appended when the
# part has any gas cavity).
_NODE_NAMES = [
    "node_mask", "mass", "massive", "seg_u", "same_chunk", "nomass_chunk_id",
    "front_alphas", "back_alphas",
]
_CAV_NAMES = [
    "cav_k0", "cav_k1", "cav_mu0", "cav_mu1", "cav_cp0", "cav_cp1",
    "cav_mass", "cav_thickness", "cav_height", "cav_angle", "cav_ein",
    "cav_eout", "seg_is_cavity",
]
_SURF_NAMES = [
    "area", "perimeter", "cos_tilt", "wind_mod", "eps_front", "eps_back",
    "rf", "front_code", "front_temp", "back_code", "back_temp",
    "fixed_h_front", "fixed_h_back", "normal_x", "normal_y",
]


def _prep_parts(bb: "BlockedBuilding", dtype, scheduled_shade_sp: bool):
    """Host-side operand prep shared by make_hour_march and the adjoint
    factory (pure code motion from make_hour_march): lane/row slicing of
    the blocked building into node-height parts, the per-part
    SurfaceBatch values, operand dicts, zone one-hots, and the per-part
    hour-input names.  Returns a SimpleNamespace of everything the
    kernel factories consume."""
    N = bb.max_nodes
    SB = bb.block_size
    ZB = bb.zones_per_block
    NB = bb.n_blocks
    SP = NB * SB
    sbb = bb.surfaces.astype(dtype)
    split = bb.layout.split
    if split is None:
        parts_meta = [(N, 0, SB)]
    else:
        parts_meta = []
        lo = 0
        for rows, w in split:
            parts_meta.append((int(rows), lo, int(w)))
            lo += int(w)
        assert lo == SB, (split, SB)
    n_parts = len(parts_meta)

    # ---- host-side lane/row slicing into parts ------------------------------
    def slice_node(a, rows, lo, w):  # [k, SP] -> [min(k, rows), NB*w]
        a = np.asarray(a)
        v = a.reshape(a.shape[0], NB, SB)[:rows, :, lo : lo + w]
        return np.ascontiguousarray(v.reshape(v.shape[0], NB * w))

    def slice_vec(a, lo, w):  # [SP] -> [NB*w]
        a = np.asarray(a)
        return np.ascontiguousarray(a.reshape(NB, SB)[:, lo : lo + w].reshape(NB * w))

    def slice_oh(a, lo, w):  # [SP, ZB] -> [NB*w, ZB]
        a = np.asarray(a)
        v = a.reshape(NB, SB, a.shape[-1])[:, lo : lo + w]
        return np.ascontiguousarray(v.reshape(NB * w, a.shape[-1]))

    part_sbs = []
    part_node_arrays = []
    part_surf_arrays = []
    part_oh = []
    for rows, lo, w in parts_meta:
        n_ = lambda a: slice_node(a, rows, lo, w)  # noqa: E731
        s_ = lambda a: slice_vec(a, lo, w)  # noqa: E731
        mask = n_(sbb.node_mask)
        massive = n_(sbb.massive)
        seg_cav = n_(sbb.seg_is_cavity)
        gasf = gas.GasProps(*[n_(f) for f in sbb.cav_gas])
        psb = replace(
            sbb,
            node_mask=mask,
            n_nodes=None,  # unused on the kernel path (mask-based last node)
            mass=n_(sbb.mass),
            massive=massive,
            seg_u=n_(sbb.seg_u),
            seg_is_cavity=seg_cav,
            cav_gas=gasf,
            cav_thickness=n_(sbb.cav_thickness),
            cav_height=n_(sbb.cav_height),
            cav_angle=n_(sbb.cav_angle),
            cav_ein=n_(sbb.cav_ein),
            cav_eout=n_(sbb.cav_eout),
            same_chunk=n_(sbb.same_chunk),
            nomass_chunk_id=n_(sbb.nomass_chunk_id),
            nomass_chunk_count=slice_node(sbb.nomass_chunk_count, 10**9, lo, w),
            max_nomass_run=int(
                slice_node(sbb.nomass_chunk_count, 10**9, lo, w).max(initial=0)
            ),
            has_nomass=bool(np.any(mask & ~massive)),
            has_massive=bool(np.any(massive)),
            has_cavity=bool(np.any(seg_cav)),
            front_alphas=n_(sbb.front_alphas),
            back_alphas=n_(sbb.back_alphas),
            area=s_(sbb.area),
            perimeter=s_(sbb.perimeter),
            normal=(s_(sbb.normal[:, 0]), s_(sbb.normal[:, 1])),
            cos_tilt=s_(sbb.cos_tilt),
            wind_mod=s_(sbb.wind_mod),
            eps_front=s_(sbb.eps_front),
            eps_back=s_(sbb.eps_back),
            rf=s_(sbb.rf),
            front_code=s_(sbb.front_code),
            front_space=None,
            front_temp=s_(sbb.front_temp),
            back_code=s_(sbb.back_code),
            back_space=None,
            back_temp=s_(sbb.back_temp),
            fixed_h_front=s_(sbb.fixed_h_front),
            fixed_h_back=s_(sbb.fixed_h_back),
            is_fenestration=None,
        )
        part_sbs.append(psb)
        node_arrays = {name: getattr(psb, name) for name in _NODE_NAMES}
        if psb.has_cavity:
            # Gas-cavity parameters: the ISO 15099 U-value re-evaluates on
            # every iteration in-kernel (pure elementwise, Mosaic-lowerable).
            node_arrays.update(
                cav_k0=np.asarray(psb.cav_gas.k0),
                cav_k1=np.asarray(psb.cav_gas.k1),
                cav_mu0=np.asarray(psb.cav_gas.mu0),
                cav_mu1=np.asarray(psb.cav_gas.mu1),
                cav_cp0=np.asarray(psb.cav_gas.cp0),
                cav_cp1=np.asarray(psb.cav_gas.cp1),
                cav_mass=np.asarray(psb.cav_gas.molar_mass),
                cav_thickness=psb.cav_thickness,
                cav_height=psb.cav_height,
                cav_angle=psb.cav_angle,
                cav_ein=psb.cav_ein,
                cav_eout=psb.cav_eout,
                seg_is_cavity=psb.seg_is_cavity,
            )
        part_node_arrays.append(node_arrays)
        # Per-surface vectors ride as [1, W] row blocks: a grid combined with
        # 1-D blocked operands has no working Mosaic lowering.
        row = lambda a: np.ascontiguousarray(np.asarray(a)[None, :])  # noqa: E731
        surf_arrays = dict(
            area=row(psb.area),
            perimeter=row(psb.perimeter),
            cos_tilt=row(psb.cos_tilt),
            wind_mod=row(psb.wind_mod),
            eps_front=row(psb.eps_front),
            eps_back=row(psb.eps_back),
            rf=row(psb.rf),
            front_code=row(psb.front_code),
            front_temp=row(psb.front_temp),
            back_code=row(psb.back_code),
            back_temp=row(psb.back_temp),
            fixed_h_front=row(psb.fixed_h_front),
            fixed_h_back=row(psb.fixed_h_back),
            normal_x=row(psb.normal[0]),
            normal_y=row(psb.normal[1]),
            chunk_count=np.ascontiguousarray(psb.nomass_chunk_count),  # [C, W*NB]
        )
        if bb.mrt_eps is not None:
            # Static Carroll effective emissivities (config.interior_mrt);
            # a part side with no participating face skips its row (and,
            # statically, the whole MRT arithmetic for that side).
            mef = np.asarray(s_(bb.mrt_eps[0]), dtype)
            meb = np.asarray(s_(bb.mrt_eps[1]), dtype)
            if mef.any():
                surf_arrays["mrt_eps_f"] = row(mef)
            if meb.any():
                surf_arrays["mrt_eps_b"] = row(meb)
        part_surf_arrays.append(surf_arrays)
        # Zone one-hots, both orientations: [W, ZB] for the reduce dots and
        # [ZB, W] for the temperature gathers (M=1 matmuls both ways — the
        # matrix-vector form has a ~10x slower Mosaic lowering).  A face that
        # never bounds a zone in this part contributes nothing: skip its
        # arrays (and, statically, its dots) entirely.
        oh_f = slice_oh(bb.front_oh, lo, w)
        oh_b = slice_oh(bb.back_oh, lo, w)

        def _t(oh):
            return np.ascontiguousarray(
                oh.reshape(NB, w, oh.shape[-1]).transpose(0, 2, 1).reshape(-1, w)
            )

        aux = {}
        if bool(oh_f.any()):
            aux["front_oh"] = oh_f
            aux["front_ohT"] = _t(oh_f)
        if bool(oh_b.any()):
            aux["back_oh"] = oh_b
            aux["back_ohT"] = _t(oh_b)
        if bb.shade is not None:
            # In-run zone shading: the controlling-zone gather one-hot plus
            # the tau/setpoint lane rows — only for parts that actually hold
            # a controlled pane (other parts trace zero shading ops).
            sh_oh = slice_oh(bb.shade[0], lo, w)
            if bool(sh_oh.any()):
                surf_arrays["shade_tau"] = row(
                    np.asarray(slice_vec(bb.shade[1], lo, w), dtype)
                )
                surf_arrays["shade_sp"] = row(
                    np.asarray(slice_vec(bb.shade[2], lo, w), dtype)
                )
                aux["shade_ohT"] = _t(sh_oh)
        part_oh.append(aux)

    part_node_names = [list(d) for d in part_node_arrays]
    part_surf_names = [list(d) for d in part_surf_arrays]
    part_aux_names = [list(d) for d in part_oh]
    # Parts holding zone-shading-controlled panes; with scheduled_shade_sp
    # each gets one extra per-hour operand (the setpoint-override series).
    shaded_set = frozenset(
        pi for pi in range(n_parts) if "shade_ohT" in part_aux_names[pi]
    )
    hour_op_names = [
        ["sol_front", "sol_back", "ir_front", "ir_back"]
        + (["shade_sp_xs"] if scheduled_shade_sp and pi in shaded_set else [])
        for pi in range(n_parts)
    ]
    return SimpleNamespace(
        parts_meta=parts_meta, n_parts=n_parts, part_sbs=part_sbs,
        part_node_arrays=part_node_arrays,
        part_surf_arrays=part_surf_arrays, part_oh=part_oh,
        part_node_names=part_node_names,
        part_surf_names=part_surf_names, part_aux_names=part_aux_names,
        shaded_set=shaded_set, hour_op_names=hour_op_names,
    )


def make_hour_march(
    bb: BlockedBuilding,
    substeps: int = None,
    interpret: bool = False,
    mode: str = "parity",
    hours: int = 1,
    grid_blocks: int = None,
    collect_bad: bool = False,
    collect_hq: bool = False,
    scheduled_setpoints: bool = False,
    collect_operative: bool = False,
    scheduled_shade_sp: bool = False,
    refresh_every: int = None,
    vmem_limit_mb: float = None,
):
    """Build the jitted hour-march: (T, zT_blocked, hour_inputs) -> updated.

    hour_inputs = (t_out[hours*sub], wind[hours*sub], wdir[hours*sub],
    sol_front[hours, SP], sol_back[hours, SP], ir_front[hours, SP],
    ir_back[hours, SP], a_extra[hours, n_blocks, ZB],
    b_extra[hours, n_blocks, ZB]) — with ``hours == 1`` the leading hour
    axis may be omitted on every leaf.

    mode="parity" runs the reference-parity sub-step physics at the
    stability-dictated sub-step count; mode="trbdf2" runs the implicit fast
    mode (heatx.engine.implicit) at ``substeps`` (default 12) sub-steps/hour
    with coefficients frozen per hour; mode="trbdf2_refresh" is the same
    scheme with the coefficients and stage factorizations re-evaluated
    every ``refresh_every`` sub-steps (default 1 = every sub-step, the
    parity coefficient cadence; k>1 is the hybrid cadence — PERF.md's
    cadence ablation measures the accuracy/cost trade).

    ``hours > 1`` marches that many consecutive hours per kernel invocation:
    one pallas_call costs a fixed ~0.7 ms/block in launch + HBM streaming of
    the building arrays regardless of sub-step count, so amortizing it over a
    day (hours=24) is what makes the fast mode fast.

    When the blocked layout carries a node-height split, the kernel marches
    each block as two sub-batches (short lanes at their own node height) —
    the interface stays full-width [N, SP]; slicing/reassembly happens in the
    jitted wrapper outside the kernel.

    ``grid_blocks`` (default: all blocks) sizes the *per-call* grid — used by
    the sharded path, which builds the call for n_blocks/n_devices blocks and
    runs it per device under ``shard_map`` (blocks are zone-closed, so the
    kernel shards embarrassingly over the block axis).  The returned function
    carries ``param_axes`` ("lane" / "row" per params entry) describing which
    axis of each static operand is the block axis.

    ``collect_bad`` appends a per-hour non-finite count ``[hours, NBl]`` to
    the outputs (one masked reduce over node temps + zone temps at each hour
    boundary) — the fused-path analogue of the reference's per-sub-step NaN
    asserts (model.rs:416-419), giving the caller fail-fast with hour/block
    resolution without leaving the kernel.  ``collect_hq`` appends the
    per-hour h/q history ``4 x [hours, SPl]`` (post-hour front/back
    convection coefficient and convective flux — the reference's observable
    state channels, surface_trait.rs:223-354), accumulated with the same
    one-hot-row trick as the zone history.  ``collect_operative`` appends
    the per-hour operative-temperature history ``[hours, NBl, ZB]``
    (``(T_air + T_mrt)/2`` with the Carroll zone MRT solved from each
    hour's final state — step.run(collect_operative=True) at kernel speed;
    requires the blocked building's MRT statics,
    ``block_building(mrt_statics=True)``).

    In-run zone-state window shading (``bb.shade``, engine.step.
    apply_zone_shading) runs in-kernel: each hour starts by scaling the
    controlled panes' incident front solar by the device transmittance
    wherever the controlling zone's carry temperature exceeds the setpoint
    — one kernel "hour" is one MAIN step (``substeps`` sub-steps of the
    main-step dt), so this is exactly the XLA integrators' per-main-step
    cadence.  ``scheduled_shade_sp=True`` appends an optional trailing
    ``shade_sp [hours, SP]`` hour-input overriding the compiled setpoints
    (schedule AND-gates pass +1e9 on blocked hours).

    In-run ventilation temperature gates (``bb.vent``, engine.step.
    apply_vent_gates) also run in-kernel: the hour-input tuple grows
    three zone-row leaves after ``b_extra`` — ``a_vent``/``b_vent``
    ([hours, n_blocks, ZB] gated ventilation A/B terms, with the
    weather-only outdoor/wind gates pre-applied host-side as zero rows)
    and ``vent_thr`` (the delta-gate threshold, vent_delta + hour-mean
    outdoor temperature) — and each hour adds them to a_extra/b_extra
    only where the carry zone temperature passes the indoor gates.
    """
    if mode not in ("parity", "trbdf2", "trbdf2_refresh"):
        raise ValueError(f"unknown hour-kernel mode {mode!r}")
    if refresh_every is not None and mode != "trbdf2_refresh":
        raise ValueError(
            "refresh_every only applies to mode='trbdf2_refresh' "
            f"(got mode={mode!r})"
        )
    if refresh_every is not None:
        k_subs = substeps or 12
        if refresh_every < 1 or k_subs % refresh_every:
            raise ValueError(
                f"refresh_every {refresh_every} must divide substeps {k_subs}"
            )
    if collect_operative and bb.mrt_eps is None:
        raise ValueError(
            "collect_operative needs the blocked Carroll statics: build "
            "with block_building(..., mrt_statics=True) (automatic when "
            "config.interior_mrt is set)"
        )
    if scheduled_setpoints and bb.ctl is None:
        raise ValueError(
            "scheduled_setpoints requires setpoint-driven HVAC "
            "(IdealHeaterCooler with heat_setpoint/cool_setpoint)"
        )
    if scheduled_shade_sp and bb.shade is None:
        raise ValueError(
            "scheduled_shade_sp requires in-run zone-shading controls "
            "(BuildingModel.add_zone_shading)"
        )
    if mode == "parity":
        if bb.config.nomass_fixed_iters is None and bb.surfaces.has_nomass:
            if os.environ.get("HEATX_KERNEL_WHILE", "0") != "1":
                raise ValueError(
                    "the parity hour kernel requires config.nomass_fixed_iters"
                    " (data-dependent while_loop in the fused pipeline is"
                    " experimental: set HEATX_KERNEL_WHILE=1 to try the exact"
                    " adaptive loop in-kernel)"
                )
        substeps = substeps or bb.base.dt_subdivisions
        dt = bb.base.dt
    else:
        substeps = substeps or 12
        dt = 3600.0 / (bb.base.n_steps_per_hour * substeps)
    dtype = bb.config.dtype
    N = bb.max_nodes
    SB = bb.block_size
    ZB = bb.zones_per_block
    NB = bb.n_blocks  # global block count (shapes of the static params)
    SP = NB * SB
    NBl = grid_blocks or NB  # per-call grid (local block count when sharded)
    SPl = NBl * SB
    if NB % NBl != 0:
        raise ValueError(f"grid_blocks {NBl} must divide n_blocks {NB}")

    pp = _prep_parts(bb, dtype, scheduled_shade_sp)
    parts_meta, n_parts = pp.parts_meta, pp.n_parts
    part_sbs = pp.part_sbs
    part_node_arrays = pp.part_node_arrays
    part_surf_arrays = pp.part_surf_arrays
    part_oh = pp.part_oh
    part_node_names = pp.part_node_names
    part_surf_names = pp.part_surf_names
    part_aux_names = pp.part_aux_names
    shaded_set = pp.shaded_set
    hour_op_names = pp.hour_op_names

    def kernel(*refs):
        i = 0
        r_shared = {}
        for name in ["t_out", "wind", "wdir"]:
            r_shared[name] = refs[i]
            i += 1
        r_parts = []
        for pi in range(n_parts):
            rp = {}
            for name in part_node_names[pi]:
                rp[name] = refs[i]
                i += 1
            for name in part_surf_names[pi]:
                rp[name] = refs[i]
                i += 1
            for name in part_aux_names[pi]:
                rp[name] = refs[i]
                i += 1
            r_parts.append(rp)
        r_shared["zone_volume"] = refs[i]
        i += 1
        if bb.mix_wt is not None:
            r_shared["mix_wt"] = refs[i]
            i += 1
        if bb.ctl is not None:
            for nm in ("ctl_heat", "ctl_cool", "ctl_mxh", "ctl_mxc"):
                r_shared[nm] = refs[i]
                i += 1
        if bb.vent is not None:
            for nm in ("vent_min", "vent_max"):
                r_shared[nm] = refs[i]
                i += 1
        for pi in range(n_parts):
            for name in hour_op_names[pi]:
                r_parts[pi][name] = refs[i]
                i += 1
        r_shared["a_extra"] = refs[i]
        r_shared["b_extra"] = refs[i + 1]
        i += 2
        if bb.vent is not None:
            # Gated ventilation A/B terms + the delta-gate threshold rows
            # (vent_delta + hour-mean outdoor temperature, folded host-side).
            for nm in ("a_vent", "b_vent", "vent_thr"):
                r_shared[nm] = refs[i]
                i += 1
        if scheduled_setpoints:
            # Per-hour setpoint schedules override the compiled ctl rows.
            r_shared["sp_heat"] = refs[i]
            r_shared["sp_cool"] = refs[i + 1]
            i += 2
        for pi in range(n_parts):
            r_parts[pi]["T0"] = refs[i]
            i += 1
        r_shared["zT0"] = refs[i]
        i += 1
        t_out_refs = [refs[i + pi] for pi in range(n_parts)]
        i += n_parts
        zt_out_ref = refs[i]
        i += 1
        hq_refs = []
        for pi in range(n_parts):
            hq_refs.append(refs[i : i + 4])
            i += 4
        zt_hist_ref = refs[i]
        i += 1
        hq_hist_refs = []
        if collect_hq:
            for pi in range(n_parts):
                hq_hist_refs.append(refs[i : i + 4])
                i += 4
        bad_ref = None
        if collect_bad:
            bad_ref = refs[i]
            i += 1
        ld_hist_ref = None
        if bb.ctl is not None:
            ld_hist_ref = refs[i]
            i += 1
        top_hist_ref = None
        if collect_operative:
            top_hist_ref = refs[i]
            i += 1
        scratch = refs[i:]

        from heatx.ops import tridiag as _td

        # Default solver: PCR when compiled (fastest on hardware, PERF.md),
        # pre-factored Thomas under interpret mode — the multi-device
        # interpret path (8 virtual CPU devices under shard_map) produces
        # NONDETERMINISTIC results with the PCR stage solves (reproduced
        # 5/5 runs PCR vs 0/5 Thomas; root cause in the interpret machinery,
        # not the math — both solvers agree to fp noise when it does run
        # correctly).  HEATX_KERNEL_SOLVER overrides either way.
        _solver_kind = os.environ.get(
            "HEATX_KERNEL_SOLVER", "thomas" if interpret else "pcr"
        )
        # Must agree with use_loop_thomas below (the scratch-shape decision).
        if os.environ.get("HEATX_KERNEL_LOOP", "0") == "1" and n_parts == 1:
            # Scratch-ref Thomas: loop-form fallback (small Mosaic MLIR) in
            # case a bigger kernel ever overwhelms the Mosaic compiler.
            solver = _make_ref_thomas(*scratch, N)
        elif _solver_kind == "pcr":
            # Parallel cyclic reduction: log2(N) full-width sweeps, no
            # sequential row chain.  After the node-split + zone-gather fixes
            # the solve dominates the parity kernel, and PCR measures ~20%
            # faster end-to-end than the unrolled Thomas (PERF.md).
            solver = _td.solve_pcr
        else:
            solver = _td.solve  # fully unrolled Thomas

        # Per-part static SurfaceBatch values rebuilt from refs.
        part_vals = []
        for pi, (rows, lo, w) in enumerate(parts_meta):
            rp = r_parts[pi]
            psb = part_sbs[pi]
            if psb.has_cavity:
                gp = gas.GasProps(
                    rp["cav_k0"][...], rp["cav_k1"][...], rp["cav_mu0"][...],
                    rp["cav_mu1"][...], rp["cav_cp0"][...], rp["cav_cp1"][...],
                    rp["cav_mass"][...],
                )
                cav = dict(
                    seg_is_cavity=rp["seg_is_cavity"][...],
                    cav_thickness=rp["cav_thickness"][...],
                    cav_height=rp["cav_height"][...],
                    cav_angle=rp["cav_angle"][...],
                    cav_ein=rp["cav_ein"][...],
                    cav_eout=rp["cav_eout"][...],
                )
            else:
                gp = gas.GasProps(*([jnp.zeros((rows, w), dtype)] * 7))
                zeros_n = jnp.zeros((rows, w), dtype)
                cav = dict(
                    seg_is_cavity=jnp.zeros((rows, w), bool),
                    cav_thickness=zeros_n,
                    cav_height=zeros_n,
                    cav_angle=zeros_n,
                    cav_ein=zeros_n,
                    cav_eout=zeros_n,
                )
            sb_vals = replace(
                psb,
                node_mask=rp["node_mask"][...],
                mass=rp["mass"][...],
                massive=rp["massive"][...],
                seg_u=rp["seg_u"][...],
                cav_gas=gp,
                **cav,
                same_chunk=rp["same_chunk"][...],
                nomass_chunk_id=rp["nomass_chunk_id"][...],
                nomass_chunk_count=rp["chunk_count"][...],
                front_alphas=rp["front_alphas"][...],
                back_alphas=rp["back_alphas"][...],
                area=rp["area"][0],
                perimeter=rp["perimeter"][0],
                # border_conditions accepts the normal as an (nx, ny) tuple on
                # the kernel path (no [W, 2] relayout in VMEM).
                normal=(rp["normal_x"][0], rp["normal_y"][0]),
                cos_tilt=rp["cos_tilt"][0],
                wind_mod=rp["wind_mod"][0],
                eps_front=rp["eps_front"][0],
                eps_back=rp["eps_back"][0],
                rf=rp["rf"][0],
                front_code=rp["front_code"][0],
                front_temp=rp["front_temp"][0],
                back_code=rp["back_code"][0],
                back_temp=rp["back_temp"][0],
                fixed_h_front=rp["fixed_h_front"][0],
                fixed_h_back=rp["fixed_h_back"][0],
            )
            part_vals.append((sb_vals, rp))

        # flush_tiny off: the TPU flushes subnormals in hardware in-kernel.
        cfg = bb.config.replace(kernel_mode=True, flush_tiny=False)
        if mode == "parity":
            body = _hour_body
        else:
            from functools import partial as _partial

            body = _partial(
                _hour_body_imp,
                refresh_h=(mode == "trbdf2_refresh"),
                refresh_every=(
                    refresh_every if mode == "trbdf2_refresh" else None
                ),
            )

        def one_hour(h, Ts, zT):
            hs = pl.ds(h, 1)
            parts = []
            for pi, (sb_vals, rp) in enumerate(part_vals):
                names = part_aux_names[pi]
                snames = part_surf_names[pi]
                sol_front = rp["sol_front"][hs, :][0]
                if pi in shaded_set:
                    # In-run zone shading (engine.step.apply_zone_shading):
                    # scale the controlled panes' incident front solar by
                    # the device transmittance wherever the controlling
                    # zone's temperature AT MAIN-STEP START (the carry zT —
                    # one kernel "hour" is one main step) exceeds the
                    # setpoint.  Uncontrolled lanes: t_ctl 0, sp +1e9,
                    # tau 1 — the multiply is a bit-exact no-op.
                    t_ctl = jnp.dot(
                        zT, rp["shade_ohT"][...], preferred_element_type=dtype
                    )[0]
                    sp_row = (
                        rp["shade_sp_xs"][hs, :][0]
                        if scheduled_shade_sp
                        else rp["shade_sp"][0]
                    )
                    sol_front = sol_front * jnp.where(
                        t_ctl > sp_row, rp["shade_tau"][0], jnp.asarray(1.0, dtype)
                    )
                parts.append(
                    SimpleNamespace(
                        sb=sb_vals,
                        front_any="front_oh" in names,
                        back_any="back_oh" in names,
                        front_oh=rp["front_oh"][...] if "front_oh" in names else None,
                        back_oh=rp["back_oh"][...] if "back_oh" in names else None,
                        front_ohT=rp["front_ohT"][...] if "front_ohT" in names else None,
                        back_ohT=rp["back_ohT"][...] if "back_ohT" in names else None,
                        mrt_ef=rp["mrt_eps_f"][0] if "mrt_eps_f" in snames else None,
                        mrt_eb=rp["mrt_eps_b"][0] if "mrt_eps_b" in snames else None,
                        sol_front=sol_front,
                        sol_back=rp["sol_back"][hs, :][0],
                        ir_front=rp["ir_front"][hs, :][0],
                        ir_back=rp["ir_back"][hs, :][0],
                    )
                )
            a_row = r_shared["a_extra"][pl.ds(h, 1), :]
            b_row = r_shared["b_extra"][pl.ds(h, 1), :]
            if bb.vent is not None:
                # In-run ventilation temperature gates (engine.step.
                # apply_vent_gates): include this hour's ventilation A/B
                # terms only where the indoor gates pass, evaluated from
                # the carry zone temperature AT MAIN-STEP START (one kernel
                # "hour" is one main step — the XLA integrators' exact
                # previous-timestep cadence).  The weather-only outdoor/
                # wind gates and the hour-mean outdoor temperature of the
                # delta threshold are pre-applied host-side (zero rows /
                # vent_thr), so uncontrolled zones add exactly 0.0.
                on = (
                    (zT > r_shared["vent_min"][...][0:1])
                    & (zT < r_shared["vent_max"][...][0:1])
                    & (zT > r_shared["vent_thr"][pl.ds(h, 1), :])
                )
                zero = jnp.asarray(0.0, dtype)
                a_row = a_row + jnp.where(
                    on, r_shared["a_vent"][pl.ds(h, 1), :], zero
                )
                b_row = b_row + jnp.where(
                    on, r_shared["b_vent"][pl.ds(h, 1), :], zero
                )
            return body(
                cfg,
                parts,
                r_shared["zone_volume"][...][0:1],
                a_row,
                b_row,
                r_shared["t_out"],
                r_shared["wind"],
                r_shared["wdir"],
                Ts,
                zT,
                substeps,
                dt,
                solver=solver,
                off=h * substeps,
                mix_wt=(
                    r_shared["mix_wt"][...] if "mix_wt" in r_shared else None
                ),
                ctl=(
                    (
                        (
                            r_shared["sp_heat"][pl.ds(h, 1), :],
                            r_shared["sp_cool"][pl.ds(h, 1), :],
                        )
                        if scheduled_setpoints
                        else (
                            r_shared["ctl_heat"][...][0:1],
                            r_shared["ctl_cool"][...][0:1],
                        )
                    )
                    + (
                        r_shared["ctl_mxh"][...][0:1],
                        r_shared["ctl_mxc"][...][0:1],
                    )
                    if bb.ctl is not None
                    else None
                ),
            )

        T0s = tuple(rp["T0"][...] for _, rp in part_vals)
        zT0 = r_shared["zT0"][...][0:1]  # [1, ZB] row (rank-2, see _boundary_temps)
        HR8 = zt_hist_ref.shape[0]  # hours padded to the 8-row sublane tile
        hour_row_iota = jax.lax.broadcasted_iota(jnp.int32, (HR8, 1), 0)

        if collect_operative:
            # Light per-part views for the hour-boundary Carroll MRT solve
            # (the comfort observable, step.run(collect_operative=True)):
            # statics + one-hots + effective emissivities, no weather.
            op_parts = []
            for pi, (sb_vals, rp) in enumerate(part_vals):
                names = part_aux_names[pi]
                snames = part_surf_names[pi]
                op_parts.append(
                    SimpleNamespace(
                        sb=sb_vals,
                        front_oh=rp["front_oh"][...] if "front_oh" in names else None,
                        back_oh=rp["back_oh"][...] if "back_oh" in names else None,
                        front_ohT=rp["front_ohT"][...] if "front_ohT" in names else None,
                        back_ohT=rp["back_ohT"][...] if "back_ohT" in names else None,
                        mrt_ef=rp["mrt_eps_f"][0] if "mrt_eps_f" in snames else None,
                        mrt_eb=rp["mrt_eps_b"][0] if "mrt_eps_b" in snames else None,
                    )
                )
            # A second (per-invocation, masks-only) statics evaluation:
            # the hour bodies build theirs inside the hours loop, so
            # threading them out would mean widening every body's return
            # for work that amortizes over hours x sub-steps.
            op_statics = [
                surf_mod.compute_statics(sb_vals) for sb_vals, _ in part_vals
            ]

            def op_temp(Ts, zT):
                """Operative temperature [1, ZB] from an hour's final state:
                zone-air-initialized 4-iteration MRT solve, then
                (T_air + T_mrt)/2 (engine.surface.zone_mrt semantics)."""
                tfbs = []
                for p in op_parts:
                    z = jnp.zeros_like(p.sb.area)
                    tf = (
                        jnp.dot(zT, p.front_ohT, preferred_element_type=dtype)[0]
                        if p.front_ohT is not None else z
                    )
                    tb = (
                        jnp.dot(zT, p.back_ohT, preferred_element_type=dtype)[0]
                        if p.back_ohT is not None else z
                    )
                    tfbs.append((tf, tb))
                _, tm = _mrt_context(op_parts, op_statics, Ts, tfbs, zT, dtype)
                return (zT + tm) / 2.0

        # Explicitly typed 0/1 constants: Python-float literals are
        # weak-typed and resolve to float64 under jax_enable_x64, which
        # would silently promote an f32 building's fori-loop history
        # carries (dtype-mismatch error on the scan/fori carry).
        zero_d = jnp.asarray(0.0, dtype)
        one_d = jnp.asarray(1.0, dtype)

        def row_mask(h):
            return jnp.where(hour_row_iota == h, one_d, zero_d)

        def bad_count(Ts, zT):
            # Non-finite values in the current state, one scalar.  Nested
            # wheres (no bool arithmetic — the i1->f32 vector casts
            # miscompile under Mosaic).
            bad = jnp.sum(jnp.where(jnp.isfinite(zT), zero_d, one_d))
            for (sb_vals, _), T in zip(part_vals, Ts):
                bad = bad + jnp.sum(
                    jnp.where(
                        sb_vals.node_mask,
                        jnp.where(jnp.isfinite(T), zero_d, one_d),
                        zero_d,
                    )
                )
            return bad

        hq_hists0 = (
            [
                tuple(jnp.zeros((HR8, parts_meta[pi][2]), dtype) for _ in range(4))
                for pi in range(n_parts)
            ]
            if collect_hq
            else None
        )
        bad_hist0 = (
            jnp.zeros((HR8, zT0.shape[-1]), dtype) if collect_bad else None
        )
        top_hist0 = (
            jnp.zeros((HR8, zT0.shape[-1]), dtype) if collect_operative else None
        )

        def post_hour(h, hqs, zT, Ts, hq_hists, bad_hist, top_hist):
            rm = row_mask(h)
            if collect_hq:
                hq_hists = [
                    tuple(acc + hqs[pi][k][None, :] * rm for k, acc in enumerate(part_acc))
                    for pi, part_acc in enumerate(hq_hists)
                ]
            if collect_bad:
                bad_hist = bad_hist + bad_count(Ts, zT) * rm
            if collect_operative:
                top_hist = top_hist + op_temp(Ts, zT) * rm
            return hq_hists, bad_hist, top_hist

        ideal = bb.ctl is not None
        ld_hist0 = jnp.zeros((HR8, zT0.shape[-1]), dtype) if ideal else None
        if hours == 1:
            Ts, zT, hqs, ld = one_hour(0, T0s, zT0)
            zt_hist = zT * row_mask(0)
            ld_hist = ld * row_mask(0) if ideal else None
            hq_hists, bad_hist, top_hist = post_hour(
                0, hqs, zT, Ts, hq_hists0, bad_hist0, top_hist0
            )
        else:
            hq0 = tuple(
                tuple(jnp.zeros((parts_meta[pi][2],), dtype) for _ in range(4))
                for pi in range(n_parts)
            )
            hist0 = jnp.zeros((HR8, zT0.shape[-1]), dtype)

            def hour_loop(h, carry):
                Ts, zT, _, hist, hq_hists, bad_hist, ld_hist, top_hist = carry
                Ts, zT, hqs, ld = one_hour(h, Ts, zT)
                # Post-hour zone temps, accumulated via a one-hot row
                # (stores with a dynamic sublane offset also lower, but the
                # masked add keeps the loop body store-free).
                hist = hist + zT * row_mask(h)
                if ideal:
                    ld_hist = ld_hist + ld * row_mask(h)
                hq_hists, bad_hist, top_hist = post_hour(
                    h, hqs, zT, Ts, hq_hists, bad_hist, top_hist
                )
                return (Ts, zT, hqs, hist, hq_hists, bad_hist, ld_hist, top_hist)

            (
                Ts, zT, hqs, zt_hist, hq_hists, bad_hist, ld_hist, top_hist
            ) = jax.lax.fori_loop(
                0, hours, hour_loop,
                (T0s, zT0, hq0, hist0, hq_hists0, bad_hist0, ld_hist0, top_hist0),
            )
        for pi in range(n_parts):
            t_out_refs[pi][...] = Ts[pi]
            for k in range(4):
                hq_refs[pi][k][...] = hqs[pi][k][None, :]
        # Write ALL 8 sublane rows (the caller reads row 0): a partially
        # written output block leaves uninitialized memory, which under the
        # multi-device interpret path corrupts OTHER outputs
        # nondeterministically (minimized repro in PERF.md).
        zt_out_ref[...] = jnp.broadcast_to(zT, zt_out_ref.shape)
        zt_hist_ref[...] = zt_hist
        if collect_hq:
            for pi in range(n_parts):
                for k in range(4):
                    hq_hist_refs[pi][k][...] = hq_hists[pi][k]
        if collect_bad:
            bad_ref[...] = jnp.broadcast_to(bad_hist, (HR8, zT0.shape[-1]))
        if ideal:
            ld_hist_ref[...] = ld_hist
        if collect_operative:
            top_hist_ref[...] = top_hist

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def vspec(rows, w):
        return pl.BlockSpec((rows, w), lambda b: (0, b), memory_space=pltpu.VMEM)

    def oh_spec(w):
        return pl.BlockSpec((w, ZB), lambda b: (b, 0), memory_space=pltpu.VMEM)

    def ohT_spec(w):
        return pl.BlockSpec((ZB, w), lambda b: (b, 0), memory_space=pltpu.VMEM)

    def zone_spec(rows=8):
        # Zone data rides lane-major [NB*rows, ZB]: ZB is the full lane dim
        # of the array (allowed by Mosaic) and rows are padded to the 8-row
        # sublane tile; row 0 carries the data for single-row operands.
        return pl.BlockSpec((rows, ZB), lambda b: (b, 0), memory_space=pltpu.VMEM)

    HR8 = ((hours + 7) // 8) * 8

    def _pad_zone_rows(a, rows):
        # [NB, k, ZB] -> [NB*rows, ZB] with k rows of data, rest zero
        a = np.asarray(a)
        out = np.zeros((NB, rows, ZB), a.dtype)
        out[:, : a.shape[1]] = a
        return out.reshape(NB * rows, ZB)

    in_specs = [smem, smem, smem]
    params = []
    param_axes = []  # block axis of each params entry: "lane" or "row"
    param_index = {}  # (part, field name) -> position in params (callers
    # swap building leaves between dispatches, e.g. seasonal ground temps)
    for pi, (rows, lo, w) in enumerate(parts_meta):
        for name in part_node_names[pi]:
            a = part_node_arrays[pi][name]
            in_specs.append(vspec(a.shape[0], w))
            param_index[(pi, name)] = len(params)
            params.append(jnp.asarray(a))
            param_axes.append("lane")
        for name in part_surf_names[pi]:
            a = part_surf_arrays[pi][name]
            in_specs.append(vspec(a.shape[0], w))
            param_index[(pi, name)] = len(params)
            params.append(jnp.asarray(a))
            param_axes.append("lane")
        for name in part_aux_names[pi]:
            in_specs.append(ohT_spec(w) if name.endswith("ohT") else oh_spec(w))
            params.append(jnp.asarray(part_oh[pi][name], dtype))
            param_axes.append("row")
    in_specs.append(zone_spec())  # zone_volume
    params.append(
        jnp.asarray(
            _pad_zone_rows(bb.zone_volume.reshape(NB, 1, ZB), 8), dtype
        )
    )
    param_axes.append("row")
    if bb.mix_wt is not None:
        in_specs.append(zone_spec(ZB))  # block-local mixing matrix
        params.append(jnp.asarray(bb.mix_wt, dtype))
        param_axes.append("row")
    ctl_param_base = len(params)  # index of the ctl heat_sp row in params
    if bb.ctl is not None:
        for arr in bb.ctl:  # thermostat heat_sp / cool_sp / max_heat / max_cool
            in_specs.append(zone_spec())
            params.append(
                jnp.asarray(_pad_zone_rows(np.asarray(arr).reshape(NB, 1, ZB), 8), dtype)
            )
            param_axes.append("row")
    if bb.vent is not None:
        for arr in bb.vent:  # vent gate min/max indoor-temperature rows
            in_specs.append(zone_spec())
            params.append(
                jnp.asarray(_pad_zone_rows(np.asarray(arr).reshape(NB, 1, ZB), 8), dtype)
            )
            param_axes.append("row")
    for pi, (rows, lo, w) in enumerate(parts_meta):
        # sol_f, sol_b, ir_f, ir_b (+ the shade-setpoint series on
        # scheduled-shading parts)
        in_specs += [vspec(hours, w)] * len(hour_op_names[pi])
    in_specs += [zone_spec(HR8), zone_spec(HR8)]  # a_extra, b_extra
    if bb.vent is not None:
        # a_vent, b_vent, vent_thr per-hour zone rows
        in_specs += [zone_spec(HR8)] * 3
    if scheduled_setpoints:
        in_specs += [zone_spec(HR8), zone_spec(HR8)]  # heat_sp, cool_sp series
    for rows, lo, w in parts_meta:
        in_specs.append(vspec(rows, w))  # T0
    in_specs.append(zone_spec())  # zT0

    out_specs = []
    out_shape = []
    for rows, lo, w in parts_meta:
        out_specs.append(vspec(rows, w))
        out_shape.append(jax.ShapeDtypeStruct((rows, NBl * w), dtype))
    out_specs.append(zone_spec())
    out_shape.append(jax.ShapeDtypeStruct((NBl * 8, ZB), dtype))
    for rows, lo, w in parts_meta:
        out_specs += [vspec(1, w)] * 4
        out_shape += [jax.ShapeDtypeStruct((1, NBl * w), dtype)] * 4
    out_specs.append(zone_spec(HR8))
    out_shape.append(jax.ShapeDtypeStruct((NBl * HR8, ZB), dtype))
    if collect_hq:
        for rows, lo, w in parts_meta:
            out_specs += [vspec(HR8, w)] * 4
            out_shape += [jax.ShapeDtypeStruct((HR8, NBl * w), dtype)] * 4
    if collect_bad:
        out_specs.append(zone_spec(HR8))
        out_shape.append(jax.ShapeDtypeStruct((NBl * HR8, ZB), dtype))
    if bb.ctl is not None:  # per-hour mean ideal-load history
        out_specs.append(zone_spec(HR8))
        out_shape.append(jax.ShapeDtypeStruct((NBl * HR8, ZB), dtype))
    if collect_operative:  # per-hour operative-temperature history
        out_specs.append(zone_spec(HR8))
        out_shape.append(jax.ShapeDtypeStruct((NBl * HR8, ZB), dtype))

    # Scratch only serves the single-part loop-Thomas fallback; skip the
    # allocation when unused — uninitialized interpret-mode buffers corrupt
    # other outputs under multi-device shard_map (PERF.md repro).
    # Must agree with the in-kernel solver selection above (both read
    # HEATX_KERNEL_LOOP at trace time).
    use_loop_thomas = (
        os.environ.get("HEATX_KERNEL_LOOP", "0") == "1" and n_parts == 1
    )
    scratch_shapes = (
        [pltpu.VMEM((N, SB), dtype) for _ in range(5)] if use_loop_thomas else []
    )

    # Optional raised scoped-VMEM ceiling (``vmem_limit_mb`` argument, env
    # override HEATX_KERNEL_VMEM_MB): the many-block compile rejection at
    # very large grids was the compiler's default scoped-VMEM heuristic —
    # measured round 4 at 100k surfaces, raising the limit to 100 MB admits
    # block 2048 (49 blocks) and 4096 (27 blocks) cleanly where the stock
    # limit rejects both (PERF.md).  Off by default: the stock limit is
    # right for the common shapes, and bench.py's probe retries a rejected
    # block size at 100 MB before halving, recording what actually ran.
    call_kw = {}
    vmem_mb = os.environ.get("HEATX_KERNEL_VMEM_MB") or vmem_limit_mb
    if vmem_mb and not interpret:
        call_kw["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=int(float(vmem_mb) * 1024 * 1024)
        )
    call = pl.pallas_call(
        kernel,
        grid=(NBl,),
        out_shape=tuple(out_shape),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        **call_kw,
    )

    # Building operands are returned to the caller and passed per call, so a
    # jit around hour_march keeps them as parameters, not baked constants.
    params = tuple(params)

    def _lane_split(a, rows, lo, w):
        """[k, SP] -> [min(k, rows), NB*w] on device (outside the kernel)."""
        k = a.shape[0]
        v = a.reshape(k, NBl, SB)[: min(k, rows), :, lo : lo + w]
        return v.reshape(v.shape[0], NBl * w)

    def hour_march(params, T, zT_blocked, hour_inputs):
        # Optional trailing extras, parsed back-to-front: the zone-shading
        # setpoint series [hours, SP] (scheduled_shade_sp), then the
        # heat/cool setpoint pair (scheduled_setpoints).  Either may be
        # omitted; defaults broadcast from the compiled params.
        hour_inputs = tuple(hour_inputs)
        # Base tuple: 9 leaves, +3 with vent gates (a_vent, b_vent,
        # vent_thr follow b_extra).
        n_base = 12 if bb.vent is not None else 9
        shade_xs = None
        if scheduled_shade_sp and len(hour_inputs) in (n_base + 1, n_base + 3):
            shade_xs = hour_inputs[-1].reshape(hours, SPl)
            hour_inputs = hour_inputs[:-1]
        vent_xs = None
        if bb.vent is not None:
            if len(hour_inputs) < n_base:
                raise ValueError(
                    "vent-gated kernels take the 12-leaf hour-input tuple "
                    "(..., a_extra, b_extra, a_vent, b_vent, vent_thr)"
                )
            vent_xs = hour_inputs[9:12]
            hour_inputs = hour_inputs[:9] + hour_inputs[12:]
        if scheduled_setpoints and len(hour_inputs) == 11:
            (t_o, wnd, wdr, sol_f, sol_b, ir_f, ir_b, a_extra, b_extra,
             sp_heat, sp_cool) = hour_inputs
        else:
            (t_o, wnd, wdr, sol_f, sol_b, ir_f, ir_b, a_extra, b_extra) = hour_inputs
            if scheduled_setpoints:
                # Default: the compiled per-zone setpoints, hour-constant —
                # read from the PARAMS argument (never the closure: params
                # may be updated/sharded by the caller; repo convention).
                def ctl_rows(k):
                    p = params[ctl_param_base + k]
                    return jnp.broadcast_to(
                        p.reshape(-1, 8, ZB)[None, :, 0], (hours, NBl, ZB)
                    )

                sp_heat = ctl_rows(0)
                sp_cool = ctl_rows(1)
        sol_f = sol_f.reshape(hours, SPl)
        sol_b = sol_b.reshape(hours, SPl)
        ir_f = ir_f.reshape(hours, SPl)
        ir_b = ir_b.reshape(hours, SPl)
        operands = [
            t_o.reshape(hours * substeps).astype(dtype),
            wnd.reshape(hours * substeps).astype(dtype),
            wdr.reshape(hours * substeps).astype(dtype),
        ]
        operands += list(params)
        for pi, (rows, lo, w) in enumerate(parts_meta):
            for a in (sol_f, sol_b, ir_f, ir_b):
                operands.append(_lane_split(a, hours, lo, w))
            if scheduled_shade_sp and pi in shaded_set:
                if shade_xs is not None:
                    operands.append(_lane_split(shade_xs, hours, lo, w))
                else:
                    # Default: the compiled per-pane setpoints, hour-constant
                    # (read from the PARAMS argument, repo convention).
                    p = params[param_index[(pi, "shade_sp")]]
                    operands.append(jnp.broadcast_to(p, (hours, p.shape[1])))
        def gains_rows(a):
            # [hours, NB, ZB] -> [NB*HR8, ZB] (hour rows grouped per block,
            # padded to the 8-row sublane tile)
            a = jnp.moveaxis(a.reshape(hours, NBl, ZB), 0, 1)
            pad = jnp.zeros((NBl, HR8 - hours, ZB), a.dtype)
            return jnp.concatenate([a, pad], axis=1).reshape(NBl * HR8, ZB)

        def zone_rows(a):
            # [NB, ZB] -> [NB*8, ZB], data in row 0 of each block
            a = a.reshape(NBl, 1, ZB)
            pad = jnp.zeros((NBl, 7, ZB), a.dtype)
            return jnp.concatenate([a, pad], axis=1).reshape(NBl * 8, ZB)

        operands += [gains_rows(a_extra), gains_rows(b_extra)]
        if vent_xs is not None:
            operands += [gains_rows(x.astype(dtype)) for x in vent_xs]
        if scheduled_setpoints:
            operands += [
                gains_rows(sp_heat.astype(dtype)),
                gains_rows(sp_cool.astype(dtype)),
            ]
        for rows, lo, w in parts_meta:
            operands.append(_lane_split(T, rows, lo, w))
        operands.append(zone_rows(zT_blocked.reshape(NBl, ZB).astype(dtype)))

        outs = call(*operands)
        oi = 0
        T_parts = outs[oi : oi + n_parts]
        oi += n_parts
        zT_new = outs[oi]
        oi += 1
        hq_parts = []
        for pi in range(n_parts):
            hq_parts.append(outs[oi : oi + 4])
            oi += 4
        zt_hist = outs[oi]
        oi += 1
        hqh_parts = []
        if collect_hq:
            for pi in range(n_parts):
                hqh_parts.append(outs[oi : oi + 4])
                oi += 4
        bad_out = outs[oi] if collect_bad else None
        oi += 1 if collect_bad else 0
        ld_out = outs[oi] if bb.ctl is not None else None
        oi += 1 if bb.ctl is not None else 0
        top_out = outs[oi] if collect_operative else None

        # Reassemble the full-width layout from the parts.
        T_new = jnp.zeros((N, NBl, SB), dtype)
        hq_full = [jnp.zeros((NBl, SB), dtype) for _ in range(4)]
        hqh_full = (
            [jnp.zeros((hours, NBl, SB), dtype) for _ in range(4)]
            if collect_hq
            else None
        )
        for pi, (rows, lo, w) in enumerate(parts_meta):
            T_new = T_new.at[:rows, :, lo : lo + w].set(
                T_parts[pi].reshape(rows, NBl, w)
            )
            for k in range(4):
                hq_full[k] = hq_full[k].at[:, lo : lo + w].set(
                    hq_parts[pi][k].reshape(NBl, w)
                )
                if collect_hq:
                    hqh_full[k] = hqh_full[k].at[:, :, lo : lo + w].set(
                        hqh_parts[pi][k].reshape(HR8, NBl, w)[:hours]
                    )
        T_new = T_new.reshape(N, SPl)
        hq = tuple(x.reshape(SPl) for x in hq_full)

        # [hours, NB, ZB]: zone temperature after each marched hour (the
        # reference's observable output channel, zone.rs:45-49)
        zt_hist = jnp.moveaxis(zt_hist.reshape(NBl, HR8, ZB)[:, :hours], 1, 0)
        zT_new = zT_new.reshape(NBl, 8, ZB)[:, 0]
        ret = (T_new, zT_new, hq, zt_hist)
        if collect_hq:
            # [hours, SPl] per channel: h_front, h_back, q_front, q_back
            ret = ret + (tuple(x.reshape(hours, SPl) for x in hqh_full),)
        if collect_bad:
            # [hours, NBl]: non-finite state count after each marched hour
            # (the value is lane-broadcast in the kernel; read lane 0)
            bad = bad_out.reshape(NBl, HR8, ZB)[:, :hours, 0]
            ret = ret + (jnp.moveaxis(bad, 1, 0),)
        if bb.ctl is not None:
            # [hours, NBl, ZB]: per-hour mean ideal-load power (W, heating +)
            ld = jnp.moveaxis(ld_out.reshape(NBl, HR8, ZB)[:, :hours], 1, 0)
            ret = ret + (ld,)
        if collect_operative:
            # [hours, NBl, ZB]: post-hour operative temperature
            top = jnp.moveaxis(top_out.reshape(NBl, HR8, ZB)[:, :hours], 1, 0)
            ret = ret + (top,)
        return ret

    hour_march.param_axes = tuple(param_axes)
    hour_march.param_index = param_index
    # Params position of the thermostat rows (heat_sp, cool_sp, max_heat,
    # max_cool in order; None without thermostats) — lets callers/tests
    # perturb or swap the compiled setpoint operands directly.
    hour_march.ctl_param_base = ctl_param_base if bb.ctl is not None else None
    hour_march.collect_bad = collect_bad
    hour_march.collect_hq = collect_hq
    hour_march.collect_loads = bb.ctl is not None
    hour_march.scheduled_setpoints = scheduled_setpoints
    hour_march.scheduled_shade_sp = scheduled_shade_sp
    hour_march.collect_operative = collect_operative
    return hour_march, params
