"""Fused Pallas hour-march kernel.

The XLA substep path re-reads the compiled building and the state from HBM on
every stability sub-step (~120 per hour for insulated constructions), which
caps throughput at memory bandwidth.  This kernel marches ONE HOUR of
sub-steps per invocation with everything resident in VMEM:

* the surface batch is partitioned into zone-closed blocks
  (heatx.build.blocking) — one Pallas grid cell per block;
* each cell loads its slice of the building + state once, runs all sub-steps
  in a ``fori_loop``, and writes the state back once;
* zone coupling (the only cross-surface dependency) happens in-kernel through
  small one-hot matmuls on the MXU: ``t_zone = oh @ zT`` to read boundary
  temperatures and ``a_z = (hA T) @ oh`` for the energy-balance reduction;
* per-sub-step weather rides in SMEM; per-hour gains/irradiance in VMEM.

The kernel body *reuses the engine's physics* (march_surfaces and friends are
pure jnp on node-major arrays, deliberately kept <= 2-D and free of
gather/scatter/cbrt/expm1 so they lower through Mosaic).  Reference-parity
caveats of this path: fixed no-mass iteration count (config.nomass_fixed_iters,
validated against the EnergyPlus replay suite) — everything else is the same
arithmetic as the XLA path.
"""

from __future__ import annotations

from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heatx.build.blocking import BlockedLayout, build_blocks
from heatx.build.layout import B_AMBIENT, B_OUTDOOR, B_SPACE, CompiledBuilding, SurfaceBatch
from heatx.config import SimConfig
from heatx.constants import KELVIN
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


def block_building(building: CompiledBuilding, block_size: int = 1024) -> BlockedBuilding:
    """Permute + pad a compiled building into zone-closed blocks."""
    layout = build_blocks(building, block_size=block_size)
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

    return BlockedBuilding(
        base=building,
        layout=layout,
        surfaces=new_sb,
        front_oh=layout.front_oh,
        back_oh=layout.back_oh,
        zone_volume=zone_volume,
        zone_valid=layout.zone_valid,
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


def _hour_body(
    bb: BlockedBuilding,
    sb_vals: SurfaceBatch,
    front_oh,  # [SB, ZB]
    back_oh,
    zone_volume,  # [ZB, 1]
    a_extra,  # [ZB] per-hour zone gains (hvac+lum+infiltration A-terms)
    b_extra,  # [ZB]
    sol_front,
    sol_back,
    ir_front,
    ir_back,
    t_out_arr,  # [>= off+substeps] (SMEM refs read by the caller closure)
    wind_arr,
    wdir_arr,
    T0,
    zT0,  # [ZB, 1]
    substeps: int,
    dt: float,
    solver=None,
    off=0,  # weather offset (multi-hour kernels pass hour*substeps)
):
    """One hour of sub-steps for one block; pure jnp (runs inside the kernel).

    Mirrors engine.step.substep + engine.zone per sub-step, with zone
    membership via one-hot matmuls.
    """
    # Loop-form solvers: an unrolled Thomas chain inflates Mosaic compile
    # time past the compile service's limits.  flush_tiny off: the TPU
    # flushes subnormals in hardware inside the kernel.
    cfg = bb.config.replace(kernel_mode=True, flush_tiny=False)
    f32 = T0.dtype

    # Hoist the loop-invariant network masks out of the sub-step loop
    # (Mosaic does not hoist out of fori_loop the way XLA hoists out of scan).
    statics = surf_mod.compute_statics(sb_vals)

    def substep(carry, t_out, wind_speed, wind_direction):
        T, zT = carry
        # boundary temperatures: zone reads via oh @ zT
        t_zone_f = jnp.dot(front_oh, zT, preferred_element_type=f32)[:, 0]
        t_zone_b = jnp.dot(back_oh, zT, preferred_element_type=f32)[:, 0]
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

        T_new = surf_mod.march_surfaces(
            sb_vals,
            T,
            t_front,
            t_back,
            wind_direction,
            wind_speed,
            sol_front,
            sol_back,
            ir_front,
            ir_back,
            dt,
            cfg,
            has_massive=sb_vals.has_massive,
            solver=solver,
            statics=statics,
        )

        env_f, env_b = surf_mod.border_conditions(
            sb_vals, T_new, t_front, t_back, wind_direction, wind_speed,
            ir_front, ir_back, cfg, statics=statics,
        )
        ts_front = T_new[0]
        ts_back = surf_mod._last_node(sb_vals, T_new, statics)
        q_front = (ts_front - t_front) * env_f.h
        q_back = (ts_back - t_back) * env_b.h

        # zone ABC via one-hot matmuls (model.rs:489-597)
        ha_f = env_f.h * sb_vals.area
        ha_b = env_b.h * sb_vals.area
        a_z = (
            a_extra
            + jnp.dot((ha_f * ts_front)[None, :], front_oh, preferred_element_type=f32)[0]
            + jnp.dot((ha_b * ts_back)[None, :], back_oh, preferred_element_type=f32)[0]
        )
        b_z = (
            b_extra
            + jnp.dot(ha_f[None, :], front_oh, preferred_element_type=f32)[0]
            + jnp.dot(ha_b[None, :], back_oh, preferred_element_type=f32)[0]
        )
        zT_flat = zT[:, 0]
        t_k = zT_flat + KELVIN
        c_z = zone_volume[:, 0] * gas.density(gas.AIR, t_k) * gas.heat_capacity(gas.AIR, t_k)
        safe_b = jnp.where(jnp.abs(b_z) > 1e-9, b_z, 1.0)
        ratio = a_z / safe_b
        zT_new = zT_flat - (ratio - zT_flat) * _expm1_neg(safe_b * dt / c_z)
        zT_new = jnp.where(jnp.abs(b_z) > 1e-9, zT_new, zT_flat)
        return (T_new, zT_new[:, None]), (env_f.h, env_b.h, q_front, q_back)

    def loop_body(i, carry):
        (T, zT), _ = carry
        t_out = t_out_arr[off + i]
        ws = wind_arr[off + i]
        wd = wdir_arr[off + i]
        return substep((T, zT), t_out, ws, wd)

    # run substeps; keep last h/q for observability
    hq0 = (
        jnp.zeros_like(sol_front),
        jnp.zeros_like(sol_front),
        jnp.zeros_like(sol_front),
        jnp.zeros_like(sol_front),
    )
    (T, zT), hq = jax.lax.fori_loop(0, substeps, loop_body, ((T0, zT0), hq0))
    return T, zT, hq


def _hour_body_imp(
    bb: BlockedBuilding,
    sb_vals: SurfaceBatch,
    front_oh,  # [SB, ZB]
    back_oh,
    zone_volume,  # [ZB, 1]
    a_extra,  # [ZB] per-hour zone gains (hvac+lum+infiltration A-terms)
    b_extra,  # [ZB]
    sol_front,
    sol_back,
    ir_front,
    ir_back,
    t_out_arr,  # [>= off+substeps] SMEM
    wind_arr,
    wdir_arr,
    T0,
    zT0,  # [ZB, 1]
    substeps: int,
    dt_sub: float,
    solver=None,
    off=0,  # weather offset (multi-hour kernels pass hour*substeps)
):
    """One hour of TR-BDF2 fast-mode sub-steps for one block (see
    heatx.engine.implicit): coefficients freeze once per hour, each sub-step
    is one tridiagonal mat-vec + two Thomas solves + the analytical zone
    update.  ~10x fewer sub-steps than the parity body at the same in-VMEM
    cost structure.

    ``solver`` is accepted for call-site compatibility with the parity body;
    the stage solves use the per-hour pre-factored division-free sweeps."""
    from heatx.engine import implicit as imp_mod
    from heatx.engine.exponential import _full_system_K, _substep_forcing
    from heatx.ops import tridiag

    cfg = bb.config.replace(kernel_mode=True)
    f32 = T0.dtype
    statics = surf_mod.compute_statics(sb_vals)

    def boundary_temps(zT, t_out):
        t_zone_f = jnp.dot(front_oh, zT, preferred_element_type=f32)[:, 0]
        t_zone_b = jnp.dot(back_oh, zT, preferred_element_type=f32)[:, 0]
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

    # -- per-hour frozen operators (implicit.build_operators, in-kernel) -----
    t_out0, ws0, wd0 = t_out_arr[off], wind_arr[off], wdir_arr[off]
    t_front0, t_back0 = boundary_temps(zT0, t_out0)
    env_f0, env_b0 = surf_mod.border_conditions(
        sb_vals, T0, t_front0, t_back0, wd0, ws0, ir_front, ir_back, cfg,
        statics=statics,
    )
    rad_hs_f = surf_mod.linearized_rad_coefficient(sb_vals.eps_front, env_f0)
    rad_hs_b = surf_mod.linearized_rad_coefficient(sb_vals.eps_back, env_b0)
    U = surf_mod.segment_u(sb_vals, T0, env_b0.air)
    K = _full_system_K(sb_vals, U, env_f0, env_b0, rad_hs_f, rad_hs_b, statics)
    C = jnp.where(sb_vals.massive, sb_vals.mass, jnp.zeros_like(sb_vals.mass))
    M1 = imp_mod._stage_matrix(sb_vals, K, C, imp_mod.GAMMA * dt_sub / 2.0)
    M2 = imp_mod._stage_matrix(sb_vals, K, C, imp_mod.BETA * dt_sub)
    # The stage matrices are frozen for the hour: pre-factor them so each
    # sub-step's two Thomas solves are division-free fused sweeps (Mosaic
    # does not hoist the pivot chain out of the fori_loop).
    cs1, inv1 = tridiag.factor(*M1)
    cs2, inv2 = tridiag.factor(*M2)

    sol_f = jnp.where(jnp.isnan(sol_front) | (sol_front < 0.0), 0.0, sol_front)
    sol_b = jnp.where(jnp.isnan(sol_back), 0.0, sol_back)
    solar_q = sb_vals.front_alphas * sol_f + sb_vals.back_alphas * sol_b

    lower, diag, upper = K
    hf, hb = env_f0.h, env_b0.h

    def substep(carry, t_out):
        T, zT = carry
        t_front, t_back = boundary_temps(zT, t_out)
        env_f = env_f0._replace(air=t_front)
        env_b = env_b0._replace(air=t_back)
        q = _substep_forcing(env_f, env_b, rad_hs_f, rad_hs_b, solar_q, statics)

        KT0 = tridiag.matvec(lower, diag, upper, T)
        half = imp_mod.GAMMA * dt_sub / 2.0
        rhs1 = C * T + half * KT0 + imp_mod.GAMMA * dt_sub * q
        rhs1 = jnp.where(sb_vals.node_mask, rhs1, T)
        T1 = tridiag.solve_factored(M1[0], cs1, inv1, rhs1)

        rhs2 = imp_mod.C1 * C * T1 - imp_mod.C2 * C * T + imp_mod.BETA * dt_sub * q
        rhs2 = jnp.where(sb_vals.node_mask, rhs2, T)
        T_new = tridiag.solve_factored(M2[0], cs2, inv2, rhs2)

        ts_front = T_new[0]
        ts_back = surf_mod._last_node(sb_vals, T_new, statics)
        q_front = (ts_front - t_front) * hf
        q_back = (ts_back - t_back) * hb

        ha_f = hf * sb_vals.area
        ha_b = hb * sb_vals.area
        a_z = (
            a_extra
            + jnp.dot((ha_f * ts_front)[None, :], front_oh, preferred_element_type=f32)[0]
            + jnp.dot((ha_b * ts_back)[None, :], back_oh, preferred_element_type=f32)[0]
        )
        b_z = (
            b_extra
            + jnp.dot(ha_f[None, :], front_oh, preferred_element_type=f32)[0]
            + jnp.dot(ha_b[None, :], back_oh, preferred_element_type=f32)[0]
        )
        zT_flat = zT[:, 0]
        t_k = zT_flat + KELVIN
        c_z = zone_volume[:, 0] * gas.density(gas.AIR, t_k) * gas.heat_capacity(gas.AIR, t_k)
        safe_b = jnp.where(jnp.abs(b_z) > 1e-9, b_z, 1.0)
        ratio = a_z / safe_b
        zT_new = zT_flat - (ratio - zT_flat) * _expm1_neg(safe_b * dt_sub / c_z)
        zT_new = jnp.where(jnp.abs(b_z) > 1e-9, zT_new, zT_flat)
        return (T_new, zT_new[:, None]), (q_front, q_back)

    def loop_body(i, carry):
        (T, zT), _ = carry
        return substep((T, zT), t_out_arr[off + i])

    hq0 = (jnp.zeros_like(sol_front), jnp.zeros_like(sol_front))
    (T, zT), (qf, qb) = jax.lax.fori_loop(0, substeps, loop_body, ((T0, zT0), hq0))
    return T, zT, (hf, hb, qf, qb)


def make_hour_march(
    bb: BlockedBuilding,
    substeps: int = None,
    interpret: bool = False,
    mode: str = "parity",
    hours: int = 1,
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
    with coefficients frozen per hour.

    ``hours > 1`` marches that many consecutive hours per kernel invocation:
    one pallas_call costs a fixed ~0.7 ms/block in launch + HBM streaming of
    the building arrays regardless of sub-step count, so amortizing it over a
    day (hours=24) is what makes the fast mode fast.
    """
    if mode not in ("parity", "trbdf2"):
        raise ValueError(f"unknown hour-kernel mode {mode!r}")
    if mode == "parity":
        if bb.config.nomass_fixed_iters is None and bb.surfaces.has_nomass:
            raise ValueError(
                "the parity hour kernel requires config.nomass_fixed_iters "
                "(a data-dependent while_loop does not fit the fused pipeline)"
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
    NB = bb.n_blocks
    SP = NB * SB

    sbb = bb.surfaces.astype(dtype)

    # Static (per-kernel) data refs: node arrays, per-surface scalars, oh
    # matrices, zone volume.  Dynamic per-hour inputs + state complete them.
    node_arrays = dict(
        node_mask=sbb.node_mask,
        mass=sbb.mass,
        massive=sbb.massive,
        seg_u=sbb.seg_u,
        same_chunk=sbb.same_chunk,
        nomass_chunk_id=sbb.nomass_chunk_id,
        front_alphas=sbb.front_alphas,
        back_alphas=sbb.back_alphas,
    )
    if sbb.has_cavity:
        # Gas-cavity parameters: the ISO 15099 U-value re-evaluates on every
        # iteration in-kernel (pure elementwise math, Mosaic-lowerable).
        node_arrays.update(
            cav_k0=np.asarray(sbb.cav_gas.k0),
            cav_k1=np.asarray(sbb.cav_gas.k1),
            cav_mu0=np.asarray(sbb.cav_gas.mu0),
            cav_mu1=np.asarray(sbb.cav_gas.mu1),
            cav_cp0=np.asarray(sbb.cav_gas.cp0),
            cav_cp1=np.asarray(sbb.cav_gas.cp1),
            cav_mass=np.asarray(sbb.cav_gas.molar_mass),
            cav_thickness=sbb.cav_thickness,
            cav_height=sbb.cav_height,
            cav_angle=sbb.cav_angle,
            cav_ein=sbb.cav_ein,
            cav_eout=sbb.cav_eout,
            seg_is_cavity=sbb.seg_is_cavity,
        )
    # Per-surface vectors ride as [1, SP] row blocks: a grid combined with
    # 1-D blocked operands has no working Mosaic lowering.
    row = lambda a: np.ascontiguousarray(np.asarray(a)[None, :])  # noqa: E731
    surf_arrays = dict(
        area=row(sbb.area),
        perimeter=row(sbb.perimeter),
        cos_tilt=row(sbb.cos_tilt),
        wind_mod=row(sbb.wind_mod),
        eps_front=row(sbb.eps_front),
        eps_back=row(sbb.eps_back),
        rf=row(sbb.rf),
        front_code=row(sbb.front_code),
        front_temp=row(sbb.front_temp),
        back_code=row(sbb.back_code),
        back_temp=row(sbb.back_temp),
        fixed_h_front=row(sbb.fixed_h_front),
        fixed_h_back=row(sbb.fixed_h_back),
        normal_x=row(sbb.normal[:, 0]),
        normal_y=row(sbb.normal[:, 1]),
        chunk_count=np.ascontiguousarray(sbb.nomass_chunk_count),  # [C, SP]
    )
    C = surf_arrays["chunk_count"].shape[0]

    node_names = list(node_arrays)
    surf_names = list(surf_arrays)

    def kernel(*refs):
        i = 0
        r = {}
        for name in ["t_out", "wind", "wdir"]:
            r[name] = refs[i]
            i += 1
        for name in node_names:
            r[name] = refs[i]
            i += 1
        for name in surf_names:
            r[name] = refs[i]
            i += 1
        for name in ["front_oh", "back_oh", "zone_volume",
                     "sol_front", "sol_back", "ir_front", "ir_back",
                     "a_extra", "b_extra", "T0", "zT0"]:
            r[name] = refs[i]
            i += 1
        (t_out_ref, zt_out_ref, hf_ref, hb_ref, qf_ref, qb_ref,
         zt_hist_ref) = refs[i : i + 7]
        l_s, d_s, u_s, bx_s, c_s = refs[i + 7 : i + 12]
        import os as _os
        from heatx.ops import tridiag as _td
        _solver_kind = _os.environ.get("HEATX_KERNEL_SOLVER", "thomas")
        if _os.environ.get("HEATX_KERNEL_LOOP", "0") == "1":
            # Scratch-ref Thomas: loop-form fallback (small Mosaic MLIR) in
            # case a bigger kernel ever overwhelms the Mosaic compiler.
            solver = _make_ref_thomas(l_s, d_s, u_s, bx_s, c_s, N)
        elif _solver_kind == "pcr":
            solver = _td.solve_pcr  # parallel cyclic reduction: no row chain
        else:
            solver = _td.solve  # fully unrolled Thomas

        if sbb.has_cavity:
            gp = gas.GasProps(
                r["cav_k0"][...], r["cav_k1"][...], r["cav_mu0"][...],
                r["cav_mu1"][...], r["cav_cp0"][...], r["cav_cp1"][...],
                r["cav_mass"][...],
            )
            cav = dict(
                seg_is_cavity=r["seg_is_cavity"][...],
                cav_thickness=r["cav_thickness"][...],
                cav_height=r["cav_height"][...],
                cav_angle=r["cav_angle"][...],
                cav_ein=r["cav_ein"][...],
                cav_eout=r["cav_eout"][...],
            )
        else:
            gp = gas.GasProps(*([jnp.zeros((N, SB), dtype)] * 7))
            zeros_n = jnp.zeros((N, SB), dtype)
            cav = dict(
                seg_is_cavity=jnp.zeros((N, SB), bool),
                cav_thickness=zeros_n,
                cav_height=zeros_n,
                cav_angle=zeros_n,
                cav_ein=zeros_n,
                cav_eout=zeros_n,
            )
        sb_vals = replace(
            sbb,
            node_mask=r["node_mask"][...],
            n_nodes=None,  # unused on the kernel path (mask-based last node)
            mass=r["mass"][...],
            massive=r["massive"][...],
            seg_u=r["seg_u"][...],
            cav_gas=gp,
            **cav,
            same_chunk=r["same_chunk"][...],
            nomass_chunk_id=r["nomass_chunk_id"][...],
            nomass_chunk_count=r["chunk_count"][...],
            front_alphas=r["front_alphas"][...],
            back_alphas=r["back_alphas"][...],
            area=r["area"][0],
            perimeter=r["perimeter"][0],
            normal=None,
            cos_tilt=r["cos_tilt"][0],
            wind_mod=r["wind_mod"][0],
            eps_front=r["eps_front"][0],
            eps_back=r["eps_back"][0],
            rf=r["rf"][0],
            front_code=r["front_code"][0],
            front_space=None,
            front_temp=r["front_temp"][0],
            back_code=r["back_code"][0],
            back_space=None,
            back_temp=r["back_temp"][0],
            fixed_h_front=r["fixed_h_front"][0],
            fixed_h_back=r["fixed_h_back"][0],
            is_fenestration=None,
        )
        # border_conditions accepts the normal as an (nx, ny) tuple on the
        # kernel path (no [SB, 2] relayout in VMEM).
        sb_vals = replace(
            sb_vals, normal=(r["normal_x"][0], r["normal_y"][0])
        )

        body = _hour_body if mode == "parity" else _hour_body_imp

        # Gains sit [ZB, hours] with hours on lanes; a dynamic lane slice is
        # not Mosaic-lowerable ("index in dimension 1 must be a multiple of
        # 128"), so hour h is selected by a one-hot masked lane-reduce.
        a_all = r["a_extra"][...]
        b_all = r["b_extra"][...]
        hour_iota = jax.lax.broadcasted_iota(jnp.int32, (1, hours), 1)

        def gain_col(vals, h):
            return jnp.where(hour_iota == h, vals, 0.0).sum(axis=1)

        def one_hour(h, T, zT):
            hs = pl.ds(h, 1)
            return body(
                bb,
                sb_vals,
                r["front_oh"][...],
                r["back_oh"][...],
                r["zone_volume"][...],
                gain_col(a_all, h),
                gain_col(b_all, h),
                r["sol_front"][hs, :][0],
                r["sol_back"][hs, :][0],
                r["ir_front"][hs, :][0],
                r["ir_back"][hs, :][0],
                r["t_out"],
                r["wind"],
                r["wdir"],
                T,
                zT,
                substeps,
                dt,
                solver=solver,
                off=h * substeps,
            )

        if hours == 1:
            T, zT, (hf, hb, qf, qb) = one_hour(0, r["T0"][...], r["zT0"][...])
            zt_hist = zT
        else:
            SBv = r["T0"].shape[-1]
            zero_row = jnp.zeros((SBv,), dtype)
            ZBv = r["zT0"].shape[0]
            hist0 = jnp.zeros((ZBv, hours), dtype)

            def hour_loop(h, carry):
                T, zT, _, hist = carry
                T, zT, hq = one_hour(h, T, zT)
                # Post-hour zone temps, accumulated via a one-hot column
                # (stores with a dynamic lane offset do not lower in Mosaic).
                hist = hist + zT * jnp.where(hour_iota == h, 1.0, 0.0)
                return (T, zT, hq, hist)

            T, zT, (hf, hb, qf, qb), zt_hist = jax.lax.fori_loop(
                0,
                hours,
                hour_loop,
                (r["T0"][...], r["zT0"][...],
                 (zero_row, zero_row, zero_row, zero_row), hist0),
            )
        t_out_ref[...] = T
        zt_out_ref[...] = zT
        hf_ref[0, :] = hf
        hb_ref[0, :] = hb
        qf_ref[0, :] = qf
        qb_ref[0, :] = qb
        zt_hist_ref[...] = zt_hist

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def nodes_spec(rows=N):
        return pl.BlockSpec((rows, SB), lambda b: (0, b), memory_space=pltpu.VMEM)

    def row_spec():
        # [1, SP] row vectors (grid + 1-D blocks have no Mosaic lowering)
        return nodes_spec(rows=1)

    def oh_spec():
        return pl.BlockSpec((SB, ZB), lambda b: (b, 0), memory_space=pltpu.VMEM)

    def zone_spec():
        return pl.BlockSpec((ZB, 1), lambda b: (b, 0), memory_space=pltpu.VMEM)

    def gains_spec():
        # [NB*ZB, hours]: every hour's gains for THIS block's zones (hours on
        # lanes: the lane dim of a block must be 128-divisible or the full
        # array dim, and ZB is neither)
        return pl.BlockSpec((ZB, hours), lambda b: (b, 0), memory_space=pltpu.VMEM)

    in_specs = [smem, smem, smem]
    in_specs += [nodes_spec() for _ in node_names]
    for name in surf_names:
        in_specs.append(nodes_spec(rows=surf_arrays[name].shape[0]))
    in_specs += [
        oh_spec(),  # front_oh
        oh_spec(),  # back_oh
        zone_spec(),  # zone_volume
        nodes_spec(rows=hours),  # sol_front
        nodes_spec(rows=hours),  # sol_back
        nodes_spec(rows=hours),  # ir_front
        nodes_spec(rows=hours),  # ir_back
        gains_spec(),  # a_extra
        gains_spec(),  # b_extra
        nodes_spec(),  # T0
        zone_spec(),  # zT0
    ]
    out_specs = (
        nodes_spec(),
        zone_spec(),
        row_spec(),
        row_spec(),
        row_spec(),
        row_spec(),
        pl.BlockSpec((ZB, hours), lambda b: (b, 0), memory_space=pltpu.VMEM),
    )
    out_shape = (
        jax.ShapeDtypeStruct((N, SP), dtype),
        jax.ShapeDtypeStruct((NB * ZB, 1), dtype),
        jax.ShapeDtypeStruct((1, SP), dtype),
        jax.ShapeDtypeStruct((1, SP), dtype),
        jax.ShapeDtypeStruct((1, SP), dtype),
        jax.ShapeDtypeStruct((1, SP), dtype),
        jax.ShapeDtypeStruct((NB * ZB, hours), dtype),
    )

    # Building operands are returned to the caller and passed per call, so a
    # jit around hour_march keeps them as parameters, not baked constants.
    params = tuple(
        [jnp.asarray(node_arrays[n]) for n in node_names]
        + [jnp.asarray(surf_arrays[n]) for n in surf_names]
        + [
            jnp.asarray(bb.front_oh, dtype),
            jnp.asarray(bb.back_oh, dtype),
            jnp.asarray(bb.zone_volume.reshape(NB * ZB, 1), dtype),
        ]
    )

    grid = (NB,)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=out_shape,
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((N, SB), dtype) for _ in range(5)],
        interpret=interpret,
    )

    def hour_march(params, T, zT_blocked, hour_inputs):
        (t_o, wnd, wdr, sol_f, sol_b, ir_f, ir_b, a_extra, b_extra) = hour_inputs
        T_new, zT_new, hf, hb, qf, qb, zt_hist = call(
            t_o.reshape(hours * substeps).astype(dtype),
            wnd.reshape(hours * substeps).astype(dtype),
            wdr.reshape(hours * substeps).astype(dtype),
            *params,
            sol_f.reshape(hours, SP),
            sol_b.reshape(hours, SP),
            ir_f.reshape(hours, SP),
            ir_b.reshape(hours, SP),
            a_extra.reshape(hours, NB * ZB).T,
            b_extra.reshape(hours, NB * ZB).T,
            T,
            zT_blocked.reshape(NB * ZB, 1),
        )
        # [hours, NB, ZB]: zone temperature after each marched hour (the
        # reference's observable output channel, zone.rs:45-49)
        zt_hist = jnp.moveaxis(zt_hist.reshape(NB, ZB, hours), -1, 0)
        return (
            T_new,
            zT_new.reshape(NB, ZB),
            (hf.reshape(SP), hb.reshape(SP), qf.reshape(SP), qb.reshape(SP)),
            zt_hist,
        )

    return hour_march, params
