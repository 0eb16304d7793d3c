"""Reverse-mode (adjoint) day kernel for the TR-BDF2 fast modes.

The fused forward day kernel (pallas_step.make_hour_march) has no VJP —
``pallas_call`` is opaque to JAX autodiff — so round 3's hybrid adjoint ran
the backward sweep through the bit-equivalent XLA path, ~45x slower than
the kernel forward (PERF.md "Differentiation cost").  This module closes
that gap with a SECOND Pallas kernel that computes the day's backward sweep
entirely in VMEM:

* a forward recompute pass marches the day hour-by-hour (the same
  ``_hour_body_imp`` arithmetic as the forward kernel) and stores each
  hour's START state in VMEM scratch — one day of states fits easily
  (24 x [rows, W] per part);
* a reverse pass walks the hours backward; for each hour it calls
  ``jax.vjp`` on the UNROLLED hour body **at kernel trace time** — JAX's
  autodiff runs while the kernel is being traced, so the generated
  transposed arithmetic (matvec adjoints, transposed tridiagonal solves,
  the zone-update and TARP/cavity coefficient chain rules) lowers through
  Mosaic like any other kernel code.  No hand-derived adjoints, and the
  gradients are exactly those of ``jax.grad`` over the same (unrolled)
  composition.

Differentiated inputs per day dispatch:

* the day-start state (node temperatures per part + zone temperatures),
* the building parameter operands that calibration targets —
  ``DIFF_NODE`` node arrays (heat capacity ``mass``, conductances
  ``seg_u``, solar absorption splits ``front/back_alphas``) and
  ``DIFF_SURF`` per-surface arrays (area, perimeter, cos_tilt, wind_mod,
  emissivities, roughness ``rf``, ground/fixed boundary temperatures,
  fixed film coefficients),
* ``zone_volume``,
* the per-hour input channels (front/back solar, front/back IR, and the
  zone gain rows ``a_extra``/``b_extra``).

Cotangents arrive on the day's outputs: the final state, the per-hour
zone-temperature history, and (for thermostatic buildings) the per-hour
ideal-load history.  Thermostatic buildings also get gradients w.r.t.
their setpoints: the compiled thermostat rows (``d_ctl_heat``/
``d_ctl_cool``) and, with ``scheduled_setpoints=True``, the per-hour
schedule channels (``d_sp_heat``/``d_sp_cool``) — the setpoint-landing
power formula (engine/zone.py, in-kernel ``_zone_update_ctl``) is smooth
in the setpoints up to the capacity clamp.  Structural operands (one-hots,
masks, boundary codes, mixing weights, capacity clamps, cavity gas
coefficients) are not differentiated; gradients w.r.t. them are either
meaningless (structure) or out of scope (cavity gas properties — the
FastRunner.chunk_grad scope probe raises rather than zeroing) — the XLA
adjoint remains available for those.

Scope: ``mode in ("parity", "trbdf2", "trbdf2_refresh")`` (any
``refresh_every`` cadence), optional inter-zone mixing, thermostats,
scheduled setpoint series and ``config.interior_mrt``.  Parity mode
unrolls the stability-dictated sub-step count and requires
``config.nomass_fixed_iters`` (the adaptive while_loop has no reverse
rule) — tractable at coarse discretizations; at the default ~118
sub-steps/hour the unrolled trace is large (see PERF.md).  In-run
shading / ventilation gates are not supported (the factory raises; use
the XLA backward).

The reference has no autodiff at all — its observable channels are the
per-step zone temperatures and surface h/q states
(/root/reference/src/zone.rs:45-49, surface_trait.rs:223-354), which are
exactly the outputs this kernel accepts cotangents on — so this is
heatx's own capability bar (SURVEY.md §2), not parity.
"""

from __future__ import annotations

import os
from dataclasses import replace
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from heatx.ops import tridiag
from heatx.ops.pallas_step import (
    BlockedBuilding,
    _hour_body,
    _hour_body_imp,
    _prep_parts,
)
from heatx.physics import gas

# Building parameter arrays the adjoint kernel differentiates.  Keys into
# the per-part node / surface operand dicts of pallas_step._prep_parts.
def _r8(x: int) -> int:
    return ((x + 7) // 8) * 8


DIFF_NODE = ("mass", "seg_u", "front_alphas", "back_alphas")
DIFF_SURF = (
    "area",
    "perimeter",
    "cos_tilt",
    "wind_mod",
    "eps_front",
    "eps_back",
    "rf",
    "front_temp",
    "back_temp",
    "fixed_h_front",
    "fixed_h_back",
)
DIFF_CHANNELS = ("sol_front", "sol_back", "ir_front", "ir_back")


def make_day_adjoint(
    bb: BlockedBuilding,
    substeps: int = None,
    mode: str = "trbdf2",
    hours: int = 1,
    refresh_every: int = None,
    interpret: bool = False,
    grid_blocks: int = None,
    vmem_limit_mb: float = None,
    scheduled_setpoints: bool = False,
):
    """Build the jitted day-adjoint:

    ``day_adjoint(params, T0, zT0_blocked, hour_inputs, cots) -> grads``

    ``params`` is the SAME operand tuple make_hour_march returns (the two
    kernels share the blocked-operand layout), ``hour_inputs`` the same
    9-leaf hour-input tuple (11-leaf with ``scheduled_setpoints``: the
    per-hour heat/cool setpoint rows appended, mirroring the forward
    kernel), ``T0``/``zT0_blocked`` the day-START state.
    ``cots = (dT_final, d_zT_final, d_zt_hist, d_ld_hist)`` carries the
    cotangents of the day's outputs (``d_ld_hist`` may be None unless the
    building is thermostatic; any entry may be None for zero).

    Returns a dict with ``dT0`` [N, SP], ``d_zT0`` [NB, ZB], ``d_params``
    ({(part, name): blocked cotangent} for DIFF_NODE/DIFF_SURF),
    ``d_zone_volume`` [NB, ZB], ``d_sol_front``/``d_sol_back``/
    ``d_ir_front``/``d_ir_back`` [hours, SP], and ``d_a_extra``/
    ``d_b_extra`` [hours, NB, ZB].  Thermostatic buildings additionally
    get ``d_ctl_heat``/``d_ctl_cool`` [NB, ZB] (the compiled thermostat
    setpoint rows — the setpoint-landing power formula is smooth in them
    up to the capacity clamp, engine/zone.py) and, with
    ``scheduled_setpoints``, ``d_sp_heat``/``d_sp_cool`` [hours, NB, ZB]
    (the per-hour schedule channels — optimal setpoint control).
    """
    if mode not in ("parity", "trbdf2", "trbdf2_refresh"):
        raise ValueError(
            f"adjoint kernel supports parity and the TR-BDF2 modes, got {mode!r}"
        )
    if mode == "parity":
        if substeps is None:
            raise ValueError(
                "mode='parity' needs the stability-dictated sub-step count "
                "(building.dt_subdivisions) passed as substeps"
            )
        if bb.surfaces.has_nomass and bb.config.nomass_fixed_iters is None:
            raise ValueError(
                "parity adjoint requires config.nomass_fixed_iters (the "
                "adaptive while_loop fixed point has no reverse-mode rule; "
                "the fixed-iteration composition unrolls instead)"
            )
    if bb.shade is not None:
        raise ValueError(
            "adjoint kernel: in-run zone shading is not supported (use the "
            "XLA backward)"
        )
    if bb.vent is not None:
        raise ValueError(
            "adjoint kernel: in-run ventilation gates are not supported "
            "(use the XLA backward)"
        )
    # config.interior_mrt IS supported: the Carroll effective emissivities
    # ride as per-part operands (mrt_eps_f/mrt_eps_b), the kernel
    # differentiates them like any other surface parameter, and
    # FastRunner.chunk_grad pulls their cotangents back through a jnp twin
    # of the blocking statics (pallas_step.mrt_eps_blocked_jnp) so
    # eps/area calibration gradients include the radiant-network chain.
    substeps = substeps or 12
    if refresh_every is not None:
        if mode != "trbdf2_refresh":
            raise ValueError("refresh_every only applies to mode='trbdf2_refresh'")
        if refresh_every < 1 or substeps % refresh_every:
            raise ValueError(
                f"refresh_every {refresh_every} must divide substeps {substeps}"
            )
    dt = 3600.0 / (bb.base.n_steps_per_hour * substeps)
    dtype = bb.config.dtype
    N = bb.max_nodes
    SB = bb.block_size
    ZB = bb.zones_per_block
    NB = bb.n_blocks
    NBl = grid_blocks or NB
    SPl = NBl * SB
    if NB % NBl != 0:
        raise ValueError(f"grid_blocks {NBl} must divide n_blocks {NB}")
    HR8 = ((hours + 7) // 8) * 8

    pp = _prep_parts(bb, dtype, scheduled_shade_sp=False)
    parts_meta, n_parts = pp.parts_meta, pp.n_parts

    # Interior-MRT buildings carry the Carroll effective emissivities as
    # extra per-part surface operands; they join the differentiated set
    # (presence varies per part side — _prep_parts skips all-zero rows).
    MRT_NAMES = ("mrt_eps_f", "mrt_eps_b")
    part_diff_surf = [
        DIFF_SURF
        + tuple(n for n in MRT_NAMES if n in pp.part_surf_names[pi])
        for pi in range(n_parts)
    ]

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)

    def vspec(rows, w):
        return pl.BlockSpec((rows, w), lambda b: (0, b), memory_space=pltpu.VMEM)

    def oh_spec(w):
        return pl.BlockSpec((w, ZB), lambda b: (b, 0), memory_space=pltpu.VMEM)

    def ohT_spec(w):
        return pl.BlockSpec((ZB, w), lambda b: (b, 0), memory_space=pltpu.VMEM)

    def zone_spec(rows=8):
        return pl.BlockSpec((rows, ZB), lambda b: (b, 0), memory_space=pltpu.VMEM)

    # ---- input specs: EXACTLY the forward kernel's operand order -----------
    in_specs = [smem, smem, smem]
    for pi, (rows, lo, w) in enumerate(parts_meta):
        for name in pp.part_node_names[pi]:
            a = pp.part_node_arrays[pi][name]
            in_specs.append(vspec(a.shape[0], w))
        for name in pp.part_surf_names[pi]:
            a = pp.part_surf_arrays[pi][name]
            in_specs.append(vspec(a.shape[0], w))
        for name in pp.part_aux_names[pi]:
            in_specs.append(ohT_spec(w) if name.endswith("ohT") else oh_spec(w))
    in_specs.append(zone_spec())  # zone_volume
    if bb.mix_wt is not None:
        in_specs.append(zone_spec(ZB))
    if bb.ctl is not None:
        in_specs += [zone_spec()] * 4
    for pi, (rows, lo, w) in enumerate(parts_meta):
        in_specs += [vspec(hours, w)] * 4  # sol_f, sol_b, ir_f, ir_b
    in_specs += [zone_spec(HR8), zone_spec(HR8)]  # a_extra, b_extra
    if scheduled_setpoints:
        if bb.ctl is None:
            raise ValueError("scheduled_setpoints requires thermostats")
        in_specs += [zone_spec(HR8), zone_spec(HR8)]  # sp_heat, sp_cool
    for rows, lo, w in parts_meta:
        in_specs.append(vspec(rows, w))  # T0
    in_specs.append(zone_spec())  # zT0
    # ---- cotangent inputs --------------------------------------------------
    for rows, lo, w in parts_meta:
        in_specs.append(vspec(rows, w))  # dT_final
    in_specs.append(zone_spec())  # d_zT_final
    in_specs.append(zone_spec(HR8))  # d_zt_hist
    has_ctl = bb.ctl is not None
    if has_ctl:
        in_specs.append(zone_spec(HR8))  # d_ld_hist

    # ---- output specs ------------------------------------------------------
    out_specs = []
    out_shape = []
    for rows, lo, w in parts_meta:
        out_specs.append(vspec(rows, w))  # dT0
        out_shape.append(jax.ShapeDtypeStruct((rows, NBl * w), dtype))
    out_specs.append(zone_spec())  # d_zT0
    out_shape.append(jax.ShapeDtypeStruct((NBl * 8, ZB), dtype))
    diff_entries = []  # (part, name, kind)
    for pi, (rows, lo, w) in enumerate(parts_meta):
        for name in DIFF_NODE:
            a = pp.part_node_arrays[pi][name]
            out_specs.append(vspec(a.shape[0], w))
            out_shape.append(jax.ShapeDtypeStruct((a.shape[0], NBl * w), dtype))
            diff_entries.append((pi, name, "node"))
        for name in part_diff_surf[pi]:
            out_specs.append(vspec(1, w))
            out_shape.append(jax.ShapeDtypeStruct((1, NBl * w), dtype))
            diff_entries.append((pi, name, "surf"))
    out_specs.append(zone_spec())  # d_zone_volume
    out_shape.append(jax.ShapeDtypeStruct((NBl * 8, ZB), dtype))
    for pi, (rows, lo, w) in enumerate(parts_meta):
        out_specs += [vspec(hours, w)] * 4  # d_sol_f, d_sol_b, d_ir_f, d_ir_b
        out_shape += [jax.ShapeDtypeStruct((hours, NBl * w), dtype)] * 4
    out_specs += [zone_spec(HR8), zone_spec(HR8)]  # d_a_extra, d_b_extra
    out_shape += [jax.ShapeDtypeStruct((NBl * HR8, ZB), dtype)] * 2
    if has_ctl:
        out_specs += [zone_spec(), zone_spec()]  # d_ctl_heat, d_ctl_cool
        out_shape += [jax.ShapeDtypeStruct((NBl * 8, ZB), dtype)] * 2
    if scheduled_setpoints:
        out_specs += [zone_spec(HR8), zone_spec(HR8)]  # d_sp_heat, d_sp_cool
        out_shape += [jax.ShapeDtypeStruct((NBl * HR8, ZB), dtype)] * 2

    # In-kernel stage-solver choice mirrors the forward kernel (PCR compiled,
    # pre-factored Thomas under interpret — the interpret-mode PCR race,
    # PERF.md).
    _solver_kind = os.environ.get(
        "HEATX_KERNEL_SOLVER", "thomas" if interpret else "pcr"
    )
    solver = tridiag.solve_pcr if _solver_kind == "pcr" else tridiag.solve

    # unroll_fixed_loops: the no-mass fixed-iteration loop runs unrolled
    # instead of fori (fori has no reverse rule; identical arithmetic).
    # Inert for the TR-BDF2 modes, which never enter march_nomass.
    cfg = bb.config.replace(
        kernel_mode=True, flush_tiny=False, unroll_fixed_loops=True
    )

    def kernel(*refs):
        i = 0
        r_shared = {}
        for name in ["t_out", "wind", "wdir"]:
            r_shared[name] = refs[i]
            i += 1
        r_parts = []
        for pi in range(n_parts):
            rp = {}
            for name in pp.part_node_names[pi]:
                rp[name] = refs[i]
                i += 1
            for name in pp.part_surf_names[pi]:
                rp[name] = refs[i]
                i += 1
            for name in pp.part_aux_names[pi]:
                rp[name] = refs[i]
                i += 1
            r_parts.append(rp)
        r_shared["zone_volume"] = refs[i]
        i += 1
        if bb.mix_wt is not None:
            r_shared["mix_wt"] = refs[i]
            i += 1
        if has_ctl:
            for nm in ("ctl_heat", "ctl_cool", "ctl_mxh", "ctl_mxc"):
                r_shared[nm] = refs[i]
                i += 1
        for pi in range(n_parts):
            for name in ("sol_front", "sol_back", "ir_front", "ir_back"):
                r_parts[pi][name] = refs[i]
                i += 1
        r_shared["a_extra"] = refs[i]
        r_shared["b_extra"] = refs[i + 1]
        i += 2
        if scheduled_setpoints:
            r_shared["sp_heat"] = refs[i]
            r_shared["sp_cool"] = refs[i + 1]
            i += 2
        for pi in range(n_parts):
            r_parts[pi]["T0"] = refs[i]
            i += 1
        r_shared["zT0"] = refs[i]
        i += 1
        dT_refs = [refs[i + pi] for pi in range(n_parts)]
        i += n_parts
        d_zT_ref = refs[i]
        i += 1
        d_zth_ref = refs[i]
        i += 1
        d_ld_ref = None
        if has_ctl:
            d_ld_ref = refs[i]
            i += 1
        # outputs
        gT0_refs = [refs[i + pi] for pi in range(n_parts)]
        i += n_parts
        g_zT0_ref = refs[i]
        i += 1
        g_param_refs = {}
        for pi, name, kind in diff_entries:
            g_param_refs[(pi, name)] = refs[i]
            i += 1
        g_zvol_ref = refs[i]
        i += 1
        g_chan_refs = []
        for pi in range(n_parts):
            g_chan_refs.append(refs[i : i + 4])
            i += 4
        g_a_ref = refs[i]
        g_b_ref = refs[i + 1]
        i += 2
        g_ctlh_ref = g_ctlc_ref = g_sph_ref = g_spc_ref = None
        if has_ctl:
            g_ctlh_ref = refs[i]
            g_ctlc_ref = refs[i + 1]
            i += 2
        if scheduled_setpoints:
            g_sph_ref = refs[i]
            g_spc_ref = refs[i + 1]
            i += 2
        TH_s = refs[i : i + n_parts]
        i += n_parts
        zTH_s = refs[i]
        i += 1
        assert i == len(refs), (i, len(refs))

        # ---- non-differentiated values (read once; closure constants) ------
        nd_parts = []
        for pi, (rows, lo, w) in enumerate(parts_meta):
            rp = r_parts[pi]
            psb = pp.part_sbs[pi]
            names = pp.part_aux_names[pi]
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
            nd_parts.append(
                SimpleNamespace(
                    gp=gp,
                    cav=cav,
                    node_mask=rp["node_mask"][...],
                    massive=rp["massive"][...],
                    same_chunk=rp["same_chunk"][...],
                    nomass_chunk_id=rp["nomass_chunk_id"][...],
                    chunk_count=rp["chunk_count"][...],
                    normal=(rp["normal_x"][0], rp["normal_y"][0]),
                    front_code=rp["front_code"][0],
                    back_code=rp["back_code"][0],
                    front_any="front_oh" in names,
                    back_any="back_oh" in names,
                    front_oh=rp["front_oh"][...] if "front_oh" in names else None,
                    back_oh=rp["back_oh"][...] if "back_oh" in names else None,
                    front_ohT=rp["front_ohT"][...] if "front_ohT" in names else None,
                    back_ohT=rp["back_ohT"][...] if "back_ohT" in names else None,
                )
            )
        mix_val = r_shared["mix_wt"][...] if bb.mix_wt is not None else None
        # Capacity clamps stay non-differentiated (structural bounds); the
        # setpoint rows move into the diff set below.
        ctl_max = (
            (
                r_shared["ctl_mxh"][...][0:1],
                r_shared["ctl_mxc"][...][0:1],
            )
            if has_ctl
            else None
        )

        # ---- differentiated parameter values -------------------------------
        diffp0 = {
            "zone_volume": r_shared["zone_volume"][...][0:1],
            "parts": [
                {
                    name: r_parts[pi][name][...]
                    for name in DIFF_NODE + part_diff_surf[pi]
                }
                for pi in range(n_parts)
            ],
        }
        if has_ctl:
            # The compiled thermostat setpoint rows: the setpoint-landing
            # power formula (_zone_update_ctl) is smooth in them up to the
            # capacity clamp.  Under scheduled mode the hour body reads the
            # schedule channels instead, so these pull zero gradient there.
            diffp0["ctl_heat"] = r_shared["ctl_heat"][...][0:1]
            diffp0["ctl_cool"] = r_shared["ctl_cool"][...][0:1]

        def build_sb(pi, dv):
            """Per-part SurfaceBatch values: non-diff arrays from the refs
            (closure constants), diff arrays from ``dv`` (vjp arguments) —
            the same replace() the forward kernel performs."""
            nd = nd_parts[pi]
            psb = pp.part_sbs[pi]
            return replace(
                psb,
                node_mask=nd.node_mask,
                mass=dv["mass"],
                massive=nd.massive,
                seg_u=dv["seg_u"],
                cav_gas=nd.gp,
                **nd.cav,
                same_chunk=nd.same_chunk,
                nomass_chunk_id=nd.nomass_chunk_id,
                nomass_chunk_count=nd.chunk_count,
                front_alphas=dv["front_alphas"],
                back_alphas=dv["back_alphas"],
                area=dv["area"][0],
                perimeter=dv["perimeter"][0],
                normal=nd.normal,
                cos_tilt=dv["cos_tilt"][0],
                wind_mod=dv["wind_mod"][0],
                eps_front=dv["eps_front"][0],
                eps_back=dv["eps_back"][0],
                rf=dv["rf"][0],
                front_code=nd.front_code,
                front_temp=dv["front_temp"][0],
                back_code=nd.back_code,
                back_temp=dv["back_temp"][0],
                fixed_h_front=dv["fixed_h_front"][0],
                fixed_h_back=dv["fixed_h_back"][0],
            )

        def read_scalars(h):
            base = h * substeps
            t = jnp.stack([r_shared["t_out"][base + k] for k in range(substeps)])
            ws = jnp.stack([r_shared["wind"][base + k] for k in range(substeps)])
            wd = jnp.stack([r_shared["wdir"][base + k] for k in range(substeps)])
            return t, ws, wd

        def read_channels(h):
            hs = pl.ds(h, 1)
            ch = {
                "parts": [
                    {
                        name: r_parts[pi][name][hs, :][0]
                        for name in DIFF_CHANNELS
                    }
                    for pi in range(n_parts)
                ],
                "a_row": r_shared["a_extra"][hs, :],
                "b_row": r_shared["b_extra"][hs, :],
            }
            if scheduled_setpoints:
                ch["sp_heat"] = r_shared["sp_heat"][hs, :]
                ch["sp_cool"] = r_shared["sp_cool"][hs, :]
            return ch

        def hour_fn(Ts, zT, diffp, ch, sc, unroll):
            parts = []
            for pi in range(n_parts):
                nd = nd_parts[pi]
                dv = diffp["parts"][pi]
                parts.append(
                    SimpleNamespace(
                        sb=build_sb(pi, dv),
                        front_any=nd.front_any,
                        back_any=nd.back_any,
                        front_oh=nd.front_oh,
                        back_oh=nd.back_oh,
                        front_ohT=nd.front_ohT,
                        back_ohT=nd.back_ohT,
                        mrt_ef=(
                            dv["mrt_eps_f"][0] if "mrt_eps_f" in dv else None
                        ),
                        mrt_eb=(
                            dv["mrt_eps_b"][0] if "mrt_eps_b" in dv else None
                        ),
                        sol_front=ch["parts"][pi]["sol_front"],
                        sol_back=ch["parts"][pi]["sol_back"],
                        ir_front=ch["parts"][pi]["ir_front"],
                        ir_back=ch["parts"][pi]["ir_back"],
                    )
                )
            t_seq, ws_seq, wd_seq = sc
            if has_ctl:
                sp = (
                    (ch["sp_heat"], ch["sp_cool"])
                    if scheduled_setpoints
                    else (diffp["ctl_heat"], diffp["ctl_cool"])
                )
                ctl = sp + ctl_max
            else:
                ctl = None
            if mode == "parity":
                return _hour_body(
                    cfg,
                    parts,
                    diffp["zone_volume"],
                    ch["a_row"],
                    ch["b_row"],
                    t_seq,
                    ws_seq,
                    wd_seq,
                    Ts,
                    zT,
                    substeps,
                    dt,
                    solver=solver,
                    off=0,
                    mix_wt=mix_val,
                    ctl=ctl,
                    unroll=unroll,
                )
            return _hour_body_imp(
                cfg,
                parts,
                diffp["zone_volume"],
                ch["a_row"],
                ch["b_row"],
                t_seq,
                ws_seq,
                wd_seq,
                Ts,
                zT,
                substeps,
                dt,
                solver=solver,
                off=0,
                mix_wt=mix_val,
                ctl=ctl,
                refresh_h=(mode == "trbdf2_refresh"),
                refresh_every=refresh_every,
                unroll=unroll,
            )

        # ---- forward recompute: store each hour's START state in scratch ---
        T0s = tuple(r_parts[pi]["T0"][...] for pi in range(n_parts))
        zT0 = r_shared["zT0"][...][0:1]

        def fwd_body(h, carry):
            Ts, zT = carry
            for pi, (rows, lo, w) in enumerate(parts_meta):
                # Store a full 8-aligned sublane tile at an 8-aligned dynamic
                # offset (Mosaic requires the store index provably % 8 == 0;
                # a rows=6 part at offset h*6 is not).
                r8 = _r8(rows)
                pad = jnp.zeros((r8 - rows, w), dtype)
                TH_s[pi][pl.ds(h * r8, r8), :] = jnp.concatenate(
                    [Ts[pi], pad], axis=0
                )
            zTH_s[pl.ds(h * 8, 8), :] = jnp.broadcast_to(zT, (8, ZB))
            Ts, zT, _, _ = hour_fn(
                Ts, zT, diffp0, read_channels(h), read_scalars(h), unroll=True
            )
            return Ts, zT

        jax.lax.fori_loop(0, hours, fwd_body, (T0s, zT0))

        # Zero-init the gain-cotangent rows (HR8 > hours rows stay zero; the
        # loop overwrites rows 0..hours-1).
        g_a_ref[...] = jnp.zeros(g_a_ref.shape, dtype)
        g_b_ref[...] = jnp.zeros(g_b_ref.shape, dtype)
        if scheduled_setpoints:
            g_sph_ref[...] = jnp.zeros(g_sph_ref.shape, dtype)
            g_spc_ref[...] = jnp.zeros(g_spc_ref.shape, dtype)

        # ---- reverse sweep -------------------------------------------------
        dP0 = jax.tree.map(jnp.zeros_like, diffp0)
        dTs0 = tuple(dT_refs[pi][...] for pi in range(n_parts))
        dzT0 = d_zT_ref[...][0:1]

        def bwd_body(j, carry):
            dTs, dzT, dP = carry
            h = hours - 1 - j
            Ts_h = tuple(
                TH_s[pi][pl.ds(h * _r8(rows), _r8(rows)), :][:rows]
                for pi, (rows, lo, w) in enumerate(parts_meta)
            )
            zT_h = zTH_s[pl.ds(h * 8, 8), :][0:1]
            ch = read_channels(h)
            sc = read_scalars(h)
            out, vjp_fn = jax.vjp(
                lambda Ts, zT, dp, c: hour_fn(Ts, zT, dp, c, sc, unroll=True),
                Ts_h,
                zT_h,
                diffp0,
                ch,
            )
            zero_hqs = jax.tree.map(jnp.zeros_like, out[2])
            cot_ld = None
            if has_ctl:
                cot_ld = d_ld_ref[pl.ds(h, 1), :]
            dzT_tot = dzT + d_zth_ref[pl.ds(h, 1), :]
            gTs, gzT, gdp, gch = vjp_fn((dTs, dzT_tot, zero_hqs, cot_ld))
            for pi in range(n_parts):
                for k, name in enumerate(DIFF_CHANNELS):
                    g_chan_refs[pi][k][pl.ds(h, 1), :] = gch["parts"][pi][name][
                        None, :
                    ]
            g_a_ref[pl.ds(h, 1), :] = gch["a_row"]
            g_b_ref[pl.ds(h, 1), :] = gch["b_row"]
            if scheduled_setpoints:
                g_sph_ref[pl.ds(h, 1), :] = gch["sp_heat"]
                g_spc_ref[pl.ds(h, 1), :] = gch["sp_cool"]
            dP = jax.tree.map(jnp.add, dP, gdp)
            return gTs, gzT, dP

        dTs, dzT, dP = jax.lax.fori_loop(
            0, hours, bwd_body, (dTs0, dzT0, dP0)
        )

        # ---- write outputs (every block fully) -----------------------------
        for pi in range(n_parts):
            gT0_refs[pi][...] = dTs[pi]
        g_zT0_ref[...] = jnp.broadcast_to(dzT, g_zT0_ref.shape)
        for pi, name, kind in diff_entries:
            g_param_refs[(pi, name)][...] = dP["parts"][pi][name]
        g_zvol_ref[...] = jnp.broadcast_to(dP["zone_volume"], g_zvol_ref.shape)
        if has_ctl:
            g_ctlh_ref[...] = jnp.broadcast_to(
                dP["ctl_heat"], g_ctlh_ref.shape
            )
            g_ctlc_ref[...] = jnp.broadcast_to(
                dP["ctl_cool"], g_ctlc_ref.shape
            )

    # VMEM scratch: per-part hour-start node states + hour-start zone temps.
    scratch_shapes = [
        pltpu.VMEM((hours * _r8(rows), w), dtype) for rows, lo, w in parts_meta
    ] + [pltpu.VMEM((hours * 8, ZB), dtype)]

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

    def _lane_split(a, rows, lo, w):
        k = a.shape[0]
        v = a.reshape(k, NBl, SB)[: min(k, rows), :, lo : lo + w]
        return v.reshape(v.shape[0], NBl * w)

    def gains_rows(a):
        a = jnp.moveaxis(a.reshape(hours, NBl, ZB), 0, 1)
        pad = jnp.zeros((NBl, HR8 - hours, ZB), a.dtype)
        return jnp.concatenate([a, pad], axis=1).reshape(NBl * HR8, ZB)

    def zone_rows(a):
        a = a.reshape(NBl, 1, ZB)
        pad = jnp.zeros((NBl, 7, ZB), a.dtype)
        return jnp.concatenate([a, pad], axis=1).reshape(NBl * 8, ZB)

    def day_adjoint(params, T0, zT0_blocked, hour_inputs, cots):
        hour_inputs = tuple(hour_inputs)
        sp_heat = sp_cool = None
        if scheduled_setpoints:
            (t_o, wnd, wdr, sol_f, sol_b, ir_f, ir_b, a_extra, b_extra,
             sp_heat, sp_cool) = hour_inputs
        else:
            (t_o, wnd, wdr, sol_f, sol_b, ir_f, ir_b, a_extra, b_extra) = (
                hour_inputs
            )
        dT_fin, d_zT_fin, d_zth, d_ld = cots
        if dT_fin is None:
            dT_fin = jnp.zeros((N, SPl), dtype)
        if d_zT_fin is None:
            d_zT_fin = jnp.zeros((NBl, ZB), dtype)
        if d_zth is None:
            d_zth = jnp.zeros((hours, NBl, ZB), dtype)
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
        operands += [
            gains_rows(a_extra.astype(dtype)),
            gains_rows(b_extra.astype(dtype)),
        ]
        if scheduled_setpoints:
            operands += [
                gains_rows(sp_heat.astype(dtype)),
                gains_rows(sp_cool.astype(dtype)),
            ]
        for rows, lo, w in parts_meta:
            operands.append(_lane_split(T0.astype(dtype), rows, lo, w))
        operands.append(zone_rows(zT0_blocked.reshape(NBl, ZB).astype(dtype)))
        for rows, lo, w in parts_meta:
            operands.append(_lane_split(dT_fin.astype(dtype), rows, lo, w))
        operands.append(zone_rows(d_zT_fin.reshape(NBl, ZB).astype(dtype)))
        operands.append(gains_rows(d_zth.astype(dtype)))
        if has_ctl:
            d_ld_arr = (
                jnp.zeros((hours, NBl, ZB), dtype) if d_ld is None else d_ld
            )
            operands.append(gains_rows(d_ld_arr.astype(dtype)))

        outs = call(*operands)
        oi = 0
        dT_parts = outs[oi : oi + n_parts]
        oi += n_parts
        d_zT0 = outs[oi].reshape(NBl, 8, ZB)[:, 0]
        oi += 1
        d_parts = {}
        for pi, name, kind in diff_entries:
            d_parts[(pi, name)] = outs[oi]
            oi += 1
        d_zvol = outs[oi].reshape(NBl, 8, ZB)[:, 0]
        oi += 1
        d_chans = []
        for pi in range(n_parts):
            d_chans.append(outs[oi : oi + 4])
            oi += 4
        d_a = jnp.moveaxis(outs[oi].reshape(NBl, HR8, ZB)[:, :hours], 1, 0)
        d_b = jnp.moveaxis(outs[oi + 1].reshape(NBl, HR8, ZB)[:, :hours], 1, 0)
        oi += 2
        d_ctl = {}
        if has_ctl:
            d_ctl["d_ctl_heat"] = outs[oi].reshape(NBl, 8, ZB)[:, 0]
            d_ctl["d_ctl_cool"] = outs[oi + 1].reshape(NBl, 8, ZB)[:, 0]
            oi += 2
        if scheduled_setpoints:
            d_ctl["d_sp_heat"] = jnp.moveaxis(
                outs[oi].reshape(NBl, HR8, ZB)[:, :hours], 1, 0
            )
            d_ctl["d_sp_cool"] = jnp.moveaxis(
                outs[oi + 1].reshape(NBl, HR8, ZB)[:, :hours], 1, 0
            )
            oi += 2

        dT0 = jnp.zeros((N, NBl, SB), dtype)
        for pi, (rows, lo, w) in enumerate(parts_meta):
            dT0 = dT0.at[:rows, :, lo : lo + w].set(
                dT_parts[pi].reshape(rows, NBl, w)
            )
        dT0 = dT0.reshape(N, SPl)
        # Reassemble the per-part parameter cotangents into full blocked
        # arrays ([k, SP] node / [SP] surface layout, zeros on lanes the
        # part does not cover) — the shapes block_building produced, so the
        # caller can pull them back through the layout adjoint directly.
        d_params = {}
        for name in DIFF_NODE:
            full = jnp.zeros((N, NBl, SB), dtype)
            for pi, (rows, lo, w) in enumerate(parts_meta):
                g = d_parts[(pi, name)]
                full = full.at[: g.shape[0], :, lo : lo + w].set(
                    g.reshape(g.shape[0], NBl, w)
                )
            d_params[name] = full.reshape(N, SPl)
        surf_names_all = DIFF_SURF + tuple(
            n for n in MRT_NAMES if any(n in pds for pds in part_diff_surf)
        )
        for name in surf_names_all:
            full = jnp.zeros((NBl, SB), dtype)
            for pi, (rows, lo, w) in enumerate(parts_meta):
                if (pi, name) not in d_parts:
                    continue  # e.g. a part side with no MRT faces
                g = d_parts[(pi, name)]
                full = full.at[:, lo : lo + w].set(g.reshape(NBl, w))
            d_params[name] = full.reshape(SPl)
        chan_full = {
            name: jnp.zeros((hours, NBl, SB), dtype) for name in DIFF_CHANNELS
        }
        for pi, (rows, lo, w) in enumerate(parts_meta):
            for k, name in enumerate(DIFF_CHANNELS):
                chan_full[name] = chan_full[name].at[:, :, lo : lo + w].set(
                    d_chans[pi][k].reshape(hours, NBl, w)
                )
        return {
            "dT0": dT0,
            "d_zT0": d_zT0,
            "d_params": d_params,
            "d_zone_volume": d_zvol,
            **{
                "d_" + name: chan_full[name].reshape(hours, SPl)
                for name in DIFF_CHANNELS
            },
            "d_a_extra": d_a,
            "d_b_extra": d_b,
            **d_ctl,
        }

    day_adjoint.diff_entries = tuple(diff_entries)
    day_adjoint.parts_meta = tuple(parts_meta)
    day_adjoint.hours = hours
    day_adjoint.substeps = substeps
    day_adjoint.scheduled_setpoints = scheduled_setpoints
    day_adjoint.has_ctl = has_ctl
    # The building-operand ordering this kernel expects (drift guard: the
    # forward kernel's param_index must enumerate the same keys in the
    # same order — FastRunner.chunk_grad asserts it at construction, so a
    # new forward operand that is not mirrored here fails loudly instead
    # of shifting every subsequent ref into garbage gradients).
    order = []
    for pi in range(n_parts):
        for name in pp.part_node_names[pi]:
            order.append((pi, name))
        for name in pp.part_surf_names[pi]:
            order.append((pi, name))
    day_adjoint.param_order = tuple(order)
    return day_adjoint
