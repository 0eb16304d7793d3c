"""Multi-chip scale-out: shard the surface axis over a device mesh.

The reference is strictly serial (its rayon feature is dormant — SURVEY.md
section 2.2); heatx's scale axis is the batched surface dimension.  Surfaces
only interact through zone air temperatures, so the sharding story is:

* ``[S, ...]`` surface arrays: sharded over the mesh axis;
* ``[Z]`` zone arrays: replicated;
* the zone reduction (segment_sum of h*A*T over surfaces, model.rs:556-590)
  becomes a partial scatter-add per device + an XLA all-reduce over ICI,
  inserted automatically by GSPMD from the sharding annotations.

No NCCL/MPI translation: collectives are whatever XLA emits for the
annotated program.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from heatx.build.layout import CompiledBuilding
from heatx.engine import step as step_mod
from heatx.engine.state import SimState, StepInputs

SURFACE_AXIS = "surf"


def _put_tree(tree, shardings):
    """device_put a pytree onto (possibly multi-process) shardings.

    In a multi-process runtime ``jax.device_put`` insists that host values be
    bit-identical across processes — which NaN-sentinel arrays (fixed_h
    overrides) can never satisfy (NaN != NaN).  Build global arrays from
    per-process local slices instead; single-process keeps the plain path.
    """
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)

    def put(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda idx: x[idx])

    return jax.tree_util.tree_map(put, tree, shardings)


def _put_spec_tree(tree, mesh: Mesh, spec_tree):
    """_put_tree against a PartitionSpec pytree (same structure as tree)."""
    shardings = jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s),
        spec_tree,
        is_leaf=lambda x: isinstance(x, P),
    )
    return _put_tree(tree, shardings)


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = SURFACE_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def state_shardings(mesh: Mesh, axis: str = SURFACE_AXIS, has_loads: bool = True) -> SimState:
    s = NamedSharding(mesh, P(axis))
    ns = NamedSharding(mesh, P(None, axis))  # node-major [N, S]
    r = NamedSharding(mesh, P())
    return SimState(
        node_T=ns, zone_T=r, h_front=s, h_back=s, q_front=s, q_back=s,
        ideal_load=(r if has_loads else None),
    )


def inputs_shardings(
    mesh: Mesh, axis: str = SURFACE_AXIS, with_sp: bool = False,
    with_shade_sp: bool = False,
) -> StepInputs:
    s = NamedSharding(mesh, P(axis))
    r = NamedSharding(mesh, P())
    return StepInputs(
        heat_sp=(r if with_sp else None),
        cool_sp=(r if with_sp else None),
        shade_sp=(s if with_shade_sp else None),  # per-surface [S]
        t_out=r,
        wind_speed=r,
        wind_direction=r,
        sol_front=s,
        sol_back=s,
        ir_front=s,
        ir_back=s,
        hvac_power=r,
        lum_power=r,
        inf_vol=r,
        inf_temp=r,
        inf_mask=r,
        vent_vol=r,
        vent_temp=r,
        vent_mask=r,
        mix_vol=r,
    )


def shard_state(state: SimState, mesh: Mesh, axis: str = SURFACE_AXIS) -> SimState:
    return _put_tree(
        state, state_shardings(mesh, axis, has_loads=state.ideal_load is not None)
    )


def shard_inputs(inputs: StepInputs, mesh: Mesh, axis: str = SURFACE_AXIS) -> StepInputs:
    sp = inputs.heat_sp is not None or inputs.cool_sp is not None
    sh = inputs_shardings(
        mesh, axis, with_sp=sp, with_shade_sp=inputs.shade_sp is not None
    )
    if sp:
        # Only replicate the setpoint leaves that are actually present.
        sh = sh._replace(
            heat_sp=sh.heat_sp if inputs.heat_sp is not None else None,
            cool_sp=sh.cool_sp if inputs.cool_sp is not None else None,
        )
    return _put_tree(inputs, sh)


def building_shardings(
    building: CompiledBuilding, mesh: Mesh, axis: str = SURFACE_AXIS
) -> CompiledBuilding:
    """Sharding pytree for the compiled building: arrays with a leading
    surface dimension shard over the mesh axis, everything else replicates."""
    s = NamedSharding(mesh, P(axis))
    ns = NamedSharding(mesh, P(None, axis))
    r = NamedSharding(mesh, P())
    S = building.n_surfaces

    def spec(x):
        arr = np.asarray(x)
        if arr.ndim == 2 and arr.shape[1] == S:
            return ns  # node-major [N, S] node data
        if arr.ndim >= 1 and arr.shape[0] == S:
            return s  # per-surface scalars / [S, ...] data
        return r

    return jax.tree_util.tree_map(spec, building)


def _check_divisible(building: CompiledBuilding, mesh: Mesh):
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    if building.n_surfaces % n_dev != 0:
        raise ValueError(
            f"{building.n_surfaces} surfaces not divisible by {n_dev} devices; "
            "compile with pad_surfaces_to a multiple of the mesh size"
        )


def _march_for_mode(mode: str, substeps: int, refresh_every: int = None):
    """Main-step integrator (building, state, inputs) -> state for a mode:
    "parity" (reference sub-step physics), "trbdf2" / "exp" (the fast modes,
    h frozen per main step, ``substeps`` sub-steps; mode="trbdf2_refresh"
    re-evaluates coefficients every ``refresh_every`` sub-steps, default 1)."""
    if refresh_every is not None and mode != "trbdf2_refresh":
        raise ValueError("refresh_every applies to mode='trbdf2_refresh'")
    if mode == "parity":
        return step_mod.march
    if mode in ("trbdf2", "trbdf2_refresh"):
        from heatx.engine.implicit import imp_march

        return partial(
            imp_march, substeps=substeps,
            refresh_h=(mode == "trbdf2_refresh"),
            refresh_every=refresh_every,
        )
    if mode == "exp":
        from heatx.engine.exponential import exp_march

        return partial(exp_march, substeps=substeps)
    raise ValueError(f"unknown march mode {mode!r}")


def make_sharded_march(
    building: CompiledBuilding,
    mesh: Mesh,
    axis: str = SURFACE_AXIS,
    donate: bool = False,
    mode: str = "parity",
    substeps: int = 12,
    scheduled_setpoints: bool = False,
    scheduled_shade_sp: bool = False,
    refresh_every: int = None,
):
    """jit-compiled main-step function with surface-axis sharding.

    The building's surface count must divide the mesh size evenly (pad with
    ``compile_building(..., pad_surfaces_to=...)`` otherwise).  The fast
    modes shard identically to the parity path: everything is per-surface
    except the zone reduction (an ICI all-reduce GSPMD inserts itself).
    Pass ``scheduled_setpoints=True`` when the inputs will carry
    StepInputs.heat_sp/cool_sp schedules (the input specs then include the
    replicated setpoint leaves; inputs must then ALWAYS carry both).
    ``scheduled_shade_sp=True`` does the same for the per-surface
    StepInputs.shade_sp zone-shading schedule (sharded over the surface
    axis; without it, zone-shaded buildings use their compiled setpoints).
    """
    _check_divisible(building, mesh)
    building = building.astype(building.config.dtype)
    bld_sh = building_shardings(building, mesh, axis)
    building = _put_tree(building, bld_sh)
    st_sh = state_shardings(mesh, axis, has_loads=building.has_ideal_hvac)
    jitted = jax.jit(
        _march_for_mode(mode, substeps, refresh_every),
        in_shardings=(
            bld_sh, st_sh,
            inputs_shardings(
                mesh, axis, with_sp=scheduled_setpoints,
                with_shade_sp=scheduled_shade_sp,
            ),
        ),
        out_shardings=st_sh,
        donate_argnums=(1,) if donate else (),
    )

    def fn(state, inputs):
        return jitted(building, state, inputs)

    return fn


def _resolve_shard_map():
    """jax.shard_map across the supported jax versions (check_rep was
    renamed check_vma somewhere in the 0.8 line; inspect the public
    signature rather than assuming — intermediate versions export
    jax.shard_map but still take check_rep)."""
    try:
        import inspect

        from jax import shard_map as _shard_map  # jax >= 0.8

        _params = inspect.signature(_shard_map).parameters

        def shard_map(f, **kw):
            if "check_rep" in kw and "check_rep" not in _params:
                kw["check_vma"] = kw.pop("check_rep")
            return _shard_map(f, **kw)

        return shard_map
    except ImportError:  # pragma: no cover - older jax
        from jax.experimental.shard_map import shard_map

        return shard_map


def shard_day_adjoint(
    adj,
    forward_hm,
    mesh: Mesh,
    axis: str = SURFACE_AXIS,
    with_ld_cot: bool = False,
):
    """Shard the adjoint day kernel (heatx.ops.pallas_adjoint) over the
    device mesh, mirroring :func:`make_sharded_hour_march`.

    The adjoint is per-zone-closed-block with no cross-block communication
    (the backward of a block-local forward is block-local), so it shards
    embarrassingly: each device runs the same pallas_call over its
    ``grid_blocks`` blocks of the blocked operands; no collectives.  Build
    ``adj`` with ``grid_blocks = n_blocks // n_devices`` (exactly like the
    forward) and pass the SHARDED forward's metadata (``param_specs``) as
    ``forward_hm`` — the two kernels share the operand layout.

    ``with_ld_cot``: the ideal-load-history cotangent slot of ``cots`` is
    an array (True) or None (False) — shard_map pins the pytree.

    Returns the wrapped ``day_adjoint`` with the same calling convention;
    outputs keep the forward's shardings (lane-sharded surface arrays,
    block-row zone arrays)."""
    shard_map = _resolve_shard_map()
    pspec = tuple(forward_hm.param_specs)
    r = P()
    lane2 = P(None, axis)
    zrow = P(axis, None)
    hz = P(None, axis, None)
    hi_spec = (r, r, r, lane2, lane2, lane2, lane2, hz, hz)
    if adj.scheduled_setpoints:
        hi_spec = hi_spec + (hz, hz)
    cot_spec = (lane2, zrow, hz, hz if with_ld_cot else None)
    in_specs = (pspec, lane2, zrow, hi_spec, cot_spec)

    node_names = {n for (_, n, k) in adj.diff_entries if k == "node"}
    surf_names = {n for (_, n, k) in adj.diff_entries if k == "surf"}
    d_params_spec = {n: lane2 for n in node_names}
    d_params_spec.update({n: P(axis) for n in surf_names})
    out_specs = {
        "dT0": lane2,
        "d_zT0": zrow,
        "d_params": d_params_spec,
        "d_zone_volume": zrow,
        "d_sol_front": lane2,
        "d_sol_back": lane2,
        "d_ir_front": lane2,
        "d_ir_back": lane2,
        "d_a_extra": hz,
        "d_b_extra": hz,
    }
    if adj.has_ctl:
        out_specs["d_ctl_heat"] = zrow
        out_specs["d_ctl_cool"] = zrow
    if adj.scheduled_setpoints:
        out_specs["d_sp_heat"] = hz
        out_specs["d_sp_cool"] = hz

    fn = shard_map(
        adj, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
        check_rep=False,
    )
    fn.diff_entries = adj.diff_entries
    fn.param_order = adj.param_order
    fn.parts_meta = adj.parts_meta
    fn.hours = adj.hours
    fn.substeps = adj.substeps
    fn.scheduled_setpoints = adj.scheduled_setpoints
    fn.has_ctl = adj.has_ctl
    fn.mesh = mesh
    return fn


def make_sharded_hour_march(
    bb,
    mesh: Mesh,
    axis: str = SURFACE_AXIS,
    substeps: int = None,
    mode: str = "trbdf2",
    hours: int = 1,
    interpret: bool = False,
    collect_bad: bool = False,
    collect_hq: bool = False,
    scheduled_setpoints: bool = False,
    collect_operative: bool = False,
    scheduled_shade_sp: bool = False,
    refresh_every: int = None,
):
    """Shard the fused Pallas hour/day kernel over the device mesh.

    Blocks are zone-closed (heatx.build.blocking), so the kernel shards
    embarrassingly over the block axis: each device runs the same pallas_call
    with a grid of ``n_blocks / n_devices`` blocks on its shard of the
    blocked arrays; no collectives are needed (the zone energy balance is
    block-local by construction).

    Returns ``(hour_march, params)`` with the same calling convention as
    :func:`heatx.ops.pallas_step.make_hour_march`, except the hour-input
    shapes must be canonical: weather ``[hours*substeps]``, per-surface
    irradiance ``[hours, SP]``, gains ``[hours, n_blocks, ZB]`` — and, with
    ``scheduled_setpoints``, the setpoint series MUST be passed (the
    11-tuple form: ``shard_map`` pins the input pytree structure, so the
    unscheduled 9-tuple fallback is not available here).

    The returned function mirrors the hour-march metadata
    (``param_index`` / ``param_axes`` / collect flags) so high-level callers
    (:class:`heatx.api.FastRunner` with ``mesh=``) can swap building operands
    between dispatches — e.g. seasonal ground temperatures — exactly as on
    the single-device path.
    """
    shard_map = _resolve_shard_map()

    from heatx.ops import pallas_step

    ndev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    NB = bb.n_blocks
    if NB % ndev != 0:
        raise ValueError(
            f"{NB} blocks not divisible by {ndev} devices; choose a block "
            "size giving a multiple (or pad the building)"
        )
    hm, params = pallas_step.make_hour_march(
        bb,
        substeps=substeps,
        mode=mode,
        hours=hours,
        interpret=interpret,
        grid_blocks=NB // ndev,
        collect_bad=collect_bad,
        collect_hq=collect_hq,
        scheduled_setpoints=scheduled_setpoints,
        collect_operative=collect_operative,
        scheduled_shade_sp=scheduled_shade_sp,
        refresh_every=refresh_every,
    )
    pspec = tuple(
        P(None, axis) if ax == "lane" else P(axis, None) for ax in hm.param_axes
    )
    r = P()
    lane2 = P(None, axis)
    hi_spec = (
        r, r, r,  # t_out, wind, wdir: replicated [hours*substeps]
        lane2, lane2, lane2, lane2,  # sol/ir [hours, SP]
        P(None, axis, None), P(None, axis, None),  # gains [hours, NB, ZB]
    )
    if bb.vent is not None:
        # a_vent / b_vent / vent_thr series [hours, NB, ZB] (blocked zone
        # rows; the in-run ventilation gate channels)
        hi_spec = hi_spec + (
            P(None, axis, None), P(None, axis, None), P(None, axis, None),
        )
    if scheduled_setpoints:
        # heat_sp / cool_sp series [hours, NB, ZB] (blocked zone rows)
        hi_spec = hi_spec + (P(None, axis, None), P(None, axis, None))
    if scheduled_shade_sp:
        # zone-shading setpoint series [hours, SP] (surface-axis sharded;
        # shard_map pins the pytree structure, so it MUST be passed)
        hi_spec = hi_spec + (lane2,)
    in_specs = (pspec, lane2, P(axis, None), hi_spec)
    out_specs = (
        lane2,  # T  [N, SP]
        P(axis, None),  # zT [NB, ZB]
        (P(axis), P(axis), P(axis), P(axis)),  # h/q [SP]
        P(None, axis, None),  # zone history [hours, NB, ZB]
    )
    if collect_hq:
        out_specs = out_specs + ((lane2, lane2, lane2, lane2),)  # [hours, SP]
    if collect_bad:
        out_specs = out_specs + (P(None, axis),)  # [hours, NB]
    if getattr(hm, "collect_loads", False):
        out_specs = out_specs + (P(None, axis, None),)  # loads [hours, NB, ZB]
    if collect_operative:
        out_specs = out_specs + (P(None, axis, None),)  # T_op [hours, NB, ZB]
    fn = shard_map(
        hm, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_rep=False
    )
    # _put_tree: multi-process-safe (params carry NaN fixed-h sentinels that
    # plain cross-process device_put rejects).
    params = tuple(_put_spec_tree(list(params), mesh, list(pspec)))
    fn.in_specs = in_specs
    fn.param_specs = pspec
    fn.mesh = mesh
    # Mirror the hour-march metadata so high-level callers treat the sharded
    # and single-device marches interchangeably (operand swaps, collect
    # unpacking).
    fn.param_axes = hm.param_axes
    fn.param_index = hm.param_index
    fn.collect_bad = hm.collect_bad
    fn.collect_hq = hm.collect_hq
    fn.collect_loads = hm.collect_loads
    fn.scheduled_setpoints = hm.scheduled_setpoints
    fn.scheduled_shade_sp = hm.scheduled_shade_sp
    fn.collect_operative = hm.collect_operative
    return fn, params


def make_sharded_fast_run(n_blocks: int, mesh: Mesh, hours: int = 2):
    """Self-contained sharded-Pallas smoke runner (used by the driver's
    multi-chip dry run): builds a tiny building that blocks into exactly
    ``n_blocks`` zone-closed blocks, shards the TR-BDF2 day kernel over the
    mesh (one block per device), and returns a nullary callable producing
    the per-hour zone-temperature history."""
    import jax.numpy as jnp

    import heatx
    from heatx.build.layout import compile_building
    from heatx.engine import state as state_mod
    from heatx.model.building import (
        Boundary,
        BuildingModel,
        Construction,
        Material,
        SpaceDef,
        Substance,
        SurfaceDef,
    )
    from heatx.ops import pallas_step

    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0)
    )
    m.add_material(Material("c10", "concrete", 0.1))
    m.add_construction(Construction("wall", ["c10"]))
    verts = np.array([[0, 0, 0], [4, 0, 0], [4, 0, 3], [0, 0, 3]], float)
    for z in range(n_blocks):
        m.add_space(SpaceDef(f"z{z}", 100.0))
        for si in range(3):
            m.add_surface(
                SurfaceDef(f"s{z}_{si}", "wall", Boundary.outdoor(),
                           Boundary.space_(f"z{z}"), vertices=verts)
            )
    building = compile_building(m, n=1, config=heatx.SimConfig(dtype=np.float32))
    building = building.astype(np.float32)
    # 3-surface components + block_size 4 => one zone-component per block.
    bb = pallas_step.block_building(building, block_size=4)
    assert bb.n_blocks == n_blocks, (bb.n_blocks, n_blocks)

    sub = 4
    hm, params = make_sharded_hour_march(
        bb, mesh, substeps=sub, mode="trbdf2", hours=hours, interpret=True
    )
    lay = bb.layout
    SP = lay.padded_surfaces
    NB, ZB = bb.n_blocks, bb.zones_per_block
    st = state_mod.initial_state(building)
    T0 = lay.surfaces_to_blocked(np.asarray(st.node_T)).astype(np.float32)
    zT0 = lay.zones_to_blocked(np.asarray(st.zone_T)).astype(np.float32)
    hi = (
        np.full((hours * sub,), 5.0, np.float32),
        np.full((hours * sub,), 3.0, np.float32),
        np.zeros((hours * sub,), np.float32),
        np.full((hours, SP), 150.0, np.float32),
        np.zeros((hours, SP), np.float32),
        np.full((hours, SP), 320.0, np.float32),
        np.zeros((hours, SP), np.float32),
        np.zeros((hours, NB, ZB), np.float32),
        np.zeros((hours, NB, ZB), np.float32),
    )
    # Shard the state/inputs onto the mesh explicitly (required once the mesh
    # spans processes; a no-op data movement on one process).
    _, t_spec, z_spec, hi_spec = hm.in_specs
    T0 = _put_spec_tree(T0, mesh, t_spec)
    zT0 = _put_spec_tree(zT0, mesh, z_spec)
    hi = tuple(_put_spec_tree(list(hi), mesh, list(hi_spec)))
    jitted = jax.jit(hm)

    def run():
        _, _, _, hist = jitted(params, T0, zT0, hi)
        return hist

    return run


def make_sharded_run(
    building: CompiledBuilding,
    mesh: Mesh,
    axis: str = SURFACE_AXIS,
    collect_zone_T: bool = True,
    donate: bool = False,
):
    """Sharded whole-sequence scan: (state, inputs_seq[T]) -> (state, zone_T[T])."""
    _check_divisible(building, mesh)
    building = building.astype(building.config.dtype)
    bld_sh = building_shardings(building, mesh, axis)
    building = _put_tree(building, bld_sh)
    st = state_shardings(mesh, axis)
    # Scanned inputs carry a leading time axis: prefix every per-step spec
    # with an unsharded dimension.
    def prefix(sharding):
        return NamedSharding(mesh, P(None, *sharding.spec))

    inp = jax.tree_util.tree_map(prefix, inputs_shardings(mesh, axis))
    jitted = jax.jit(
        partial(step_mod.run, collect_zone_T=collect_zone_T),
        in_shardings=(bld_sh, st, inp),
        out_shardings=(st, NamedSharding(mesh, P())) if collect_zone_T else (st, None),
        donate_argnums=(1,) if donate else (),
    )

    def fn(state, inputs_seq):
        return jitted(building, state, inputs_seq)

    return fn
