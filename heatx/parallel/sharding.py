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


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = SURFACE_AXIS) -> Mesh:
    """1-D mesh over all (or the given) devices."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def state_shardings(mesh: Mesh, axis: str = SURFACE_AXIS) -> SimState:
    s = NamedSharding(mesh, P(axis))
    ns = NamedSharding(mesh, P(None, axis))  # node-major [N, S]
    r = NamedSharding(mesh, P())
    return SimState(node_T=ns, zone_T=r, h_front=s, h_back=s, q_front=s, q_back=s)


def inputs_shardings(mesh: Mesh, axis: str = SURFACE_AXIS) -> StepInputs:
    s = NamedSharding(mesh, P(axis))
    r = NamedSharding(mesh, P())
    return StepInputs(
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
    )


def shard_state(state: SimState, mesh: Mesh, axis: str = SURFACE_AXIS) -> SimState:
    return jax.device_put(state, state_shardings(mesh, axis))


def shard_inputs(inputs: StepInputs, mesh: Mesh, axis: str = SURFACE_AXIS) -> StepInputs:
    return jax.device_put(inputs, inputs_shardings(mesh, axis))


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


def _march_for_mode(mode: str, substeps: int):
    """Main-step integrator (building, state, inputs) -> state for a mode:
    "parity" (reference sub-step physics), "trbdf2" / "exp" (the fast modes,
    h frozen per main step, ``substeps`` sub-steps)."""
    if mode == "parity":
        return step_mod.march
    if mode == "trbdf2":
        from heatx.engine.implicit import imp_march

        return partial(imp_march, substeps=substeps)
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
):
    """jit-compiled main-step function with surface-axis sharding.

    The building's surface count must divide the mesh size evenly (pad with
    ``compile_building(..., pad_surfaces_to=...)`` otherwise).  The fast
    modes shard identically to the parity path: everything is per-surface
    except the zone reduction (an ICI all-reduce GSPMD inserts itself).
    """
    _check_divisible(building, mesh)
    building = building.astype(building.config.dtype)
    bld_sh = building_shardings(building, mesh, axis)
    building = jax.device_put(building, bld_sh)
    jitted = jax.jit(
        _march_for_mode(mode, substeps),
        in_shardings=(bld_sh, state_shardings(mesh, axis), inputs_shardings(mesh, axis)),
        out_shardings=state_shardings(mesh, axis),
        donate_argnums=(1,) if donate else (),
    )

    def fn(state, inputs):
        return jitted(building, state, inputs)

    return fn


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
    building = jax.device_put(building, bld_sh)
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
