"""Ensemble simulation: march many building variants in one XLA program.

The compiled building is a *pytree of arrays* (heatx/build/layout.py
registers it), so a population of variants that share a compiled layout
(same node counts, same static flags, same ``dt_subdivisions``) stacks
leaf-wise into a single pytree with a leading ensemble axis, and
``jax.vmap`` marches every member simultaneously — design-space sweeps,
Monte-Carlo uncertainty quantification, and population calibration all
become one batched device program instead of E serial runs.

The reference has no equivalent: it marches exactly one building per
process (model.rs:359-427), so a 256-variant sweep costs 256 serial
simulations.  Here the ensemble axis is pure TPU leverage — member-parallel
arithmetic widens every vector op, and the axis shards over a device mesh
(``shard_ensemble``) exactly like the surface axis does, making parameter
studies embarrassingly chip-parallel.

Two usage patterns:

* **stacked variants** — compile K buildings with identical topology and
  ``stack_pytrees`` them (layout equality is asserted), then
  ``ensemble_run`` the stack;
* **parameter perturbations** — keep ONE compiled building and vmap a
  params->building transform over a batched parameter pytree
  (``run_param_ensemble``), e.g. scaling ``surfaces.seg_u`` or the solar
  absorption vectors.  This composes with ``jax.grad`` for population-level
  calibration and with ``shard_ensemble`` for multi-chip sweeps.

For maximum throughput at large E x small building, the alternative route is
to *replicate the variants into one BuildingModel* (distinct spaces per
member) and run the fused Pallas day kernel on the combined model — blocks
are zone-closed, so members never interact; see examples/design_sweep.py.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from heatx.build.layout import CompiledBuilding
from heatx.engine import step as step_mod
from heatx.engine.state import SimState, StepInputs

__all__ = [
    "stack_pytrees",
    "ensemble_initial_state",
    "make_run",
    "ensemble_run",
    "run_param_ensemble",
    "shard_ensemble",
]


def stack_pytrees(trees: Sequence[Any]):
    """Stack identically-structured pytrees leaf-wise along a new leading
    ensemble axis.

    Structure (including static aux: node counts, flags, ``SimConfig``,
    ``dt_subdivisions``) must match exactly across members — that is the
    "shared compiled layout" contract that makes vmap valid.  Works on
    ``CompiledBuilding``, ``SimState``, ``StepInputs``, or any parameter
    pytree.
    """
    if not trees:
        raise ValueError("stack_pytrees needs at least one tree")
    leaves0, treedef0 = jax.tree_util.tree_flatten(trees[0])
    stacked = [[np.asarray(l)] for l in leaves0]
    for i, t in enumerate(trees[1:], start=1):
        leaves, treedef = jax.tree_util.tree_flatten(t)
        if treedef != treedef0:
            raise ValueError(
                f"ensemble member {i} has a different compiled structure "
                f"than member 0 (layouts/configs must match):\n{treedef}\nvs\n{treedef0}"
            )
        for acc, l in zip(stacked, leaves):
            l = np.asarray(l)
            if l.shape != acc[0].shape or l.dtype != acc[0].dtype:
                raise ValueError(
                    f"ensemble member {i} leaf shape/dtype {l.shape}/{l.dtype} "
                    f"!= member 0 {acc[0].shape}/{acc[0].dtype}"
                )
            acc.append(l)
    out = [jnp.stack(acc) for acc in stacked]
    return jax.tree_util.tree_unflatten(treedef0, out)


def ensemble_initial_state(building_e: CompiledBuilding, n_members: int) -> SimState:
    """Fresh [E, ...] state for a stacked building (members start identical,
    with the reference's registered initial values)."""
    from heatx.engine import state as state_mod

    one = jax.tree.map(lambda x: x[0], building_e)
    st = state_mod.initial_state(one)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x[None], (n_members,) + x.shape), st
    )


def _seq_run(mode: str, substeps, collect_zone_T: bool, collect_loads: bool = False):
    """A (building, state, inputs_seq) -> (state, history) runner for one
    member, for each production integrator.  With ``collect_loads`` the
    history is ``(zone_T_hist, ideal_load_hist)`` (setpoint-driven HVAC
    only, like step.run)."""
    if mode == "parity":
        if substeps is not None:
            # Parity marches the stability-dictated dt_subdivisions; a
            # substeps request would otherwise be silently ignored.
            raise ValueError(
                "mode='parity' marches the building's dt_subdivisions; "
                "substeps applies to 'trbdf2'/'exponential' only"
            )
        return partial(
            step_mod.run, collect_zone_T=collect_zone_T, collect_loads=collect_loads
        )
    substeps = 8 if substeps is None else int(substeps)

    if mode == "trbdf2":
        from heatx.engine.implicit import imp_march as march_fn
    elif mode == "exponential":
        from heatx.engine.exponential import exp_march as march_fn
    else:
        raise ValueError(f"unknown mode {mode!r} (parity | trbdf2 | exponential)")

    def run(building, state, inputs_seq):
        if collect_loads and not building.has_ideal_hvac:
            raise ValueError(
                "collect_loads requires setpoint-driven HVAC "
                "(IdealHeaterCooler with heat_setpoint/cool_setpoint)"
            )

        def body(carry, step_inputs):
            new_state = march_fn(building, carry, step_inputs, substeps)
            out = new_state.zone_T if collect_zone_T else None
            if collect_loads:
                out = (out, new_state.ideal_load)
            return new_state, out

        return jax.lax.scan(body, state, step_mod._with_time_axis_mix(inputs_seq))

    return run


def make_run(
    mode: str = "parity",
    substeps: int = None,
    collect_zone_T: bool = True,
    inputs_axes=None,
    jit: bool = True,
    collect_loads: bool = False,
):
    """Build a jitted ensemble runner ``fn(building_e, state_e, inputs_seq)``.

    ``building_e``/``state_e`` carry a leading ensemble axis on every leaf
    (see :func:`stack_pytrees` / :func:`ensemble_initial_state`);
    ``inputs_seq`` is shared across members by default (``inputs_axes=None``)
    or per-member with ``inputs_axes=0`` (leaves then shaped [E, T, ...]).
    ``substeps`` (fast modes only; default 8) is rejected under
    ``mode="parity"``, which marches the stability-dictated sub-step count.
    Returns ``(final_state_e, zone_T_hist_e)`` with ``zone_T_hist_e`` shaped
    [E, T, Z]; ``collect_loads`` makes the history
    ``(zone_T_hist_e, ideal_load_hist_e)`` (setpoint-driven HVAC only).
    """
    run1 = _seq_run(mode, substeps, collect_zone_T, collect_loads)
    fn = jax.vmap(run1, in_axes=(0, 0, inputs_axes))
    return jax.jit(fn) if jit else fn


def ensemble_run(
    building_e: CompiledBuilding,
    state_e: SimState,
    inputs_seq: StepInputs,
    mode: str = "parity",
    substeps: int = None,
    collect_zone_T: bool = True,
    inputs_axes=None,
    collect_loads: bool = False,
):
    """One-shot convenience wrapper over :func:`make_run` (re-traces per
    call; build the runner once via ``make_run`` for repeated use)."""
    fn = make_run(
        mode, substeps, collect_zone_T, inputs_axes, jit=False,
        collect_loads=collect_loads,
    )
    return fn(building_e, state_e, inputs_seq)


def run_param_ensemble(
    building: CompiledBuilding,
    apply_fn: Callable[[CompiledBuilding, Any], CompiledBuilding],
    params_e: Any,
    state: SimState,
    inputs_seq: StepInputs,
    mode: str = "parity",
    substeps: int = None,
    collect_zone_T: bool = True,
    inputs_axes=None,
    collect_loads: bool = False,
):
    """Sweep a batched parameter pytree over ONE compiled building.

    ``apply_fn(building, params) -> building`` is any pure transform (e.g.
    ``dataclasses.replace`` scaling ``surfaces.seg_u``); ``params_e`` carries
    a leading [E] axis on every leaf.  The single building, initial state,
    and input sequence are shared; only the parameters are member-specific —
    so the member program differs from a plain run only where the parameters
    touch it.  Fully differentiable: wrap in ``jax.grad`` for population
    calibration.
    """
    run1 = _seq_run(mode, substeps, collect_zone_T, collect_loads)

    def member(params):
        return run1(apply_fn(building, params), state, inputs_seq)

    if inputs_axes is None:
        return jax.vmap(member)(params_e)

    def member_i(params, inputs):
        return run1(apply_fn(building, params), state, inputs)

    return jax.vmap(member_i, in_axes=(0, inputs_axes))(params_e, inputs_seq)


def shard_ensemble(tree, mesh, axis_name: Optional[str] = None):
    """Distribute an ensemble-stacked pytree's leading [E] axis over a device
    mesh (members are independent, so this is embarrassingly parallel — the
    compiled program runs E/n_devices members per chip with zero collectives
    in the forward pass).

    ``axis_name`` defaults to the mesh's first axis.  E must divide evenly.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    axis_name = axis_name or mesh.axis_names[0]
    n_dev = int(mesh.shape[axis_name])  # only this axis partitions the E dim

    def put(x):
        x = jnp.asarray(x)
        if x.ndim == 0:
            return x
        if x.shape[0] % max(n_dev, 1):
            raise ValueError(
                f"ensemble size {x.shape[0]} not divisible by {n_dev} devices"
            )
        spec = P(*((axis_name,) + (None,) * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, tree)
