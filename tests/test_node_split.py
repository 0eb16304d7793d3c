"""Node-height split of the blocked layout (heatx.build.blocking).

The Pallas hour kernel is VPU-throughput bound, so blocks are lane-split by
node count: few-node surfaces march as a short sub-batch.  The split is pure
layout — results must match the unsplit kernel to float tolerance (the only
reordering is the zone reduction, summed per sub-batch).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import heatx
from heatx.build.blocking import build_blocks
from heatx.build.layout import compile_building
from heatx.engine import state as state_mod
from heatx.ops import pallas_step

from test_pallas_hour import city_model


def _run(building, st, bb, mode, substeps, hours=2):
    hm, params = pallas_step.make_hour_march(
        bb, interpret=True, mode=mode, substeps=substeps, hours=hours
    )
    lay = bb.layout
    SP = lay.padded_surfaces
    sub = substeps or building.dt_subdivisions
    S = building.n_surfaces
    T0 = jnp.asarray(lay.surfaces_to_blocked(np.asarray(st.node_T)))
    zT0 = jnp.asarray(lay.zones_to_blocked(np.asarray(st.zone_T)))
    hi = (
        jnp.full((hours * sub,), 5.0),
        jnp.full((hours * sub,), 3.0),
        jnp.full((hours * sub,), 1.0),
        jnp.tile(jnp.asarray(lay.surfaces_to_blocked(np.full(S, 200.0)))[None], (hours, 1)),
        jnp.zeros((hours, SP)),
        jnp.tile(jnp.asarray(lay.surfaces_to_blocked(np.full(S, 320.0)))[None], (hours, 1)),
        jnp.zeros((hours, SP)),
        jnp.zeros((hours, bb.n_blocks, bb.zones_per_block)),
        jnp.zeros((hours, bb.n_blocks, bb.zones_per_block)),
    )
    T, zT, hq, _ = hm(params, T0, zT0, hi)
    return (
        lay.surfaces_from_blocked(np.asarray(T), S),
        lay.zones_from_blocked(np.asarray(zT), building.n_zones),
        [lay.surfaces_from_blocked(np.asarray(x), S) for x in hq],
    )


@pytest.mark.slow
@pytest.mark.parametrize("mode,substeps", [("parity", None), ("trbdf2", 6)])
def test_split_kernel_matches_unsplit(mode, substeps):
    m = city_model(5, 4)
    cfg = heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=2)
    building = compile_building(m, n=4, config=cfg).astype(np.float64)
    st = state_mod.initial_state(building)

    bb_ref = pallas_step.block_building(building, block_size=32, node_split=None)
    bb_split = pallas_step.block_building(building, block_size=32, node_split=(8, 16))
    assert len(bb_split.layout.split) == 2
    assert bb_split.layout.split[0][1] == 16  # short part width

    a = _run(building, st, bb_ref, mode, substeps)
    b = _run(building, st, bb_split, mode, substeps)
    assert np.max(np.abs(a[0] - b[0])) < 1e-9  # node temperatures
    assert np.max(np.abs(a[1] - b[1])) < 1e-9  # zone temperatures
    for k in range(4):
        assert np.max(np.abs(a[2][k] - b[2][k])) < 1e-9  # h / q channels


def test_auto_split_selection():
    """Auto mode splits when the padded-row savings are real, never strands a
    component, and keeps every zone's surfaces in one block."""
    m = city_model(40, 4)
    building = compile_building(m, n=4, config=heatx.SimConfig(dtype=np.float64))
    lay = build_blocks(building, block_size=192, node_split="auto", lane_quantum=64)
    assert lay.split is not None
    n_nodes = np.asarray(building.surfaces.n_nodes)
    perm = lay.surf_perm
    SB = lay.block_size
    assert SB == sum(w for _, w in lay.split)
    for b in range(lay.n_blocks):
        blk = perm[b * SB : (b + 1) * SB]
        lo = 0
        for rows, w in lay.split:
            for s in blk[lo : lo + w]:
                if s >= 0:
                    assert n_nodes[s] <= rows
            lo += w

    # small blocks (quantum > block) never split
    lay2 = build_blocks(building, block_size=16, node_split="auto")
    assert lay2.split is None


def test_forced_split_infeasible_falls_back():
    """A forced split whose capacities can't hold some component must fall
    back to the unsplit layout rather than mis-pack."""
    m = city_model(2, 4)  # component of 2 zones + partition: 9 surfaces
    building = compile_building(m, n=4, config=heatx.SimConfig(dtype=np.float64))
    # short width 1 cannot hold the component's short surfaces
    lay = build_blocks(building, block_size=16, node_split=(8, 1))
    assert lay.split is None
    # every surface present exactly once
    perm = lay.surf_perm
    placed = sorted(s for s in perm if s >= 0)
    assert placed == list(range(building.n_surfaces))


def test_partition_covers_every_surface_once():
    """The k-part packing never duplicates or drops a surface, and zone
    tables stay consistent with the one-hot matrices."""
    m = city_model(7, 5)
    building = compile_building(m, n=2, config=heatx.SimConfig(dtype=np.float64))
    lay = build_blocks(building, block_size=64, node_split="auto", lane_quantum=8)
    perm = lay.surf_perm
    placed = sorted(s for s in perm if s >= 0)
    assert placed == list(range(building.n_surfaces))
    zt = lay.zone_table
    zs = sorted(z for z in zt.ravel() if z >= 0)
    assert zs == list(range(building.n_zones))
    # each space-facing surface has exactly one 1 in its one-hot row
    fronts = np.asarray(building.surfaces.front_code)
    backs = np.asarray(building.surfaces.back_code)
    from heatx.build.layout import B_SPACE
    for sp in range(lay.padded_surfaces):
        s = perm[sp]
        if s < 0:
            continue
        assert lay.front_oh[sp].sum() == (1.0 if fronts[s] == B_SPACE else 0.0)
        assert lay.back_oh[sp].sum() == (1.0 if backs[s] == B_SPACE else 0.0)
