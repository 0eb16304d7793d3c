"""Ensemble (vmap) simulation: many building variants in one program.

Contract: every ensemble member's result equals the same variant run alone
through the same integrator — the ensemble axis is pure batching, and it
shards over the device mesh with no cross-member communication.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import heatx
from heatx import ensemble
from heatx.build.layout import compile_building
from heatx.engine import state as state_mod
from heatx.engine import step as step_mod
from heatx.testing import SingleZoneOptions, TestMat, single_zone_building


def _model(solar_absorbtance=0.7):
    opts = SingleZoneOptions(
        construction=[TestMat.polyurethane(0.02), TestMat.concrete(0.1)],
        heating_power=300.0,
        solar_absorbtance=solar_absorbtance,
    )
    return single_zone_building(opts)


def _compile(model):
    cfg = heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1)
    return compile_building(model, n=1, config=cfg).astype(jnp.float64)


def _inputs_seq(building, T=4):
    one = state_mod.default_inputs(
        building,
        t_out=2.0,
        wind_speed=3.0,
        wind_direction=0.7,
        sol_front=np.full(building.n_surfaces, 180.0),
        ir_front=np.full(building.n_surfaces, 320.0),
        hvac_power=np.full(building.n_hvacs, 300.0),
    )
    seq = jax.tree.map(lambda x: jnp.broadcast_to(x, (T,) + jnp.shape(x)), one)
    t_out = jnp.asarray(2.0 + 3.0 * np.sin(np.arange(T)), jnp.float64)
    return seq._replace(t_out=t_out)


ALPHAS = [0.45, 0.7, 0.9]


@pytest.fixture(scope="module")
def stacked():
    builds = [_compile(_model(a)) for a in ALPHAS]
    b_e = ensemble.stack_pytrees(builds)
    st_e = ensemble.ensemble_initial_state(b_e, len(ALPHAS))
    return builds, b_e, st_e


@pytest.mark.parametrize("mode", ["parity", "trbdf2"])
def test_stacked_matches_individual(stacked, mode):
    builds, b_e, st_e = stacked
    seq = _inputs_seq(builds[0])
    sub = None if mode == "parity" else 2
    run = ensemble.make_run(mode=mode, substeps=sub, jit=False)
    state_e, hist_e = run(b_e, st_e, seq)
    assert hist_e.shape == (len(builds), 4, builds[0].n_zones)
    single = ensemble._seq_run(mode, sub, True)
    for i, b in enumerate(builds):
        st = state_mod.initial_state(b)
        state_i, hist_i = single(b, st, seq)
        np.testing.assert_allclose(np.asarray(hist_e[i]), np.asarray(hist_i),
                                   rtol=0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(state_e.node_T[i]),
                                   np.asarray(state_i.node_T), rtol=0, atol=1e-12)
    # The absorptance variants actually diverge (the ensemble isn't trivial).
    assert float(jnp.abs(hist_e[0, -1] - hist_e[-1, -1]).max()) > 1e-3


def test_param_ensemble_and_gradient():
    b = _compile(_model())
    st = state_mod.initial_state(b)
    seq = _inputs_seq(b)
    sb0 = b.surfaces

    def apply_fn(building, params):
        sb = dataclasses.replace(sb0, seg_u=sb0.seg_u * params["u_scale"])
        return dataclasses.replace(building, surfaces=sb)

    scales = jnp.asarray([0.8, 1.0, 1.25], jnp.float64)
    params_e = {"u_scale": scales}
    _, hist_e = ensemble.run_param_ensemble(b, apply_fn, params_e, st, seq)
    # vs the member run alone
    _, hist_1 = step_mod.run(b, st, seq)
    np.testing.assert_allclose(np.asarray(hist_e[1]), np.asarray(hist_1),
                               rtol=0, atol=1e-12)
    # More insulation (smaller U) holds the heated zone warmer.
    assert float(hist_e[0, -1, 0]) > float(hist_e[2, -1, 0])

    # Population gradients: one backward pass per member via vmap(grad).
    def loss(u_scale):
        bb = apply_fn(b, {"u_scale": u_scale})
        _, hist = step_mod.run(bb, st, seq)
        return jnp.mean(hist)

    g = jax.vmap(jax.grad(loss))(scales)
    assert g.shape == scales.shape
    assert np.all(np.isfinite(np.asarray(g)))
    assert float(jnp.abs(g).min()) > 0.0


def test_sharded_ensemble_matches_unsharded(stacked):
    from heatx.parallel import sharding as sh

    builds, _, _ = stacked
    E = 8
    variants = [builds[i % len(builds)] for i in range(E)]
    b_e = ensemble.stack_pytrees(variants)
    st_e = ensemble.ensemble_initial_state(b_e, E)
    seq = _inputs_seq(variants[0], T=3)

    run = ensemble.make_run(mode="parity", jit=True)
    ref_state, ref_hist = run(b_e, st_e, seq)

    mesh = sh.make_mesh(jax.devices("cpu")[:8], axis_name="ens")
    b_s = ensemble.shard_ensemble(b_e, mesh)
    st_s = ensemble.shard_ensemble(st_e, mesh)
    out_state, out_hist = run(b_s, st_s, seq)
    np.testing.assert_allclose(np.asarray(out_hist), np.asarray(ref_hist),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out_state.zone_T),
                               np.asarray(ref_state.zone_T), rtol=0, atol=1e-12)


def test_ensemble_demand_sweep():
    """Thermostats compose with the ensemble axis: sweeping the heating
    setpoint over one compiled building returns a per-member demand history,
    monotone in the setpoint."""
    import dataclasses

    from heatx.model.building import IdealHeaterCooler

    m = _model()
    m.add_hvac(IdealHeaterCooler("t", ["Space"], heat_setpoint=20.0))
    b = _compile(m)
    st = state_mod.initial_state(b)
    seq = _inputs_seq(b, T=6)._replace(
        t_out=jnp.full((6,), -5.0, jnp.float64),
        hvac_power=jnp.zeros((6, b.n_hvacs), jnp.float64),
    )

    def apply_fn(bld, sp):
        return dataclasses.replace(bld, ctl_heat_sp=jnp.full_like(bld.ctl_heat_sp, sp))

    setpoints = jnp.asarray([23.0, 24.0, 25.0], jnp.float64)
    _, (zt, loads) = ensemble.run_param_ensemble(
        b, apply_fn, setpoints, st, seq, mode="trbdf2", substeps=2,
        collect_loads=True,
    )
    loads = np.asarray(loads)  # [E, T, Z]
    assert loads.shape == (3, 6, 1)
    totals = loads.sum(axis=(1, 2))
    assert totals[0] < totals[1] < totals[2]  # higher setpoint, more demand
    # Each member pinned at its own setpoint by the end.
    zt = np.asarray(zt)
    for i, sp in enumerate([23.0, 24.0, 25.0]):
        assert abs(zt[i, -1, 0] - sp) < 1e-6, (i, zt[i, -1, 0])


def test_stack_rejects_mismatched_layouts():
    b1 = _compile(_model())
    # A different construction discretizes to a different node layout.
    opts = SingleZoneOptions(
        construction=[TestMat.concrete(0.2)], heating_power=300.0
    )
    b2 = _compile(single_zone_building(opts))
    with pytest.raises(ValueError):
        ensemble.stack_pytrees([b1, b2])
