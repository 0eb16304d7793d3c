"""Multi-zone integration: partition coupling, equilibrium, and the sharded
whole-sequence scan."""

import jax
import numpy as np
import pytest

import heatx
from heatx.build.layout import compile_building
from heatx.engine import state as state_mod, step as step_mod, zone as zone_mod
from heatx.model.building import (
    Boundary, BuildingModel, Construction, ElectricHeater, Material,
    SpaceDef, Substance, SurfaceDef,
)
from heatx.parallel import sharding as sh


def two_zone_model():
    m = BuildingModel()
    m.add_substance(
        Substance("conc", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0,
                  front_thermal_absorbtance=0.0, back_thermal_absorbtance=0.0)
    )
    m.add_material(Material("c10", "conc", 0.1))
    m.add_construction(Construction("wall", ["c10"]))
    m.add_space(SpaceDef("hot", 100.0))
    m.add_space(SpaceDef("cold", 100.0))
    verts = np.array([[0, 0, 0], [5, 0, 0], [5, 0, 3], [0, 0, 3]], float)
    m.add_surface(SurfaceDef("ext-hot", "wall", Boundary.outdoor(), Boundary.space_("hot"), vertices=verts))
    m.add_surface(SurfaceDef("ext-cold", "wall", Boundary.outdoor(), Boundary.space_("cold"), vertices=verts))
    m.add_surface(SurfaceDef("partition", "wall", Boundary.space_("hot"), Boundary.space_("cold"), vertices=verts))
    m.add_hvac(ElectricHeater("h", "hot"))
    return m


def test_partition_couples_zones():
    tm = heatx.ThermalModel(two_zone_model(), n=4, config=heatx.SimConfig(dtype=np.float64))
    st = tm.initial_state()
    inp = tm.inputs(t_out=0.0, hvac_power=np.array([2000.0]))
    for _ in range(24 * 4):
        st = tm.march(st, inp)
    hot, cold = float(st.zone_T[0]), float(st.zone_T[1])
    # heat flows hot -> partition -> cold: ordering and coupling
    assert hot > cold > 0.0
    # model.rs:161-169 sign convention: flow = (T_surface - T_air) * h, i.e.
    # positive = heat delivered INTO the adjacent zone.  The partition sits
    # between hot and cold air, so its front face (hot side) absorbs
    # (negative) and its back face (cold side) delivers (positive).
    assert float(st.q_front[2]) < 0.0
    assert float(st.q_back[2]) > 0.0


def test_isothermal_equilibrium_multizone():
    """Everything at 15 C with no gains -> every node and zone settles at
    15 C (global equilibrium sanity across the zone coupling)."""
    m = two_zone_model()
    tm = heatx.ThermalModel(m, n=2, config=heatx.SimConfig(dtype=np.float64))
    st = tm.initial_state()
    from heatx.constants import SIGMA

    ir = SIGMA * (15.0 + 273.15) ** 4
    S = tm.building.n_surfaces
    inp = tm.inputs(t_out=15.0, ir_front=np.full(S, ir), ir_back=np.full(S, ir))
    for _ in range(3000):
        st = tm.march(st, inp)
    # within the no-mass relaxation tolerance of the scheme (0.01 C/node)
    np.testing.assert_allclose(np.asarray(st.zone_T), 15.0, atol=1e-2)
    masked = np.asarray(st.node_T)[np.asarray(tm.building.surfaces.node_mask)]
    np.testing.assert_allclose(masked, 15.0, atol=2e-2)


def test_mean_future_temperatures():
    """Mean-T variant (model.rs:617-644; dead code upstream, exposed here):
    average of T(t) over dt sits between T0 and T(dt)."""
    t0 = np.array([20.0])
    a, b, c = np.array([3000.0]), np.array([100.0]), np.array([120000.0])
    t_end = float(zone_mod.future_zone_temperatures(t0, a, b, c, 600.0)[0])
    t_mean = float(zone_mod.mean_future_zone_temperatures(t0, a, b, c, 600.0)[0])
    assert min(20.0, t_end) < t_mean < max(20.0, t_end)
    # closed-form check
    import math

    x = b[0] * 600.0 / c[0]
    exp_mean = a[0] / b[0] + (c[0] * (t0[0] - a[0] / b[0]) / (600.0 * b[0])) * (
        1.0 - math.exp(-x)
    )
    np.testing.assert_allclose(t_mean, exp_mean, rtol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_run_matches_single_device():
    m = two_zone_model()
    # pad to 8 for the mesh
    building = compile_building(
        m, n=4, config=heatx.SimConfig(dtype=np.float64), pad_surfaces_to=8
    )
    state0 = state_mod.initial_state(building)
    T = 5
    single = state_mod.default_inputs(building, t_out=-3.0, wind_speed=2.0,
                                      hvac_power=np.array([1500.0]))
    seq = jax.tree.map(
        lambda x: np.broadcast_to(np.asarray(x)[None], (T,) + np.asarray(x).shape).copy(),
        single,
    )
    ref_state, ref_hist = step_mod.run(building, state0, seq)

    mesh = sh.make_mesh(jax.devices()[:8])
    run_sh = sh.make_sharded_run(building, mesh)
    st = sh.shard_state(state0, mesh)
    out_state, hist = run_sh(st, seq)
    np.testing.assert_allclose(np.asarray(hist), np.asarray(ref_hist), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(out_state.zone_T), np.asarray(ref_state.zone_T), atol=1e-12
    )


def test_fast_mode_partition_coupling():
    """TR-BDF2 fast mode on a partitioned two-zone building: heat must flow
    hot -> partition -> cold exactly like the parity path (tolerance covers
    the per-step coefficient freeze)."""
    cfg = heatx.SimConfig(dtype=np.float64)
    tm = heatx.ThermalModel(two_zone_model(), n=1, config=cfg)
    inputs = tm.inputs(
        t_out=np.float64(0.0),
        wind_speed=np.float64(3.0),
        hvac_power=np.array([800.0]),
    )
    stp = tm.initial_state()
    stf = tm.initial_state()
    for _ in range(48):
        stp = tm.march(stp, inputs)
        stf = tm.march_imp(stf, inputs, substeps=8)
    zp = np.asarray(stp.zone_T)
    zf = np.asarray(stf.zone_T)
    assert zf[0] > zf[1] > 0.0  # heated zone warmer, cold zone above outdoor
    np.testing.assert_allclose(zf, zp, atol=0.3)
