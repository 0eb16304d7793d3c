"""Setpoint-driven ideal-loads HVAC (thermostat control).

The reference stubs IdealHeaterCooler with ``todo!()``
(heating_cooling.rs:66-90); heatx implements the EnergyPlus
ideal-loads-air-system pattern on the analytical zone update
(heatx/engine/zone.py::zone_update).  Contracts tested:

* the controller lands the zone EXACTLY on the setpoint when capacity
  allows (the closed-form inversion of model.rs:650-674's update);
* at the capacity limit the trajectory is bit-identical to an
  ElectricHeater delivering max power;
* inside the deadband the update is bit-identical to the uncontrolled
  building;
* the load history is energy-consistent and differentiable.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import heatx
from heatx.build.layout import compile_building
from heatx.engine import state as state_mod
from heatx.engine import step as step_mod
from heatx.model.building import ElectricHeater, IdealHeaterCooler
from heatx.testing import SingleZoneOptions, TestMat, single_zone_building


def _model(hvac=None, heating_power=0.0):
    opts = SingleZoneOptions(
        construction=[TestMat.polyurethane(0.02), TestMat.concrete(0.1)],
        heating_power=heating_power,
        infiltration_rate=0.01,
    )
    m = single_zone_building(opts)
    if hvac is not None:
        m.add_hvac(hvac)
    return m


def _compile(m):
    cfg = heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1)
    return compile_building(m, n=1, config=cfg).astype(jnp.float64)


def _seq(b, T, t_out=-5.0, sol=0.0):
    one = state_mod.default_inputs(
        b,
        t_out=t_out,
        wind_speed=3.0,
        sol_front=np.full(b.n_surfaces, sol),
        inf_vol=np.full(b.n_zones, 0.01),
        inf_temp=np.full(b.n_zones, t_out),
        inf_mask=np.ones(b.n_zones, bool),
    )
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (T,) + jnp.shape(x)), one)


def test_heating_pins_setpoint_and_reports_load():
    b = _compile(_model(IdealHeaterCooler(
        "ideal", ["Space"], heat_setpoint=20.0, cool_setpoint=27.0)))
    assert b.has_ideal_hvac
    st = state_mod.initial_state(b)
    assert st.ideal_load is not None and st.ideal_load.shape == (1,)
    T = 48
    state, (zt, loads) = step_mod.run(b, st, _seq(b, T), collect_loads=True)
    zt, loads = np.asarray(zt), np.asarray(loads)
    assert zt.shape == loads.shape == (T, 1)
    # After the initial free cool-down from 22 C, the thermostat holds the
    # zone exactly at the heating setpoint.
    assert np.all(np.abs(zt[24:] - 20.0) < 1e-9), zt[24:, 0]
    assert np.all(loads[24:] > 0.0)
    # Steady load balances the envelope: re-running with an ElectricHeater at
    # the steady load reproduces the same steady temperature.
    steady = float(loads[-1, 0])
    b2 = _compile(_model(heating_power=1.0))
    st2 = state_mod.initial_state(b2)
    seq2 = _seq(b2, T)._replace(
        hvac_power=jnp.full((T, b2.n_hvacs), steady, jnp.float64))
    _, zt2 = step_mod.run(b2, st2, seq2)
    assert abs(float(np.asarray(zt2)[-1, 0]) - 20.0) < 0.05


def test_capacity_limit_equals_electric_heater():
    cap = 40.0
    b_ctl = _compile(_model(IdealHeaterCooler(
        "ideal", ["Space"], heat_setpoint=35.0, max_heating=cap)))
    b_el = _compile(_model(heating_power=1.0))
    T = 24
    st = state_mod.initial_state(b_ctl)
    _, (zt_ctl, loads) = step_mod.run(b_ctl, st, _seq(b_ctl, T), collect_loads=True)
    # The 35 C setpoint is unreachable at 40 W: the controller saturates...
    assert np.all(np.asarray(loads) == cap)
    # ...and the trajectory is bit-identical to an ElectricHeater at 40 W.
    seq = _seq(b_el, T)._replace(
        hvac_power=jnp.full((T, b_el.n_hvacs), cap, jnp.float64))
    _, zt_el = step_mod.run(b_el, state_mod.initial_state(b_el), seq)
    np.testing.assert_array_equal(np.asarray(zt_ctl), np.asarray(zt_el))


def test_deadband_is_bit_identical_to_uncontrolled():
    b_ctl = _compile(_model(IdealHeaterCooler(
        "ideal", ["Space"], heat_setpoint=-40.0, cool_setpoint=90.0)))
    b_free = _compile(_model())
    T = 24
    _, (zt_ctl, loads) = step_mod.run(
        b_ctl, state_mod.initial_state(b_ctl), _seq(b_ctl, T), collect_loads=True
    )
    _, zt_free = step_mod.run(b_free, state_mod.initial_state(b_free), _seq(b_free, T))
    assert np.all(np.asarray(loads) == 0.0)
    np.testing.assert_array_equal(np.asarray(zt_ctl), np.asarray(zt_free))


def test_cooling_pins_setpoint():
    b = _compile(_model(IdealHeaterCooler(
        "ideal", ["Space"], heat_setpoint=15.0, cool_setpoint=24.0)))
    T = 48
    state, (zt, loads) = step_mod.run(
        b, state_mod.initial_state(b), _seq(b, T, t_out=32.0, sol=500.0),
        collect_loads=True,
    )
    zt, loads = np.asarray(zt), np.asarray(loads)
    assert np.all(np.abs(zt[24:] - 24.0) < 1e-9)
    assert np.all(loads[24:] < 0.0)


@pytest.mark.parametrize("mode", ["trbdf2", "exponential"])
def test_fast_modes_track_parity(mode):
    b = _compile(_model(IdealHeaterCooler(
        "ideal", ["Space"], heat_setpoint=20.0, cool_setpoint=27.0)))
    if mode == "trbdf2":
        from heatx.engine.implicit import imp_march as march_fn
    else:
        from heatx.engine.exponential import exp_march as march_fn
    T = 36
    seq = _seq(b, T)
    _, (zt_p, loads_p) = step_mod.run(
        b, state_mod.initial_state(b), seq, collect_loads=True
    )
    st = state_mod.initial_state(b)
    zts, lds = [], []
    march = jax.jit(lambda s, x: march_fn(b, s, jax.tree.map(lambda v: v, x), 8))
    for t in range(T):
        st = march(st, jax.tree.map(lambda v: v[t], seq))
        zts.append(float(st.zone_T[0]))
        lds.append(float(st.ideal_load[0]))
    # Same setpoint pinning; loads agree to the frozen-h approximation.
    assert abs(zts[-1] - float(np.asarray(zt_p)[-1, 0])) < 0.05
    assert abs(lds[-1] - float(np.asarray(loads_p)[-1, 0])) < 2.0


def test_annual_demand_gradient():
    """Annual heating demand is differentiable w.r.t. the envelope: more
    insulation (smaller U) means less demand."""
    b = _compile(_model(IdealHeaterCooler("ideal", ["Space"], heat_setpoint=20.0)))
    T = 24
    seq = _seq(b, T)
    st = state_mod.initial_state(b)
    sb0 = b.surfaces

    def demand(u_scale):
        bb = dataclasses.replace(
            b, surfaces=dataclasses.replace(sb0, seg_u=sb0.seg_u * u_scale)
        )
        _, (_, loads) = step_mod.run(bb, st, seq, collect_loads=True)
        return jnp.sum(loads[12:])  # W-hours over the settled window

    g = jax.grad(demand)(jnp.asarray(1.0, jnp.float64))
    assert np.isfinite(float(g))
    assert float(g) > 0.0  # more conductance -> more heating demand
    # FD cross-check
    eps = 1e-4
    fd = (float(demand(1.0 + eps)) - float(demand(1.0 - eps))) / (2 * eps)
    np.testing.assert_allclose(float(g), fd, rtol=1e-5)


def test_build_validation():
    with pytest.raises(ValueError, match="below cool_setpoint"):
        _compile(_model(IdealHeaterCooler(
            "x", ["Space"], heat_setpoint=25.0, cool_setpoint=20.0)))
    m = _model(IdealHeaterCooler("a", ["Space"], heat_setpoint=20.0))
    m.add_hvac(IdealHeaterCooler("b", ["Space"], cool_setpoint=26.0))
    with pytest.raises(ValueError, match="controlled by both"):
        _compile(m)
    with pytest.raises(ValueError, match="collect_loads"):
        b = _compile(_model())
        step_mod.run(b, state_mod.initial_state(b), _seq(b, 2), collect_loads=True)


def test_kernel_matches_xla_fast_mode():
    """The fused kernel's in-kernel thermostat (FastRunner path) matches the
    XLA TR-BDF2 march: same setpoint pinning, same loads, same final state."""
    from heatx.engine.implicit import imp_march

    m = _model(IdealHeaterCooler(
        "ideal", ["Space"], heat_setpoint=20.0, cool_setpoint=27.0))
    tm = heatx.ThermalModel(
        m, n=1, config=heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1)
    )
    b = tm._device()
    T = 8
    seq = _seq(b, T)
    fr = tm.fast_runner(block_size=8, mode="trbdf2", substeps=4, hours=2)
    st0 = tm.initial_state()
    final, zt_k, loads_k = fr.run(st0, seq, collect_loads=True)
    zt_k, loads_k = np.asarray(zt_k), np.asarray(loads_k)
    assert zt_k.shape == loads_k.shape == (T, 1)

    st = tm.initial_state()
    zts, lds = [], []
    for t in range(T):
        st = imp_march(b, st, jax.tree.map(lambda v: v[t], seq), 4)
        zts.append(float(st.zone_T[0]))
        lds.append(float(st.ideal_load[0]))
    np.testing.assert_allclose(zt_k[:, 0], zts, rtol=0, atol=1e-7)
    np.testing.assert_allclose(loads_k[:, 0], lds, rtol=1e-6, atol=1e-4)
    np.testing.assert_allclose(
        float(final.ideal_load[0]), lds[-1], rtol=1e-6, atol=1e-4
    )
    # march() (single hour) also reports the load channel.
    fr1 = tm.fast_runner(block_size=8, mode="trbdf2", substeps=4, hours=1)
    st1 = fr1.march(st0, jax.tree.map(lambda v: v[0], seq))
    assert st1.ideal_load is not None and np.isfinite(float(st1.ideal_load[0]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_parity_kernel_matches_xla_parity():
    """The PARITY hour kernel's in-kernel thermostat matches the XLA parity
    march (same reference sub-step physics + the same control law)."""
    m = _model(IdealHeaterCooler(
        "ideal", ["Space"], heat_setpoint=23.0, cool_setpoint=28.0))
    tm = heatx.ThermalModel(
        m, n=1, config=heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1)
    )
    b = tm._device()
    T = 4
    seq = _seq(b, T)
    fr = tm.fast_runner(block_size=8, mode="parity", hours=2)
    final_k, zt_k, loads_k = fr.run(tm.initial_state(), seq, collect_loads=True)
    final_x, (zt_x, loads_x) = step_mod.run(
        b, tm.initial_state(), seq, collect_loads=True
    )
    np.testing.assert_allclose(
        np.asarray(zt_k), np.asarray(zt_x), rtol=0, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(loads_k), np.asarray(loads_x), rtol=1e-6, atol=1e-4
    )
    assert float(np.asarray(loads_x).max()) > 0.0


def test_sharded_kernel_with_thermostats_matches_unsharded():
    """The in-kernel thermostat shards with the blocks (zone-closed, so the
    control is block-local): sharded == unsharded bit-for-bit, including the
    demand history."""
    from heatx.build.layout import compile_building as cb
    from heatx.model.building import (
        Boundary, BuildingModel, Construction, Material, SpaceDef, Substance,
        SurfaceDef,
    )
    from heatx.ops import pallas_step
    from heatx.parallel import sharding as sh

    m = BuildingModel()
    m.add_substance(Substance(
        "concrete", thermal_conductivity=0.816, density=1700.0,
        specific_heat_capacity=800.0))
    m.add_material(Material("c20", "concrete", 0.2))
    m.add_construction(Construction("massive", ["c20"]))
    verts = np.array([[0, 0, 0], [6, 0, 0], [6, 0, 3], [0, 0, 3]], float)
    for z in range(8):
        m.add_space(SpaceDef(f"z{z}", 150.0))
        for si in range(3):
            m.add_surface(SurfaceDef(
                f"s{z}_{si}", "massive", Boundary.outdoor(),
                Boundary.space_(f"z{z}"), vertices=verts))
        # Setpoints above the 22 C initial state so heating engages within
        # the short 2 h window (massive zones cool only ~0.1 K/2 h).
        m.add_hvac(IdealHeaterCooler(
            f"t{z}", [f"z{z}"], heat_setpoint=23.0 + 0.25 * z, cool_setpoint=29.0))
    cfg = heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=2)
    building = cb(m, n=1, config=cfg).astype(np.float64)
    bb = pallas_step.block_building(building, block_size=4)
    assert bb.n_blocks == 8 and bb.ctl is not None

    from heatx.engine import state as state_mod

    hours, sub = 2, 4
    lay = bb.layout
    SP = lay.padded_surfaces
    NB, ZB = bb.n_blocks, bb.zones_per_block
    st = state_mod.initial_state(building)
    T0 = jnp.asarray(lay.surfaces_to_blocked(np.asarray(st.node_T)))
    zT0 = jnp.asarray(lay.zones_to_blocked(np.asarray(st.zone_T)))
    hi = (
        jnp.full((hours * sub,), -3.0),
        jnp.full((hours * sub,), 3.0),
        jnp.full((hours * sub,), 1.0),
        jnp.zeros((hours, SP)),
        jnp.zeros((hours, SP)),
        jnp.tile(jnp.asarray(
            lay.surfaces_to_blocked(np.full(building.n_surfaces, 320.0)))[None],
            (hours, 1)),
        jnp.zeros((hours, SP)),
        jnp.zeros((hours, NB, ZB)),
        jnp.zeros((hours, NB, ZB)),
    )
    hm0, p0 = pallas_step.make_hour_march(
        bb, substeps=sub, mode="trbdf2", hours=hours, interpret=True)
    assert hm0.collect_loads
    T_a, zT_a, hq_a, hist_a, ld_a = hm0(p0, T0, zT0, hi)
    assert np.asarray(ld_a).shape == (hours, NB, ZB)
    assert np.asarray(ld_a).max() > 0  # setpoints above 22 C: heating engages

    mesh = sh.make_mesh(jax.devices()[:8])
    hm1, p1 = sh.make_sharded_hour_march(
        bb, mesh, substeps=sub, mode="trbdf2", hours=hours, interpret=True)
    T_b, zT_b, hq_b, hist_b, ld_b = jax.jit(hm1)(p1, T0, zT0, hi)
    np.testing.assert_array_equal(np.asarray(zT_a), np.asarray(zT_b))
    np.testing.assert_array_equal(np.asarray(hist_a), np.asarray(hist_b))
    np.testing.assert_array_equal(np.asarray(ld_a), np.asarray(ld_b))


def test_setpoint_schedules():
    """Time-varying setpoints (StepInputs.heat_sp/cool_sp): a night-setback
    schedule pins each hour at that hour's setpoint; a [Z] constant schedule
    equals the compiled setpoints bit-for-bit."""
    b = _compile(_model(IdealHeaterCooler(
        "ideal", ["Space"], heat_setpoint=21.0, cool_setpoint=28.0)))
    T = 48
    seq = _seq(b, T)
    # Constant schedule == compiled setpoints: identical trajectories.
    seq_const = seq._replace(
        heat_sp=jnp.full((b.n_zones,), 21.0, jnp.float64),
        cool_sp=jnp.full((b.n_zones,), 28.0, jnp.float64),
    )
    _, (zt0, ld0) = step_mod.run(b, state_mod.initial_state(b), seq,
                                 collect_loads=True)
    _, (zt1, ld1) = step_mod.run(b, state_mod.initial_state(b), seq_const,
                                 collect_loads=True)
    np.testing.assert_array_equal(np.asarray(zt0), np.asarray(zt1))
    np.testing.assert_array_equal(np.asarray(ld0), np.asarray(ld1))

    # Night setback: 17 C from 22:00-06:00, 22 C otherwise.
    hours = np.arange(T) % 24
    sp = np.where((hours >= 22) | (hours < 6), 17.0, 22.0)
    seq_sched = seq._replace(heat_sp=jnp.asarray(sp, jnp.float64)[:, None])
    _, (zt, ld) = step_mod.run(b, state_mod.initial_state(b), seq_sched,
                               collect_loads=True)
    zt = np.asarray(zt)[:, 0]
    # After the first day, daytime hours pin at 22, deep-night hours sit at
    # or above 17 (the zone may not cool to 17 within the setback window).
    day = (hours >= 8) & (hours < 22) & (np.arange(T) >= 24)
    night = (hours >= 23) | (hours < 6)
    night &= np.arange(T) >= 24
    assert np.all(np.abs(zt[day] - 22.0) < 1e-6), zt[day]
    assert np.all(zt[night] >= 17.0 - 1e-9)
    assert zt[night].min() < 21.0  # the setback actually lets it drift down
    # Scheduled setback uses less energy than holding 22 C around the clock.
    seq_hold = seq._replace(heat_sp=jnp.full((T, b.n_zones), 22.0, jnp.float64))
    _, (_, ld_hold) = step_mod.run(b, state_mod.initial_state(b), seq_hold,
                                   collect_loads=True)
    assert float(np.asarray(ld).sum()) < float(np.asarray(ld_hold).sum())

    # The fast mode takes the same schedule per main step.
    from heatx.engine.implicit import imp_march

    st = state_mod.initial_state(b)
    st = imp_march(b, st, jax.tree.map(lambda v: v[30], seq_sched), 4)
    assert np.isfinite(float(st.ideal_load[0]))


def test_schedule_shape_forms():
    """[T] per-step scalar schedules, [Z] constants, and [1, Z] constants
    all normalize consistently (regression: a 1-D [T] schedule was once
    broadcast to (T, T))."""
    b = _compile(_model(IdealHeaterCooler(
        "ideal", ["Space"], heat_setpoint=21.0, cool_setpoint=29.0)))
    T = 10
    seq = _seq(b, T)
    sp = np.where(np.arange(T) % 2 == 0, 24.0, 23.0)
    # [T] scalar series == explicit [T, Z]
    _, (zt_a, _) = step_mod.run(
        b, state_mod.initial_state(b),
        seq._replace(heat_sp=jnp.asarray(sp)), collect_loads=True)
    _, (zt_b, _) = step_mod.run(
        b, state_mod.initial_state(b),
        seq._replace(heat_sp=jnp.asarray(sp)[:, None]), collect_loads=True)
    np.testing.assert_array_equal(np.asarray(zt_a), np.asarray(zt_b))
    # FastRunner: [T] series, [Z] constant, [1, Z] constant all run and the
    # constants equal the compiled values.
    tm = heatx.ThermalModel(_model(IdealHeaterCooler(
        "i2", ["Space"], heat_setpoint=23.0, cool_setpoint=29.0)),
        n=1, config=heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1))
    fr = tm.fast_runner(block_size=8, mode="trbdf2", substeps=4, hours=2,
                        scheduled_setpoints=True)
    bb = tm._device()
    seq2 = _seq(bb, T=8)
    st = tm.initial_state()
    _, zt0, _ = fr.run(st, seq2, collect_loads=True)
    for form in (jnp.full((bb.n_zones,), 23.0, jnp.float64),
                 jnp.full((1, bb.n_zones), 23.0, jnp.float64)):
        _, zt1, _ = fr.run(st, seq2._replace(heat_sp=form), collect_loads=True)
        np.testing.assert_allclose(np.asarray(zt1), np.asarray(zt0),
                                   rtol=0, atol=1e-12)
    sp8 = jnp.full((8,), 23.0, jnp.float64)  # [T] scalar series, same value
    _, zt2, _ = fr.run(st, seq2._replace(heat_sp=sp8), collect_loads=True)
    np.testing.assert_allclose(np.asarray(zt2), np.asarray(zt0),
                               rtol=0, atol=1e-12)
    # march() on a scheduled runner honors per-call constant setpoints.
    fr1 = tm.fast_runner(block_size=8, mode="trbdf2", substeps=4, hours=1,
                         scheduled_setpoints=True)
    one = jax.tree.map(lambda v: v[0], seq2)
    st_hot = fr1.march(st, one._replace(heat_sp=jnp.asarray(25.0, jnp.float64)))
    st_def = fr1.march(st, one)
    assert float(st_hot.zone_T[0]) > float(st_def.zone_T[0])


def test_sharded_march_with_schedules():
    """make_sharded_march(scheduled_setpoints=True) marches with per-zone
    setpoint overrides, matching the single-device march."""
    from heatx.build.layout import compile_building as cb
    from heatx.engine.implicit import imp_march
    from heatx.parallel import sharding as sh

    m = _model(IdealHeaterCooler(
        "ideal", ["Space"], heat_setpoint=21.0, cool_setpoint=29.0))
    cfg = heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1)
    b = cb(m, n=1, config=cfg, pad_surfaces_to=8).astype(jnp.float64)
    mesh = sh.make_mesh(jax.devices("cpu")[:8])
    march = sh.make_sharded_march(
        b, mesh, mode="trbdf2", substeps=4, scheduled_setpoints=True
    )
    st = state_mod.initial_state(b)
    inp = state_mod.default_inputs(b, t_out=-5.0, wind_speed=3.0)._replace(
        heat_sp=jnp.full((b.n_zones,), 24.0, jnp.float64),
        cool_sp=jnp.full((b.n_zones,), 29.0, jnp.float64),
    )
    out = march(sh.shard_state(st, mesh), sh.shard_inputs(inp, mesh))
    ref = imp_march(b, st, inp, 4)
    np.testing.assert_allclose(np.asarray(out.zone_T), np.asarray(ref.zone_T),
                               rtol=0, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.ideal_load),
                               np.asarray(ref.ideal_load), rtol=0, atol=1e-9)


def test_kernel_setpoint_schedules_match_xla():
    """The fused kernel takes per-hour setpoint schedules too
    (FastRunner(scheduled_setpoints=True)): night setback through the
    kernel matches the XLA TR-BDF2 march with the same schedule."""
    from heatx.engine.implicit import imp_march

    m = _model(IdealHeaterCooler(
        "ideal", ["Space"], heat_setpoint=21.0, cool_setpoint=29.0))
    tm = heatx.ThermalModel(
        m, n=1, config=heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1)
    )
    b = tm._device()
    T = 8
    sp = np.where(np.arange(T) % 8 < 4, 24.0, 18.0)  # alternating setback
    seq = _seq(b, T)._replace(heat_sp=jnp.asarray(sp, jnp.float64)[:, None])

    fr = tm.fast_runner(block_size=8, mode="trbdf2", substeps=4, hours=2,
                        scheduled_setpoints=True)
    _, zt_k, ld_k = fr.run(tm.initial_state(), seq, collect_loads=True)

    st = tm.initial_state()
    zts, lds = [], []
    for t in range(T):
        st = imp_march(b, st, jax.tree.map(lambda v: v[t], seq), 4)
        zts.append(float(st.zone_T[0]))
        lds.append(float(st.ideal_load[0]))
    np.testing.assert_allclose(np.asarray(zt_k)[:, 0], zts, rtol=0, atol=1e-7)
    np.testing.assert_allclose(np.asarray(ld_k)[:, 0], lds, rtol=1e-6, atol=1e-4)
    # The schedule actually switches regimes (pins 24 then floats/pins 18).
    assert abs(zts[3] - 24.0) < 1e-6
    # Without the flag, schedules are rejected with a clear error.
    fr0 = tm.fast_runner(block_size=8, mode="trbdf2", substeps=4, hours=2)
    with pytest.raises(ValueError, match="scheduled_setpoints"):
        fr0.run(tm.initial_state(), seq)
    # With the flag but no schedule, compiled setpoints apply (defaults).
    _, zt_d, ld_d = fr.run(
        tm.initial_state(), seq._replace(heat_sp=None), collect_loads=True
    )
    _, zt_c, ld_c = tm.fast_runner(
        block_size=8, mode="trbdf2", substeps=4, hours=2
    ).run(tm.initial_state(), seq._replace(heat_sp=None), collect_loads=True)
    np.testing.assert_allclose(np.asarray(zt_d), np.asarray(zt_c),
                               rtol=0, atol=1e-9)


def test_steady_load_matches_closed_form():
    """Analytical-tier validation (the reference's theoretical() suite
    pattern, validate_wall_heat_transfer.rs:36-86): single no-mass zone with
    pinned h and zero emissivity has exact B = U*A + rho*inf*cp, so the
    steady thermostat load must equal B*(T_set - T_out) exactly."""
    from heatx.physics import gas
    from heatx.testing import SingleZoneOptions, TestMat, single_zone_building

    inf_rate = 0.01
    opts = SingleZoneOptions(
        zone_volume=40.0, surface_height=2.0, surface_width=2.0,
        construction=[TestMat.polyurethane(0.02)], emissivity=0.0,
        infiltration_rate=inf_rate,
    )
    m = single_zone_building(opts)
    m.add_hvac(IdealHeaterCooler("t", ["Space"], heat_setpoint=20.0))
    tm = heatx.ThermalModel(m, n=1, config=heatx.SimConfig(dtype=jnp.float64))
    tm.building.set_fixed_h(10.0, 10.0)
    b = tm._device()

    t_out = 0.0
    r = tm.building.discretizations[0].r_value() + 0.1 + 0.1
    # Infiltration rho*cp is evaluated at the INLET air temperature
    # (model.rs:524-544 uses the incoming stream's properties).
    rho = float(gas.density(gas.AIR, t_out + 273.15))
    cp = float(gas.heat_capacity(gas.AIR, t_out + 273.15))
    B = 4.0 / r + inf_rate * rho * cp  # U*A + infiltration coupling
    expected = B * (20.0 - t_out)

    Z = b.n_zones
    T = 24
    one = state_mod.default_inputs(
        b, t_out=t_out, inf_vol=np.full(Z, inf_rate),
        inf_temp=np.full(Z, t_out), inf_mask=np.ones(Z, bool),
    )
    seq = jax.tree.map(lambda x: jnp.broadcast_to(x, (T,) + jnp.shape(x)), one)
    _, (zt, loads) = step_mod.run(
        b, state_mod.initial_state(b), seq, collect_loads=True
    )
    assert abs(float(np.asarray(zt)[-1, 0]) - 20.0) < 1e-9
    got = float(np.asarray(loads)[-1, 0])
    np.testing.assert_allclose(got, expected, rtol=1e-6)


def test_fuzz_control_invariants():
    """Random setpoints/capacities/weather: the controller never exceeds its
    capacity, and whenever it acts without saturating the zone lands exactly
    on the setpoint (parity integrator, 12 h each)."""
    rng = np.random.default_rng(7)
    for trial in range(4):
        heat_sp = float(rng.uniform(16.0, 24.0))
        cool_sp = heat_sp + float(rng.uniform(0.5, 6.0))
        max_h = float(rng.choice([25.0, 150.0, np.inf]))
        max_c = float(rng.choice([25.0, 150.0, np.inf]))
        b = _compile(_model(IdealHeaterCooler(
            "i", ["Space"], heat_setpoint=heat_sp, cool_setpoint=cool_sp,
            max_heating=max_h, max_cooling=max_c)))
        T = 12
        seq = _seq(b, T, t_out=float(rng.uniform(-15.0, 35.0)),
                   sol=float(rng.uniform(0.0, 600.0)))
        _, (zt, loads) = step_mod.run(
            b, state_mod.initial_state(b), seq, collect_loads=True)
        zt = np.asarray(zt)[:, 0]
        loads = np.asarray(loads)[:, 0]
        assert np.all(loads <= max_h + 1e-9), (trial, loads.max())
        assert np.all(loads >= -max_c - 1e-9), (trial, loads.min())
        # Unsaturated active control pins the setpoint.  loads is the MEAN
        # over the main step's sub-steps, so "unsaturated" must hold with
        # margin (a mean strictly below capacity can still contain saturated
        # sub-steps during the approach transient).
        heating = (loads > 1e-9) & (loads < max_h * 0.99)
        cooling = (loads < -1e-9) & (loads > -max_c * 0.99)
        # Skip the first hours (approach transient from 22 C).
        assert np.all(np.abs(zt[3:][heating[3:]] - heat_sp) < 1e-6), trial
        assert np.all(np.abs(zt[3:][cooling[3:]] - cool_sp) < 1e-6), trial
        assert np.all(np.isfinite(zt)) and np.all(np.isfinite(loads))


def test_checkpoint_roundtrip_with_loads(tmp_path):
    from heatx.io.checkpoint import load_state, save_state

    b = _compile(_model(IdealHeaterCooler("ideal", ["Space"], heat_setpoint=20.0)))
    st = state_mod.initial_state(b)
    st2, _ = step_mod.run(b, st, _seq(b, 3))[0], None
    p = str(tmp_path / "st.npz")
    save_state(p, st2, step=3)
    loaded, step = load_state(p)
    assert step == 3
    np.testing.assert_array_equal(np.asarray(loaded.ideal_load),
                                  np.asarray(st2.ideal_load))
    # Uncontrolled states round-trip with the channel absent.
    b0 = _compile(_model())
    st0 = state_mod.initial_state(b0)
    save_state(p, st0)
    loaded0, _ = load_state(p)
    assert loaded0.ideal_load is None
    # building= reconciles the optional channel across model changes: an old
    # (channel-less) checkpoint resumes on a thermostatic building with a
    # zeroed channel, and a controlled checkpoint resumes on an uncontrolled
    # building with the channel dropped — both march without a carry-
    # structure mismatch.
    up, _ = load_state(p, building=b)
    assert up.ideal_load is not None and float(jnp.sum(up.ideal_load)) == 0.0
    step_mod.march(b, up, state_mod.default_inputs(b, t_out=0.0))
    save_state(p, st2, step=3)
    down, _ = load_state(p, building=b0)
    assert down.ideal_load is None
    step_mod.march(b0, down, state_mod.default_inputs(b0, t_out=0.0))
