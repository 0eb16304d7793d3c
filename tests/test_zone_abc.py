"""Zone A/B/C coefficient test (model.rs:695-733 test_calculate_zones_abc)."""

import numpy as np

import heatx
from heatx.engine import surface as surf_mod
from heatx.engine import zone as zone_mod
from heatx.physics import gas
from heatx.testing import SingleZoneOptions, TestMat, single_zone_building


def test_calculate_zones_abc():
    opts = SingleZoneOptions(
        zone_volume=40.0,
        surface_height=2.0,
        surface_width=2.0,
        construction=[TestMat.polyurethane(0.02)],
        emissivity=0.0,
    )
    model = single_zone_building(opts)
    tm = heatx.ThermalModel(model, n=1, config=heatx.SimConfig(dtype=np.float64))
    b = tm.building
    state = tm.initial_state()
    inputs = tm.inputs()

    ts_front = state.node_T[0]
    ts_back = surf_mod._last_node(b.surfaces, state.node_T)
    a, bb, c = zone_mod.zone_abc(
        b, state.zone_T, state.h_front, state.h_back, ts_front, ts_back, inputs
    )
    assert a.shape == (1,) and bb.shape == (1,) and c.shape == (1,)

    # C = V rho(22) cp(22) (zone.rs:59-65)
    exp_c = 40.0 * float(gas.density(gas.AIR, 295.15)) * float(
        gas.heat_capacity(gas.AIR, 295.15)
    )
    np.testing.assert_allclose(float(c[0]), exp_c, rtol=1e-12)

    # Only the back face bounds the zone: a = h*A*T_s, b = h*A with the
    # initial registered h (surface_trait.rs:229-232) and T = 22.
    hi = float(state.h_back[0])
    area = float(b.surfaces.area[0])
    np.testing.assert_allclose(float(a[0]), area * hi * 22.0, rtol=1e-12)
    np.testing.assert_allclose(float(bb[0]), area * hi, rtol=1e-12)


def test_ventilation_terms():
    """Ventilation contributes rho*V*cp terms exactly like infiltration
    (model.rs:536-544), through its own state channels."""
    opts = SingleZoneOptions(
        zone_volume=40.0,
        construction=[TestMat.polyurethane(0.02)],
        emissivity=0.0,
    )
    model = single_zone_building(opts)
    tm = heatx.ThermalModel(model, n=1, config=heatx.SimConfig(dtype=np.float64))
    b = tm.building
    state = tm.initial_state()

    v_vent, t_vent = 0.25, 28.0
    inputs = tm.inputs(
        vent_vol=np.array([v_vent]),
        vent_temp=np.array([t_vent]),
        vent_mask=np.array([True]),
    )
    ts_front = state.node_T[0]
    ts_back = surf_mod._last_node(b.surfaces, state.node_T)
    a, bb, _ = zone_mod.zone_abc(
        b, state.zone_T, state.h_front, state.h_back, ts_front, ts_back, inputs
    )
    # subtract the surface coupling part (computed with mask off)
    a0, bb0, _ = zone_mod.zone_abc(
        b, state.zone_T, state.h_front, state.h_back, ts_front, ts_back, tm.inputs()
    )
    t_k = t_vent + 273.15
    term = float(gas.density(gas.AIR, t_k)) * v_vent * float(gas.heat_capacity(gas.AIR, t_k))
    np.testing.assert_allclose(float(a[0] - a0[0]), term * t_vent, rtol=1e-12)
    np.testing.assert_allclose(float(bb[0] - bb0[0]), term, rtol=1e-12)


def test_ideal_heater_cooler_pairs():
    """IdealHeaterCooler delivers its power to each target space (implemented
    in heatx; todo!() in the reference, heating_cooling.rs:66-90)."""
    from heatx.model.building import IdealHeaterCooler

    opts = SingleZoneOptions(
        zone_volume=40.0, construction=[TestMat.polyurethane(0.02)], emissivity=0.0
    )
    model = single_zone_building(opts)
    from heatx.model.building import SpaceDef

    model.add_space(SpaceDef("second", 30.0))
    model.add_hvac(IdealHeaterCooler("ihc", ["Space", "second"]))
    tm = heatx.ThermalModel(model, n=1, config=heatx.SimConfig(dtype=np.float64))
    b = tm.building
    assert b.n_hvacs == 1
    np.testing.assert_array_equal(np.asarray(b.hvac_pair_unit), [0, 0])

    state = tm.initial_state()
    inputs = tm.inputs(hvac_power=np.array([-750.0]))  # cooling
    ts_front = state.node_T[0]
    ts_back = surf_mod._last_node(b.surfaces, state.node_T)
    a, _, _ = zone_mod.zone_abc(
        b, state.zone_T, state.h_front, state.h_back, ts_front, ts_back, inputs
    )
    a0, _, _ = zone_mod.zone_abc(
        b, state.zone_T, state.h_front, state.h_back, ts_front, ts_back, tm.inputs()
    )
    diff = np.asarray(a) - np.asarray(a0)
    np.testing.assert_allclose(diff, [-750.0, -750.0], rtol=1e-12)


def test_future_temperature_hold_when_decoupled():
    """|B| ~ 0 -> zone holds temperature (model.rs:662-670)."""
    zone_T = np.array([25.0])
    t_new = zone_mod.future_zone_temperatures(
        zone_T, np.array([0.0]), np.array([0.0]), np.array([1000.0]), 60.0
    )
    np.testing.assert_allclose(np.asarray(t_new), [25.0])
