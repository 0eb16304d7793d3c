"""EnergyPlus IDF import (heatx.model.idf).

The reference consumes its fixtures' ``in.idf`` files only through
EnergyPlus; the envelope models are re-authored by hand in Rust
(validate_wall_heat_transfer.rs:95-613).  heatx parses them directly —
these tests load every fixture IDF, compile it, and prove the IDF-built
massive/nomass models march identically to the hand-built
``heatx.testing`` replay models.
"""

import glob
import os

import numpy as np
import pytest

import heatx
from heatx.build.layout import compile_building
from heatx.model.idf import load_idf
from heatx.testing import SingleZoneOptions, TestMat, single_zone_building

F64 = heatx.SimConfig(dtype=np.float64)


def _fixture_idfs(ref_fixtures):
    paths = sorted(glob.glob(os.path.join(ref_fixtures, "*", "in.idf")))
    assert len(paths) >= 15, paths
    return paths


def test_parses_and_compiles_every_fixture(ref_fixtures):
    """All 15 fixture IDFs parse and compile (trombe included — the only
    multi-zone one; its replay test is commented out in the reference
    because the CSV blob is missing, validate_wall_heat_transfer.rs:996)."""
    for path in _fixture_idfs(ref_fixtures):
        loaded = load_idf(path)
        assert loaded.timestep == 20, path
        b = compile_building(loaded.model, n=4, config=F64)
        assert b.n_surfaces >= 1
        # Fixtures declare zero infiltration everywhere.
        assert all(v == 0.0 for v in loaded.infiltration.values()), path


def _march_zone_series(model, hours=24, t_out=2.0, sol=300.0, n=4):
    tm = heatx.ThermalModel(model, n=n, config=F64)
    st = tm.initial_state()
    inp = tm.inputs(t_out=t_out, wind_speed=3.0, sol_front=sol)
    out = []
    for _ in range(hours * n):
        st = tm.march(st, inp)
        out.append(np.asarray(st.zone_T))
    return np.stack(out)


def test_massive_full_matches_handbuilt(ref_fixtures):
    """The IDF-built massive_full model (one 20x3 m concrete wall on a
    600 m3 zone, eps 0.9 / alpha 0.7 — in.idf:46-57) marches bit-for-bit
    like the hand-built replay model (testing.single_zone_building)."""
    loaded = load_idf(os.path.join(ref_fixtures, "massive_full", "in.idf"))
    hand = single_zone_building(SingleZoneOptions(
        zone_volume=600.0, surface_width=20.0, surface_height=3.0,
        construction=[TestMat.concrete(0.2)],
        emissivity=0.9, solar_absorbtance=0.7,
    ))
    zi = _march_zone_series(loaded.model)
    zh = _march_zone_series(hand)
    np.testing.assert_allclose(zi, zh, rtol=0, atol=1e-12)


def test_nomass_full_matches_handbuilt(ref_fixtures):
    """Material:NoMass (R = 0.02/0.0252) realizes as the equivalent
    polyurethane slab and matches the hand-built Polyurethane(0.02) model
    (validate_wall_heat_transfer.rs:949) to the fixture's R rounding."""
    loaded = load_idf(os.path.join(ref_fixtures, "nomass_full", "in.idf"))
    hand = single_zone_building(SingleZoneOptions(
        zone_volume=600.0, surface_width=20.0, surface_height=3.0,
        construction=[TestMat.polyurethane(0.02)],
        emissivity=0.9, solar_absorbtance=0.7,
    ))
    zi = _march_zone_series(loaded.model)
    zh = _march_zone_series(hand)
    # in.idf rounds R to 10 digits -> thickness differs in the 12th digit.
    np.testing.assert_allclose(zi, zh, rtol=1e-6)


def test_every_replay_fixture_idf_matches_handbuilt_building(ref_fixtures):
    """ALL 14 replay fixtures: the compiled building built from the
    fixture's own ``in.idf`` equals the hand-authored replay model
    (or the ``.spl`` one for tilted/horizontal) leaf-for-leaf.

    Together with the 5 end-to-end ``test_eplus_replay_from_idf`` cases this
    gates the whole EnergyPlus-file -> heatx loop: identical compiled
    buildings march identically, so every fixture's replay result is the
    IDF-built model's result.  Tolerance 2e-5 covers the fixture IDFs'
    floored optical properties (EnergyPlus requires absorptance >= 1e-9 /
    1e-5 where the Rust models use exact 0,
    validate_wall_heat_transfer.rs:817-994) and R-value rounding."""
    import jax.tree_util as jtu

    from heatx.validate.replay import WALL_CASES, build_case_model

    for name, case in WALL_CASES.items():
        hand = build_case_model(case, ref_fixtures, via_idf=False)
        idf = build_case_model(case, ref_fixtures, via_idf=True)
        bh = heatx.ThermalModel(hand, n=20, config=F64).building
        bi = heatx.ThermalModel(idf, n=20, config=F64).building
        lh, th = jtu.tree_flatten(bh)
        li, ti = jtu.tree_flatten(bi)
        assert th == ti, name
        for a, b in zip(lh, li):
            a, b = np.asarray(a), np.asarray(b)
            assert a.shape == b.shape and a.dtype == b.dtype, name
            if a.dtype.kind == "f":
                np.testing.assert_allclose(
                    np.nan_to_num(a, nan=-999.0),
                    np.nan_to_num(b, nan=-999.0),
                    rtol=0, atol=2e-5, err_msg=name,
                )
            else:
                assert (a == b).all(), name


def test_geometry_and_site(ref_fixtures):
    loaded = load_idf(os.path.join(ref_fixtures, "massive_full", "in.idf"))
    m = loaded.model
    assert m.site_details.terrain == "suburbs"
    (sd,) = m.surfaces
    area, perimeter, normal, height = sd.resolved_geometry()
    assert area == pytest.approx(60.0)
    assert perimeter == pytest.approx(46.0)
    assert height == pytest.approx(1.5)
    assert abs(normal[2]) < 1e-12  # vertical wall
    (sp,) = m.spaces
    assert sp.volume == 600.0


def test_trombe_two_zones_and_window(ref_fixtures):
    """The trombe fixture: cavity zone + interior zone, an inter-zone wall
    (OBC=Zone), and a glazed window whose area nets out of its host."""
    loaded = load_idf(os.path.join(ref_fixtures, "trombe_wall_full", "in.idf"))
    m = loaded.model
    assert {s.name for s in m.spaces} == {"Interior Space", "Mid Space"}
    assert len(m.surfaces) == 2 and len(m.fenestrations) == 1
    inner = next(s for s in m.surfaces if s.name == "Trombe Wall Inside")
    assert inner.front_boundary.kind == "space"
    assert inner.front_boundary.space == "Mid Space"
    outer = next(s for s in m.surfaces if s.name == "Trombe Wall Outside")
    # Host area netted by the 19.98 x 2.98 window.
    assert outer.area == pytest.approx(60.0 - 19.98 * 2.98)
    win = m.fenestrations[0]
    sub = m.substances[m.materials[m.constructions[win.construction].materials[0]].substance]
    assert sub.solar_transmittance == pytest.approx(0.82)
    assert sub.front_solar_absorbtance == pytest.approx(1.0 - 0.82 - 0.1)
    b = compile_building(m, n=4, config=F64)
    assert b.n_zones == 2


def test_infiltration_methods():
    """ACH and Flow/Zone methods convert to m3/s with the schedule constant."""
    idf = """
    Zone, Z1, 0, 0, 0, 0, 1, 1, 3, 720, 240;
    Schedule:Constant, Half, Any number, 0.5;
    ZoneInfiltration:DesignFlowRate, InfA, Z1, Half, AirChanges/Hour,
        0, 0, 0, 2.0, 1, 0, 0, 0;
    ZoneInfiltration:DesignFlowRate, InfB, Z1, , Flow/Zone,
        0.25, 0, 0, 0, 1, 0, 0, 0;
    """
    loaded = load_idf(idf)
    # 2 ACH on 720 m3 = 0.4 m3/s, halved by the schedule; plus 0.25.
    assert loaded.infiltration["Z1"] == pytest.approx(0.2 + 0.25)


def test_rejects_unsupported():
    with pytest.raises(ValueError, match="Volume"):
        load_idf("Zone, Z1, 0, 0, 0, 0, 1, 1, 3, autocalculate;")
    with pytest.raises(ValueError, match="Outside Boundary"):
        load_idf("""
        Zone, Z1, 0, 0, 0, 0, 1, 1, 3, 720;
        BuildingSurface:Detailed, W, Wall, C, Z1, , Foundation, , No, No, 0,
            4, 0,0,0, 1,0,0, 1,0,1, 0,0,1;
        """)


def test_no_space_name_field(ref_fixtures):
    """Pre-22.1 IDFs omit the Space Name field; indices adapt."""
    idf = """
    Zone, Z1, 0, 0, 0, 0, 1, 1, 3, 720;
    BuildingSurface:Detailed, W, Wall, C, Z1, Outdoors, , Sun, Wind, 0.5,
        4, 0,0,3, 0,0,0, 2,0,0, 2,0,3;
    """
    loaded = load_idf(idf)
    (sd,) = loaded.model.surfaces
    assert sd.front_boundary.kind == "outdoor"
    area, _, _, _ = sd.resolved_geometry()
    assert area == pytest.approx(6.0)


# The full validation loop the reference cannot close: EnergyPlus input
# file -> heatx (heatx.model.idf) -> EnergyPlus output.  The reference
# re-authors every fixture model in Rust (validate_wall_heat_transfer.rs:
# 713-750); here the fixture's own in.idf builds the model and must replay
# within the SAME thresholds as the hand-built equivalent
# (tests/test_eplus_replay.py).  Representative subset: one per material
# family plus both .spl-geometry cases (tilted/horizontal exercise the
# IDF vertex -> tilt path through TARP).
@pytest.mark.slow
@pytest.mark.parametrize(
    "name", ["massive_full", "nomass_full", "mixed_full", "tilted", "horizontal"]
)
def test_eplus_replay_from_idf(name, ref_fixtures):
    from heatx.validate.replay import WALL_CASES, run_case
    from heatx.validate.series import SeriesValidation
    from test_eplus_replay import THRESHOLDS

    expected, found = run_case(WALL_CASES[name], ref_fixtures, via_idf=True)
    rmse_frac, bias_frac = THRESHOLDS[name]
    v = SeriesValidation(
        title=f"{name} (model from in.idf)", expected=expected, found=found,
        max_rmse_frac=rmse_frac, max_bias_frac=bias_frac,
    )
    assert v.passes, v.summary()


def test_trombe_idf_marches(ref_fixtures):
    """The IDF-built trombe model (glazed cavity zone + interior zone)
    marches sanely: under a blackbody sky at the air temperature the
    sunless model settles near ambient, and irradiating the glazed facade
    warms the cavity zone more than the interior (irradiance is a
    per-face input here, like the reference — no inter-surface solar
    distribution)."""
    from heatx.build.layout import B_OUTDOOR
    from heatx.constants import SIGMA

    loaded = load_idf(os.path.join(ref_fixtures, "trombe_wall_full", "in.idf"))
    tm = heatx.ThermalModel(loaded.model, n=4, config=F64)
    outdoor = np.asarray(tm.building.surfaces.front_code) == B_OUTDOOR
    t_out = 15.0
    ir = SIGMA * (t_out + 273.15) ** 4 * outdoor

    def settle(sol_level):
        sol = np.where(outdoor, sol_level, 0.0)
        inp = tm.inputs(t_out=t_out, wind_speed=2.0, sol_front=sol,
                        ir_front=ir)
        st = tm.initial_state()
        # Start at ambient: the massive walls' multi-day time constant
        # would otherwise dominate the 96 h settle from the 22 C default.
        import jax.numpy as jnp

        st = st._replace(
            node_T=jnp.full_like(st.node_T, t_out),
            zone_T=jnp.full_like(st.zone_T, t_out),
        )
        for _ in range(96 * 4):
            st = tm.march(st, inp)
        return np.asarray(st.zone_T)

    zmap = {sp.name: i for i, sp in enumerate(loaded.model.spaces)}
    z_dark = settle(0.0)
    assert np.isfinite(z_dark).all()
    np.testing.assert_allclose(z_dark, t_out, atol=1.0)  # near-ambient
    z_sun = settle(600.0)
    gain_mid = z_sun[zmap["Mid Space"]] - z_dark[zmap["Mid Space"]]
    gain_int = z_sun[zmap["Interior Space"]] - z_dark[zmap["Interior Space"]]
    assert gain_mid > 1.0, (z_dark, z_sun)
    assert gain_mid > gain_int > 0.0, (z_dark, z_sun)


_GAINS_IDF = """
Version, 9.4;
Timestep, 4;
RunPeriod, Run, 1, 1, 12, 31, Monday, No, No, No, Yes, Yes;

Material, CONCRETE, MediumRough, 0.20, 0.816, 1700.0, 800.0, 0.9, 0.7, 0.7;
Construction, WALL, CONCRETE;

Zone, Z1, 0, 0, 0, 0, 1, 1, 3.0, 300.0, 100.0;
Zone, Z2, 0, 0, 0, 0, 1, 1, 3.0, 240.0;

BuildingSurface:Detailed, W1, Wall, WALL, Z1, Outdoors, , SunExposed,
  WindExposed, autocalculate, 4,
  0, 0, 3,  0, 0, 0,  10, 0, 0,  10, 0, 3;
BuildingSurface:Detailed, W2, Wall, WALL, Z2, Outdoors, , SunExposed,
  WindExposed, autocalculate, 4,
  0, 5, 3,  0, 5, 0,  10, 5, 0,  10, 5, 3;
BuildingSurface:Detailed, F2, Floor, WALL, Z2, Ground, , NoSun,
  NoWind, autocalculate, 4,
  0, 0, 0,  0, 4, 0,  5, 4, 0,  5, 0, 0;

Schedule:Constant, AlwaysOn, , 1.0;
Schedule:Constant, Activity, , 120.0;
Schedule:Compact, OfficeOcc, Fraction,
  Through: 12/31,
  For: Weekdays,
  Until: 8:00, 0.0,
  Until: 18:00, 1.0,
  Until: 24:00, 0.1,
  For: AllOtherDays,
  Until: 24:00, 0.0;
Schedule:Compact, HeatSP, Temperature,
  Through: 12/31,
  For: AllDays,
  Until: 6:00, 16.0,
  Until: 22:00, 21.0,
  Until: 24:00, 16.0;

Lights, L1, Z1, OfficeOcc, Watts/Area, , 10.0, , 0.2, 0.4, 0.2;
ElectricEquipment, E1, Z1, AlwaysOn, EquipmentLevel, 500.0, , , 0.1, 0.3, 0.1;
People, P1, Z2, OfficeOcc, People, 10, , , 0.3, autocalculate, Activity;

HVACTemplate:Thermostat, TST, HeatSP, , , 26.0;
HVACTemplate:Zone:IdealLoadsAirSystem, Z1, TST;
ZoneControl:Thermostat, ZT2, Z2, , ThermostatSetpoint:SingleHeating, SH1;
ThermostatSetpoint:SingleHeating, SH1, HeatSP;
"""


def test_compact_schedule_rendering():
    """Schedule:Compact Through/For/Until grammar: hour k (0-based,
    hour-beginning) takes the first Until whose end time exceeds k; For
    day groups follow the RunPeriod start weekday (Monday here)."""
    loaded = load_idf(_GAINS_IDF)
    occ = loaded.schedule_series("OfficeOcc", 24 * 7)
    day0 = occ[:24]  # Jan 1 = Monday (a weekday)
    assert (day0[:8] == 0.0).all()
    assert (day0[8:18] == 1.0).all()
    assert (day0[18:] == 0.1).all()
    sat = occ[24 * 5 : 24 * 6]  # day 5 from Monday = Saturday
    assert (sat == 0.0).all()
    # Year-periodic wrap and start_hour offset agree.
    assert loaded.schedule_series("OfficeOcc", 24, start_hour=8760)[10] == 1.0


def test_day_week_year_schedule_family():
    """The classic Schedule:Day:Hourly / Day:Interval -> Week:Daily /
    Week:Compact -> Schedule:Year chain renders like the equivalent
    Schedule:Compact: hour-ending Until times on the hour-beginning grid,
    weekday anchoring from the RunPeriod start day, whole-year coverage."""
    wk_hours = ", ".join(["0"] * 8 + ["1"] * 10 + ["0.1"] * 6)
    idf = f"""
    RunPeriod, Yr, 1, 1, 12, 31, Monday;
    Schedule:Day:Hourly, WorkDay, , {wk_hours};
    Schedule:Day:Interval, OffDay, , No, Until: 24:00, 0.0;
    Schedule:Week:Daily, Wk, OffDay, WorkDay, WorkDay, WorkDay, WorkDay,
        WorkDay, OffDay, OffDay, OffDay, OffDay, OffDay, OffDay;
    Schedule:Week:Compact, WkC, For: Weekdays, WorkDay,
        For: AllOtherDays, OffDay;
    Schedule:Year, Occ, , Wk, 1, 1, 12, 31;
    Schedule:Year, OccC, , WkC, 1, 1, 6, 30, WkC, 7, 1, 12, 31;
    Schedule:Compact, OccRef, , Through: 12/31, For: Weekdays,
        Until: 8:00, 0, Until: 18:00, 1, Until: 24:00, 0.1,
        For: AllOtherDays, Until: 24:00, 0;
    """
    loaded = load_idf(idf)
    occ = loaded.schedule_series("Occ", 8760)
    ref = loaded.schedule_series("OccRef", 8760)
    np.testing.assert_array_equal(occ, ref)
    np.testing.assert_array_equal(loaded.schedule_series("OccC", 8760), ref)
    # Jan 1 = Monday: working profile; day 5 (Saturday) off.
    assert occ[12] == 1.0 and occ[3] == 0.0 and occ[20] == 0.1
    assert (occ[24 * 5 : 24 * 7] == 0.0).all()
    # Gains may reference a Schedule:Year by name.
    loaded2 = load_idf(idf + """
    Zone, Z1, 0, 0, 0, 0, 1, 1, 3, 300;
    Lights, L1, Z1, Occ, LightingLevel, 100;
    """)
    lp = loaded2.hourly_channels(48)["lum_power"]
    np.testing.assert_allclose(lp[12, 0], 100.0)
    np.testing.assert_allclose(lp[3, 0], 0.0)


def test_day_week_year_schedule_errors():
    """Unknown references and coverage gaps fail loudly."""
    with pytest.raises(ValueError, match="day schedule 'Nope'"):
        load_idf("Schedule:Week:Daily, W, Nope, Nope, Nope, Nope, Nope, "
                 "Nope, Nope;")
    with pytest.raises(ValueError, match="leaves day 32 uncovered"):
        load_idf("""
        Schedule:Day:Interval, D, , No, Until: 24:00, 1.0;
        Schedule:Week:Daily, W, D, D, D, D, D, D, D;
        Schedule:Year, Y, , W, 1, 1, 1, 31;
        """)
    with pytest.raises(ValueError, match="not a whole hour"):
        load_idf("Schedule:Day:Interval, D, , No, Until: 9:30, 1.0, "
                 "Until: 24:00, 0.0;")
    with pytest.raises(ValueError, match="leaves saturday uncovered"):
        load_idf("""
        Schedule:Day:Hourly, D, , 1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1;
        Schedule:Week:Compact, W, For: Weekdays, D, For: Sunday, D;
        """)
    # A truncated Schedule:Day:Hourly must not silently zero the missing
    # hours (EnergyPlus requires all 24 values).
    with pytest.raises(ValueError, match="18 of the required 24"):
        load_idf("Schedule:Day:Hourly, D, , "
                 "1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1;")
    # An odd field count in Schedule:Week:Compact (DayType list without its
    # day-schedule name) must not silently drop the rule.
    with pytest.raises(ValueError, match="dangling DayType list"):
        load_idf("""
        Schedule:Day:Hourly, D, , 1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1,1;
        Schedule:Week:Compact, W, For: Weekdays, D, For: AllOtherDays;
        """)


def test_internal_gains_and_thermostats_import():
    loaded = load_idf(_GAINS_IDF)
    m = loaded.model
    # Devices: 1 luminaire (Lights), 2 ElectricHeaters (equipment, people),
    # 2 IdealHeaterCoolers (template + ZoneControl).
    assert len(m.luminaires) == 1 and m.luminaires[0].target_space == "Z1"
    assert len(m.hvacs) == 4
    ch = loaded.hourly_channels(24)
    # Lights: 10 W/m2 x 100 m2 (explicit zone floor area) x (1 - 0.2 return
    # air) = 800 W at full occupancy.
    lp = ch["lum_power"]
    assert lp.shape == (24, 1)
    np.testing.assert_allclose(lp[12, 0], 800.0)
    np.testing.assert_allclose(lp[2, 0], 0.0)
    # Equipment: 500 W x (1 - 0.1 latent - 0.1 lost) = 400 W always on.
    hp = ch["hvac_power"]
    assert hp.shape == (24, 4)
    np.testing.assert_allclose(hp[:, 0], 400.0)
    # People: 10 x 0.6 sensible x 120 W/person activity x occupancy.
    np.testing.assert_allclose(hp[12, 1], 720.0)
    np.testing.assert_allclose(hp[2, 1], 0.0)
    # Thermostat slots never consume the hvac_power channel.
    np.testing.assert_allclose(hp[:, 2:], 0.0)
    # Setpoints: Z1 heat follows HeatSP (16 night / 21 day), cool 26 const;
    # Z2 heat scheduled, cooling side absent (sentinel).
    hs, cs = ch["heat_sp"], ch["cool_sp"]
    np.testing.assert_allclose(hs[3], [16.0, 16.0])
    np.testing.assert_allclose(hs[12], [21.0, 21.0])
    np.testing.assert_allclose(cs[12], [26.0, 1e9])
    # The Z2 floor area needed by nothing here came from the Floor surface;
    # exercise the fallback through a Watts/Area gain on Z2.
    loaded2 = load_idf(_GAINS_IDF.replace(
        "Lights, L1, Z1, OfficeOcc, Watts/Area, , 10.0",
        "Lights, L1, Z2, OfficeOcc, Watts/Area, , 10.0",
    ))
    lp2 = loaded2.hourly_channels(24)["lum_power"]
    np.testing.assert_allclose(lp2[12, 0], 10.0 * 20.0 * 0.8)  # 5x4 m floor


def test_imported_gains_drive_a_simulation():
    """End to end: the imported devices + schedules drive a one-day march
    and the scheduled thermostat heats the zones to the setback pattern."""
    loaded = load_idf(_GAINS_IDF)
    tm = heatx.ThermalModel(loaded.model, n=1, config=F64)
    T = 24
    ch = loaded.hourly_channels(T)
    seq = tm.inputs_sequence(
        T, t_out=np.full(T, -5.0), wind_speed=np.full(T, 3.0), **ch
    )
    final, (zt, loads) = tm.run(tm.initial_state(), seq, collect_loads=True)
    zt, loads = np.asarray(zt), np.asarray(loads)
    assert np.isfinite(zt).all()
    # Daytime control band [21, 26]: both zones inside it all afternoon.
    assert (zt[12:22] >= 21.0 - 1e-6).all()
    assert (zt[12:22] <= 26.0 + 1e-6).all()
    # Z2 (720 W of people only) needs real heating against the -5 C
    # outdoors; Z1's 1,200 W of lights+equipment ride it to the COOLING
    # setpoint — the ideal loads show both regimes simultaneously.
    assert loads[12:22, 1].min() > 0.0
    assert loads[12:22, 0].min() < 0.0
    # Night setback 16: Z2 free-floats below the daytime setpoint with the
    # heater off until the 06:00 schedule step snaps it back to 21.
    assert zt[4, 1] < 21.0 and loads[3:5, 1].max() == 0.0
    np.testing.assert_allclose(zt[6, 1], 21.0, atol=1e-6)


def test_airflow_series_infiltration_and_ventilation():
    """ZoneInfiltration/ZoneVentilation:DesignFlowRate render to scheduled
    [T, Z] m3/s series (airflow_series); the design totals stay reported."""
    idf = _GAINS_IDF + """
ZoneInfiltration:DesignFlowRate, Inf1, Z1, OfficeOcc, AirChanges/Hour,
    0, 0, 0, 1.2, 1, 0, 0, 0;
ZoneVentilation:DesignFlowRate, Vent1, Z2, OfficeOcc, Flow/Zone,
    0.05, , , , Natural;
"""
    loaded = load_idf(idf)
    np.testing.assert_allclose(loaded.infiltration["Z1"], 1.2 * 300.0 / 3600.0)
    np.testing.assert_allclose(loaded.ventilation["Z2"], 0.05)
    air = loaded.airflow_series(24)
    iv, vv = air["inf_vol"], air["vent_vol"]
    assert iv.shape == (24, 2) and vv.shape == (24, 2)
    # OfficeOcc (Monday): 0 before 8, 1.0 in 8-18, 0.1 after 18.
    np.testing.assert_allclose(iv[12], [1.2 * 300.0 / 3600.0, 0.0])
    np.testing.assert_allclose(iv[2], [0.0, 0.0])
    np.testing.assert_allclose(vv[12], [0.0, 0.05])
    np.testing.assert_allclose(vv[20], [0.0, 0.005])


def test_window_gas_and_simple_glazing():
    """WindowMaterial:Gas builds an ISO 15099 cavity layer;
    WindowMaterial:SimpleGlazingSystem builds the equivalent single pane
    (glass resistance = 1/U minus NFRC winter films, tau = SHGC)."""
    idf = """
    Material, Concrete, Rough, 0.2, 0.816, 1700, 800, 0.9, 0.7, 0.7;
    WindowMaterial:Glazing, Clear3, SpectralAverage, , 0.003, 0.837, 0.075,
        0.075, 0.898, 0.081, 0.081, 0.0, 0.84, 0.84, 0.9;
    WindowMaterial:Gas, Argon12, Argon, 0.012;
    WindowMaterial:SimpleGlazingSystem, SG, 2.5, 0.4, 0.6;
    Construction, Wall, Concrete;
    Construction, DoubleGlz, Clear3, Argon12, Clear3;
    Construction, SimpleGlz, SG;
    Zone, Z1, 0, 0, 0, 0, 1, 1, 3, 300, 100;
    BuildingSurface:Detailed, W1, Wall, Wall, Z1, Outdoors, , Sun, Wind, 0,
        4, 0,0,3, 0,0,0, 10,0,0, 10,0,3;
    FenestrationSurface:Detailed, WinA, Window, DoubleGlz, W1, , 0, , 1,
        4, 1,0,2, 1,0,1, 3,0,1, 3,0,2;
    FenestrationSurface:Detailed, WinB, Window, SimpleGlz, W1, , 0, , 1,
        4, 5,0,2, 5,0,1, 7,0,1, 7,0,2;
    """
    loaded = load_idf(idf)
    m = loaded.model
    # Gas layer -> GasSubstance; the double-glazed construction compiles to
    # a building with a gas cavity.
    gs = m.substances["Argon12 substance"]
    assert gs.is_gas and gs.gas == "argon"
    # Simple glazing: equivalent pane properties.
    sg = m.substances["SG substance"]
    r_glass = 1.0 / 2.5 - (1.0 / 26.0 + 1.0 / 7.7)
    assert sg.thermal_conductivity == pytest.approx(0.006 / r_glass)
    assert sg.solar_transmittance == pytest.approx(0.4)
    b = compile_building(m, n=4, config=F64)
    assert bool(np.asarray(b.surfaces.seg_is_cavity).any())
    # And it marches: a sunny cold day stays finite with both windows.
    zt = _march_zone_series(m, hours=12)
    assert np.isfinite(zt).all()


def test_zonelist_expansion():
    """Gains and airflows on a ZoneList instantiate per member zone, each
    sized by its own zone's floor area (the EnergyPlus semantic)."""
    idf = """
    Material, Concrete, Rough, 0.2, 0.816, 1700, 800, 0.9, 0.7, 0.7;
    Construction, Wall, Concrete;
    Zone, A, 0, 0, 0, 0, 1, 1, 3, 300, 100;
    Zone, B, 0, 0, 0, 0, 1, 1, 3, 150,  50;
    ZoneList, Offices, A, B;
    Schedule:Constant, On, , 1.0;
    Lights, L, Offices, On, Watts/Area, , 10.0, , 0.0;
    ZoneInfiltration:DesignFlowRate, Inf, Offices, On, AirChanges/Hour,
        0, 0, 0, 1.0, 1, 0, 0, 0;
    Schedule:Constant, HSP, Temperature, 19.0;
    ZoneControl:Thermostat, T, Offices, , ThermostatSetpoint:SingleHeating, SH;
    ThermostatSetpoint:SingleHeating, SH, HSP;
    """
    loaded = load_idf(idf)
    m = loaded.model
    assert [l.name for l in m.luminaires] == ["L:A", "L:B"]
    ch = loaded.hourly_channels(2)
    np.testing.assert_allclose(ch["lum_power"][0], [1000.0, 500.0])
    np.testing.assert_allclose(loaded.infiltration["A"], 300.0 / 3600.0)
    np.testing.assert_allclose(loaded.infiltration["B"], 150.0 / 3600.0)
    # The zone-list thermostat controls every member zone.
    assert [t.zone for t in loaded.thermostats] == ["A", "B"]
    np.testing.assert_allclose(ch["heat_sp"][0], [19.0, 19.0])


def test_internal_mass_and_unknown_warning():
    """InternalMass becomes a both-faces-to-the-zone surface (partitions /
    furniture thermal mass slows the zone response); unknown object types
    raise an honest not-imported warning."""
    base = """
    Material, Concrete, Rough, 0.1, 0.816, 1700, 800, 0.9, 0.7, 0.7;
    Construction, Wall, Concrete;
    Zone, A, 0, 0, 0, 0, 1, 1, 3, 300, 100;
    BuildingSurface:Detailed, WA, Wall, Wall, A, Outdoors, , Sun, Wind, 0,
        4, 0,0,3, 0,0,0, 10,0,0, 10,0,3;
    """
    heavy = base + "InternalMass, Mass, Wall, A, , 60.0;\n"
    m_light = load_idf(base).model
    m_heavy = load_idf(heavy).model
    im = next(s for s in m_heavy.surfaces if s.name == "Mass")
    assert im.front_boundary.kind == "space" and im.back_boundary.kind == "space"
    area, perim, _, _ = im.resolved_geometry()
    assert area == pytest.approx(60.0)
    # Step the outdoor temperature: the massive zone must respond slower.
    zl = _march_zone_series(m_light, hours=6, t_out=-10.0, sol=0.0)
    zh = _march_zone_series(m_heavy, hours=6, t_out=-10.0, sol=0.0)
    assert zh[-1, 0] > zl[-1, 0] + 0.5  # internal mass holds the heat
    with pytest.warns(UserWarning, match="not imported.*airflownetwork"):
        load_idf(base + "AirflowNetwork:SimulationControl, X;\n")


def test_review_fixes_runperiod_zonelist_airflow_schedule():
    """Round-3 self-review regressions: (a) RunPeriod's start weekday
    anchors the run period's BEGIN date, not Jan 1; (b) ZoneList members
    validate at parse time; (c) airflow schedule references validate like
    gain schedules."""
    base = """
    Zone, A, 0, 0, 0, 0, 1, 1, 3, 300, 100;
    Schedule:Compact, WD, Fraction,
        Through: 12/31,
        For: Weekdays, Until: 24:00, 1.0,
        For: AllOtherDays, Until: 24:00, 0.0;
    """
    # Jul 1 declared a Tuesday: day-of-year 181 must render as a weekday,
    # and Jul 5 (Saturday) as weekend.
    loaded = load_idf("RunPeriod, Summer, 7, 1, 9, 30, Tuesday;\n" + base)
    s = loaded.schedules["wd"]
    jul1 = (31 + 28 + 31 + 30 + 31 + 30) * 24
    assert s[jul1] == 1.0  # Tuesday
    assert s[jul1 + 4 * 24] == 0.0  # Saturday
    with pytest.raises(ValueError, match="member 'Typo'"):
        load_idf(base + """
    ZoneList, L, A, Typo;
    ZoneInfiltration:DesignFlowRate, I, L, , Flow/Zone, 0.1, 0, 0, 0;
    """)
    with pytest.raises(ValueError, match="schedule 'Mystery'"):
        load_idf(base + """
    ZoneInfiltration:DesignFlowRate, I, A, Mystery, Flow/Zone, 0.1, 0, 0, 0;
    """)
    # Constant schedules still fold into the reported design total.
    loaded = load_idf(base + """
    Schedule:Constant, Half, , 0.5;
    ZoneInfiltration:DesignFlowRate, I, A, Half, Flow/Zone, 0.2, 0, 0, 0;
    """)
    assert loaded.infiltration["A"] == pytest.approx(0.1)


def test_zone_volume_autocalculate():
    """Zone Volume autocalculate derives as ceiling height x floor area
    (explicit or computed from the zone's Floor surfaces); without both it
    stays a clear error."""
    idf = """
    Material, Concrete, Rough, 0.2, 0.816, 1700, 800, 0.9, 0.7, 0.7;
    Construction, Slab, Concrete;
    Zone, A, 0, 0, 0, 0, 1, 1, 2.5, autocalculate;
    BuildingSurface:Detailed, F, Floor, Slab, A, Ground, , NoSun, NoWind, 0,
        4, 0,0,0, 0,4,0, 5,4,0, 5,0,0;
    """
    loaded = load_idf(idf)
    (sp,) = loaded.model.spaces
    assert sp.volume == pytest.approx(2.5 * 20.0)  # 5x4 floor
    # Explicit floor area wins over the computed one.
    loaded2 = load_idf(idf.replace("2.5, autocalculate;", "2.5, , 30.0;"))
    assert loaded2.model.spaces[0].volume == pytest.approx(2.5 * 30.0)
    with pytest.raises(ValueError, match="autocalculate"):
        load_idf("Zone, A, 0, 0, 0, 0, 1, 1, autocalculate, autocalculate;")


def test_global_geometry_rules_relative_and_clockwise():
    """Relative coordinates rotate by building north + zone relative north
    and translate by the zone origin; Clockwise vertex entry flips to the
    CCW winding the normal math assumes."""
    def wall_idf(rules, zone_fields, verts):
        return f"""
        GlobalGeometryRules, UpperLeftCorner, {rules};
        Building, B, 0, Suburbs, 0.04, 0.25, MinimalShadowing, 25, 6;
        Material, Concrete, Rough, 0.2, 0.816, 1700, 800, 0.9, 0.7, 0.7;
        Construction, Wall, Concrete;
        Zone, A, {zone_fields}, 1, 1, 3, 300, 100;
        BuildingSurface:Detailed, W, Wall, Wall, A, Outdoors, , Sun, Wind, 0,
            4, {verts};
        """
    base_verts = "0,0,3, 0,0,0, 10,0,0, 10,0,3"  # CCW, outward normal -y

    world = load_idf(wall_idf("CounterClockWise, World", "0, 0, 0, 0", base_verts))
    (sw,) = world.model.surfaces
    _, _, n_w, h_w = sw.resolved_geometry()
    np.testing.assert_allclose(n_w, [0, -1, 0], atol=1e-12)

    # Same wall in RELATIVE coords of a zone whose north points 90 deg
    # clockwise and whose origin is (10, 5, 2): the normal rotates -y -> -x
    # and the centroid rises by the 2 m z-origin.
    rel = load_idf(wall_idf(
        "CounterClockWise, Relative", "90, 10, 5, 2", base_verts
    ))
    (sr,) = rel.model.surfaces
    area, _, n_r, h_r = sr.resolved_geometry()
    np.testing.assert_allclose(n_r, [-1, 0, 0], atol=1e-12)
    assert area == pytest.approx(30.0)
    assert h_r == pytest.approx(h_w + 2.0)

    # Clockwise entry of the reversed loop reproduces the CCW baseline.
    cw_verts = "10,0,3, 10,0,0, 0,0,0, 0,0,3"
    cw = load_idf(wall_idf("Clockwise, World", "0, 0, 0, 0", cw_verts))
    (sc,) = cw.model.surfaces
    _, _, n_c, _ = sc.resolved_geometry()
    np.testing.assert_allclose(n_c, n_w, atol=1e-12)


def test_airgap_and_rectangular_window():
    """Material:AirGap realizes as the NoMass equivalent slab; the simple
    rectangular Window object becomes a fenestration in its host's plane
    with the host's area netted."""
    idf = """
    Material, Concrete, Rough, 0.2, 0.816, 1700, 800, 0.9, 0.7, 0.7;
    Material:AirGap, Gap, 0.15;
    WindowMaterial:Glazing, Clear3, SpectralAverage, , 0.003, 0.837, 0.075,
        0.075, 0.898, 0.081, 0.081, 0.0, 0.84, 0.84, 0.9;
    Construction, Wall, Concrete, Gap, Concrete;
    Construction, Glz, Clear3;
    Zone, A, 0, 0, 0, 0, 1, 1, 3, 300, 100;
    BuildingSurface:Detailed, W, Wall, Wall, A, Outdoors, , Sun, Wind, 0,
        4, 0,0,3, 0,0,0, 10,0,0, 10,0,3;
    Window, Win, Glz, W, , 1, 2.0, 1.0, 4.0, 1.5;
    """
    loaded = load_idf(idf)
    m = loaded.model
    gap = m.materials["Gap"]
    sub = m.substances[gap.substance]
    from heatx.model.idf import NOMASS_CONDUCTIVITY
    assert gap.thickness == pytest.approx(0.15 * NOMASS_CONDUCTIVITY)
    assert sub.thermal_conductivity == NOMASS_CONDUCTIVITY
    (win,) = m.fenestrations
    area, perim, normal, _ = win.resolved_geometry()
    assert area == pytest.approx(6.0) and perim == pytest.approx(11.0)
    np.testing.assert_allclose(normal, [0, -1, 0], atol=1e-12)
    (host,) = m.surfaces
    assert host.area == pytest.approx(30.0 - 6.0)
    # The triple-layer wall with the air gap compiles and marches.
    zt = _march_zone_series(m, hours=4)
    assert np.isfinite(zt).all()


def test_fenestration_multiplier_and_interzone_host():
    """Second-review regressions: (a) a fenestration Multiplier scales the
    pane's own heat-transfer area, not just the host cut; (b) a window on
    an inter-zone host (OBC=Surface) faces the adjacent zone, not the
    outdoors; (c) a rectangular window's centroid height tracks Start Z."""
    idf = """
    Material, Concrete, Rough, 0.2, 0.816, 1700, 800, 0.9, 0.7, 0.7;
    WindowMaterial:Glazing, Clear3, SpectralAverage, , 0.003, 0.837, 0.075,
        0.075, 0.898, 0.081, 0.081, 0.0, 0.84, 0.84, 0.9;
    Construction, Wall, Concrete;
    Construction, Glz, Clear3;
    Zone, A, 0, 0, 0, 0, 1, 1, 3, 300, 100;
    Zone, B, 0, 0, 0, 0, 1, 1, 3, 300, 100;
    BuildingSurface:Detailed, WA, Wall, Wall, A, Surface, WB, NoSun, NoWind, 0,
        4, 0,0,20, 0,0,0, 10,0,0, 10,0,20;
    BuildingSurface:Detailed, WB, Wall, Wall, B, Surface, WA, NoSun, NoWind, 0,
        4, 10,0,20, 10,0,0, 0,0,0, 0,0,20;
    FenestrationSurface:Detailed, FM, Window, Glz, WA, , 0, , 3,
        4, 1,0,2, 1,0,1, 3,0,1, 3,0,2;
    Window, WR, Glz, WA, , 1, 2.0, 17.0, 2.0, 1.0;
    """
    loaded = load_idf(idf)
    m = loaded.model
    fm = next(f for f in m.fenestrations if f.name == "FM")
    area, perim, _, _ = fm.resolved_geometry()
    assert area == pytest.approx(3 * 2.0)  # 2 m2 polygon x multiplier 3
    assert perim == pytest.approx(3 * 6.0)
    # Both panes face zone B through the inter-zone host, not the outdoors.
    for f in m.fenestrations:
        assert f.front_boundary.kind == "space", f.name
        assert f.front_boundary.space == "B", f.name
    # Host area netted by all panes (6 + 2 of 200).
    host = next(s for s in m.surfaces if s.name == "WA")
    assert host.area == pytest.approx(200.0 - 6.0 - 2.0)
    # Rectangular window 17 m up the 20 m wall: centroid 17.5 m, not 10.
    wr = next(f for f in m.fenestrations if f.name == "WR")
    assert wr.resolved_geometry()[3] == pytest.approx(17.5)
    # It all compiles and marches.
    b = compile_building(m, n=1, config=F64)
    assert b.n_zones == 2


def test_truncated_dark_glazing_not_misread_as_standard():
    """Third-review regression: a truncated WindowMaterial:Glazing for dark
    glass (tau_sol < 0.1) padded with trailing blanks must still take the
    truncated-schema reading (the standard reading needs a numeric
    Conductivity at index 14, not just a small field 4)."""
    idf = """
    Zone, A, 0, 0, 0, 0, 1, 1, 3, 300, 100;
    WindowMaterial:Glazing, Dark, SpectralAverage, , 0.05, 0.30, 0.30,
        0.06, 0.25, 0.25, 0.0, , ;
    """
    loaded = load_idf(idf)
    sub = loaded.model.substances["Dark substance"]
    # Truncated reading: field 4 IS tau_sol, thickness falls back to 6 mm.
    assert sub.solar_transmittance == pytest.approx(0.05)
    assert loaded.model.materials["Dark"].thickness == pytest.approx(0.006)
    assert sub.front_solar_absorbtance == pytest.approx(1 - 0.05 - 0.30)


def test_standard_glazing_with_blank_conductivity():
    """Fourth-review regression: a standard-schema glazing that leaves
    Conductivity blank (the IDD default) still classifies as standard by
    its emissivity fields."""
    idf = """
    Zone, A, 0, 0, 0, 0, 1, 1, 3, 300, 100;
    WindowMaterial:Glazing, Clear3, SpectralAverage, , 0.003, 0.837, 0.075,
        0.075, 0.898, 0.081, 0.081, 0.0, 0.84, 0.84;
    """
    loaded = load_idf(idf)
    sub = loaded.model.substances["Clear3 substance"]
    assert sub.solar_transmittance == pytest.approx(0.837)
    assert loaded.model.materials["Clear3"].thickness == pytest.approx(0.003)
    from heatx.model.idf import GLAZING_CONDUCTIVITY
    assert sub.thermal_conductivity == GLAZING_CONDUCTIVITY


_MINI_IDF = """
Material, M, Rough, 0.2, 0.8, 1700, 800, 0.9, 0.7, 0.7;
Construction, C, M;
Zone, RoomA, 0, 0, 0, 0, 1, 1, 3.0, 90.0;
BuildingSurface:Detailed,
    Wall, Wall, C, ROOMA, , Outdoors, , SunExposed, WindExposed, 0,
    4, 0,0,3, 0,0,0, 10,0,0, 10,0,3;
"""


def test_idf_case_insensitive_references():
    """Zone / host-surface references resolve case-insensitively, like
    EnergyPlus (the BuildingSurface above references ROOMA)."""
    m = load_idf(_MINI_IDF + """
FenestrationSurface:Detailed, Win, Window, C, WALL, , , , 1,
    4, 1,0,2, 1,0,1, 3,0,1, 3,0,2;
Lights, L, rooma, , LightingLevel, 100;
""").model
    assert m.spaces[0].name == "RoomA"
    assert m.surfaces[0].back_boundary.space == "RoomA"
    assert m.fenestrations[0].back_boundary.space == "RoomA"


def test_idf_missing_path_raises():
    with pytest.raises(FileNotFoundError):
        load_idf("/no/such/dir/model.idf")
    with pytest.raises(FileNotFoundError):
        load_idf("typo_name.idf")


def test_idf_zone_multiplier_recorded():
    """Zone Multiplier (field 7) is recorded for aggregation — the zone
    marches once; LoadedIdf.multipliers() gives the compiled-order
    vector (EnergyPlus's building-total semantics).  No warning."""
    import warnings

    idf = _MINI_IDF.replace(
        "Zone, RoomA, 0, 0, 0, 0, 1, 1, 3.0, 90.0;",
        "Zone, RoomA, 0, 0, 0, 0, 1, 10, 3.0, 90.0;",
    )
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        loaded = load_idf(idf)
    assert loaded.zone_multipliers == {"RoomA": 10.0}
    mv = loaded.multipliers()
    names = [sp.name for sp in loaded.model.spaces]
    assert mv[names.index("RoomA")] == 10.0
    assert all(
        m == 1.0 for n, m in zip(names, mv) if n != "RoomA"
    )
    # Unmultiplied file: empty dict, all-ones vector.
    loaded1 = load_idf(_MINI_IDF)
    assert loaded1.zone_multipliers == {}
    assert np.all(loaded1.multipliers() == 1.0)


def test_idf_unknown_obc_zone_clear_error():
    idf = _MINI_IDF + """
BuildingSurface:Detailed,
    Part, Wall, C, RoomA, , Zone, Elsewhere, NoSun, NoWind, 0,
    4, 0,0,3, 0,0,0, 10,0,0, 10,0,3;
"""
    with pytest.raises(ValueError, match="unknown zone 'Elsewhere'"):
        load_idf(idf)


def test_idf_pre9_fenestration_schema():
    """Pre-9.0 FenestrationSurface:Detailed carries a Shading Control Name
    field before Frame/Multiplier; both generations must parse to the same
    window."""
    new = load_idf(_MINI_IDF + """
FenestrationSurface:Detailed, Win, Window, C, Wall, , , , 2,
    4, 1,0,2, 1,0,1, 3,0,1, 3,0,2;
""").model
    old = load_idf(_MINI_IDF + """
FenestrationSurface:Detailed, Win, Window, C, Wall, , , MyShade, , 2,
    4, 1,0,2, 1,0,1, 3,0,1, 3,0,2;
""").model
    f_new, f_old = new.fenestrations[0], old.fenestrations[0]
    np.testing.assert_allclose(f_new.vertices, f_old.vertices)
    assert f_new.area == f_old.area  # multiplier 2 applied in both


_SHADE_IDF = """
Material, Concrete, Rough, 0.2, 0.816, 1700, 800, 0.9, 0.7, 0.7;
WindowMaterial:Glazing, Clear3, SpectralAverage, , 0.003, 0.837, 0.075,
    0.075, 0.898, 0.081, 0.081, 0.0, 0.84, 0.84, 0.9;
WindowMaterial:Shade, Roller, 0.25, 0.5, 0.25, 0.5, 0.9, 0.0, 0.003, 0.1;
Construction, Wall, Concrete;
Construction, Glz, Clear3;
Construction, GlzShaded, Clear3, Roller;
Zone, A, 0, 0, 0, 0, 1, 1, 3, 300, 100;
BuildingSurface:Detailed, W, Wall, Wall, A, Outdoors, , Sun, Wind, 0,
    4, 0,0,3, 0,0,0, 10,0,0, 10,0,3;
FenestrationSurface:Detailed, Win1, Window, Glz, W, , 0, , 1,
    4, 1,0,2, 1,0,1, 3,0,1, 3,0,2;
FenestrationSurface:Detailed, Win2, Window, Glz, W, , 0, , 1,
    4, 5,0,2, 5,0,1, 7,0,1, 7,0,2;
Schedule:Compact, Afternoons, Fraction,
    Through: 12/31, For: AllDays,
    Until: 12:00, 0.0, Until: 18:00, 1.0, Until: 24:00, 0.0;
"""


def test_window_shading_control_scheduled():
    """WindowShadingControl (9.0+): OnIfScheduleAllows deploys the shade
    during scheduled hours only; the multiplier is the shade material's
    solar transmittance on the controlled panes."""
    idf = _SHADE_IDF + """
WindowShadingControl, SC, A, 1, ExteriorShade, , OnIfScheduleAllows,
    Afternoons, , Yes, No, Roller, , , , , Sequential, Win1;
"""
    loaded = load_idf(idf)
    (rule,) = loaded.shading
    assert rule.fenestrations == ["Win1"]
    assert rule.transmittance == pytest.approx(0.25)
    assert rule.schedule == "afternoons"
    mult = loaded.shading_series(24)
    # Columns: [wall, Win1, Win2]; shade down 12:00-18:00 on Win1 only.
    assert mult.shape == (24, 3)
    np.testing.assert_allclose(mult[:, 0], 1.0)
    np.testing.assert_allclose(mult[:, 2], 1.0)
    np.testing.assert_allclose(mult[13, 1], 0.25)
    np.testing.assert_allclose(mult[10, 1], 1.0)


def test_window_shading_always_on_from_construction():
    """AlwaysOn + the shade found as a layer of 'Construction with
    Shading'; both named panes controlled."""
    idf = _SHADE_IDF + """
WindowShadingControl, SC, A, 1, ExteriorShade, GlzShaded, AlwaysOn,
    , , No, No, , , , , , Group, Win1, Win2;
"""
    loaded = load_idf(idf)
    (rule,) = loaded.shading
    assert sorted(rule.fenestrations) == ["Win1", "Win2"]
    assert rule.schedule is None
    mult = loaded.shading_series(6)
    np.testing.assert_allclose(mult[:, 1:], 0.25)


def test_window_shading_pre9_property():
    """Pre-9.0: the fenestration names its WindowProperty:ShadingControl
    (the extra field before Frame that shifts the schema)."""
    idf = _SHADE_IDF + """
FenestrationSurface:Detailed, Win3, Window, Glz, W, , 0, OldSC, , 1,
    4, 8,0,2, 8,0,1, 9,0,1, 9,0,2;
WindowProperty:ShadingControl, OldSC, InteriorShade, , AlwaysOn,
    , , No, No, Roller;
"""
    loaded = load_idf(idf)
    (rule,) = loaded.shading
    assert rule.fenestrations == ["Win3"]
    assert rule.transmittance == pytest.approx(0.25)
    mult = loaded.shading_series(2)
    assert mult.shape == (2, 4)
    np.testing.assert_allclose(mult[:, 3], 0.25)


def test_window_shading_unsupported_honest():
    """Zone-state-dependent control types and missing shade devices warn
    and leave the panes unshaded; unknown pane names are hard errors."""
    with pytest.warns(UserWarning, match="state-dependent"):
        loaded = load_idf(_SHADE_IDF + """
WindowShadingControl, SC, A, 1, InteriorShade, , OnIfHighGlare,
    , 26, No, No, Roller, , , , , Sequential, Win1;
""")
    assert loaded.shading == []
    with pytest.warns(UserWarning, match="no WindowMaterial:Shade"):
        loaded = load_idf(_SHADE_IDF + """
WindowShadingControl, SC, A, 1, ExteriorBlind, , AlwaysOn,
    , , No, No, , , , , , Sequential, Win1;
""")
    assert loaded.shading == []
    with pytest.raises(ValueError, match="names no parsed window"):
        load_idf(_SHADE_IDF + """
WindowShadingControl, SC, A, 1, ExteriorShade, , AlwaysOn,
    , , No, No, Roller, , , , , Sequential, Typo;
""")
    with pytest.warns(UserWarning, match="has no WindowProperty"):
        load_idf(_SHADE_IDF + """
FenestrationSurface:Detailed, Win3, Window, Glz, W, , 0, Ghost, , 1,
    4, 8,0,2, 8,0,1, 9,0,1, 9,0,2;
""")


def test_window_shading_high_outdoor_temperature():
    """OnIfHighOutdoorAirTemperature deploys exactly on the hours where
    the passed dry bulb exceeds the setpoint."""
    loaded = load_idf(_SHADE_IDF + """
WindowShadingControl, SC, A, 1, ExteriorShade, , OnIfHighOutdoorAirTemperature,
    , 25, No, No, Roller, , , , , Group, Win1, Win2;
""")
    (rule,) = loaded.shading
    assert rule.control == "high_outdoor_temp"
    assert rule.setpoint == pytest.approx(25.0)
    db = np.array([20.0, 26.0, 30.0, 24.0])
    mult = loaded.shading_series(4, dry_bulb=db)
    np.testing.assert_allclose(mult[:, 0], 1.0)  # the wall is untouched
    np.testing.assert_allclose(mult[:, 1], [1.0, 0.25, 0.25, 1.0])
    np.testing.assert_allclose(mult[:, 2], [1.0, 0.25, 0.25, 1.0])


def test_window_shading_high_horizontal_solar():
    """OnIfHighHorizontalSolar gates on the global-horizontal series."""
    loaded = load_idf(_SHADE_IDF + """
WindowShadingControl, SC, A, 1, ExteriorShade, , OnIfHighHorizontalSolar,
    , 300, No, No, Roller, , , , , Sequential, Win1;
""")
    ghi = np.array([0.0, 250.0, 500.0])
    mult = loaded.shading_series(3, horizontal_solar=ghi)
    np.testing.assert_allclose(mult[:, 1], [1.0, 1.0, 0.25])
    np.testing.assert_allclose(mult[:, 2], 1.0)  # Win2 uncontrolled


def test_window_shading_outdoor_and_solar_combinations():
    """The weather-only AND-combinations deploy only when BOTH the dry
    bulb exceeds Setpoint and the solar condition exceeds Setpoint 2
    (field 14): per-pane incident for ...AndHighSolarOnWindow, global
    horizontal for ...AndHighHorizontalSolar."""
    loaded = load_idf(_SHADE_IDF + """
WindowShadingControl, SC, A, 1, ExteriorShade, ,
    OnIfHighOutdoorAirTempAndHighSolarOnWindow,
    , 25, No, No, Roller, , , 200, , Sequential, Win1;
""")
    (rule,) = loaded.shading
    assert rule.control == "high_outdoor_and_solar"
    assert rule.setpoint == pytest.approx(25.0)
    assert rule.setpoint2 == pytest.approx(200.0)
    db = np.array([20.0, 30.0, 30.0, 20.0])
    inc = np.zeros((4, 3))
    inc[:, 1] = [300.0, 100.0, 300.0, 300.0]  # Win1's column
    mult = loaded.shading_series(4, dry_bulb=db, incident=inc)
    # Deploys only where BOTH 30 > 25 and 300 > 200 (hour 2).
    np.testing.assert_allclose(mult[:, 1], [1.0, 1.0, 0.25, 1.0])
    np.testing.assert_allclose(mult[:, 2], 1.0)

    loaded = load_idf(_SHADE_IDF + """
WindowShadingControl, SC, A, 1, ExteriorShade, ,
    OnIfHighOutdoorAirTempAndHighHorizontalSolar,
    , 25, No, No, Roller, , , 400, , Sequential, Win1;
""")
    (rule,) = loaded.shading
    assert rule.control == "high_outdoor_and_horizontal"
    ghi = np.array([500.0, 500.0, 300.0, 500.0])
    mult = loaded.shading_series(4, dry_bulb=db, horizontal_solar=ghi)
    np.testing.assert_allclose(mult[:, 1], [1.0, 0.25, 1.0, 1.0])

    # Missing Setpoint 2 is a hard error; missing context warns honestly.
    with pytest.raises(ValueError, match="Setpoint 2"):
        load_idf(_SHADE_IDF + """
WindowShadingControl, SC, A, 1, ExteriorShade, ,
    OnIfHighOutdoorAirTempAndHighSolarOnWindow,
    , 25, No, No, Roller, , , , , Sequential, Win1;
""")
    loaded = load_idf(_SHADE_IDF + """
WindowShadingControl, SC, A, 1, ExteriorShade, ,
    OnIfHighOutdoorAirTempAndHighSolarOnWindow,
    , 25, No, No, Roller, , , 200, , Sequential, Win1;
""")
    with pytest.warns(UserWarning, match="incident"):
        mult = loaded.shading_series(4, dry_bulb=db)  # no incident context
    np.testing.assert_allclose(mult, 1.0)


def test_window_shading_high_solar_on_window_per_pane():
    """OnIfHighSolarOnWindow reads the pane's own column of the incident
    array: two panes under one rule deploy independently."""
    loaded = load_idf(_SHADE_IDF + """
WindowShadingControl, SC, A, 1, ExteriorShade, , OnIfHighSolarOnWindow,
    , 200, No, No, Roller, , , , , Group, Win1, Win2;
""")
    (rule,) = loaded.shading
    assert rule.control == "high_solar"
    incident = np.array([
        [0.0, 150.0, 250.0],  # only Win2 over the 200 W/m2 setpoint
        [0.0, 300.0, 100.0],  # only Win1
        [0.0, 50.0, 50.0],  # neither
    ])
    mult = loaded.shading_series(3, incident=incident)
    np.testing.assert_allclose(mult[:, 1], [1.0, 0.25, 1.0])
    np.testing.assert_allclose(mult[:, 2], [0.25, 1.0, 1.0])


def test_window_shading_weather_control_schedule_gate():
    """A schedule on a weather-dependent control (Shading Control Is
    Scheduled = Yes) ANDs with the condition; named-but-not-Yes warns and
    is ignored (EnergyPlus semantics)."""
    loaded = load_idf(_SHADE_IDF + """
WindowShadingControl, SC, A, 1, ExteriorShade, , OnIfHighOutdoorAirTemperature,
    Afternoons, 25, Yes, No, Roller, , , , , Sequential, Win1;
""")
    (rule,) = loaded.shading
    assert rule.schedule == "afternoons"
    db = np.full(24, 30.0)  # always over the setpoint...
    mult = loaded.shading_series(24, dry_bulb=db)
    # ...but deployed only during the 12:00-18:00 schedule window.
    np.testing.assert_allclose(mult[10, 1], 1.0)
    np.testing.assert_allclose(mult[13, 1], 0.25)
    with pytest.warns(UserWarning, match="schedule is ignored"):
        loaded = load_idf(_SHADE_IDF + """
WindowShadingControl, SC, A, 1, ExteriorShade, , OnIfHighOutdoorAirTemperature,
    Afternoons, 25, No, No, Roller, , , , , Sequential, Win1;
""")
    (rule,) = loaded.shading
    assert rule.schedule is None


def test_window_shading_weather_context_missing():
    """A weather-dependent rule without its context warns and leaves the
    panes unshaded for that call; a wrong-length context is an error."""
    loaded = load_idf(_SHADE_IDF + """
WindowShadingControl, SC, A, 1, ExteriorShade, , OnIfHighOutdoorAirTemperature,
    , 25, No, No, Roller, , , , , Sequential, Win1;
""")
    with pytest.warns(UserWarning, match="dry_bulb= weather context"):
        mult = loaded.shading_series(4)
    np.testing.assert_allclose(mult, 1.0)
    with pytest.raises(ValueError, match="expected 4"):
        loaded.shading_series(4, dry_bulb=np.zeros(3))


def test_window_shading_weather_control_needs_setpoint():
    with pytest.raises(ValueError, match="needs a Setpoint"):
        load_idf(_SHADE_IDF + """
WindowShadingControl, SC, A, 1, ExteriorShade, , OnIfHighHorizontalSolar,
    , , No, No, Roller, , , , , Sequential, Win1;
""")


def test_window_shading_screen_device():
    """WindowMaterial:Screen reduces to its openness area fraction
    (1 - d/s)^2 — EnergyPlus's normal-incidence beam transmittance."""
    loaded = load_idf(_SHADE_IDF + """
WindowMaterial:Screen, Bug, DoNotModel, 0.08, 0.08, 0.9, 221,
    0.0025, 0.001, 0.025;
WindowShadingControl, SC, A, 1, ExteriorScreen, , AlwaysOn,
    , , No, No, Bug, , , , , Sequential, Win1;
""")
    (rule,) = loaded.shading
    assert rule.transmittance == pytest.approx((1.0 - 0.001 / 0.0025) ** 2)
    with pytest.raises(ValueError, match="Material Spacing"):
        load_idf(_SHADE_IDF + """
WindowMaterial:Screen, Bad, DoNotModel, 0.08, 0.08, 0.9, 221,
    0.001, 0.0025, 0.025;
WindowShadingControl, SC, A, 1, ExteriorScreen, , AlwaysOn,
    , , No, No, Bad, , , , , Sequential, Win1;
""")


def test_window_shading_blind_device():
    """WindowMaterial:Blind reduces to a slat-coverage transmittance:
    cover = min(1, (w/s)|cos angle|) with E+'s slat-angle convention
    (0 = closed, 90 = open), the covered fraction passing the slat's
    beam transmittance."""

    def tau_for(width, sep, angle, tau_slat=0.0):
        loaded = load_idf(_SHADE_IDF + f"""
WindowMaterial:Blind, Slats, Horizontal, {width}, {sep}, 0.001, {angle},
    160, {tau_slat}, 0.6, 0.6, 0.7, 0.7, 0.6, 0.6, 0.7, 0.7, 0.0, 0.9;
WindowShadingControl, SC, A, 1, InteriorBlind, , AlwaysOn,
    , , No, No, Slats, , , , , Sequential, Win1;
""")
        (rule,) = loaded.shading
        return rule.transmittance

    # Closed (angle 0, w >= s): fully covered, only slat transmittance.
    assert tau_for(0.025, 0.019, 0.0, 0.1) == pytest.approx(0.1)
    # Open (angle 90): cover ~ 0 regardless of w/s.
    assert tau_for(0.025, 0.019, 90.0) == pytest.approx(1.0, abs=1e-12)
    # 45 deg, w = s: cover = cos(45), pass-through = 1 - cover.
    assert tau_for(0.02, 0.02, 45.0) == pytest.approx(
        1.0 - np.cos(np.radians(45.0))
    )
    with pytest.raises(ValueError, match="Slat Width"):
        load_idf(_SHADE_IDF + """
WindowMaterial:Blind, Bad, Horizontal, , 0.019, 0.001, 45,
    160, 0, 0.6, 0.6, 0.7, 0.7, 0.6, 0.6, 0.7, 0.7, 0.0, 0.9;
WindowShadingControl, SC, A, 1, InteriorBlind, , AlwaysOn,
    , , No, No, Bad, , , , , Sequential, Win1;
""")


def test_window_shading_zone_air_temperature_in_run():
    """OnIfHighZoneAirTemperature lowers to in-run ZoneShadingControls on
    the model (deployment reads the marching zone temperature — a
    host-side series cannot express it), not to shading_series rules."""
    loaded = load_idf(_SHADE_IDF + """
WindowShadingControl, SC, A, 1, ExteriorShade, , OnIfHighZoneAirTemperature,
    , 26, No, No, Roller, , , , , Sequential, Win1, Win2;
""")
    assert loaded.shading == []  # nothing renders host-side
    (rule,) = loaded.zone_shading
    assert rule.control == "high_zone_temp"
    assert rule.zone == "A"
    assert rule.setpoint == pytest.approx(26.0)
    ctls = loaded.model.zone_shading
    assert [(c.surface, c.space) for c in ctls] == [
        ("Win1", "A"), ("Win2", "A")
    ]
    assert all(c.transmittance == pytest.approx(0.25) for c in ctls)
    # No schedule gate -> the compiled setpoints say everything.
    assert loaded.shading_setpoint_series(4) is None
    # The model compiles and the compiled arrays carry the control.
    from heatx.build.layout import compile_building

    b = compile_building(loaded.model, n=1)
    assert b.has_zone_shading
    zs = np.asarray(b.shade_zone)
    assert (zs >= 0).sum() == 2

    with pytest.raises(ValueError, match="needs a Setpoint"):
        load_idf(_SHADE_IDF + """
WindowShadingControl, SC, A, 1, ExteriorShade, , OnIfHighZoneAirTemperature,
    , , No, No, Roller, , , , , Sequential, Win1;
""")
    with pytest.raises(ValueError, match="not a parsed zone"):
        load_idf(_SHADE_IDF + """
WindowShadingControl, SC, Nope, 1, ExteriorShade, ,
    OnIfHighZoneAirTemperature, , 26, No, No, Roller, , , , , Sequential,
    Win1;
""")


def test_window_shading_zone_air_temperature_schedule_gate():
    """A 'Shading Control Is Scheduled = Yes' schedule renders to the
    StepInputs.shade_sp override: blocked hours +1e9, allowed hours the
    setpoint (uncontrolled panes +1e9 throughout)."""
    loaded = load_idf(_SHADE_IDF + """
WindowShadingControl, SC, A, 1, ExteriorShade, , OnIfHighZoneAirTemperature,
    Afternoons, 26, Yes, No, Roller, , , , , Sequential, Win1;
""")
    (rule,) = loaded.zone_shading
    assert rule.schedule == "afternoons"
    sp = loaded.shading_setpoint_series(24)
    S = len(loaded.model.surfaces)
    win1 = S + [f.name for f in loaded.model.fenestrations].index("Win1")
    # Afternoons: 12:00-18:00 on; hour h covers [h, h+1).
    np.testing.assert_allclose(sp[:12, win1], 1e9)
    np.testing.assert_allclose(sp[12:18, win1], 26.0)
    np.testing.assert_allclose(sp[18:, win1], 1e9)
    # Every other column (wall + the uncontrolled Win2) stays +1e9.
    other = [c for c in range(sp.shape[1]) if c != win1]
    np.testing.assert_allclose(sp[:, other], 1e9)


def test_window_shading_zone_temperature_marches():
    """End to end: the imported in-run control actually sheds solar when
    the zone runs hot — the controlled building ends cooler under strong
    sun, identical when the zone never crosses the setpoint."""
    import jax

    import heatx
    from heatx.build.layout import compile_building
    from heatx.engine import state as state_mod
    from heatx.engine import step as step_mod

    def run(text, sol, steps=48):
        loaded = load_idf(_SHADE_IDF + text)
        b = compile_building(
            loaded.model, n=1,
            config=heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=1),
        ).astype(np.float64)
        st = state_mod.initial_state(b)
        inp = state_mod.default_inputs(
            b, t_out=25.0, wind_speed=2.0,
            sol_front=np.full(b.n_surfaces, sol),
        )
        march = jax.jit(step_mod.march)
        for _ in range(steps):
            st = march(b, st, inp)
        return float(np.asarray(st.zone_T)[0])

    ctl = """
WindowShadingControl, SC, A, 1, ExteriorShade, , OnIfHighZoneAirTemperature,
    , 26, No, No, Roller, , , , , Sequential, Win1, Win2;
"""
    assert run(ctl, sol=800.0) < run("", sol=800.0) - 0.3
    # Never crossing the setpoint: bit-identical to the unshaded model.
    assert run(ctl, sol=5.0) == run("", sol=5.0)


def test_window_shading_switchable_glazing():
    """SwitchableGlazing (electrochromic) deploys by switching the pane
    to the darkened 'Construction with Shading'; heatx approximates the
    deployed state by scaling incident solar by the ratio of the two
    systems' ISO 9050 solar transmittances (per pane — it depends on
    each pane's own base construction)."""
    dark = """
WindowMaterial:Glazing, Dark3, SpectralAverage, , 0.003, 0.1, 0.075,
    0.075, 0.2, 0.081, 0.081, 0.0, 0.84, 0.84, 0.9;
Construction, GlzDark, Dark3;
"""
    loaded = load_idf(_SHADE_IDF + dark + """
WindowShadingControl, SC, A, 1, SwitchableGlazing, GlzDark, AlwaysOn,
    , , No, No, , , , , , Sequential, Win1;
""")
    (rule,) = loaded.shading
    assert rule.transmittance == pytest.approx(0.1 / 0.837)
    # Zone-state control: the ratio lands on the in-run control.
    loaded2 = load_idf(_SHADE_IDF + dark + """
WindowShadingControl, SC, A, 1, SwitchableGlazing, GlzDark,
    OnIfHighZoneAirTemperature, , 26, No, No, , , , , , Sequential, Win1;
""")
    (ctl,) = loaded2.model.zone_shading
    assert ctl.transmittance == pytest.approx(0.1 / 0.837)
    # Missing / unknown switched construction is an error, not a warning.
    with pytest.raises(ValueError, match="SwitchableGlazing needs"):
        load_idf(_SHADE_IDF + """
WindowShadingControl, SC, A, 1, SwitchableGlazing, , AlwaysOn,
    , , No, No, , , , , , Sequential, Win1;
""")
    # An opaque base pane cannot switch.
    with pytest.raises(ValueError, match="is opaque"):
        load_idf(_SHADE_IDF + dark + """
FenestrationSurface:Detailed, WinOp, Window, Wall, W, , 0, , 1,
    4, 8,0,2, 8,0,1, 9,0,1, 9,0,2;
WindowShadingControl, SC, A, 1, SwitchableGlazing, GlzDark, AlwaysOn,
    , , No, No, , , , , , Sequential, WinOp;
""")


def test_window_shading_one_control_per_pane():
    """Several WindowShadingControls may legally reference the same pane
    (Shading Control Sequence Number orders them in E+); heatx keeps the
    first per pane in sequence order and warns on the rest — it must NOT
    abort the import, and a pane named by both a zone-state and a
    weather rule must not get shaded twice."""
    # Two sequenced zone-temperature rules on Win1: sequence 1 wins even
    # though it appears second in the file.
    with pytest.warns(UserWarning, match="already controlled"):
        loaded = load_idf(_SHADE_IDF + """
WindowShadingControl, SC2, A, 2, ExteriorShade, ,
    OnIfHighZoneAirTemperature, , 28, No, No, Roller, , , , , Sequential,
    Win1;
WindowShadingControl, SC1, A, 1, ExteriorShade, ,
    OnIfHighZoneAirTemperature, , 26, No, No, Roller, , , , , Sequential,
    Win1;
""")
    (ctl,) = loaded.model.zone_shading
    assert ctl.setpoint == pytest.approx(26.0)  # sequence 1's setpoint
    # Mixed kinds: the zone-state rule claims Win1 first; the weather
    # rule keeps only Win2 (no double shading of Win1).
    with pytest.warns(UserWarning, match="already controlled"):
        loaded = load_idf(_SHADE_IDF + """
WindowShadingControl, SCZ, A, 1, ExteriorShade, ,
    OnIfHighZoneAirTemperature, , 26, No, No, Roller, , , , , Sequential,
    Win1;
WindowShadingControl, SCW, A, 2, ExteriorShade, , AlwaysOn,
    , , No, No, Roller, , , , , Sequential, Win1, Win2;
""")
    (rule,) = loaded.shading
    assert rule.fenestrations == ["Win2"]
    assert [c.surface for c in loaded.model.zone_shading] == ["Win1"]
    # Every pane already claimed -> the extra rule controls nothing.
    with pytest.warns(UserWarning, match="controls nothing"):
        load_idf(_SHADE_IDF + """
WindowShadingControl, SC1, A, 1, ExteriorShade, , AlwaysOn,
    , , No, No, Roller, , , , , Sequential, Win1;
WindowShadingControl, SC2, A, 2, ExteriorShade, , AlwaysOn,
    , , No, No, Roller, , , , , Sequential, Win1;
""")


def test_window_shading_device_validation():
    """Out-of-range device parameters are import errors, not silent
    solar amplifiers: a negative screen diameter / slat width would give
    a 'transmittance' > 1 that shading_series would multiply in."""
    with pytest.raises(ValueError, match="Material Spacing"):
        load_idf(_SHADE_IDF + """
WindowMaterial:Screen, Bad, DoNotModel, 0.08, 0.08, 0.9, 221,
    0.0025, -0.001, 0.025;
WindowShadingControl, SC, A, 1, ExteriorScreen, , AlwaysOn,
    , , No, No, Bad, , , , , Sequential, Win1;
""")
    with pytest.raises(ValueError, match="positive Slat"):
        load_idf(_SHADE_IDF + """
WindowMaterial:Blind, Bad, Horizontal, -0.02, 0.019, 0.001, 45,
    160, 0, 0.6, 0.6, 0.7, 0.7, 0.6, 0.6, 0.7, 0.7, 0.0, 0.9;
WindowShadingControl, SC, A, 1, InteriorBlind, , AlwaysOn,
    , , No, No, Bad, , , , , Sequential, Win1;
""")
    with pytest.raises(ValueError, match="outside \\[0, 1\\]"):
        load_idf(_SHADE_IDF + """
WindowMaterial:Shade, Bad, 1.5, 0.5, 0.25, 0.5, 0.9, 0.0, 0.003, 0.1;
WindowShadingControl, SC, A, 1, ExteriorShade, , AlwaysOn,
    , , No, No, Bad, , , , , Sequential, Win1;
""")


def test_window_shading_pre9_weather_control():
    """Pre-9.0 WindowProperty:ShadingControl carries the setpoint in
    field 6 (after Schedule)."""
    loaded = load_idf(_SHADE_IDF + """
FenestrationSurface:Detailed, Win3, Window, Glz, W, , 0, OldSC, , 1,
    4, 8,0,2, 8,0,1, 9,0,1, 9,0,2;
WindowProperty:ShadingControl, OldSC, ExteriorShade, ,
    OnIfHighOutdoorAirTemperature, , 27.5, No, No, Roller;
""")
    (rule,) = loaded.shading
    assert rule.control == "high_outdoor_temp"
    assert rule.setpoint == pytest.approx(27.5)
    mult = loaded.shading_series(2, dry_bulb=np.array([20.0, 30.0]))
    np.testing.assert_allclose(mult[:, 3], [1.0, 0.25])


def _loops_match(got, expected, atol=1e-9):
    """The two vertex loops describe the same polygon (any rotation of
    the cycle, either winding — blockers are winding-agnostic)."""
    got, expected = np.asarray(got, float), np.asarray(expected, float)
    assert got.shape == expected.shape
    for cand in (got, got[::-1]):
        for k in range(len(cand)):
            if np.allclose(np.roll(cand, k, axis=0), expected, atol=atol):
                return True
    return False


def test_shading_site_rectangle():
    """Shading:Site lowers its azimuth/tilt/origin/length/height spec to
    the world rectangle: lower-left corner at the origin, Length along
    the horizontal width axis, Height up the slope."""
    loaded = load_idf(_SHADE_IDF + """
Shading:Site, Screen, 180, 90, 0, -5, 0, 4, 3;
""")
    (shade,) = loaded.model.shades
    assert _loops_match(shade, [
        [0, -5, 0], [4, -5, 0], [4, -5, 3], [0, -5, 3]
    ])
    # Tilt defaults to 90 (vertical).
    loaded2 = load_idf(_SHADE_IDF + """
Shading:Site, Screen, 180, , 0, -5, 0, 4, 3;
""")
    assert _loops_match(loaded2.model.shades[0], shade)
    with pytest.raises(ValueError, match="Length and Height"):
        load_idf(_SHADE_IDF + "Shading:Site, Bad, 180, 90, 0, -5, 0, 4;\n")


def test_shading_site_rectangle_tilted():
    """A tilted Shading:Site rectangle slopes up away from the facing
    direction (the up-slope axis tips back by the tilt)."""
    loaded = load_idf(_SHADE_IDF + """
Shading:Site, Awning, 180, 30, 0, -5, 2, 4, 2;
""")
    (shade,) = loaded.model.shades
    c30, s30 = np.cos(np.radians(30)), np.sin(np.radians(30))
    assert _loops_match(shade, [
        [0, -5, 2], [4, -5, 2],
        [4, -5 + 2 * c30, 2 + 2 * s30], [0, -5 + 2 * c30, 2 + 2 * s30]
    ])


def test_shading_building_rotates_with_north_axis():
    """Shading:Building rotates with the Building north axis (like the
    :Detailed form); Shading:Site does not."""
    text = """
Building, Rotated, 90, , , , , 1, 25;
""" + _SHADE_IDF + """
Shading:Building, Attached, 180, 90, 0, -5, 0, 4, 3;
"""
    loaded = load_idf(text)
    (shade,) = loaded.model.shades
    # (x, y) -> (y, -x) under a 90-degree clockwise building rotation.
    assert _loops_match(shade, [
        [-5, 0, 0], [-5, -4, 0], [-5, -4, 3], [-5, 0, 3]
    ])
    site = load_idf(text.replace("Shading:Building", "Shading:Site"))
    assert _loops_match(site.model.shades[0], [
        [0, -5, 0], [4, -5, 0], [4, -5, 3], [0, -5, 3]
    ])


def test_shading_overhang():
    """Shading:Overhang hangs a plate above the window: Height above the
    window top, spanning width + left/right extensions, projecting Depth
    perpendicular to the window at the default 90-degree tilt.  Win1
    spans x 1-3, z 1-2 on the y=0 south wall."""
    loaded = load_idf(_SHADE_IDF + """
Shading:Overhang, OH, Win1, 0.5, 90, 0.2, 0.3, 1.0;
""")
    (shade,) = loaded.model.shades
    assert _loops_match(shade, [
        [0.8, 0, 2.5], [3.3, 0, 2.5], [3.3, -1, 2.5], [0.8, -1, 2.5]
    ])
    # The :Projection form's depth is a fraction of the window height.
    loaded2 = load_idf(_SHADE_IDF + """
Shading:Overhang:Projection, OH, Win1, 0.5, 90, 0.2, 0.3, 0.5;
""")
    (shade2,) = loaded2.model.shades
    assert _loops_match(shade2, [
        [0.8, 0, 2.5], [3.3, 0, 2.5], [3.3, -0.5, 2.5], [0.8, -0.5, 2.5]
    ])
    # A tilted overhang (45 degrees from the window) droops accordingly.
    loaded3 = load_idf(_SHADE_IDF + """
Shading:Overhang, OH, Win1, 0, 45, 0, 0, 1.0;
""")
    (shade3,) = loaded3.model.shades
    r = np.sqrt(0.5)
    assert _loops_match(shade3, [
        [1, 0, 2], [3, 0, 2], [3, -r, 2 + r], [1, -r, 2 + r]
    ])
    with pytest.raises(ValueError, match="positive Depth"):
        load_idf(_SHADE_IDF + "Shading:Overhang, OH, Win1, 0.5, 90, 0, 0;\n")
    with pytest.raises(ValueError, match="names no parsed fenestration"):
        load_idf(_SHADE_IDF + "Shading:Overhang, OH, Nope, 0.5, 90, 0, 0, 1;\n")


def test_shading_fin():
    """Shading:Fin hangs vertical plates at the window's sides, each
    with its own extension / above / below / tilt / depth; a side with
    no positive depth is absent (E+ allows one-sided fins)."""
    loaded = load_idf(_SHADE_IDF + """
Shading:Fin, FN, Win1, 0.1, 0.2, 0.3, 90, 0.8, 0.1, 0.2, 0.3, 90, 0.6;
""")
    left, right = loaded.model.shades
    assert _loops_match(left, [
        [0.9, 0, 0.7], [0.9, 0, 2.2], [0.9, -0.8, 2.2], [0.9, -0.8, 0.7]
    ])
    assert _loops_match(right, [
        [3.1, 0, 0.7], [3.1, 0, 2.2], [3.1, -0.6, 2.2], [3.1, -0.6, 0.7]
    ])
    # Left-only fin: the blank right side is simply absent.
    loaded2 = load_idf(_SHADE_IDF + """
Shading:Fin, FN, Win1, 0.1, 0.2, 0.3, 90, 0.8;
""")
    assert len(loaded2.model.shades) == 1
    # The :Projection form's depths are fractions of the window width (2 m).
    loaded3 = load_idf(_SHADE_IDF + """
Shading:Fin:Projection, FN, Win1, 0, 0, 0, 90, 0.4;
""")
    (fin,) = loaded3.model.shades
    assert _loops_match(fin, [
        [1, 0, 1], [1, 0, 2], [1, -0.8, 2], [1, -0.8, 1]
    ])
    with pytest.warns(UserWarning, match="shades nothing"):
        load_idf(_SHADE_IDF + "Shading:Fin, FN, Win1, 0.1, 0, 0, 90, 0;\n")


def test_shading_overhang_blocks_high_sun():
    """End to end through the ray-cast: the imported overhang shades the
    window under high sun but passes low sun (the passive-solar truth,
    same as tests/test_shadow.py's hand-built polygon)."""
    from heatx.weather.shadow import sunlit_fraction

    loaded = load_idf(_SHADE_IDF + """
Shading:Overhang, OH, Win1, 0.5, 90, 0.5, 0.5, 1.0;
""")
    m = loaded.model
    win_col = len(m.surfaces) + [f.name for f in m.fenestrations].index(
        "Win1"
    )
    # 0.5 m above a 1 m window, 1 m deep: 70-degree sun casts 2.75 m down
    # the wall (full shade); 10-degree sun casts 0.18 m (clears the top).
    alt = np.radians([70.0, 10.0])
    az = np.radians([180.0, 180.0])
    f = sunlit_fraction(m, alt, az)
    assert f[0, win_col] == 0.0  # high sun: fully shaded
    assert f[1, win_col] == 1.0  # low winter sun slips under


def test_cli_applies_shading(ref_fixtures, tmp_path, capsys):
    """The simulate command scales the controlled panes' incident solar:
    the always-shaded variant runs cooler on a sunny day."""
    import csv as _csv
    import os as _os

    from heatx.cli import main

    EPW = f"{ref_fixtures}/epw/CHL_Santiago.855740_IWEC.epw"
    if not _os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    base = _SHADE_IDF + "Timestep, 1;\n"
    shaded = base + """
WindowShadingControl, SC, A, 1, ExteriorShade, , AlwaysOn,
    , , No, No, Roller, , , , , Group, Win1, Win2;
"""
    temps = {}
    for tag, text in (("open", base), ("shaded", shaded)):
        p = tmp_path / f"{tag}.idf"
        p.write_text(text)
        o = tmp_path / f"{tag}.csv"
        assert main(["simulate", str(p), EPW, "--hours", "48", "--engine",
                     "xla", "--mode", "trbdf2", "--f64", "-o", str(o)]) == 0
        temps[tag] = np.asarray(
            [r[1] for r in list(_csv.reader(open(o)))[1:]], float
        )
    err = capsys.readouterr().err
    assert "window shading: 1 rule(s)" in err
    # South-facing (shade side in Santiago) glazing sees mostly diffuse;
    # the shade still reads clearly against the 48 h mean.
    assert temps["shaded"].mean() < temps["open"].mean() - 0.03


def test_cli_in_run_zone_shading(ref_fixtures, tmp_path, capsys):
    """The simulate command compiles OnIfHighZoneAirTemperature into the
    march, notes it on stderr, and the fused kernel engine agrees with
    the XLA engine on the controlled building."""
    import csv as _csv
    import os as _os

    from heatx.cli import main

    EPW = f"{ref_fixtures}/epw/CHL_Santiago.855740_IWEC.epw"
    if not _os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    base = _SHADE_IDF + "Timestep, 1;\n"
    ctl = base + """
WindowShadingControl, SC, A, 1, ExteriorShade, , OnIfHighZoneAirTemperature,
    , 10, No, No, Roller, , , , , Group, Win1, Win2;
"""
    temps = {}
    for tag, text in (("open", base), ("ctl", ctl)):
        p = tmp_path / f"{tag}.idf"
        p.write_text(text)
        o = tmp_path / f"{tag}.csv"
        assert main(["simulate", str(p), EPW, "--hours", "48", "--engine",
                     "xla", "--mode", "trbdf2", "--f64", "-o", str(o)]) == 0
        temps[tag] = np.asarray(
            [r[1] for r in list(_csv.reader(open(o)))[1:]], float
        )
    err = capsys.readouterr().err
    assert "in-run zone shading: 1 rule(s)" in err
    # A 10 C setpoint deploys essentially always on this January run:
    # the controlled building sheds window solar and runs cooler.
    assert temps["ctl"].mean() < temps["open"].mean() - 0.01
    # The fused kernel engine runs the control in-kernel and matches XLA
    # (interpret mode on CPU; same mode/precision as the XLA run above).
    p = tmp_path / "ctl.idf"
    ok = tmp_path / "k.csv"
    assert main(["simulate", str(p), EPW, "--hours", "48", "--engine",
                 "kernel", "--mode", "trbdf2", "--f64", "-o", str(ok)]) == 0
    kernel_T = np.asarray(
        [r[1] for r in list(_csv.reader(open(ok)))[1:]], float
    )
    np.testing.assert_allclose(kernel_T, temps["ctl"], atol=1e-6)


def test_zoneventilation_gates_lower_to_controls():
    """Numeric temperature/wind limit fields lower to in-run
    ZoneVentilationControls (they read the marching zone temperature, so
    they compile into the march); wide-open defaults lower to nothing;
    schedule-valued gates and per-zone gate conflicts warn honestly."""
    import warnings as _w

    base = """
    Zone, A, 0, 0, 0, 0, 1, 1, 3, 300, 100;
    Schedule:Constant, On, , 1.0;
    """
    gated = base + """
    ZoneVentilation:DesignFlowRate, V, A, On, Flow/Zone,
        0.1, , , , Natural, , , 1, 0, 0, 0, 22, , 100, , 2;
    """
    with _w.catch_warnings():
        _w.simplefilter("error")
        loaded = load_idf(gated)
    assert loaded.ventilation["A"] == pytest.approx(0.1)
    (ctl,) = loaded.model.vent_controls
    assert ctl.space == "A"
    assert ctl.min_indoor == pytest.approx(22.0)
    assert ctl.max_indoor == pytest.approx(100.0)
    assert ctl.delta == pytest.approx(2.0)
    assert ctl.max_wind == pytest.approx(40.0)  # default preserved

    open_vent = base + """
    ZoneVentilation:DesignFlowRate, V, A, On, Flow/Zone,
        0.1, , , , Natural, , , 1, 0, 0, 0, -100, , 100, , -100;
    """
    with _w.catch_warnings():
        _w.simplefilter("error")
        loaded = load_idf(open_vent)  # defaults: no warning, no control
    assert loaded.model.vent_controls == []

    # Schedule-valued gate fields stay unimported, with a warning.
    sched_gate = base + """
    Schedule:Constant, MinT, , 18.0;
    ZoneVentilation:DesignFlowRate, V, A, On, Flow/Zone,
        0.1, , , , Natural, , , 1, 0, 0, 0, , MinT;
    """
    with pytest.warns(UserWarning, match="Minimum Indoor Temperature Sch"):
        loaded = load_idf(sched_gate)
    assert loaded.model.vent_controls == []

    # Two objects in one zone with DIFFERENT gates: the per-zone channel
    # cannot express per-object gating — warn and run ungated.
    mixed = base + """
    ZoneVentilation:DesignFlowRate, V1, A, On, Flow/Zone,
        0.1, , , , Natural, , , 1, 0, 0, 0, 22;
    ZoneVentilation:DesignFlowRate, V2, A, On, Flow/Zone,
        0.2, , , , Natural, , , 1, 0, 0, 0, 18;
    """
    with pytest.warns(UserWarning, match="DIFFERENT temperature/wind"):
        loaded = load_idf(mixed)
    assert loaded.model.vent_controls == []
    assert loaded.ventilation["A"] == pytest.approx(0.3)

    # Two objects with IDENTICAL gates lower to one per-zone control.
    same = base + """
    ZoneVentilation:DesignFlowRate, V1, A, On, Flow/Zone,
        0.1, , , , Natural, , , 1, 0, 0, 0, 22;
    ZoneVentilation:DesignFlowRate, V2, A, On, Flow/Zone,
        0.2, , , , Natural, , , 1, 0, 0, 0, 22;
    """
    with _w.catch_warnings():
        _w.simplefilter("error")
        loaded = load_idf(same)
    (ctl,) = loaded.model.vent_controls
    assert ctl.min_indoor == pytest.approx(22.0)


def test_rectangular_window_vertices_synthesized():
    """Rectangular Window objects reconstruct their vertex loop in the
    host plane (Starting X along the wall from the lower-left corner
    viewed from outside, Starting Z up) — so context shading can ray-cast
    them; multiplier area/perimeter overrides are untouched."""
    idf = """
    Material, Concrete, Rough, 0.2, 0.816, 1700, 800, 0.9, 0.7, 0.7;
    WindowMaterial:Glazing, Clear3, SpectralAverage, , 0.003, 0.837, 0.075,
        0.075, 0.898, 0.081, 0.081, 0.0, 0.84, 0.84, 0.9;
    Construction, Wall, Concrete;
    Construction, Glz, Clear3;
    Zone, A, 0, 0, 0, 0, 1, 1, 3, 300, 100;
    BuildingSurface:Detailed, W, Wall, Wall, A, Outdoors, , Sun, Wind, 0,
        4, 0,0,3, 0,0,0, 10,0,0, 10,0,3;
    Window, Win, Glz, W, , 2, 1.0, 0.5, 4.0, 1.5;
    """
    loaded = load_idf(idf)
    (win,) = loaded.model.fenestrations
    v = win.vertices
    assert v is not None and v.shape == (4, 3)
    # In the host plane (y = 0), 1 m from the wall's lower-left corner,
    # 0.5 m up, 4 x 1.5 m.
    np.testing.assert_allclose(sorted(set(np.round(v[:, 2], 9))), [0.5, 2.0])
    assert np.allclose(v[:, 1], 0.0)
    assert np.ptp(v[:, 0]) == pytest.approx(4.0)
    # Overrides still carry the multiplier (2 panes).
    area, perim, _, h = win.resolved_geometry()
    assert area == pytest.approx(2 * 4.0 * 1.5)
    assert h == pytest.approx(0.5 + 0.75)
    # And the ray-cast covers it now: a huge screen in front blocks it.
    from heatx.weather.shadow import sunlit_fraction

    loaded.model.add_shade(np.array(
        [[-20, -2, -5], [30, -2, -5], [30, -2, 60], [-20, -2, 60]], float
    ))
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")  # no 'cannot ray-cast' warning anymore
        f = sunlit_fraction(
            loaded.model, np.radians([30.0]), np.radians([180.0])
        )
    assert f[0, 1] == 0.0  # the window (index 1) is behind the screen


def test_rectangular_window_pre9_shading_control_attaches():
    """Pre-9.0 rectangular Window referencing a WindowProperty:
    ShadingControl gets the rule (it used to be silently dropped)."""
    idf = """
    Material, Concrete, Rough, 0.2, 0.816, 1700, 800, 0.9, 0.7, 0.7;
    WindowMaterial:Glazing, Clear3, SpectralAverage, , 0.003, 0.837, 0.075,
        0.075, 0.898, 0.081, 0.081, 0.0, 0.84, 0.84, 0.9;
    WindowMaterial:Shade, Roller, 0.3, 0.5, 0.3, 0.5, 0.9, 0.0, 0.003, 0.1;
    Construction, Wall, Concrete;
    Construction, Glz, Clear3;
    Zone, A, 0, 0, 0, 0, 1, 1, 3, 300, 100;
    BuildingSurface:Detailed, W, Wall, Wall, A, Outdoors, , Sun, Wind, 0,
        4, 0,0,3, 0,0,0, 10,0,0, 10,0,3;
    Window, Win, Glz, W, OldSC, , 1, 1.0, 0.5, 4.0, 1.5;
    WindowProperty:ShadingControl, OldSC, ExteriorShade, , AlwaysOn,
        , , No, No, Roller;
    """
    loaded = load_idf(idf)
    (rule,) = loaded.shading
    assert rule.fenestrations == ["Win"]
    assert rule.transmittance == pytest.approx(0.3)
