"""Design-day sizing (heatx.sizing — extension; the reference has no
sizing machinery, its IdealHeaterCooler is todo!(), heating_cooling.rs:66).
"""

import numpy as np
import pytest

import heatx
from heatx.sizing import (
    DAILY_RANGE_FRACTION,
    DesignDay,
    clark_allen_sky_emissivity,
    design_day_loads,
    design_days_from_epw,
)
from heatx.testing import SingleZoneOptions, TestMat, single_zone_building
from heatx.weather.epw import read_epw

EPW = "/root/reference/tests/epw/CHL_Santiago.855740_IWEC.epw"
F64 = heatx.SimConfig(dtype=np.float64, interior_mrt=True)


@pytest.fixture
def epw(ref_fixtures):
    return read_epw(f"{ref_fixtures}/epw/CHL_Santiago.855740_IWEC.epw")


def _model(width=10.0):
    return single_zone_building(SingleZoneOptions(
        zone_volume=300.0, surface_width=width, surface_height=3.0,
        construction=[TestMat.concrete(0.2)],
    ))


def test_design_conditions_from_epw(epw):
    """The DESIGN CONDITIONS header parses to the ASHRAE values (southern
    hemisphere: heating month July, cooling January)."""
    dc = epw.design_conditions
    assert dc["heating_db_996"] == -1.1
    assert dc["heating_coldest_month"] == 7
    assert dc["heating_dp_996"] == -2.7
    assert dc["heating_mcws"] == 0.9
    assert dc["cooling_db_004"] == 31.8
    assert dc["cooling_db_range"] == 17.2
    assert dc["cooling_hottest_month"] == 1
    assert dc["cooling_mcws"] == 5.7
    days = design_days_from_epw(epw)
    assert days["winter"].dry_bulb_profile.max() == -1.1
    assert days["winter"].dry_bulb_profile.min() == -1.1
    summer = days["summer"].dry_bulb_profile
    assert summer.max() == pytest.approx(31.8)  # 15:00, fraction 0
    assert summer.min() == pytest.approx(31.8 - 17.2)  # 05:00
    assert summer.argmax() in (13, 14)
    # No-header EPW fails loudly.
    import dataclasses

    bare = dataclasses.replace(epw, design_conditions={})
    with pytest.raises(ValueError, match="DESIGN CONDITIONS"):
        design_days_from_epw(bare)


def test_daily_range_fractions_are_ashrae():
    assert DAILY_RANGE_FRACTION.shape == (24,)
    assert DAILY_RANGE_FRACTION.max() == 1.0  # 05:00 minimum temperature
    assert DAILY_RANGE_FRACTION[14] == 0.0  # 15:00 maximum
    assert clark_allen_sky_emissivity(0.0) == pytest.approx(0.787)
    assert clark_allen_sky_emissivity(20.0) > clark_allen_sky_emissivity(0.0)


def test_ashrae_clear_sky():
    from heatx.weather.solar import ashrae_clear_sky

    dni, dhi = ashrae_clear_sky(np.radians([60.0, 30.0, -5.0]), month=1)
    assert 1230 * np.exp(-0.142 / np.sin(np.radians(60))) == pytest.approx(dni[0])
    assert dni[0] > dni[1] > 0.0
    assert dni[2] == 0.0 and dhi[2] == 0.0
    np.testing.assert_allclose(dhi[:2], 0.058 * dni[:2])
    # clearness scales both.
    d2, h2 = ashrae_clear_sky(np.radians(60.0), month=1, clearness=0.5)
    assert d2 == pytest.approx(0.5 * dni[0])


def test_winter_day_steady_and_scales_with_area(epw):
    """A constant winter day converges to a steady heating load that
    scales ~linearly with envelope area and grows when the design
    temperature drops."""
    days = design_days_from_epw(epw)
    r1 = design_day_loads(_model(10.0), days["winter"], config=F64, epw=epw)
    assert r1.peak_W.shape == (1,)
    p1 = float(r1.peak_W[0])
    assert p1 > 100.0
    # Converged periodic day under constant forcing: flat profile.
    prof = r1.profile_W[:, 0]
    assert prof.min() > 0  # always heating
    assert (prof.max() - prof.min()) < 0.05 * p1
    # Double the wall -> ~double the loss (within film nonlinearity).
    r2 = design_day_loads(_model(20.0), days["winter"], config=F64, epw=epw)
    assert 1.7 < float(r2.peak_W[0]) / p1 < 2.3
    # Colder design day -> bigger load, roughly proportional to deltaT.
    import dataclasses

    colder = dataclasses.replace(days["winter"], db_max=-11.1)
    r3 = design_day_loads(_model(10.0), colder, config=F64, epw=epw)
    ratio = float(r3.peak_W[0]) / p1
    dt_ratio = (20.0 + 11.1) / (20.0 + 1.1)
    assert 0.8 * dt_ratio < ratio < 1.2 * dt_ratio


def test_summer_day_solar_and_timing(epw):
    """The cooling day's peak lands in the afternoon/evening; killing the
    clear-sky solar (clearness=0) shrinks the load."""
    import dataclasses

    days = design_days_from_epw(epw)
    r = design_day_loads(_model(), days["summer"], config=F64, epw=epw)
    peak = float(r.peak_W[0])
    assert peak > 0.0
    assert 12 <= int(r.peak_hour[0]) <= 22
    dark = dataclasses.replace(days["summer"], clearness=0.0)
    r0 = design_day_loads(_model(), dark, config=F64, epw=epw)
    assert float(r0.peak_W[0]) < peak
    # Summer days need the EPW sun path.
    with pytest.raises(ValueError, match="sun path"):
        design_day_loads(_model(), days["summer"], config=F64)


def test_subhourly_grid_matches_hourly(epw):
    """n=4 main steps/hour lands on the same steady winter load as n=1
    (the channels hold within the hour)."""
    days = design_days_from_epw(epw)
    r1 = design_day_loads(_model(), days["winter"], config=F64, epw=epw, n=1)
    r4 = design_day_loads(_model(), days["winter"], config=F64, epw=epw, n=4)
    assert r4.profile_W.shape[0] == 96
    np.testing.assert_allclose(r4.peak_W, r1.peak_W, rtol=0.02)


def test_sizing_replaces_thermostats_keeps_gain_devices(epw):
    """Pre-existing setpoint HVACs are removed from the sizing copy (their
    capacity is the unknown); scheduled power devices stay as gains."""
    from heatx.model.building import ElectricHeater, IdealHeaterCooler

    m = _model()
    m.add_hvac(IdealHeaterCooler("old tstat", ["Space"],
                                 heat_setpoint=15.0, max_heating=50.0))
    m.add_hvac(ElectricHeater("plug loads", "Space"))
    days = design_days_from_epw(epw)
    base = design_day_loads(_model(), days["winter"], config=F64, epw=epw)
    r = design_day_loads(
        m, days["winter"], config=F64, epw=epw,
        # The ElectricHeater delivers through the hvac_power channel:
        # [n_hvacs] static vector (old tstat removed -> plug loads at
        # index 0, the sizing ideal loads appended after).
        extra_channels={"hvac_power": np.array([200.0, 0.0])},
    )
    # The 50 W-capped 15 C thermostat must NOT cap the sizing load, and
    # the 200 W gain offsets the envelope loss.
    assert float(r.peak_W[0]) > 100.0
    assert float(r.peak_W[0]) == pytest.approx(
        float(base.peak_W[0]) - 200.0, abs=30.0
    )


def test_cli_size(ref_fixtures, tmp_path, capsys):
    from heatx.cli import main

    js = tmp_path / "sizing.json"
    rc = main([
        "size", f"{ref_fixtures}/massive_full/in.idf", EPW,
        "--f64", "--platform", "cpu", "--sizing-json", str(js),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "winter design day (-1.1 C" in out
    assert "summer design day (31.8 C, range 17.2 K" in out
    import json

    s = json.loads(js.read_text())
    assert s["winter"]["peak_heating_W"]["Interior Space"] > 100.0
    assert s["summer"]["total_peak_cooling_W"] > 0.0


def test_sizing_hvac_power_remap():
    """The hvac_power channel remaps from the original device order to the
    sizing copy's (thermostats dropped, zero-power sizing unit appended)."""
    from heatx.model.building import ElectricHeater, IdealHeaterCooler
    from heatx.sizing import sizing_hvac_power

    m = _model()
    m.add_hvac(ElectricHeater("eq1", "Space"))
    m.add_hvac(IdealHeaterCooler("t1", ["Space"], heat_setpoint=20.0))
    m.add_hvac(ElectricHeater("eq2", "Space"))
    m.add_hvac(IdealHeaterCooler("t2", ["Space"], cool_setpoint=26.0))
    np.testing.assert_array_equal(
        sizing_hvac_power(m, np.array([100.0, 7.0, 200.0, 7.0])),
        [100.0, 200.0, 0.0],
    )
    series = np.tile([100.0, 7.0, 200.0, 7.0], (5, 1))
    out = sizing_hvac_power(m, series)
    assert out.shape == (5, 3)
    np.testing.assert_array_equal(out[0], [100.0, 200.0, 0.0])


def test_cli_size_with_gains_and_thermostats(ref_fixtures, tmp_path, capsys):
    """Regression: an IDF with scheduled gains AND multiple thermostats
    sizes cleanly — the hvac_power channel is remapped onto the sizing
    copy's device order (it used to broadcast-crash unless the IDF had
    exactly one thermostat)."""
    from heatx.cli import main

    idf = tmp_path / "m.idf"
    idf.write_text("""
Timestep, 1;
Material, Concrete, Rough, 0.2, 0.816, 1700, 800, 0.9, 0.7, 0.7;
Construction, Wall, Concrete;
Zone, A, 0, 0, 0, 0, 1, 1, 3, 300, 100;
Zone, B, 0, 0, 0, 0, 1, 1, 3, 300, 100;
BuildingSurface:Detailed, WA, Wall, Wall, A, Outdoors, , Sun, Wind, 0,
    4, 0,0,3, 0,0,0, 10,0,0, 10,0,3;
BuildingSurface:Detailed, WB, Wall, Wall, B, Outdoors, , Sun, Wind, 0,
    4, 0,5,3, 0,5,0, 10,5,0, 10,5,3;
Schedule:Constant, On, , 1.0;
ElectricEquipment, E1, A, On, EquipmentLevel, 500.0;
Schedule:Constant, Act, , 120.0;
People, P1, B, On, People, 5, , , 0.3, , Act;
Schedule:Constant, HSP, Temperature, 19.0;
ZoneControl:Thermostat, TA, A, , ThermostatSetpoint:SingleHeating, SH;
ZoneControl:Thermostat, TB, B, , ThermostatSetpoint:SingleHeating, SH;
ThermostatSetpoint:SingleHeating, SH, HSP;
""")
    js = tmp_path / "s.json"
    rc = main(["size", str(idf), EPW, "--f64", "--platform", "cpu",
               "--sizing-json", str(js)])
    assert rc == 0
    import json

    s = json.loads(js.read_text())
    assert set(s["winter"]["peak_heating_W"]) == {"A", "B"}
    # Summer includes the 400 W equipment gain in zone A (10% latent/lost
    # defaults absent -> full 500 W sensible here): A needs more cooling.
    assert (s["summer"]["peak_cooling_W"]["A"]
            > s["summer"]["peak_cooling_W"]["B"])


@pytest.mark.slow
def test_sized_capacity_covers_the_annual_run(epw):
    """Closing the loop: equipment capped at the design-day peaks holds the
    setpoints through the whole annual EPW run (0 unmet heating hours; a
    handful of cooling exceedances — the 0.4% cooling design condition
    statistically permits ~35), while half-sized equipment fails hundreds
    of hours.  This validates the sizing pipeline against the simulation
    it is meant to protect."""
    import copy

    from heatx.build.layout import B_OUTDOOR
    from heatx.model.building import IdealHeaterCooler
    from heatx.weather.solar import surface_irradiance, surface_longwave

    m = _model()
    days = design_days_from_epw(epw)
    rw = design_day_loads(m, days["winter"], config=F64, epw=epw)
    rs = design_day_loads(m, days["summer"], config=F64, epw=epw)
    heat_cap, cool_cap = float(rw.peak_W[0]), float(rs.peak_W[0])

    def annual_unmet(hc, cc):
        mm = copy.deepcopy(m)
        mm.add_hvac(IdealHeaterCooler(
            "hvac", ["Space"], heat_setpoint=20.0, cool_setpoint=26.0,
            max_heating=hc, max_cooling=cc,
        ))
        tm = heatx.ThermalModel(mm, n=1, config=F64)
        T = 8760
        sol = surface_irradiance(epw, tm.building, hours=T, sky="perez")
        ir = surface_longwave(epw, tm.building, hours=T)
        outf = np.asarray(tm.building.surfaces.front_code) == B_OUTDOOR
        seq = tm.inputs_sequence(
            T, t_out=epw.dry_bulb[:T], wind_speed=epw.wind_speed[:T],
            wind_direction=np.radians(epw.wind_direction_deg[:T]),
            sol_front=sol * outf, ir_front=ir * outf,
        )
        day1 = tm.inputs_sequence(
            24, t_out=epw.dry_bulb[:24], wind_speed=epw.wind_speed[:24],
            sol_front=sol[:24] * outf, ir_front=ir[:24] * outf,
        )
        st, _ = tm.warmup(tm.initial_state(), day1)
        _, zt = tm.run(st, seq)
        zt = np.asarray(zt)
        return int((zt < 19.5).sum()), int((zt > 26.5).sum())

    uh, uc = annual_unmet(heat_cap, cool_cap)
    assert uh == 0, (uh, uc)
    assert uc <= 35, (uh, uc)  # the 0.4% condition's statistical allowance
    uh2, uc2 = annual_unmet(0.5 * heat_cap, 0.5 * cool_cap)
    assert uh2 > 100, (uh2, uc2)  # half-sized heating demonstrably fails


def test_annual_peak_loads_consistency(epw):
    """Sizing by simulation: coverage=100 peaks equal the demand-series
    maxima, lower coverage never exceeds them, and capping capacities at
    the 100% peaks reproduces a covered year (same config throughout)."""
    import copy

    from heatx.model.building import IdealHeaterCooler
    from heatx.sizing import annual_peak_loads

    m = _model()
    r = annual_peak_loads(m, epw, heat_sp=20.0, cool_sp=26.0,
                          coverage=100.0, config=F64)
    assert r.loads_W.shape == (epw.n_hours, 1)
    np.testing.assert_allclose(
        r.peak_heating_W, np.clip(r.loads_W, 0, None).max(0)
    )
    np.testing.assert_allclose(
        r.peak_cooling_W, np.clip(-r.loads_W, 0, None).max(0)
    )
    r996 = annual_peak_loads(m, epw, heat_sp=20.0, cool_sp=26.0,
                             coverage=99.6, config=F64)
    assert (r996.peak_heating_W <= r.peak_heating_W + 1e-9).all()
    assert (r996.peak_cooling_W <= r.peak_cooling_W + 1e-9).all()
    assert r996.max_heating_W == pytest.approx(r.peak_heating_W)

    # Cap at the 100% peaks and re-run the same year: still covered.
    mm = copy.deepcopy(m)
    mm.add_hvac(IdealHeaterCooler(
        "hvac", ["Space"], heat_setpoint=20.0, cool_setpoint=26.0,
        max_heating=float(r.peak_heating_W[0]) + 1.0,
        max_cooling=float(r.peak_cooling_W[0]) + 1.0,
    ))
    from heatx.build.layout import B_OUTDOOR
    from heatx.weather.solar import surface_irradiance, surface_longwave

    cfg = heatx.SimConfig(dtype=np.float64, interior_mrt=True)
    tm = heatx.ThermalModel(mm, n=1, config=cfg)
    T = epw.n_hours
    outf = np.asarray(tm.building.surfaces.front_code) == B_OUTDOOR
    sol = surface_irradiance(epw, tm.building, hours=T, sky="perez")
    ir = surface_longwave(epw, tm.building, hours=T)
    seq = tm.inputs_sequence(
        T, t_out=epw.dry_bulb, wind_speed=epw.wind_speed,
        wind_direction=np.radians(epw.wind_direction_deg),
        sol_front=sol * outf, ir_front=ir * outf,
    )
    day1 = seq._replace(**{
        k: getattr(seq, k)[:24] for k in seq._fields
        if getattr(seq, k) is not None and np.ndim(getattr(seq, k)) > 0
        and np.shape(getattr(seq, k))[0] == T
    })
    st, _ = tm.warmup(
        tm.initial_state(), day1,
        run=lambda s: tm.run(s, day1, collect_zone_T=False,
                             mode="trbdf2")[0],
    )
    _, zt = tm.run(st, seq, mode="trbdf2")
    zt = np.asarray(zt)
    assert int((zt < 19.5).sum()) == 0
    assert int((zt > 26.5).sum()) == 0


def test_cli_size_annual(ref_fixtures, tmp_path, capsys):
    from heatx.cli import main

    js = tmp_path / "s.json"
    rc = main([
        "size", f"{ref_fixtures}/massive_full/in.idf", EPW,
        "--f64", "--platform", "cpu", "--annual", "--coverage", "99.0",
        "--sizing-json", str(js),
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "annual-simulation sizing (99.0 % coverage" in out
    import json

    s = json.loads(js.read_text())
    ann = s["annual"]
    assert ann["coverage_pct"] == 99.0
    nm = "Interior Space"
    assert 0.0 <= ann["peak_heating_W"][nm] <= ann["abs_max_heating_W"][nm]
    assert 0.0 <= ann["peak_cooling_W"][nm] <= ann["abs_max_cooling_W"][nm]
    # Design-day heating (constant 99.6% extreme) bounds the annual value.
    assert (s["winter"]["peak_heating_W"][nm]
            >= ann["peak_heating_W"][nm] * 0.9)


def test_annual_peak_loads_kernel_engine(epw):
    """engine="kernel" routes the annual sizing through the fused day
    kernel (interpret mode on CPU) and matches the XLA TR-BDF2 scan; the
    seasonal soil rides the runner's own per-dispatch operand swaps."""
    from heatx.model.building import Boundary, SurfaceDef
    from heatx.sizing import annual_peak_loads

    m = _model()
    m.add_surface(SurfaceDef(
        "slab", "the construction", Boundary.ground(), Boundary.space_("Space"),
        vertices=np.array(
            [[0, 0, 0], [0, 5, 0], [10, 5, 0], [10, 0, 0]], float
        ),
    ))
    kw = dict(heat_sp=20.0, cool_sp=26.0, coverage=99.6, config=F64)
    rx = annual_peak_loads(m, epw, engine="xla", **kw)
    rk = annual_peak_loads(m, epw, engine="kernel", **kw)
    # The in-kernel Carroll MRT matches the XLA evaluation at ~1e-9 per
    # step (tests/test_mrt.py); compounded through a chaotic year that
    # drifts to ~1 W on kW-scale loads — gate the drift, not bit-equality.
    np.testing.assert_allclose(rk.loads_W, rx.loads_W, atol=3.0)
    np.testing.assert_allclose(rk.peak_heating_W, rx.peak_heating_W,
                               rtol=2e-3)
    np.testing.assert_allclose(rk.peak_cooling_W, rx.peak_cooling_W,
                               rtol=2e-3, atol=1.0)
    with pytest.raises(ValueError, match="hourly main steps"):
        annual_peak_loads(m, epw, engine="kernel", n=2, config=F64)
    with pytest.raises(ValueError, match="engine must be"):
        annual_peak_loads(m, epw, engine="bogus", config=F64)
