"""CLI driver tests (``python -m heatx``): info + simulate on a reference
``.spl`` model, plus the ``ThermalModel.inputs_sequence`` helper the CLI is
built on.  The reference has no executable (it is a library plugged into
SIMPLE's orchestrator, model.rs:182-428); the CLI is a heatx extension."""

import csv
import os

import numpy as np
import pytest

from heatx.cli import main

EPW = "/root/reference/tests/epw/CHL_Santiago.855740_IWEC.epw"


@pytest.fixture
def spl(ref_fixtures):
    p = f"{ref_fixtures}/tilted/back.spl"
    if not os.path.isfile(p) or not os.path.isfile(EPW):
        pytest.skip("reference fixtures unavailable")
    return p


def _read(path):
    with open(path) as f:
        rows = list(csv.reader(f))
    return rows[0], np.array([[float(v) for v in r[1:]] for r in rows[1:]])


def test_cli_info(spl, capsys):
    assert main(["info", spl]) == 0
    out = capsys.readouterr().out
    assert "1 surfaces" in out
    assert "Interior Space" in out
    assert "sub-steps per main step" in out


def test_cli_simulate_writes_csv(spl, tmp_path):
    out = tmp_path / "z.csv"
    assert main(["simulate", spl, EPW, "--hours", "6", "-o", str(out)]) == 0
    header, temps = _read(out)
    assert header == ["hour", "Interior Space"]
    assert temps.shape == (6, 1)
    assert np.isfinite(temps).all()
    assert (temps > -30).all() and (temps < 60).all()


def test_cli_engines_and_modes_agree(spl, tmp_path):
    """XLA parity, the fused kernel (interpret on CPU), and the TR-BDF2
    host loop all march the same building to nearby temperatures."""
    runs = {
        "xla": ["--engine", "xla"],
        # The tilted wall is all-massive, so the fixed-iteration no-mass
        # regime is inert and the kernel matches the XLA parity march.
        "kernel": ["--engine", "kernel", "--nomass-iters", "1"],
        "trbdf2": ["--engine", "xla", "--mode", "trbdf2"],
    }
    temps = {}
    for name, extra in runs.items():
        p = tmp_path / f"{name}.csv"
        # --f64 matches the suite's x64-enabled process (a standalone f32
        # CLI process runs with x64 off; mixing the two breaks the kernel).
        args = ["simulate", spl, EPW, "--hours", "6", "--f64", "-o", str(p)]
        assert main(args + extra) == 0
        temps[name] = _read(p)[1][:, 0]
    assert np.max(np.abs(temps["xla"] - temps["kernel"])) < 5e-3
    # The fast mode freezes h per step: same building, looser agreement.
    assert np.max(np.abs(temps["xla"] - temps["trbdf2"])) < 0.5


def test_inputs_sequence_shapes_and_run():
    import jax.numpy as jnp

    import heatx
    from heatx.testing import SingleZoneOptions, TestMat, single_zone_building

    tm = heatx.ThermalModel(
        single_zone_building(
            SingleZoneOptions(construction=[TestMat.concrete(0.2)])
        ),
        config=heatx.SimConfig(dtype=jnp.float64),
    )
    b = tm.building
    T = 5
    t_series = np.linspace(0.0, 10.0, T)
    sol_static = np.full(b.n_surfaces, 100.0)
    seq = tm.inputs_sequence(T, t_out=t_series, sol_front=sol_static)
    assert seq.t_out.shape == (T,)
    assert np.allclose(np.asarray(seq.t_out), t_series)
    assert seq.sol_front.shape == (T, b.n_surfaces)
    assert np.allclose(np.asarray(seq.sol_front), 100.0)
    assert seq.inf_vol.shape == (T, b.n_zones)

    # The broadcast sequence scans identically to marching by hand.
    st = tm.initial_state()
    final, zt = tm.run(st, seq)
    state = st
    for t in range(T):
        state = tm.march(
            state, tm.inputs(t_out=t_series[t], sol_front=sol_static)
        )
    assert np.allclose(np.asarray(zt[-1]), np.asarray(state.zone_T), atol=1e-12)

    # Per-sub-step weather: [T, sub] passes through, [sub] broadcasts.
    sub = b.dt_subdivisions
    seq2 = tm.inputs_sequence(T, t_out=np.zeros((T, sub)))
    assert seq2.t_out.shape == (T, sub)
    seq3 = tm.inputs_sequence(T, wind_speed=np.full(sub, 2.0))
    assert seq3.wind_speed.shape == (T, sub)


def test_cli_rejects_exp_mode_on_kernel_engine(capsys):
    """--engine kernel implements parity/trbdf2 only; an explicit
    exp+kernel combination must exit with a clear error, not crash in
    make_hour_march (and engine=auto must route exp to the XLA loop)."""
    rc = main(["simulate", "m.spl", "w.epw", "--mode", "exp",
               "--engine", "kernel"])
    assert rc == 2
    err = capsys.readouterr().err
    assert "parity/trbdf2" in err


def test_cli_simulate_idf(ref_fixtures, tmp_path):
    """An EnergyPlus fixture IDF simulates directly: the IDF's Timestep (20)
    becomes the main-step rate, hourly EPW weather holds across each hour's
    20 main steps, and the CSV reports end-of-hour temperatures."""
    idf = f"{ref_fixtures}/massive_full/in.idf"
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    out = tmp_path / "z.csv"
    assert main([
        "simulate", idf, EPW, "--hours", "4", "--mode", "trbdf2",
        "--engine", "xla", "-o", str(out),
    ]) == 0
    header, temps = _read(out)
    assert header == ["hour", "Interior Space"]
    assert temps.shape == (4, 1)
    assert np.isfinite(temps).all()


def test_cli_idf_kernel_engine_needs_hourly_steps(ref_fixtures, capsys):
    """The fused kernel marches hourly main steps; an IDF Timestep > 1 on
    --engine kernel is rejected with guidance instead of mis-simulating."""
    idf = f"{ref_fixtures}/massive_full/in.idf"
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    rc = main(["simulate", idf, EPW, "--hours", "2", "--engine", "kernel"])
    assert rc == 2
    assert "--n 1" in capsys.readouterr().err


_SLAB_IDF = """
Timestep, 1;
Building, B, 0, Suburbs, 0.04, 0.25, MinimalShadowing, 25, 6;
Material, Concrete, Rough, 0.2, 0.816, 1700, 800, 0.9, 0.7, 0.7;
Construction, Slab, Concrete;
Zone, Room, 0, 0, 0, 0, 1, 1, 3, 300, 100;
BuildingSurface:Detailed,
    Floor, Floor, Slab, Room, , Ground, , NoSun, NoWind, 0,
    4, 0,0,0, 10,0,0, 10,10,0, 0,10,0;
"""


def test_cli_seasonal_ground(tmp_path, capsys):
    """A ground-coupled slab picks up the EPW's monthly soil temperatures
    (month-chunked scans on the parity engine); --no-ground holds the
    compiled constant and gives a different series."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    idf = tmp_path / "slab.idf"
    idf.write_text(_SLAB_IDF)
    g1, g2 = tmp_path / "g1.csv", tmp_path / "g2.csv"
    # 746 h crosses the January/February month boundary (744).
    base = ["simulate", str(idf), EPW, "--hours", "746", "--mode", "parity",
            "--engine", "xla", "--f64"]
    assert main(base + ["-o", str(g1)]) == 0
    assert "seasonal ground temperatures" in capsys.readouterr().err
    assert main(base + ["--no-ground", "-o", str(g2)]) == 0
    _, t1 = _read(g1)
    _, t2 = _read(g2)
    assert t1.shape == (746, 1) and np.isfinite(t1).all()
    # January soil at 4 m in the Santiago EPW is ~14.9 C vs the compiled
    # 10 C default: the seasonal series must move the zone.
    assert np.abs(t1 - t2).max() > 0.5


def test_cli_idf_infiltration_applied(tmp_path, capsys):
    """IDF ZoneInfiltration design flows drive StepInputs.inf_* (outdoor-air
    exchange): the infiltrated zone tracks the cold outdoors more closely
    than the sealed one."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    base = _SLAB_IDF.replace("Ground", "Outdoors")
    leaky = base + """
ZoneInfiltration:DesignFlowRate, Inf, Room, , AirChanges/Hour,
    0, 0, 0, 2.0, 1, 0, 0, 0;
"""
    sealed_p, leaky_p = tmp_path / "sealed.idf", tmp_path / "leaky.idf"
    sealed_p.write_text(base)
    leaky_p.write_text(leaky)
    outs = {}
    for name, p in (("sealed", sealed_p), ("leaky", leaky_p)):
        o = tmp_path / f"{name}.csv"
        assert main(["simulate", str(p), EPW, "--hours", "48", "--mode",
                     "trbdf2", "--engine", "xla", "-o", str(o)]) == 0
        outs[name] = _read(o)[1]
    err = capsys.readouterr().err
    assert "infiltration (m3/s): Room 0.167" in err
    # Santiago January nights are cold; the leaky zone must sit closer to
    # the outdoor series than the sealed zone on average.
    from heatx.weather.epw import read_epw
    dry = read_epw(EPW).dry_bulb[:48][:, None]
    assert np.mean(np.abs(outs["leaky"] - dry)) < np.mean(np.abs(outs["sealed"] - dry))


def test_cli_idf_gains_and_thermostat(tmp_path, capsys):
    """Imported Lights + thermostat drive the simulation: the scheduled
    setpoints hold the zone in band, --loads-csv writes the hourly demand,
    and the XLA and kernel engines agree on both series."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    idf = _SLAB_IDF.replace("Ground", "Outdoors") + """
Schedule:Compact, Occ, Fraction,
    Through: 12/31,
    For: AllDays, Until: 8:00, 0.0, Until: 18:00, 1.0, Until: 24:00, 0.0;
Lights, L1, Room, Occ, LightingLevel, 400.0;
HVACTemplate:Thermostat, TST, , 20.0, , 26.0;
HVACTemplate:Zone:IdealLoadsAirSystem, Room, TST;
"""
    p = tmp_path / "office.idf"
    p.write_text(idf)
    series = {}
    for name, extra in (
        ("xla", ["--engine", "xla", "--mode", "trbdf2"]),
        ("kernel", ["--engine", "kernel", "--mode", "trbdf2"]),
    ):
        o, ld = tmp_path / f"{name}.csv", tmp_path / f"{name}_loads.csv"
        assert main([
            "simulate", str(p), EPW, "--hours", "48", "--f64",
            "-o", str(o), "--loads-csv", str(ld),
        ] + extra) == 0
        series[name] = (_read(o)[1], _read(ld)[1])
    err = capsys.readouterr().err
    assert "imported gains/schedules: 1 devices, 1 thermostats" in err
    for name, (temps, loads) in series.items():
        assert temps.shape == (48, 1) and loads.shape == (48, 1), name
        # The thermostat holds the band all 48 h.
        assert (temps >= 20.0 - 1e-6).all() and (temps <= 26.0 + 1e-6).all(), name
        # Santiago January: real heating demand at night somewhere.
        assert loads.max() > 0.0, name
    # The two engines march the same physics at the same sub-step count.
    dT = np.abs(series["xla"][0] - series["kernel"][0]).max()
    assert dT < 0.05, dT


def test_cli_resume_matches_continuous(tmp_path):
    """--save-state / --init-state / --start-hour: a 48 h run split into two
    24 h segments (state checkpointed between) reproduces the continuous run
    exactly — weather, solar, schedules and gains all offset correctly."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    idf = _SLAB_IDF.replace("Ground", "Outdoors") + """
Schedule:Compact, Occ, Fraction,
    Through: 12/31,
    For: AllDays, Until: 8:00, 0.0, Until: 18:00, 1.0, Until: 24:00, 0.0;
Lights, L1, Room, Occ, LightingLevel, 400.0;
"""
    p = tmp_path / "m.idf"
    p.write_text(idf)
    base = ["simulate", str(p), EPW, "--engine", "xla", "--mode", "trbdf2",
            "--f64"]
    full = tmp_path / "full.csv"
    assert main(base + ["--hours", "48", "-o", str(full)]) == 0
    ck = tmp_path / "ck.npz"
    s1, s2 = tmp_path / "s1.csv", tmp_path / "s2.csv"
    assert main(base + ["--hours", "24", "-o", str(s1),
                        "--save-state", str(ck)]) == 0
    assert main(base + ["--hours", "24", "-o", str(s2), "--start-hour", "24",
                        "--init-state", str(ck)]) == 0
    _, tf = _read(full)
    _, t1 = _read(s1)
    _, t2 = _read(s2)
    np.testing.assert_array_equal(tf, np.concatenate([t1, t2]))
    # The hour column of the resumed segment continues the year clock.
    with open(s2) as f:
        rows = list(csv.reader(f))
    assert rows[1][0] == "24" and rows[-1][0] == "47"


def test_cli_fluxes_csv(tmp_path, capsys):
    """--fluxes-csv exports the per-surface observable channels (the
    reference's surface_trait state slots) from the fused kernel, and the
    final hour agrees with the final-state h/q."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    p = tmp_path / "m.idf"
    p.write_text(_SLAB_IDF.replace("Ground", "Outdoors"))
    pre = tmp_path / "fx"
    assert main([
        "simulate", str(p), EPW, "--hours", "24", "--engine", "kernel",
        "--mode", "trbdf2", "--f64", "--fluxes-csv", str(pre),
    ]) == 0
    for chan in ("h_front", "h_back", "q_front", "q_back"):
        header, series = _read(f"{pre}_{chan}.csv")
        assert header == ["hour", "Floor"]
        assert series.shape == (24, 1) and np.isfinite(series).all(), chan
    _, h = _read(f"{pre}_h_front.csv")
    assert (h > 0).all()  # a live convection coefficient every hour
    # XLA engines reject the flag with guidance instead of mis-running.
    assert main([
        "simulate", str(p), EPW, "--hours", "2", "--engine", "xla",
        "--fluxes-csv", str(pre),
    ]) == 2
    assert "--engine kernel" in capsys.readouterr().err


def test_cli_honors_idf_runperiod(tmp_path, capsys):
    """An IDF RunPeriod (Jul 1 - Jul 7 here) sets the simulation window
    when --hours/--start-hour are not given; explicit flags override."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    idf = _SLAB_IDF.replace("Ground", "Outdoors") + \
        "RunPeriod, Week, 7, 1, 7, 7, Tuesday, No, No, No, Yes, Yes;\n"
    p = tmp_path / "m.idf"
    p.write_text(idf)
    o = tmp_path / "z.csv"
    assert main(["simulate", str(p), EPW, "--engine", "xla",
                 "--mode", "trbdf2", "-o", str(o)]) == 0
    err = capsys.readouterr().err
    assert "RunPeriod: days 182..188 (168 h from hour 4344)" in err
    with open(o) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 1 + 168
    assert rows[1][0] == "4344" and rows[-1][0] == str(4344 + 167)
    # Explicit flags still win.
    assert main(["simulate", str(p), EPW, "--engine", "xla", "--mode",
                 "trbdf2", "--hours", "3", "-o", str(o)]) == 0
    with open(o) as f:
        assert len(list(csv.reader(f))) == 1 + 3


def test_cli_runperiod_wraparound_and_explicit_zero(tmp_path, capsys):
    """Fourth-review regressions: a Dec->Feb RunPeriod wraps the year
    boundary instead of producing a negative horizon, and an explicit
    --start-hour 0 overrides the RunPeriod begin date."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    idf = _SLAB_IDF.replace("Ground", "Outdoors") + \
        "RunPeriod, Winter, 12, 30, 1, 2, Sunday;\n"
    p = tmp_path / "m.idf"
    p.write_text(idf)
    o = tmp_path / "z.csv"
    assert main(["simulate", str(p), EPW, "--engine", "xla",
                 "--mode", "trbdf2", "-o", str(o)]) == 0
    err = capsys.readouterr().err
    assert "RunPeriod: days 364..2 (96 h from hour 8712)" in err
    with open(o) as f:
        rows = list(csv.reader(f))
    assert len(rows) == 1 + 96  # Dec 30, 31, Jan 1, 2
    assert main(["simulate", str(p), EPW, "--engine", "xla", "--mode",
                 "trbdf2", "--start-hour", "0", "--hours", "2",
                 "-o", str(o)]) == 0
    with open(o) as f:
        rows = list(csv.reader(f))
    assert rows[1][0] == "0"  # explicit Jan-1 start wins


def test_cli_summary_json(tmp_path):
    """--summary-json writes machine-readable results; on a thermostatic
    model it also collects and summarizes the demand (kWh, peaks) without
    needing --loads-csv."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    idf = _SLAB_IDF.replace("Ground", "Outdoors") + """
HVACTemplate:Thermostat, TST, , 20.0, , 26.0;
HVACTemplate:Zone:IdealLoadsAirSystem, Room, TST;
"""
    p = tmp_path / "m.idf"
    p.write_text(idf)
    js = tmp_path / "summary.json"
    assert main(["simulate", str(p), EPW, "--hours", "24", "--engine",
                 "xla", "--mode", "trbdf2", "--summary-json", str(js)]) == 0
    import json

    s = json.loads(js.read_text())
    assert s["hours"] == 24 and s["engine"] == "xla"
    z = s["zones"]["Room"]
    assert 20.0 - 1e-6 <= z["min_C"] <= z["max_C"] <= 26.0 + 1e-6
    d = s["demand"]
    assert d["heating_kwh"] >= 0 and d["cooling_kwh"] >= 0
    assert d["cooling_kwh"] == pytest.approx(
        d["per_zone_cooling_kwh"]["Room"], abs=1e-6
    )
    assert (d["heating_kwh"] + d["cooling_kwh"]) > 0
    # Unlimited ideal loads land exactly on the setpoint: no unmet hours.
    assert d["unmet_heating_hours"] == 0 and d["unmet_cooling_hours"] == 0


def test_cli_zone_multiplier_scales_building_totals(tmp_path):
    """Zone Multiplier (Zone field 7): the zone is simulated once, the
    BUILDING demand totals scale by the multiplier; per-zone figures stay
    per-instance (EnergyPlus semantics)."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    base = _SLAB_IDF.replace("Ground", "Outdoors") + """
HVACTemplate:Thermostat, TST, , 20.0, , 26.0;
HVACTemplate:Zone:IdealLoadsAirSystem, Room, TST;
"""
    mult = base.replace(
        "Zone, Room, 0, 0, 0, 0, 1, 1, 3, 300, 100;",
        "Zone, Room, 0, 0, 0, 0, 1, 3, 3, 300, 100;",
    )
    assert mult != base  # the replace actually hit
    import json

    results = {}
    for tag, text in (("one", base), ("three", mult)):
        p = tmp_path / f"{tag}.idf"
        p.write_text(text)
        js = tmp_path / f"{tag}.json"
        assert main(["simulate", str(p), EPW, "--hours", "24", "--engine",
                     "xla", "--mode", "trbdf2",
                     "--summary-json", str(js)]) == 0
        results[tag] = json.loads(js.read_text())["demand"]
    one, three = results["one"], results["three"]
    # Per-zone (per-instance) figures identical; building totals x3.
    assert three["per_zone_heating_kwh"]["Room"] == pytest.approx(
        one["per_zone_heating_kwh"]["Room"], abs=1e-6
    )
    assert three["heating_kwh"] == pytest.approx(
        3 * one["heating_kwh"], rel=1e-6
    )
    assert three["cooling_kwh"] == pytest.approx(
        3 * one["cooling_kwh"], rel=1e-6
    )
    assert three["zone_multipliers"] == {"Room": 3.0}
    assert "zone_multipliers" not in one
    # Coincident building-wide peaks scale with the multiplier too.  The
    # summary rounds to 0.1 W, so round(3v, 1) vs 3*round(v, 1) can differ
    # by up to ~0.2 W — compare at the rounding quantum, not rel=1e-6.
    assert three["peak_heating_w"] == pytest.approx(
        3 * one["peak_heating_w"], abs=0.3
    )
    assert three["peak_cooling_w"] == pytest.approx(
        3 * one["peak_cooling_w"], abs=0.3
    )


def test_cli_warmup_days(tmp_path, capsys):
    """--warmup-days repeats the first day to convergence before the
    reported horizon: the first reported hour moves from the 22 C
    initialization toward the periodic regime, and stderr names the
    repeat count."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    idf = tmp_path / "m.idf"
    idf.write_text(_SLAB_IDF.replace("Ground", "Outdoors"))
    o1, o2 = tmp_path / "a.csv", tmp_path / "b.csv"
    base = ["simulate", str(idf), EPW, "--hours", "24", "--engine", "xla",
            "--mode", "trbdf2", "--f64"]
    assert main(base + ["-o", str(o1)]) == 0
    assert main(base + ["--warmup-days", "25", "-o", str(o2)]) == 0
    err = capsys.readouterr().err
    assert "# warm-up:" in err
    a = [float(r[1]) for r in list(csv.reader(open(o1)))[1:]]
    b = [float(r[1]) for r in list(csv.reader(open(o2)))[1:]]
    # Warmed start differs up front and is more day-periodic.
    assert abs(a[0] - b[0]) > 0.5
    assert abs(b[-1] - b[0]) < abs(a[-1] - a[0])


def test_cli_interior_mrt(tmp_path):
    """--interior-mrt changes results on a multi-surface zone (the zone's
    faces exchange longwave directly) and runs on the kernel engine too."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    idf = _SLAB_IDF.replace("Ground", "Outdoors") + """
BuildingSurface:Detailed,
    Wall, Wall, Slab, Room, , Outdoors, , SunExposed, WindExposed, 0,
    4, 0,0,3, 0,0,0, 10,0,0, 10,0,3;
"""
    p = tmp_path / "m.idf"
    p.write_text(idf)
    o1, o2 = tmp_path / "a.csv", tmp_path / "b.csv"
    base = ["simulate", str(p), EPW, "--hours", "12", "--engine", "xla",
            "--mode", "trbdf2", "--f64"]
    assert main(base + ["-o", str(o1)]) == 0
    assert main(base + ["--interior-mrt", "-o", str(o2)]) == 0
    a = [r[1] for r in csv.reader(open(o1))][1:]
    b = [r[1] for r in csv.reader(open(o2))][1:]
    assert a != b  # radiant coupling moved the zone trajectory
    # The fused kernel implements the same MRT network (pallas_step
    # _mrt_context): same trajectory as the XLA integrator, f64.
    o3 = tmp_path / "c.csv"
    kbase = [x for x in base if x not in ("--engine", "xla")]
    assert main(kbase + ["--interior-mrt", "--engine", "kernel",
                         "-o", str(o3)]) == 0
    c = [r[1] for r in csv.reader(open(o3))][1:]
    np.testing.assert_allclose(
        np.asarray(c, float), np.asarray(b, float), atol=1e-8
    )


def test_cli_summary_json_subhourly_scheduled_setpoints(tmp_path):
    """Scheduled setpoints + IDF Timestep > 1: the unmet-hours summary must
    downsample the [T*n] setpoint series to the hourly zt grid instead of
    crashing on a shape mismatch."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    idf = _SLAB_IDF.replace("Ground", "Outdoors").replace(
        "Timestep, 1;", "Timestep, 4;"
    ) + """
Schedule:Compact, HeatSP, Temperature, Through: 12/31, For: AllDays,
    Until: 24:00, 20.0;
HVACTemplate:Thermostat, TST, HeatSP, , , 26.0;
HVACTemplate:Zone:IdealLoadsAirSystem, Room, TST;
"""
    p = tmp_path / "m.idf"
    p.write_text(idf)
    js = tmp_path / "summary.json"
    assert main(["simulate", str(p), EPW, "--hours", "24", "--engine",
                 "xla", "--mode", "trbdf2", "--summary-json", str(js)]) == 0
    import json

    s = json.loads(js.read_text())
    assert s["timestep_per_hour"] == 4 if "timestep_per_hour" in s else True
    d = s["demand"]
    assert "unmet_heating_hours" in d and d["unmet_heating_hours"] >= 0


def test_cli_operative_csv(tmp_path):
    """--operative-csv writes the hourly per-zone operative temperature via
    the kernel engine; rejected on the XLA engine."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    idf = _SLAB_IDF.replace("Ground", "Outdoors") + """
BuildingSurface:Detailed,
    Wall, Wall, Slab, Room, , Outdoors, , SunExposed, WindExposed, 0,
    4, 0,0,3, 0,0,0, 10,0,0, 10,0,3;
"""
    p = tmp_path / "m.idf"
    p.write_text(idf)
    oz, oo = tmp_path / "z.csv", tmp_path / "op.csv"
    assert main(["simulate", str(p), EPW, "--hours", "12", "--engine",
                 "kernel", "--mode", "trbdf2", "--f64", "-o", str(oz),
                 "--operative-csv", str(oo)]) == 0
    zt = np.asarray([r[1] for r in csv.reader(open(oz))][1:], float)
    top = np.asarray([r[1] for r in csv.reader(open(oo))][1:], float)
    assert top.shape == zt.shape
    # Operative sits between air and the (colder) envelope faces here, and
    # is not the air temperature itself.
    assert np.all(np.isfinite(top)) and np.abs(top - zt).max() > 0.01
    assert main(["simulate", str(p), EPW, "--hours", "12", "--engine",
                 "xla", "--mode", "trbdf2", "--operative-csv",
                 str(oo)]) == 2


def test_cli_summary_unmet_hours(tmp_path):
    """Capacity-limited ideal loads report unmet setpoint hours (zone-hours
    outside the +-0.5 K throttling range) in the summary."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    spl = """
    Substance {
        type: "Normal", name: "Concrete", thermal_conductivity: 0.816,
        density: 1700., specific_heat_capacity: 800.,
    }
    Material { name: "C10", substance: "Concrete", thickness: 0.1 }
    Construction { name: "Wall", materials: ["C10"] }
    Space { name: "Room", volume: 300. }
    Surface {
        name: "W", construction: "Wall",
        back_boundary: { type: "Space", space: "Room" },
        vertices: [ 0.,0.,0., 10.,0.,0., 10.,0.,3., 0.,0.,3. ]
    }
    HVAC {
        type: "IdealHeaterCooler", name: "tstat", target_spaces: ["Room"],
        heating_setpoint: 30., max_heating_power: 1.,
    }
    """
    p = tmp_path / "m.spl"
    p.write_text(spl)
    js = tmp_path / "summary.json"
    assert main(["simulate", str(p), EPW, "--hours", "24", "--engine",
                 "xla", "--mode", "trbdf2", "--summary-json", str(js)]) == 0
    import json

    d = json.loads(js.read_text())["demand"]
    # 1 W against a 30 C setpoint: the zone free-floats below 29.5 C.
    assert d["unmet_heating_hours"] > 0
    assert d["unmet_cooling_hours"] == 0  # no cooling side configured


def test_time_leaf_mask_short_run_collision():
    """A static per-zone leaf whose length equals a SHORT run's step count
    must not be misread as a time series (channel-name classification)."""
    import heatx
    from heatx.cli import _slice_inputs, _time_leaf_mask
    from heatx.model.building import (
        Boundary, BuildingModel, Construction, Material, SpaceDef,
        Substance, SurfaceDef,
    )

    m = BuildingModel()
    m.add_substance(Substance("c", thermal_conductivity=0.8, density=1700.0,
                              specific_heat_capacity=800.0))
    m.add_material(Material("m", "c", 0.1))
    m.add_construction(Construction("w", ["m"]))
    v = np.array([[0, 0, 0], [5, 0, 0], [5, 0, 3], [0, 0, 3]], float)
    for z in range(3):
        m.add_space(SpaceDef(f"z{z}", 100.0))
        m.add_surface(SurfaceDef(f"s{z}", "w", Boundary.outdoor(),
                                 Boundary.space_(f"z{z}"), vertices=v))
    tm = heatx.ThermalModel(m, n=1, config=heatx.SimConfig(dtype=np.float64))
    # 3 zones, 3 steps: inf_vol [3] collides with T_steps=3 by shape.
    seq = tm.inputs(
        t_out=np.array([1.0, 2.0, 3.0]),
        inf_vol=np.array([0.1, 0.2, 0.3]),
        inf_temp=np.zeros(3), inf_mask=np.ones(3, bool),
    )
    mask = _time_leaf_mask(seq, 3)
    assert mask["t_out"] and not mask["inf_vol"] and not mask["inf_mask"]
    step0 = _slice_inputs(seq, 0, mask)
    assert float(step0.t_out) == 1.0
    assert step0.inf_vol.shape == (3,)  # static vector intact


def test_cli_ir_model_tilted_vs_horizontal(tmp_path):
    """The default tilted exterior-longwave model blends cold sky with
    air/ground blackbody by view factor: a vertical wall loses less IR than
    under the raw horizontal sky column, so the zone runs warmer; an
    up-facing outdoor surface (F_sky = 1) is bit-identical either way."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    wall_idf = _SLAB_IDF.replace("Ground", "Outdoors") + """
BuildingSurface:Detailed,
    Wall, Wall, Slab, Room, , Outdoors, , SunExposed, WindExposed, 0,
    4, 0,0,3, 0,0,0, 10,0,0, 10,0,3;
"""
    p = tmp_path / "w.idf"
    p.write_text(wall_idf)
    base = ["simulate", str(p), EPW, "--hours", "48", "--engine", "xla",
            "--mode", "trbdf2", "--f64"]
    o1, o2 = tmp_path / "t.csv", tmp_path / "h.csv"
    assert main(base + ["-o", str(o1)]) == 0
    assert main(base + ["--ir-model", "horizontal", "-o", str(o2)]) == 0
    tilted = _read(o1)[1][:, 0]
    horiz = _read(o2)[1][:, 0]
    assert not np.array_equal(tilted, horiz)
    # The Santiago sky column is (almost) always colder than the air
    # blackbody, so blending in air/ground keeps the zone warmer.
    assert (tilted - horiz).mean() > 0.05

    # Up-facing outdoor face only: F_sky = 1, beta = 1 -> the models agree
    # exactly (the slab IDF's floor polygon winds to an upward normal).
    p2 = tmp_path / "r.idf"
    p2.write_text(_SLAB_IDF.replace("Ground", "Outdoors"))
    base2 = ["simulate", str(p2), EPW, "--hours", "24", "--engine", "xla",
             "--mode", "trbdf2", "--f64"]
    o3, o4 = tmp_path / "rt.csv", tmp_path / "rh.csv"
    assert main(base2 + ["-o", str(o3)]) == 0
    assert main(base2 + ["--ir-model", "horizontal", "-o", str(o4)]) == 0
    np.testing.assert_array_equal(_read(o3)[1], _read(o4)[1])


def test_cli_comfort_csv(tmp_path):
    """--comfort-csv writes hourly per-zone Fanger PMV/PPD from the
    in-kernel operative history; --indoor-rh pins a constant RH; rejected
    on the XLA engine like --operative-csv."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    idf = _SLAB_IDF.replace("Ground", "Outdoors") + """
BuildingSurface:Detailed,
    Wall, Wall, Slab, Room, , Outdoors, , SunExposed, WindExposed, 0,
    4, 0,0,3, 0,0,0, 10,0,0, 10,0,3;
"""
    p = tmp_path / "m.idf"
    p.write_text(idf)
    oz, oc = tmp_path / "z.csv", tmp_path / "c.csv"
    base = ["simulate", str(p), EPW, "--hours", "12", "--engine", "kernel",
            "--mode", "trbdf2", "--f64", "-o", str(oz)]
    assert main(base + ["--comfort-csv", str(oc)]) == 0
    rows = list(csv.reader(open(oc)))
    assert rows[0] == ["hour", "Room PMV", "Room PPD%"]
    pmv = np.asarray([r[1] for r in rows[1:]], float)
    ppd = np.asarray([r[2] for r in rows[1:]], float)
    assert pmv.shape == (12,) and np.isfinite(pmv).all()
    assert (ppd >= 5.0 - 1e-6).all() and (ppd <= 100.0).all()
    # Matches the library computation from the zone/operative histories.
    oo = tmp_path / "op.csv"
    assert main(base + ["--operative-csv", str(oo), "--comfort-csv",
                        str(oc), "--indoor-rh", "50"]) == 0
    zt = np.asarray([r[1] for r in csv.reader(open(oz))][1:], float)
    top = np.asarray([r[1] for r in csv.reader(open(oo))][1:], float)
    pmv2 = np.asarray([r[1] for r in list(csv.reader(open(oc)))[1:]], float)
    from heatx.comfort import zone_comfort_history

    ref, _ = zone_comfort_history(zt, 2 * top - zt, 50.0)
    np.testing.assert_allclose(pmv2, ref, atol=2e-3)  # CSV rounding
    assert main(["simulate", str(p), EPW, "--hours", "6", "--engine",
                 "xla", "--comfort-csv", str(oc)]) == 2


@pytest.mark.slow
def test_cli_summary_monthly_breakdown(tmp_path):
    """Year-aligned runs get a calendar-month demand breakdown whose sum
    equals the annual totals (partial trailing months report what ran)."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    idf = _SLAB_IDF.replace("Ground", "Outdoors") + """
HVACTemplate:Thermostat, TST, , 20.0, , 26.0;
HVACTemplate:Zone:IdealLoadsAirSystem, Room, TST;
"""
    p = tmp_path / "m.idf"
    p.write_text(idf)
    js = tmp_path / "s.json"
    # 60 days + 1: January + February + a 25 h partial March.
    assert main(["simulate", str(p), EPW, "--hours", str(59 * 24 + 25),
                 "--engine", "xla", "--mode", "trbdf2", "--f64",
                 "--summary-json", str(js)]) == 0
    import json

    d = json.loads(js.read_text())["demand"]
    mh, mc = d["monthly_heating_kwh"], d["monthly_cooling_kwh"]
    assert len(mh) == 3 and len(mc) == 3  # Jan, Feb, partial Mar
    assert sum(mh) == pytest.approx(d["heating_kwh"], abs=0.01)
    assert sum(mc) == pytest.approx(d["cooling_kwh"], abs=0.01)
    # Santiago January (summer): cooling-dominated month.
    assert mc[0] > mh[0]


def test_cli_refresh_every(tmp_path):
    """--refresh-every k: validated against --mode mismatch, and
    k=substeps reproduces the frozen trbdf2 run exactly (the cadence
    identity the kernel/XLA paths are gated on)."""
    if not os.path.isfile(EPW):
        pytest.skip("reference EPW unavailable")
    p = tmp_path / "m.idf"
    p.write_text(_SLAB_IDF.replace("Ground", "Outdoors"))
    # mode mismatch fails loudly
    assert main(["simulate", str(p), EPW, "--hours", "2", "--engine", "xla",
                 "--mode", "trbdf2", "--refresh-every", "2",
                 "-o", str(tmp_path / "x.csv")]) == 2
    outs = {}
    for tag, argv in (
        ("frozen", ["--mode", "trbdf2"]),
        ("k=subs", ["--mode", "trbdf2_refresh", "--refresh-every", "8"]),
        ("k2", ["--mode", "trbdf2_refresh", "--refresh-every", "2"]),
    ):
        o = tmp_path / f"{tag}.csv"
        assert main(["simulate", str(p), EPW, "--hours", "24", "--engine",
                     "xla", "--substeps", "8", "-o", str(o)] + argv) == 0
        with open(o) as f:
            outs[tag] = [r for r in csv.reader(f)][1:]
    assert outs["frozen"] == outs["k=subs"]  # cadence identity
    assert outs["k2"] != outs["frozen"]  # the hybrid actually refreshes
