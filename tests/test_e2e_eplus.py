"""Full-stack EnergyPlus validation (heatx.validate.endtoend).

The replay suite (test_eplus_replay.py) replays EnergyPlus's own boundary
conditions and so isolates the solver.  These tests close the loop the
reference never does (its march_model always replays logged inputs,
validate_wall_heat_transfer.rs:615-711): heatx computes incident solar
(Perez) and incident longwave (tilted view-factor blend) from the same
Santiago EPW EnergyPlus ran with, builds each fixture model from its own
in.idf, and must land on EnergyPlus's zone temperature.  Errors here are
the *weather-model stack's* — solver error is bounded far tighter by the
replay suite.
"""

import os

import numpy as np
import pytest

from heatx.io.eplus import read_eplusout
from heatx.validate.endtoend import (
    FULL_CASES,
    HOURS,
    run_end_to_end_case,
    weather_model_inputs,
)
from heatx.weather.epw import read_epw

# (max zone-T RMSE [K], max |bias| [K]) per fixture, ~1.5x the measured
# values (massive 0.120/-0.114, nomass 0.165/-0.102, mixed 0.110/-0.109,
# tilted 0.225/-0.170, horizontal 0.151/-0.027).  All well under the
# ASHRAE-style 1 K comfort resolution.
#
# ATTRIBUTION (the converged-start experiment below): replaying the 21-day
# horizon twice (passes=2, a converged initial state — the same protocol
# that collapsed the replay suite's mixed-case residuals,
# test_eplus_replay.py) leaves these residuals essentially UNCHANGED
# (massive 0.1202 -> 0.1202, nomass 0.1646 -> 0.1646, mixed
# 0.1097 -> 0.0963, tilted 0.2255 -> 0.2255, horizontal 0.1513 -> 0.1513).
# So — unlike the replay suite — the e2e residual is NOT the 22 C
# cold-start transient: it is a steady, systematically negative bias
# (~-0.1 K).  Decomposition (round-4 measurements):
#   * the replay path (EnergyPlus's own logged inputs) already carries
#     -0.015..-0.045 K of it (solver/film/timestep-convention share);
#   * the computed incident LONGWAVE is exonerated: vs the fixture-implied
#     incident IR (gain/(A*eps) + sigma*Ts^4) the bias is < 0.06 W/m2 on
#     every fixture (rmse ~4.5 W/m2 = sub-hour structure only);
#   * the remainder tracks the computed SOLAR's small mean offsets
#     (-1.1..+1.5 W/m2, test_solar_model_matches_logged_incident) — the
#     known Perez-variant + hourly-interpolation differences vs
#     EnergyPlus's sub-hour solar, not a model defect.
# Only the insulated mixed wall carries a small removable transient share
# (~0.013 K rmse).
E2E_THRESHOLDS = {
    "massive_full": (0.20, 0.20),
    "nomass_full": (0.25, 0.20),
    "mixed_full": (0.20, 0.20),
    "tilted": (0.35, 0.30),
    "horizontal": (0.25, 0.20),
}

# Converged-start (passes=2) thresholds: ~1.5x the measured converged
# values above.  These bound the WEATHER-MODEL error itself, with the
# protocol transient removed — the e2e analogue of the replay suite's
# test_mixed_bias_is_cold_start_artifact discipline
# (validate_wall_heat_transfer.rs:615-711's warm-up intent).
E2E_WARM_THRESHOLDS = {
    "massive_full": (0.18, 0.17),
    "nomass_full": (0.25, 0.16),
    "mixed_full": (0.15, 0.14),
    "tilted": (0.34, 0.26),
    "horizontal": (0.23, 0.08),
}


def _hourly_mean(a, steps_per_hour=20):
    return a[: HOURS * steps_per_hour].reshape(HOURS, steps_per_hour).mean(1)


@pytest.mark.slow
@pytest.mark.parametrize("name", FULL_CASES)
def test_end_to_end_zone_temperature(name, ref_fixtures):
    expected, found = run_end_to_end_case(name, ref_fixtures)
    err = found - expected
    rmse = float(np.sqrt((err**2).mean()))
    bias = float(err.mean())
    max_rmse, max_bias = E2E_THRESHOLDS[name]
    assert rmse < max_rmse, (name, rmse, bias)
    assert abs(bias) < max_bias, (name, rmse, bias)


@pytest.mark.slow
@pytest.mark.parametrize("name", ["massive_full", "mixed_full"])
def test_e2e_warm_start(name, ref_fixtures):
    """Converged-start e2e gate: passes=2 hands the solver a converged
    initial state, so the residual is pure weather-model error.  Bounds are
    ~1.5x the measured converged residuals (module docstring carries the
    full attribution experiment).  Two fixtures run in CI (the massive
    baseline and the one case with a measurable transient share); the
    measured table covers all five."""
    expected, found = run_end_to_end_case(name, ref_fixtures, passes=2)
    err = found - expected
    rmse = float(np.sqrt((err**2).mean()))
    bias = float(err.mean())
    max_rmse, max_bias = E2E_WARM_THRESHOLDS[name]
    assert rmse < max_rmse, (name, rmse, bias)
    assert abs(bias) < max_bias, (name, rmse, bias)
    if name == "mixed_full":
        # The converged mixed residual must sit below the cold-start one:
        # the (small) transient share is real and removable.
        cold_rmse = 0.1097
        assert rmse < cold_rmse, (rmse, cold_rmse)


@pytest.mark.parametrize("name", ["massive_full", "tilted", "horizontal"])
def test_solar_model_matches_logged_incident(name, ref_fixtures):
    """heatx's Perez plane-of-array (with the fixture's explicit View
    Factor to Ground) reproduces EnergyPlus's logged per-timestep incident
    solar.  The horizontal fixture is the sharp check: its roof pins
    VFg = 0.5, which EnergyPlus honors for the ground-reflected term even
    though the geometric factor is 0 — worth ~10 % of GHI."""
    import heatx
    from heatx.validate.replay import WALL_CASES, build_case_model

    case = WALL_CASES[name]
    model = build_case_model(case, ref_fixtures, via_idf=True)
    b = heatx.ThermalModel(
        model, n=20, config=heatx.SimConfig(dtype=np.float64)
    ).building
    epw = read_epw(f"{ref_fixtures}/epw/CHL_Santiago.855740_IWEC.epw")
    run = read_eplusout(f"{ref_fixtures}/{name}/eplusout.csv")
    sol, _ = weather_model_inputs(epw, model, b)
    from heatx.build.layout import B_OUTDOOR

    side = (
        "front"
        if np.asarray(b.surfaces.front_code)[0] == B_OUTDOOR
        else "back"
    )
    ours = np.asarray(sol[side])[:, 0]
    t_mid = (np.arange(run.n_steps) + 0.5) / 20.0
    ours_steps = np.interp(t_mid, np.arange(HOURS + 1) + 0.5, ours)
    err = ours_steps - run.incident_solar
    rmse = float(np.sqrt((err**2).mean()))
    bias = float(err.mean())
    # Measured: massive 5.1/-1.1, tilted 6.4/+0.1, horizontal 6.3/+1.5
    # W/m2 (residual = sub-hour structure the hourly EPW cannot resolve).
    assert rmse < 10.0, (name, rmse, bias)
    assert abs(bias) < 3.0, (name, rmse, bias)
    # Daily energy within 6% (sub-hour cloud structure + Perez-variant
    # differences on diffuse-dominated days), 21-day total within 2.5%.
    ld = _hourly_mean(run.incident_solar).reshape(21, 24).sum(1)
    od = _hourly_mean(ours_steps).reshape(21, 24).sum(1)
    np.testing.assert_allclose(od, ld, rtol=0.06)
    assert abs(od.sum() / ld.sum() - 1.0) < 0.025


def test_fixture_weather_is_the_epw(ref_fixtures):
    """The fixture's logged outdoor dry-bulb IS the EPW series (EnergyPlus's
    hourly->timestep interpolation) — the justification for driving the
    end-to-end runs with the logged series instead of re-interpolating."""
    epw = read_epw(f"{ref_fixtures}/epw/CHL_Santiago.855740_IWEC.epw")
    run = read_eplusout(f"{ref_fixtures}/massive_full/eplusout.csv")
    t_mid = (np.arange(run.n_steps) + 0.5) / 20.0
    interp = np.interp(t_mid, np.arange(HOURS) + 1.0, epw.dry_bulb[:HOURS])
    err = run.outdoor_temp - interp
    assert np.sqrt((err**2).mean()) < 0.15
    assert np.abs(err).max() < 2.0  # convention noise at hour edges only


def test_idf_view_factor_to_ground_imported(ref_fixtures):
    """The importer carries the explicit View Factor to Ground; blank /
    autocalculate stays geometric (None)."""
    from heatx.model.idf import load_idf

    for name in ("horizontal", "tilted", "massive_full"):
        loaded = load_idf(os.path.join(ref_fixtures, name, "in.idf"))
        (sd,) = loaded.model.surfaces
        assert sd.ground_view_factor == pytest.approx(0.5), name
    from heatx.model.idf import load_idf as _l

    loaded = _l("""
    Zone, A, 0, 0, 0, 0, 1, 1, 3, 300, 100;
    Material, M, Rough, 0.2, 0.8, 1700, 800, 0.9, 0.7, 0.7;
    Construction, C, M;
    BuildingSurface:Detailed, W, Wall, C, A, Outdoors, , Sun, Wind,
        autocalculate, 4, 0,0,3, 0,0,0, 10,0,0, 10,0,3;
    """)
    assert loaded.model.surfaces[0].ground_view_factor is None


def test_poa_ground_view_override():
    """poa_irradiance's ground_view overrides only the ground-reflected
    term; NaN entries stay geometric."""
    from heatx.weather.solar import poa_irradiance

    kw = dict(
        dni=0.0, dhi=0.0, ghi=500.0, altitude_rad=1.0, azimuth_rad=0.0,
        normal_x=0.0, normal_y=0.0, cos_tilt=1.0, albedo=0.2,
    )
    assert poa_irradiance(**kw) == 0.0  # geometric: horizontal sees no ground
    assert poa_irradiance(**kw, ground_view=0.5) == pytest.approx(50.0)
    got = poa_irradiance(
        dni=0.0, dhi=0.0, ghi=500.0, altitude_rad=1.0, azimuth_rad=0.0,
        normal_x=np.array([0.0, 0.0]), normal_y=np.array([0.0, 0.0]),
        cos_tilt=np.array([1.0, 1.0]), albedo=0.2,
        ground_view=np.array([np.nan, 0.5]),
    )
    np.testing.assert_allclose(got, [0.0, 50.0])
