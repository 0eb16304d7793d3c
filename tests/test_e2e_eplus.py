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

# (max zone-T RMSE [K], max |bias| [K]) per fixture, ~1.5x the round-5
# measured values (massive 0.058/-0.046, nomass 0.132/-0.035, mixed
# 0.038/-0.034, tilted 0.217/-0.168, horizontal 0.147/-0.079).  Round 5
# implemented EnergyPlus's SUB-HOUR solar convention
# (heatx.weather.solar.surface_irradiance_steps: mid-hour-centered
# irradiance interpolation, per-timestep sun position at the step end,
# Perez normalized by the 1367 W/m2 solar constant, ground reflection
# from the reconstructed horizontal) — halving the incident-solar
# residual and cutting massive/mixed zone-T error ~3x (0.120 -> 0.058,
# 0.110 -> 0.038).
#
# ATTRIBUTION of what remains:
#   * Converged-start (passes=2) leaves every residual essentially
#     unchanged (mixed 0.038 -> 0.035 only) — not cold-start transient.
#   * The tilted/horizontal residual is the FIXTURES' OWN SUN PATH:
#     per-day best-fit analysis shows their logged incident solar follows
#     a sun frozen near day 11 through run days 1-20 (day 21 is live) —
#     see heatx.validate.endtoend.fixture_anomaly_sun.  heatx's path
#     matches the closed-form geometry (noon altitude Jan 1: 79.63 vs
#     90-|lat-dec| = 79.55 deg), and test_e2e_sun_anomaly_attribution
#     below CHECKS the attribution: mimicking the frozen path collapses
#     tilted to 0.079 K RMSE / -0.010 K bias (horizontal 0.114/-0.035,
#     nomass 0.102/+0.010) — all five fixtures then sit at or under
#     ~0.11 K RMSE / 0.05 K |bias|.
#   * The replay path (EnergyPlus's own logged inputs) carries
#     -0.015..-0.045 K (solver/film/timestep-convention share); the
#     computed longwave is exonerated to < 0.06 W/m2 bias (round 4).
E2E_THRESHOLDS = {
    "massive_full": (0.09, 0.07),
    "nomass_full": (0.20, 0.06),
    "mixed_full": (0.06, 0.05),
    "tilted": (0.33, 0.25),
    "horizontal": (0.22, 0.12),
}

# Converged-start (passes=2) thresholds: ~1.5x the measured converged
# values (identical to cold start except mixed 0.035/-0.017).  These
# bound the WEATHER-MODEL error itself, with the protocol transient
# removed — the e2e analogue of the replay suite's
# test_mixed_bias_is_cold_start_artifact discipline
# (validate_wall_heat_transfer.rs:615-711's warm-up intent).
E2E_WARM_THRESHOLDS = {
    "massive_full": (0.09, 0.07),
    "nomass_full": (0.20, 0.06),
    "mixed_full": (0.055, 0.03),
    "tilted": (0.33, 0.25),
    "horizontal": (0.22, 0.12),
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
@pytest.mark.parametrize("name", FULL_CASES)
def test_e2e_warm_start(name, ref_fixtures):
    """Converged-start e2e gate, ALL FIVE fixtures: passes=2 hands the
    solver a converged initial state, so the residual is pure
    weather-model error.  Bounds are ~1.5x the measured converged
    residuals (module docstring carries the full attribution)."""
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
        cold_rmse = 0.0379
        assert rmse < cold_rmse, (rmse, cold_rmse)


@pytest.mark.slow
def test_e2e_sun_anomaly_attribution(ref_fixtures):
    """The tilted fixture's residual is the FIXTURES' sun path, not
    heatx's: substituting the apparent frozen-at-day-11 sun
    (heatx.validate.endtoend.fixture_anomaly_sun — derived by per-day
    best-fit against the logged incident solar) collapses the residual
    ~3x and removes the bias.  Gates at ~1.5x the measured frozen-sun
    values (0.079 K RMSE / -0.010 K bias)."""
    expected, found = run_end_to_end_case(
        "tilted", ref_fixtures, mimic_fixture_sun=True
    )
    err = found - expected
    rmse = float(np.sqrt((err**2).mean()))
    bias = float(err.mean())
    assert rmse < 0.12, (rmse, bias)
    assert abs(bias) < 0.05, (rmse, bias)
    # The attribution is only meaningful if the frozen path explains the
    # bulk of the standard run's residual (measured 0.217 -> 0.079).
    std_rmse, _ = E2E_THRESHOLDS["tilted"]
    assert rmse < 0.6 * (std_rmse / 1.5), rmse


#: Measured per-step incident-solar residuals (round 5, the EnergyPlus
#: sub-hour chain): (rmse [W/m2], |bias| [W/m2]) gates at ~1.5x measured
#: (massive 2.82/+0.02, tilted 5.81/+0.08, horizontal 3.17/+0.30; the
#: tilted rmse is dominated by the fixtures' frozen sun path — with it
#: mimicked the tilted rmse drops to 3.96).
SOLAR_THRESHOLDS = {
    "massive_full": (4.5, 0.5),
    "tilted": (8.5, 0.5),
    "horizontal": (5.0, 0.6),
}


@pytest.mark.parametrize("name", ["massive_full", "tilted", "horizontal"])
def test_solar_model_matches_logged_incident(name, ref_fixtures):
    """heatx's EnergyPlus-convention sub-hour solar chain
    (surface_irradiance_steps: mid-hour-centered irradiance
    interpolation, per-timestep sun position, Perez with the 1367 W/m2
    constant, reconstructed-horizontal ground term, the fixture's
    explicit View Factor to Ground) reproduces EnergyPlus's logged
    per-timestep incident solar — the horizontal fixture is the sharp
    VFg check (its roof pins 0.5 where the geometric factor is 0, worth
    ~10 % of GHI)."""
    import heatx
    from heatx.validate.replay import WALL_CASES, build_case_model

    case = WALL_CASES[name]
    model = build_case_model(case, ref_fixtures, via_idf=True)
    b = heatx.ThermalModel(
        model, n=20, config=heatx.SimConfig(dtype=np.float64)
    ).building
    epw = read_epw(f"{ref_fixtures}/epw/CHL_Santiago.855740_IWEC.epw")
    run = read_eplusout(f"{ref_fixtures}/{name}/eplusout.csv")
    sph = run.n_steps // HOURS
    sol, _ = weather_model_inputs(epw, model, b, steps_per_hour=sph)
    from heatx.build.layout import B_OUTDOOR

    side = (
        "front"
        if np.asarray(b.surfaces.front_code)[0] == B_OUTDOOR
        else "back"
    )
    ours_steps = np.asarray(sol[side])[:, 0]
    err = ours_steps - run.incident_solar
    rmse = float(np.sqrt((err**2).mean()))
    bias = float(err.mean())
    max_rmse, max_bias = SOLAR_THRESHOLDS[name]
    assert rmse < max_rmse, (name, rmse, bias)
    assert abs(bias) < max_bias, (name, rmse, bias)
    # Daily energy within 4.5% (measured max 3.0% — the fixtures' frozen
    # sun path dominates), 21-day total within 0.5% (measured <= 0.08%).
    ld = _hourly_mean(run.incident_solar, sph).reshape(21, 24).sum(1)
    od = _hourly_mean(ours_steps, sph).reshape(21, 24).sum(1)
    np.testing.assert_allclose(od, ld, rtol=0.045)
    assert abs(od.sum() / ld.sum() - 1.0) < 0.005


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
