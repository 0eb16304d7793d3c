"""Fanger PMV/PPD (heatx.comfort — extension; the reference has no
comfort machinery).  Gates the ISO 7730 algorithm's identities, known
values, and the integration with heatx's zone/MRT observables."""

import numpy as np
import pytest

from heatx.comfort import pmv_ppd, saturation_vapor_pressure, zone_comfort_history


def test_known_values_iso_algorithm():
    """The canonical reference case (ta=tr=25, rh=50, v=0.1, 1.2 met,
    0.5 clo) lands on PMV 0.12 — the value the ISO 7730 BASIC listing and
    its public reimplementations (pythermalcomfort, CBE) report."""
    pmv, ppd = pmv_ppd(25.0, 25.0, 50.0, 0.1, 1.2, 0.5)
    assert pmv == pytest.approx(0.12, abs=0.02)
    assert ppd == pytest.approx(5.3, abs=0.3)
    # A warm case and its air-speed relief (ISO annex D pattern).
    warm, _ = pmv_ppd(27.0, 27.0, 60.0, 0.1, 1.2, 0.5)
    breezy, _ = pmv_ppd(27.0, 27.0, 60.0, 0.3, 1.2, 0.5)
    assert warm > 0.6
    assert breezy < warm - 0.2


def test_ppd_identity_and_minimum():
    """PPD is the standard quartic of PMV, minimized at 5% for PMV=0."""
    for pmv_target in (-2.0, -1.0, 0.0, 0.5, 1.5):
        # Construct conditions hitting the PMV, then check the identity.
        pmv, ppd = pmv_ppd(
            18.0 + 5.0 * (pmv_target + 2.0), 22.0, 50.0, 0.1, 1.2, 0.5
        )
        expect = 100.0 - 95.0 * np.exp(
            -0.03353 * pmv**4 - 0.2179 * pmv**2
        )
        assert ppd == pytest.approx(float(expect), rel=1e-12)
        assert ppd >= 5.0 - 1e-9


def test_monotonicities():
    base = dict(rel_humidity_pct=50.0, air_speed=0.1, met=1.2, clo=0.5)
    cold, _ = pmv_ppd(16.0, 16.0, **base)
    neutral, _ = pmv_ppd(24.0, 24.0, **base)
    hot, _ = pmv_ppd(30.0, 30.0, **base)
    assert cold < neutral < hot
    # Warmer radiant field at the same air temperature -> warmer vote.
    low_mrt, _ = pmv_ppd(24.0, 18.0, **base)
    high_mrt, _ = pmv_ppd(24.0, 30.0, **base)
    assert low_mrt < high_mrt
    # More clothing helps when cold.
    thin, _ = pmv_ppd(16.0, 16.0, 50.0, 0.1, 1.2, 0.5)
    thick, _ = pmv_ppd(16.0, 16.0, 50.0, 0.1, 1.2, 1.5)
    assert thick > thin
    # Humidity warms slightly on the warm side (more latent resistance).
    dry, _ = pmv_ppd(28.0, 28.0, 20.0, 0.1, 1.2, 0.5)
    humid, _ = pmv_ppd(28.0, 28.0, 90.0, 0.1, 1.2, 0.5)
    assert humid > dry


def test_iteration_converged():
    """30 bisected iterations sit on the 150-iteration fixed point."""
    ta = np.linspace(10.0, 35.0, 11)
    p30, _ = pmv_ppd(ta, ta, 50.0, 0.15, 1.4, 0.8, iters=30)
    p150, _ = pmv_ppd(ta, ta, 50.0, 0.15, 1.4, 0.8, iters=150)
    np.testing.assert_allclose(p30, p150, atol=1e-6)


def test_saturation_pressure():
    # ~2339 Pa at 20 C, ~4246 Pa at 30 C (steam-table values, ~1%).
    assert saturation_vapor_pressure(20.0) == pytest.approx(2339.0, rel=0.01)
    assert saturation_vapor_pressure(30.0) == pytest.approx(4246.0, rel=0.01)


def test_zone_comfort_history_broadcasting():
    T, Z = 5, 3
    zt = np.full((T, Z), 24.0)
    mrt = np.full((T, Z), 24.0)
    rh = np.linspace(30.0, 70.0, T)  # [T] series broadcasts over zones
    pmv, ppd = zone_comfort_history(zt, mrt, rh)
    assert pmv.shape == (T, Z) and ppd.shape == (T, Z)
    assert np.isfinite(pmv).all()
    # RH rising within the comfortable band moves the vote monotonically.
    assert (np.diff(pmv[:, 0]) > 0).all()


def test_simulation_integration():
    """End to end with the simulator: PMV/PPD over a marched history using
    the zone MRT observable (operative collection)."""
    import heatx
    from heatx.testing import SingleZoneOptions, TestMat, single_zone_building

    m = single_zone_building(SingleZoneOptions(
        zone_volume=300.0, surface_width=10.0, surface_height=3.0,
        construction=[TestMat.concrete(0.2)],
    ))
    tm = heatx.ThermalModel(m, n=1, config=heatx.SimConfig(dtype=np.float64))
    T = 24
    seq = tm.inputs_sequence(
        T, t_out=np.full(T, 28.0), wind_speed=np.full(T, 2.0),
        sol_front=np.full(T, 300.0),
    )
    _, (zt, t_op) = tm.run(
        tm.initial_state(), seq, collect_operative=True, mode="trbdf2"
    )
    zt = np.asarray(zt)
    mrt = 2.0 * np.asarray(t_op) - zt  # operative = (air + mrt)/2
    pmv, ppd = zone_comfort_history(zt, mrt, 50.0)
    assert pmv.shape == zt.shape
    assert np.isfinite(pmv).all() and (ppd >= 5.0 - 1e-9).all()


def test_adaptive_model_values():
    """ASHRAE 55 adaptive: t_comf = 0.31*t_pma + 17.8, bands +-3.5/2.5 K,
    NaN outside the 10-33.5 C applicability range."""
    from heatx.comfort import ADAPTIVE_RANGE, adaptive_comfort

    band = adaptive_comfort(np.array([20.0, 5.0, 35.0]))
    assert band["t_comf"][0] == pytest.approx(24.0)
    assert band["lo_80"][0] == pytest.approx(20.5)
    assert band["hi_80"][0] == pytest.approx(27.5)
    assert band["lo_90"][0] == pytest.approx(21.5)
    assert np.isnan(band["t_comf"][1]) and np.isnan(band["hi_90"][2])
    assert ADAPTIVE_RANGE == (10.0, 33.5)


def test_prevailing_mean_and_acceptability(ref_fixtures):
    from heatx.comfort import adaptive_acceptability, prevailing_mean_outdoor
    from heatx.weather.epw import read_epw

    epw = read_epw(f"{ref_fixtures}/epw/CHL_Santiago.855740_IWEC.epw")
    pma = prevailing_mean_outdoor(epw.dry_bulb, days=7)
    assert pma.shape == epw.dry_bulb.shape
    # Hand-check one interior day: day 40's PMA = mean of days 33..39.
    daily = epw.dry_bulb.reshape(-1, 24).mean(1)
    assert pma[40 * 24] == pytest.approx(daily[33:40].mean())
    # Constant within each day.
    assert (pma[:24] == pma[0]).all()
    # Wraparound: day 0 looks into late December.
    assert pma[0] == pytest.approx(daily[-7:].mean())
    with pytest.raises(ValueError, match=r"\[7, 30\]"):
        prevailing_mean_outdoor(epw.dry_bulb, days=3)
    with pytest.raises(ValueError, match="whole days"):
        prevailing_mean_outdoor(epw.dry_bulb[:100])

    # Acceptability masks broadcast [T, Z] against [T].
    T = len(pma)
    top = np.tile((0.31 * pma + 17.8)[:, None], (1, 2))  # exactly t_comf
    acc = adaptive_acceptability(top, pma)
    assert acc["in_80"].shape == (T, 2)
    applicable = acc["applicable"]
    assert (acc["in_90"][applicable]).all()  # on the comfort line
    # 5 K above the line: outside 90, inside 80 is false too (5 > 3.5).
    acc2 = adaptive_acceptability(top + 5.0, pma)
    assert not acc2["in_80"][applicable].any()


def test_indoor_rh_from_outdoor():
    """Constant-moisture RH conversion: 80% at 0 C is ~21% at 21 C (the
    vapor pressure holds, the saturation reference moves)."""
    from heatx.comfort import indoor_rh_from_outdoor

    rh_in = indoor_rh_from_outdoor(80.0, 0.0, 21.0)
    pa_out = 0.80 * saturation_vapor_pressure(0.0)
    assert rh_in == pytest.approx(
        100.0 * pa_out / saturation_vapor_pressure(21.0), rel=1e-12
    )
    assert 18.0 < rh_in < 25.0
    # Same temperature -> unchanged; colder indoors clips at saturation.
    assert indoor_rh_from_outdoor(55.0, 20.0, 20.0) == pytest.approx(55.0)
    assert indoor_rh_from_outdoor(90.0, 25.0, 5.0) == 100.0
    # Broadcasts over [T, Z] zone temperatures.
    out = indoor_rh_from_outdoor(
        np.full((4, 1), 70.0), np.full((4, 1), 5.0), np.full((4, 3), 22.0)
    )
    assert out.shape == (4, 3)


def test_prevailing_mean_short_series_rejected():
    from heatx.comfort import prevailing_mean_outdoor

    with pytest.raises(ValueError, match="at least 7 days"):
        prevailing_mean_outdoor(np.zeros(48))
