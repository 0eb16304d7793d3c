"""End-to-end validation of the HEADLINE fast-mode regime.

bench.py's default row runs the TR-BDF2 day kernel with coefficients frozen
per hour, 8 sub-steps/hour, and hourly EPW weather linearly interpolated to
sub-steps.  This test replays exactly that regime (via the XLA imp_march
path, which tests/test_pallas_imp.py shows is the same arithmetic as the
kernel) against the reference-parity integrator (118 stability sub-steps,
exact no-mass while_loop) over three weeks of real EPW weather on the bench
city model.

Measured (f64, CHL_Santiago IWEC, 504 h, 48 h warm-up skip):
zone-T range 17.5 K, RMSE 0.33 K (1.9% of range), bias +0.07 K,
max |err| 0.70 K — the same error class as the EnergyPlus replay suite
itself (tests/test_eplus_replay.py, ~2% of range).  Thresholds carry ~1.5x
headroom.  Reference evidence standard: validate_wall_heat_transfer.rs:615-711.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import heatx
from heatx.build.layout import compile_building
from heatx.engine import state as state_mod, step as step_mod
from heatx.engine.implicit import imp_march
from heatx.weather.epw import read_epw, interpolate_to_steps

from bench import build_city_model

HOURS = 504
WARMUP = 48
SUBF = 8  # bench --exp-substeps default


def _interp(v, k):
    return interpolate_to_steps(np.asarray(v, float), k)[: HOURS * k].reshape(HOURS, k)


def compute_regime_runs(fixtures_root):
    """Parity / fast / hour-constant-weather zone histories over 3 weeks of
    real EPW weather on the bench city model.  Plain function so the
    validation-report script (scripts/make_validation_reports.py) can call it
    without going through pytest fixture internals."""
    w = read_epw(f"{fixtures_root}/epw/CHL_Santiago.855740_IWEC.epw")
    dry, wind = w.dry_bulb[:HOURS], w.wind_speed[:HOURS]
    wdir = w.wind_direction_rad[:HOURS]
    ghi, ir = w.global_horizontal[:HOURS], w.horizontal_ir[:HOURS]

    model = build_city_model(4, 10)
    cfg = heatx.SimConfig(dtype=np.float64)
    b = compile_building(model, n=1, config=cfg).astype(np.float64)
    S, Z = b.n_surfaces, b.n_zones
    sub = b.dt_subdivisions
    rng = np.random.default_rng(0)
    sol_factor = rng.uniform(0.2, 1.0, S)

    st0 = state_mod.initial_state(b)
    base = state_mod.default_inputs(b)
    base = base._replace(
        hvac_power=jnp.full((b.n_hvacs,), 500.0, np.float64),
        lum_power=jnp.full((b.n_luminaires,), 150.0, np.float64),
    )

    # Reference-parity: stability-dictated sub-steps, exact no-mass loop,
    # per-sub-step interpolated weather (model.rs:371-374).
    seq = base._replace(
        t_out=jnp.asarray(_interp(dry, sub)),
        wind_speed=jnp.asarray(_interp(wind, sub)),
        wind_direction=jnp.asarray(_interp(wdir, sub)),
        sol_front=jnp.asarray(ghi[:, None] * sol_factor[None, :]),
        ir_front=jnp.asarray(np.broadcast_to(ir[:, None], (HOURS, S))),
        sol_back=jnp.zeros((HOURS, S)),
        ir_back=jnp.zeros((HOURS, S)),
        hvac_power=jnp.broadcast_to(base.hvac_power, (HOURS, b.n_hvacs)),
        lum_power=jnp.broadcast_to(base.lum_power, (HOURS, b.n_luminaires)),
        inf_vol=jnp.zeros((HOURS, Z)),
        inf_temp=jnp.zeros((HOURS, Z)),
        inf_mask=jnp.zeros((HOURS, Z)),
        vent_vol=jnp.zeros((HOURS, Z)),
        vent_temp=jnp.zeros((HOURS, Z)),
        vent_mask=jnp.zeros((HOURS, Z)),
    )
    run = jax.jit(step_mod.run, static_argnames=("collect_zone_T",))
    _, zhist_par = run(b, st0, seq, collect_zone_T=True)

    # Fast mode at the bench settings (hourly freeze, SUBF sub-steps,
    # interpolated t_out) and with hour-constant t_out for the drift check.
    def fast_hist(t_out_seq, refresh_h=False):
        def hour(state, x):
            t_sub, ws, wd, g, qir = x
            inputs = base._replace(
                t_out=t_sub, wind_speed=ws, wind_direction=wd,
                sol_front=g * jnp.asarray(sol_factor),
                ir_front=jnp.broadcast_to(qir, (S,)),
            )
            s = imp_march(b, state, inputs, SUBF, refresh_h=refresh_h)
            return s, s.zone_T

        xs = (t_out_seq, jnp.asarray(wind), jnp.asarray(wdir),
              jnp.asarray(ghi), jnp.asarray(ir))
        _, hist = jax.jit(lambda s, xs: jax.lax.scan(hour, s, xs))(st0, xs)
        return np.asarray(hist)

    t_interp = jnp.asarray(_interp(dry, SUBF))
    zhist_fast = fast_hist(t_interp)
    zhist_const = fast_hist(
        jnp.asarray(np.broadcast_to(dry[:, None], (HOURS, SUBF)))
    )
    zhist_refresh = fast_hist(t_interp, refresh_h=True)
    return np.asarray(zhist_par), zhist_fast, zhist_const, zhist_refresh


@pytest.fixture(scope="module")
def regime_runs(ref_fixtures_module):
    return compute_regime_runs(ref_fixtures_module)


@pytest.fixture(scope="module")
def ref_fixtures_module():
    import os

    root = os.environ.get("HEAT_REF_FIXTURES", "/root/reference/tests")
    if not os.path.isdir(root):
        pytest.skip(f"reference fixtures not available at {root}")
    return root


@pytest.mark.slow
def test_headline_regime_tracks_parity(regime_runs):
    zhist_par, zhist_fast, _, _ = regime_runs
    d = zhist_fast[WARMUP:] - zhist_par[WARMUP:]
    rng_T = zhist_par[WARMUP:].max() - zhist_par[WARMUP:].min()
    rmse = float(np.sqrt((d ** 2).mean()))
    bias = float(d.mean())
    mx = float(np.abs(d).max())
    assert rmse < 0.5, f"RMSE {rmse:.3f} K"
    assert rmse / rng_T < 0.03, f"RMSE {rmse / rng_T * 100:.2f}% of range"
    assert abs(bias) < 0.2, f"bias {bias:+.3f} K"
    assert mx < 1.2, f"max err {mx:.3f} K"


@pytest.mark.slow
def test_interpolated_weather_beats_hourly_steps(regime_runs):
    """Per-sub-step weather wiring (model.rs:371-374): interpolating the
    hourly series to sub-steps must move results measurably and toward the
    parity run (which also interpolates)."""
    zhist_par, zhist_fast, zhist_const, _ = regime_runs
    err_interp = np.sqrt(((zhist_fast[WARMUP:] - zhist_par[WARMUP:]) ** 2).mean())
    err_const = np.sqrt(((zhist_const[WARMUP:] - zhist_par[WARMUP:]) ** 2).mean())
    drift = np.abs(zhist_fast[WARMUP:] - zhist_const[WARMUP:]).max()
    assert drift > 0.0, "interpolation had no effect — wiring broken"
    assert err_interp <= err_const * 1.05, (
        f"interpolated {err_interp:.4f} K vs hour-constant {err_const:.4f} K"
    )


@pytest.mark.slow
def test_committed_golden_matches_parity_run(regime_runs):
    """The committed golden behind bench.py's hardware-accuracy row
    (accuracy_* fields) must track the live parity integrator.  If this
    fails after a legitimate numerics change, regenerate with
    scripts/make_accuracy_golden.py."""
    import os

    path = os.path.join(os.path.dirname(__file__), "data",
                        "accuracy_golden_504h.npz")
    with np.load(path) as g:
        gold = g["zhist_par"]
        assert int(g["hours"]) == HOURS and int(g["warmup"]) == WARMUP
    zhist_par, _, _, _ = regime_runs
    np.testing.assert_allclose(gold, np.asarray(zhist_par), atol=5e-4)


def test_committed_annual_golden_prefix(ref_fixtures_module):
    """The committed ANNUAL golden (bench.py's accuracy_annual_* row: f32
    accumulation over 8760 h on the reduced 2-zone model) must track the
    live parity integrator.  Recomputing the full year in CI would cost
    minutes, but the integrator is deterministic from the initial state,
    so matching a fresh 48 h prefix pins the whole trajectory (any
    numerics change shows up in the first hours).  Regenerate with
    scripts/make_accuracy_golden.py after legitimate changes."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import make_accuracy_golden as mg

    path = os.path.join(os.path.dirname(__file__), "data",
                        "accuracy_golden_annual.npz")
    with np.load(path) as g:
        gold = g["zhist_par"]
        assert int(g["hours"]) == mg.ANNUAL_HOURS
        assert int(g["zones"]) == mg.ANNUAL_ZONES
        assert gold.shape == (mg.ANNUAL_HOURS, mg.ANNUAL_ZONES)
    # 49 h computed, 48 h compared: the per-sub-step weather interpolation
    # of the last hour reads the NEXT hourly record, so a truncated-horizon
    # run only matches the full-year trajectory away from its own tail.
    fresh = mg.parity_annual_hist(ref_fixtures_module, hours=49)
    np.testing.assert_allclose(gold[:48], fresh[:48], atol=5e-4)


@pytest.mark.slow
def test_refresh_regime_beats_frozen_h(regime_runs):
    """mode="trbdf2_refresh" (film coefficients / cavity U / stage
    factorizations re-evaluated every sub-step — the parity path's
    coefficient cadence, surface.rs:596-717) must cut the frozen-h error by
    several x at the same sub-step count.  Measured (f64, 3-week regime
    workload): frozen 0.33 K RMSE -> refreshed ~0.05 K."""
    zhist_par, zhist_fast, _, zhist_refresh = regime_runs
    d_frozen = zhist_fast[WARMUP:] - zhist_par[WARMUP:]
    d_refresh = zhist_refresh[WARMUP:] - zhist_par[WARMUP:]
    rmse_frozen = float(np.sqrt((d_frozen ** 2).mean()))
    rmse_refresh = float(np.sqrt((d_refresh ** 2).mean()))
    assert rmse_refresh < 0.1, f"refresh RMSE {rmse_refresh:.3f} K"
    assert rmse_refresh < rmse_frozen / 3.0, (
        f"refresh {rmse_refresh:.3f} K vs frozen {rmse_frozen:.3f} K"
    )
    assert float(np.abs(d_refresh).max()) < 0.3, (
        f"refresh max err {np.abs(d_refresh).max():.3f} K"
    )
