"""In-graph NaN guards (the reference's per-step asserts, model.rs:416-419).

A compiled whole-run scan must fail fast and LOCATED when the state goes
non-finite, not march a year of garbage.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import heatx
from heatx.engine.state import default_inputs, initial_state
from heatx.testing import SingleZoneOptions, TestMat, single_zone_building


def _model():
    opts = SingleZoneOptions(
        zone_volume=300.0,
        surface_height=3.0,
        surface_width=10.0,
        construction=[TestMat.concrete(0.2)],
        emissivity=0.9,
        solar_absorbtance=0.7,
    )
    return heatx.ThermalModel(
        single_zone_building(opts), n=2, config=heatx.SimConfig(dtype=np.float64)
    )


def _seq(tm, hours, poison_at=None):
    b = tm.building
    t_out = np.full(hours, 5.0)
    if poison_at is not None:
        t_out[poison_at] = np.nan
    base = default_inputs(b)
    S, Z = b.n_surfaces, b.n_zones
    return base._replace(
        t_out=jnp.asarray(t_out),
        wind_speed=jnp.full((hours,), 2.0),
        wind_direction=jnp.zeros((hours,)),
        sol_front=jnp.zeros((hours, S)),
        sol_back=jnp.zeros((hours, S)),
        ir_front=jnp.full((hours, S), 350.0),
        ir_back=jnp.zeros((hours, S)),
        hvac_power=jnp.zeros((hours, b.n_hvacs)),
        lum_power=jnp.zeros((hours, b.n_luminaires)),
        inf_vol=jnp.zeros((hours, Z)),
        inf_temp=jnp.zeros((hours, Z)),
        inf_mask=jnp.zeros((hours, Z)),
        vent_vol=jnp.zeros((hours, Z)),
        vent_temp=jnp.zeros((hours, Z)),
        vent_mask=jnp.zeros((hours, Z)),
    )


def test_checked_run_passes_clean_inputs():
    tm = _model()
    st = tm.initial_state()
    state, hist = tm.run_checked(st, _seq(tm, 6))
    assert np.all(np.isfinite(np.asarray(hist)))


def test_checked_run_locates_nan():
    from jax.experimental import checkify

    tm = _model()
    st = tm.initial_state()
    with pytest.raises(checkify.JaxRuntimeError) as e:
        tm.run_checked(st, _seq(tm, 6, poison_at=3))
    msg = str(e.value)
    assert "main step 3" in msg, msg


def test_fast_runner_assert_finite():
    tm = _model()
    st = tm.initial_state()
    fr = tm.fast_runner(block_size=8, mode="parity", interpret=True)
    # Poison via a NaN boundary: NaN outdoor temperature at hour 2.  The
    # analytical zone update's |b| > 1e-9 guard treats a NaN coupling as
    # "hold temperature", so the NaN surfaces in the node state.
    seq = _seq(tm, 4, poison_at=2)
    with pytest.raises(FloatingPointError) as e:
        fr.run(st, seq, assert_finite=True)
    # The in-kernel per-hour finite count localizes the failure to the hour
    # it first appears (round 3; previously a post-hoc node check).
    assert "hour 2" in str(e.value), str(e.value)
    # Clean inputs pass.
    final, hist = fr.run(st, _seq(tm, 4), assert_finite=True)
    assert np.all(np.isfinite(np.asarray(hist)))


def test_fast_runner_assert_finite_per_chunk_path(monkeypatch):
    """Large-workload regime: chunks above the surface-hours threshold keep
    the LAGGED per-chunk sync (fail-fast mid-run) instead of the small-model
    end-of-run reduction — forced here by dropping the threshold to 0, with
    the same hour-resolution localization either way."""
    import heatx.api as api_mod

    monkeypatch.setattr(api_mod, "DEFER_CHECK_SURFACE_HOURS", 0)
    tm = _model()
    st = tm.initial_state()
    fr = tm.fast_runner(block_size=8, mode="parity", interpret=True)
    seq = _seq(tm, 4, poison_at=2)
    with pytest.raises(FloatingPointError) as e:
        fr.run(st, seq, assert_finite=True, dispatch_days=1)
    assert "hour 2" in str(e.value), str(e.value)
    final, hist = fr.run(st, _seq(tm, 4), assert_finite=True, dispatch_days=1)
    assert np.all(np.isfinite(np.asarray(hist)))
