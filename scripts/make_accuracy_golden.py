"""Regenerate the committed golden for bench.py's hardware-accuracy row.

The golden is the REFERENCE-EXACT zone-temperature history (f64, CPU, the
adaptive no-mass while_loop, stability-dictated sub-steps, per-sub-step
interpolated EPW weather — the same parity integrator the EnergyPlus replay
suite gates) over 3 weeks of real weather on the 4-zone/40-surface city
model, produced by tests/test_fast_regime.compute_regime_runs.

bench.py replays the identical workload through the fused Pallas kernels on
the real TPU in float32 and reports the RMSE against this golden in the
scored JSON line (accuracy_* fields) — a hardware-measured accuracy number
to go with the wall-clock ones.

Run after any engine/numerics change that legitimately moves results:

    python scripts/make_accuracy_golden.py

(tests/test_fast_regime.py::test_committed_golden_matches_parity_run fails
until the golden is regenerated, so drift cannot go unnoticed.)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/heatx-jax-cache")

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                   "accuracy_golden_504h.npz")
OUT_ANNUAL = os.path.join(os.path.dirname(__file__), "..", "tests", "data",
                          "accuracy_golden_annual.npz")

ANNUAL_ZONES = 2
ANNUAL_SPZ = 10
ANNUAL_HOURS = 8760


def parity_annual_hist(fixtures_root, zones=ANNUAL_ZONES, spz=ANNUAL_SPZ,
                       hours=ANNUAL_HOURS):
    """Reference-exact (f64, adaptive no-mass loop, stability sub-steps,
    per-sub-step interpolated EPW weather) zone history over ``hours`` of
    real weather on a REDUCED city model — the annual-horizon golden.

    Mirrors tests/test_fast_regime.compute_regime_runs' parity leg with a
    parameterized model size and horizon: the full-scale 3-week golden
    bounds per-season accuracy; this one bounds f32 ACCUMULATION over the
    8760 h the headline claim is quoted for (the state carries through
    ~1M parity sub-steps here)."""
    import jax
    import jax.numpy as jnp

    import heatx
    from heatx.build.layout import compile_building
    from heatx.engine import state as state_mod, step as step_mod
    from heatx.weather.epw import interpolate_to_steps, read_epw

    from bench import build_city_model

    w = read_epw(f"{fixtures_root}/epw/CHL_Santiago.855740_IWEC.epw")

    def series(v):
        return np.asarray(v, float)[:hours]

    dry, wind = series(w.dry_bulb), series(w.wind_speed)
    wdir = series(w.wind_direction_rad)
    ghi, ir = series(w.global_horizontal), series(w.horizontal_ir)

    model = build_city_model(zones, spz)
    cfg = heatx.SimConfig(dtype=np.float64)
    b = compile_building(model, n=1, config=cfg).astype(np.float64)
    S, Z = b.n_surfaces, b.n_zones
    sub = b.dt_subdivisions
    sol_factor = np.random.default_rng(0).uniform(0.2, 1.0, S)

    def interp(v):
        return interpolate_to_steps(v, sub)[: hours * sub].reshape(hours, sub)

    st0 = state_mod.initial_state(b)
    base = state_mod.default_inputs(b)
    base = base._replace(
        hvac_power=jnp.full((b.n_hvacs,), 500.0, np.float64),
        lum_power=jnp.full((b.n_luminaires,), 150.0, np.float64),
    )
    seq = base._replace(
        t_out=jnp.asarray(interp(dry)),
        wind_speed=jnp.asarray(interp(wind)),
        wind_direction=jnp.asarray(interp(wdir)),
        sol_front=jnp.asarray(ghi[:, None] * sol_factor[None, :]),
        ir_front=jnp.asarray(np.broadcast_to(ir[:, None], (hours, S))),
        sol_back=jnp.zeros((hours, S)),
        ir_back=jnp.zeros((hours, S)),
        hvac_power=jnp.broadcast_to(base.hvac_power, (hours, b.n_hvacs)),
        lum_power=jnp.broadcast_to(base.lum_power, (hours, b.n_luminaires)),
        inf_vol=jnp.zeros((hours, Z)),
        inf_temp=jnp.zeros((hours, Z)),
        inf_mask=jnp.zeros((hours, Z)),
        vent_vol=jnp.zeros((hours, Z)),
        vent_temp=jnp.zeros((hours, Z)),
        vent_mask=jnp.zeros((hours, Z)),
    )
    run = jax.jit(step_mod.run, static_argnames=("collect_zone_T",))
    _, zhist = run(b, st0, seq, collect_zone_T=True)
    return np.asarray(zhist, np.float64)


def main():
    import test_fast_regime as tfr

    root = os.environ.get("HEAT_REF_FIXTURES", "/root/reference/tests")
    zhist_par = tfr.compute_regime_runs(root)[0]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    np.savez(
        OUT,
        zhist_par=np.asarray(zhist_par, np.float64),
        hours=np.int64(tfr.HOURS),
        warmup=np.int64(tfr.WARMUP),
        zones=np.int64(4),
        surfaces_per_zone=np.int64(10),
    )
    print(f"wrote {os.path.normpath(OUT)}: zhist_par {zhist_par.shape}, "
          f"range [{zhist_par.min():.2f}, {zhist_par.max():.2f}] C")

    zhist_a = parity_annual_hist(root)
    np.savez(
        OUT_ANNUAL,
        zhist_par=zhist_a,
        hours=np.int64(ANNUAL_HOURS),
        warmup=np.int64(tfr.WARMUP),
        zones=np.int64(ANNUAL_ZONES),
        surfaces_per_zone=np.int64(ANNUAL_SPZ),
    )
    print(f"wrote {os.path.normpath(OUT_ANNUAL)}: zhist_par {zhist_a.shape}, "
          f"range [{zhist_a.min():.2f}, {zhist_a.max():.2f}] C")


if __name__ == "__main__":
    main()
