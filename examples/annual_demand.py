"""Annual heating/cooling demand of a city block, computed in-kernel.

Every zone gets a thermostatic IdealHeaterCooler (20 C / 26 C setpoints).
The fused TR-BDF2 day kernel computes the exact setpoint-landing power
inside the Pallas kernel each sub-step (heatx.ops.pallas_step's
_zone_update_ctl — the EnergyPlus ideal-loads pattern) and accumulates the
per-hour demand history, so a full year of load calculation for thousands
of surfaces costs about the same as the free-float simulation: this is THE
production use of a building thermal simulator, at TPU speed.

Run:  python examples/annual_demand.py [--zones 1000] [--hours 8760]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--zones", type=int, default=1000)
    ap.add_argument("--hours", type=int, default=8760)
    ap.add_argument("--block-size", type=int, default=2048)
    args = ap.parse_args()
    if os.environ.get("HEATX_EXAMPLE_FAST") == "1":  # smoke-test settings
        args.zones = min(args.zones, 4)
        args.hours = min(args.hours, 48)
        args.block_size = min(args.block_size, 16)

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("HEATX_JAX_CACHE", "/tmp/heatx-jax-cache"),
    )

    import heatx
    from bench import build_city_model, load_weather
    from heatx.model.building import IdealHeaterCooler

    # The bench city model with real compass orientations, and a thermostat
    # per zone instead of scheduled heater power (the ElectricHeaters stay
    # but receive 0 W).
    model = build_city_model(args.zones, 10, orientations=True)
    for z in range(args.zones):
        model.add_hvac(IdealHeaterCooler(
            f"tstat{z}", [f"z{z}"], heat_setpoint=20.0, cool_setpoint=26.0,
        ))

    tm = heatx.ThermalModel(
        model, n=1, config=heatx.SimConfig(dtype=jnp.float32, nomass_fixed_iters=1)
    )
    b = tm.building
    S = b.n_surfaces
    print(f"# {S} surfaces, {b.n_zones} zones, thermostats in-kernel",
          file=sys.stderr)

    dry, wind, wdir, ghi, ir = load_weather(args.hours)
    T = args.hours
    # Orientation-resolved incident solar (heatx.weather.solar: sun position
    # + isotropic-sky transposition from the EPW's DNI/DHI/GHI).
    epw_path = os.environ.get(
        "HEATX_EPW", "/root/reference/tests/epw/CHL_Santiago.855740_IWEC.epw"
    )
    if os.path.isfile(epw_path):
        from heatx.weather.epw import read_epw
        from heatx.weather.solar import surface_irradiance

        sol = np.asarray(surface_irradiance(read_epw(epw_path), b, hours=T),
                         np.float32)
    else:
        rng = np.random.default_rng(0)
        sol = np.asarray(ghi[:, None] * rng.uniform(0.2, 1.0, S)[None, :],
                         np.float32)
    # Channels without a time axis pass through natively — FastRunner
    # broadcasts them lazily per dispatch chunk (broadcasting every leaf to
    # [T, ...] eagerly costs GBs of HBM at 100k-surface scale).
    seq = tm.inputs(lum_power=np.full(b.n_luminaires, 150.0))._replace(
        t_out=jnp.asarray(dry, jnp.float32),
        wind_speed=jnp.asarray(wind, jnp.float32),
        wind_direction=jnp.asarray(wdir, jnp.float32),
        sol_front=jnp.asarray(sol, jnp.float32),
        ir_front=jnp.asarray(ir, jnp.float32),  # [T] per-hour scalar
    )

    fr = tm.fast_runner(block_size=args.block_size, mode="trbdf2", substeps=8,
                        hours=24)
    st = tm.initial_state()

    t0 = time.time()
    final, zt, loads = fr.run(st, seq, dispatch_days=37, collect_loads=True)
    loads_np = np.asarray(loads)  # [T, Z] mean W per hour
    print(f"# compile+run: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    final, zt, loads = fr.run(st, seq, dispatch_days=37, collect_loads=True)
    # Device-side annual reduction; only [Z] summaries cross the host link
    # (pulling the full [8760, Z] histories through a remote tunnel costs
    # more than the simulation itself).
    import jax.numpy as jnp

    heat = np.asarray(jnp.sum(jnp.clip(loads, min=0), axis=0)) / 1000.0  # kWh
    cool = np.asarray(-jnp.sum(jnp.clip(loads, max=0), axis=0)) / 1000.0
    wall = time.time() - t0
    print(f"annual demand of {b.n_zones} zones ({S} surfaces) in {wall:.2f}s "
          f"on one chip")
    loads_np = np.asarray(loads)
    print(f"heating: mean {heat.mean():.0f} kWh/zone "
          f"(p5 {np.percentile(heat, 5):.0f}, p95 {np.percentile(heat, 95):.0f})")
    print(f"cooling: mean {cool.mean():.0f} kWh/zone "
          f"(p5 {np.percentile(cool, 5):.0f}, p95 {np.percentile(cool, 95):.0f})")
    zt_np = np.asarray(zt)
    inband = ((zt_np > 19.99) & (zt_np < 26.01)).mean()
    print(f"zone-hours inside the 20-26 C band: {inband * 100:.1f}%")
    assert np.isfinite(loads_np).all() and np.isfinite(zt_np).all()
    print("demand OK")


if __name__ == "__main__":
    main()
