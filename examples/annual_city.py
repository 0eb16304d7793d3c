"""End-to-end example: annual simulation of a city block on one TPU chip.

Builds a 1,000-zone / 10,000-surface district (massive walls, insulated
walls, glazing, heaters, lighting, inter-zone mixing, a ground slab per
zone), loads EPW weather, and marches a full year through the fused TR-BDF2
day kernel — then prints per-zone statistics and saves a checkpoint.

Run:  python examples/annual_city.py [--zones 100] [--epw path.epw]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def build_district(n_zones: int):
    from heatx.model.building import (
        Boundary, BuildingModel, Construction, ElectricHeater, Luminaire,
        Material, SpaceDef, Substance, SurfaceDef,
    )

    m = BuildingModel()
    m.add_substance(Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                              specific_heat_capacity=800.0, front_solar_absorbtance=0.7,
                              back_solar_absorbtance=0.7))
    m.add_substance(Substance("poly", thermal_conductivity=0.0252, density=17.5,
                              specific_heat_capacity=2400.0))
    m.add_substance(Substance("glass", thermal_conductivity=1.0, density=2500.0,
                              specific_heat_capacity=840.0, solar_transmittance=0.8,
                              front_solar_absorbtance=0.1, back_solar_absorbtance=0.1))
    m.add_material(Material("c20", "concrete", 0.2))
    m.add_material(Material("slab", "concrete", 0.15))
    m.add_material(Material("p2", "poly", 0.02))
    m.add_material(Material("g6", "glass", 0.006))
    m.add_construction(Construction("massive", ["c20"]))
    m.add_construction(Construction("mixed", ["p2", "c20", "p2"]))
    m.add_construction(Construction("window", ["g6"]))
    m.add_construction(Construction("floor", ["slab"]))

    wall = np.array([[0, 0, 0], [6, 0, 0], [6, 0, 3], [0, 0, 3]], float)
    slab = np.array([[0, 0, 0], [6, 0, 0], [6, 6, 0], [0, 6, 0]], float)
    for z in range(n_zones):
        zone = f"z{z}"
        m.add_space(SpaceDef(zone, 108.0))
        for si in range(6):
            m.add_surface(SurfaceDef(f"w{z}_{si}", "massive", Boundary.outdoor(),
                                     Boundary.space_(zone), vertices=wall))
        m.add_surface(SurfaceDef(f"i{z}", "mixed", Boundary.outdoor(),
                                 Boundary.space_(zone), vertices=wall))
        m.add_fenestration(SurfaceDef(f"g{z}", "window", Boundary.outdoor(),
                                      Boundary.space_(zone), vertices=wall))
        m.add_surface(SurfaceDef(f"f{z}", "floor", Boundary.ground(temperature=12.0),
                                 Boundary.space_(zone), vertices=slab))
        m.add_hvac(ElectricHeater(f"h{z}", zone))
        m.add_luminaire(Luminaire(f"l{z}", zone))
        if z > 0 and z % 2 == 1:
            m.add_mixing(f"z{z-1}", zone, 0.03)  # paired zones share air
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--zones", type=int, default=100)
    ap.add_argument("--hours", type=int, default=8760)
    ap.add_argument(
        "--epw", default="/root/reference/tests/epw/CHL_Santiago.855740_IWEC.epw"
    )
    ap.add_argument("--out", default="/tmp/heatx_city_checkpoint.npz")
    args = ap.parse_args()
    if os.environ.get("HEATX_EXAMPLE_FAST") == "1":  # smoke-test settings
        args.zones, args.hours = min(args.zones, 4), min(args.hours, 48)

    import jax.numpy as jnp

    import heatx
    from heatx.io.checkpoint import save_state

    t0 = time.time()
    tm = heatx.ThermalModel(build_district(args.zones), n=1)
    b = tm.building
    print(f"compiled {b.n_surfaces} surfaces / {b.n_zones} zones "
          f"in {time.time()-t0:.1f}s")

    # Hourly weather -> a [T, ...] input sequence.
    if os.path.isfile(args.epw):
        from heatx.weather.epw import read_epw

        w = read_epw(args.epw)
        reps = -(-args.hours // w.n_hours)
        dry = np.tile(w.dry_bulb, reps)[: args.hours]
        wind = np.tile(w.wind_speed, reps)[: args.hours]
        wdir = np.tile(w.wind_direction_rad, reps)[: args.hours]
        ghi = np.tile(w.global_horizontal, reps)[: args.hours]
        ir = np.tile(w.horizontal_ir, reps)[: args.hours]
    else:
        t = np.arange(args.hours)
        dry = 10 + 10 * np.sin(2 * np.pi * t / 24)
        wind = np.full(args.hours, 3.0)
        wdir = np.zeros(args.hours)
        ghi = np.maximum(0, 600 * np.sin(2 * np.pi * (t % 24) / 24 - np.pi / 2))
        ir = np.full(args.hours, 350.0)

    S = b.n_surfaces
    rng = np.random.default_rng(0)
    sol_factor = rng.uniform(0.2, 1.0, S)
    seq = tm.inputs()._replace(
        t_out=jnp.asarray(dry),
        wind_speed=jnp.asarray(wind),
        wind_direction=jnp.asarray(wdir),
        sol_front=jnp.asarray(ghi[:, None] * sol_factor[None, :]),
        ir_front=jnp.asarray(np.broadcast_to(ir[:, None], (args.hours, S))),
        hvac_power=jnp.broadcast_to(
            jnp.full((b.n_hvacs,), 400.0), (args.hours, b.n_hvacs)
        ),
        lum_power=jnp.broadcast_to(
            jnp.full((b.n_luminaires,), 120.0), (args.hours, b.n_luminaires)
        ),
    )

    runner = tm.fast_runner(mode="trbdf2", substeps=8, hours=24)
    state = tm.initial_state()
    t0 = time.time()
    final, zone_hist = runner.run(
        state, seq, assert_finite=True, interp_weather=True
    )
    zone_hist = np.asarray(zone_hist)
    print(f"marched {args.hours} h x {b.n_surfaces} surfaces "
          f"in {time.time()-t0:.1f}s (incl. compile)")
    print(f"zone temperatures: mean {zone_hist.mean():.2f}C  "
          f"min {zone_hist.min():.2f}C  max {zone_hist.max():.2f}C")
    coldest = np.unravel_index(zone_hist.argmin(), zone_hist.shape)
    print(f"coldest hour: h={coldest[0]} zone={coldest[1]}")
    save_state(args.out, final)
    print(f"checkpoint saved to {args.out}")


if __name__ == "__main__":
    main()
