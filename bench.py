"""heatx headline benchmark: annual 8760 h EPW simulation of a 10k-surface
building on one chip.

Target (BASELINE.json north star): < 10 s wall-clock on a single TPU v5e,
metric = wall-node updates/sec/chip.  The reference publishes no performance
numbers (BASELINE.md), so vs_baseline is measured against the 10 s target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def build_city_model(n_zones: int, surfaces_per_zone: int):
    """A synthetic city-block building: per zone, massive concrete walls, one
    mixed (insulated) wall, and a glazed window — exercising the massive RK4
    path, the no-mass fixed point, and glazing optics together."""
    from heatx.model.building import Boundary, SurfaceDef
    from heatx.testing import SingleZoneOptions, TestMat, single_zone_building
    from heatx.model.building import (
        BuildingModel,
        Construction,
        GasSubstance,
        Luminaire,
        ElectricHeater,
        Material,
        SpaceDef,
        Substance,
    )

    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0, front_thermal_absorbtance=0.9,
                  back_thermal_absorbtance=0.9, front_solar_absorbtance=0.7,
                  back_solar_absorbtance=0.7)
    )
    m.add_substance(
        Substance("poly", thermal_conductivity=0.0252, density=17.5,
                  specific_heat_capacity=2400.0, front_thermal_absorbtance=0.9,
                  back_thermal_absorbtance=0.9, front_solar_absorbtance=0.7,
                  back_solar_absorbtance=0.7)
    )
    m.add_substance(
        Substance("glass", thermal_conductivity=1.0, density=2500.0,
                  specific_heat_capacity=840.0, solar_transmittance=0.8,
                  front_solar_absorbtance=0.1, back_solar_absorbtance=0.1,
                  front_thermal_absorbtance=0.84, back_thermal_absorbtance=0.84)
    )
    m.add_material(Material("c20", "concrete", 0.2))
    m.add_material(Material("p2", "poly", 0.02))
    m.add_material(Material("g6", "glass", 0.006))
    m.add_construction(Construction("massive", ["c20"]))
    m.add_construction(Construction("mixed", ["p2", "c20", "p2"]))
    m.add_construction(Construction("window", ["g6"]))

    verts = np.array([[0, 0, 0], [6, 0, 0], [6, 0, 3], [0, 0, 3]], float)
    kinds = ["massive"] * (surfaces_per_zone - 2) + ["mixed", "window"]
    for z in range(n_zones):
        zone = f"z{z}"
        m.add_space(SpaceDef(zone, 200.0))
        for si, kind in enumerate(kinds):
            m.add_surface(
                SurfaceDef(
                    f"s{z}_{si}", kind, Boundary.outdoor(), Boundary.space_(zone),
                    vertices=verts,
                )
            )
        m.add_hvac(ElectricHeater(f"h{z}", zone))
        m.add_luminaire(Luminaire(f"l{z}", zone))
    return m


def load_weather(hours: int):
    """EPW weather if the reference fixture is available, synthetic otherwise."""
    epw_path = os.environ.get(
        "HEATX_EPW", "/root/reference/tests/epw/CHL_Santiago.855740_IWEC.epw"
    )
    if os.path.isfile(epw_path):
        from heatx.weather.epw import read_epw

        w = read_epw(epw_path)
        reps = int(np.ceil(hours / w.n_hours))
        return (
            np.tile(w.dry_bulb, reps)[:hours],
            np.tile(w.wind_speed, reps)[:hours],
            np.tile(w.wind_direction_rad, reps)[:hours],
            np.tile(w.global_horizontal, reps)[:hours],
            np.tile(w.horizontal_ir, reps)[:hours],
        )
    t = np.arange(hours)
    return (
        10.0 + 10.0 * np.sin(2 * np.pi * t / 24.0),
        3.0 + 2.0 * np.sin(2 * np.pi * t / 17.0),
        np.radians((t * 7.0) % 360.0),
        np.maximum(0.0, 600.0 * np.sin(2 * np.pi * (t % 24) / 24.0 - np.pi / 2)),
        np.full(hours, 350.0),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--zones", type=int, default=1000)
    ap.add_argument("--surfaces-per-zone", type=int, default=10)
    ap.add_argument("--hours", type=int, default=8760)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--warmup-hours", type=int, default=24)
    ap.add_argument(
        "--nomass-iters",
        type=int,
        default=2,
        help="fixed no-mass iterations per sub-step (0 = reference-exact "
        "while_loop); 1-2 match the EnergyPlus replay within its thresholds",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("HEATX_JAX_CACHE", "/tmp/heatx-jax-cache"),
    )

    import heatx
    from heatx.build.layout import compile_building
    from heatx.engine import state as state_mod
    from heatx.engine import step as step_mod

    dtype = jnp.float64 if args.dtype == "float64" else jnp.float32

    t0 = time.time()
    model = build_city_model(args.zones, args.surfaces_per_zone)
    cfg = heatx.SimConfig(
        dtype=dtype,
        nomass_fixed_iters=args.nomass_iters if args.nomass_iters > 0 else None,
    )
    building = compile_building(model, n=1, config=cfg)
    S, N = building.n_surfaces, building.max_nodes
    n_nodes_total = int(np.sum(building.surfaces.n_nodes))
    subs = building.dt_subdivisions
    print(
        f"# compiled {S} surfaces x {N} max nodes ({n_nodes_total} real nodes), "
        f"{building.n_zones} zones, dt={building.dt:.1f}s x {subs} substeps/hour, "
        f"build {time.time() - t0:.1f}s",
        file=sys.stderr,
    )

    dry, wind, wdir, ghi, ir = load_weather(args.hours)
    # Static per-surface scale factors for solar/IR (a real deployment feeds
    # per-surface irradiance from the solar module; the bench synthesizes it).
    rng = np.random.default_rng(0)
    sol_factor = jnp.asarray(rng.uniform(0.2, 1.0, S), dtype)
    state0 = state_mod.initial_state(building)
    base = state_mod.default_inputs(building)
    base = base._replace(
        hvac_power=jnp.full((building.n_hvacs,), 500.0, dtype),
        lum_power=jnp.full((building.n_luminaires,), 150.0, dtype),
    )

    def year(bld, state, xs):
        def hour_body(carry, x):
            t_out, ws, wd, g, q_ir = x
            inputs = base._replace(
                t_out=t_out,
                wind_speed=ws,
                wind_direction=wd,
                sol_front=g * sol_factor,
                ir_front=jnp.broadcast_to(q_ir, (S,)),
            )
            new = step_mod.march(bld, carry, inputs)
            return new, new.zone_T[0]

        return jax.lax.scan(hour_body, state, xs)

    # The building rides as a traced pytree argument so the HLO stays small.
    _year_jit = jax.jit(year, donate_argnums=(1,))
    building_dev = building.astype(dtype)
    year_fn = lambda st, xs: _year_jit(building_dev, st, xs)  # noqa: E731

    def xs_slice(h0, h1):
        sl = slice(h0, h1)
        return tuple(
            jnp.asarray(v[sl], dtype) for v in (dry, wind, wdir, ghi, ir)
        )

    # Warm-up + compile with the SAME scan length as the timed run (a
    # different length is a different executable).
    xs = xs_slice(0, args.hours)
    t0 = time.time()
    state, _ = year_fn(state0, xs)
    jax.block_until_ready(state)
    print(f"# compile+warmup pass: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    state, zt = year_fn(state, xs)
    jax.block_until_ready(zt)
    wall = time.time() - t0

    total_substeps = args.hours * subs
    node_updates = n_nodes_total * total_substeps
    rate = node_updates / wall
    print(
        f"# {args.hours}h x {subs} substeps, {node_updates:.3e} node-updates "
        f"in {wall:.2f}s -> {rate:.3e} node-updates/s; "
        f"zone_T[0] final {float(state.zone_T[0]):.2f}C",
        file=sys.stderr,
    )
    assert np.isfinite(float(state.zone_T[0])), "simulation diverged"

    print(
        json.dumps(
            {
                "metric": f"annual_{args.hours}h_{S}surface_sim_wall_clock",
                "value": round(wall, 3),
                "unit": "s",
                "vs_baseline": round(10.0 / wall, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
