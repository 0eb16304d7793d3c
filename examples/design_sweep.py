"""Design-space sweep: simulate a whole grid of building variants at once.

The compiled building is a pytree of arrays, so a parameter grid vmaps into
ONE batched device program (`heatx.ensemble`): here a 7x7 grid of
(insulation conductance, solar absorptance) variants of a single-zone
building marches a week of EPW weather simultaneously, and the best passive
design (closest to a 21 C comfort target on a fixed 300 W heating budget) is read off
the batch.  49 simulations cost roughly one wall-clock simulation — on the
reference's serial CPU design the same sweep is 49 sequential runs.

For sweeps of thousands of variants, either shard the ensemble axis over a
device mesh (`ensemble.shard_ensemble` — zero cross-member collectives) or
replicate the variants into one multi-zone BuildingModel and run the fused
Pallas day kernel (blocks are zone-closed, so members never interact).

Run:  python examples/design_sweep.py
"""

import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def build():
    from heatx.model.building import (
        Boundary, BuildingModel, Construction, Material, SpaceDef, Substance,
        SurfaceDef,
    )

    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0, front_solar_absorbtance=0.7,
                  back_solar_absorbtance=0.7)
    )
    m.add_substance(
        Substance("poly", thermal_conductivity=0.0252, density=17.5,
                  specific_heat_capacity=2400.0)
    )
    m.add_substance(
        Substance("glass", thermal_conductivity=1.0, density=2500.0,
                  specific_heat_capacity=840.0, solar_transmittance=0.8,
                  front_solar_absorbtance=0.1, back_solar_absorbtance=0.1)
    )
    m.add_material(Material("p5", "poly", 0.05))
    m.add_material(Material("c15", "concrete", 0.15))
    m.add_material(Material("g6", "glass", 0.006))
    m.add_construction(Construction("wall", ["p5", "c15"]))
    m.add_construction(Construction("window", ["g6"]))
    m.add_space(SpaceDef("room", 120.0))
    verts = np.array([[0, 0, 0], [5, 0, 0], [5, 0, 3], [0, 0, 3]], float)
    m.add_surface(SurfaceDef("south", "wall", Boundary.outdoor(),
                             Boundary.space_("room"), vertices=verts))
    m.add_fenestration(SurfaceDef("win", "window", Boundary.outdoor(),
                                  Boundary.space_("room"),
                                  vertices=0.4 * verts + np.array([1, 0, 1])))
    from heatx.model.building import ElectricHeater

    m.add_hvac(ElectricHeater("h", "room"))
    return m


def week_weather(hours=168):
    epw = os.environ.get(
        "HEATX_EPW", "/root/reference/tests/epw/CHL_Santiago.855740_IWEC.epw"
    )
    if os.path.isfile(epw):
        from heatx.weather.epw import read_epw

        w = read_epw(epw)
        # A winter week (Santiago: July).
        s = 24 * 190
        sl = slice(s, s + hours)
        return w.dry_bulb[sl], w.wind_speed[sl], w.wind_direction_rad[sl], \
            w.global_horizontal[sl], w.horizontal_ir[sl]
    t = np.arange(hours)
    return (
        4.0 + 7.0 * np.sin(2 * np.pi * (t - 14) / 24.0),
        3.0 + np.zeros(hours),
        np.radians((t * 11.0) % 360.0),
        np.maximum(0.0, 500.0 * np.sin(2 * np.pi * (t - 6) / 24.0)),
        np.full(hours, 330.0),
    )


def main():
    import heatx
    from heatx import ensemble
    from heatx.build.layout import compile_building
    from heatx.engine import state as state_mod

    cfg = heatx.SimConfig(dtype=jnp.float32, nomass_fixed_iters=1)
    building = compile_building(build(), n=1, config=cfg).astype(jnp.float32)
    st = state_mod.initial_state(building)

    dry, wind, wdir, ghi, ir = week_weather()
    T = len(dry)
    S = building.n_surfaces
    # 300 W of heating plus ~0.25 ACH infiltration of outdoor air.
    one = state_mod.default_inputs(
        building,
        hvac_power=np.full(building.n_hvacs, 300.0),
        inf_vol=np.full(building.n_zones, 0.008),
        inf_mask=np.ones(building.n_zones, bool),
    )
    seq = jax.tree.map(lambda x: jnp.broadcast_to(x, (T,) + jnp.shape(x)), one)
    seq = seq._replace(
        t_out=jnp.asarray(dry, jnp.float32),
        inf_temp=jnp.asarray(dry, jnp.float32)[:, None]
        * jnp.ones((building.n_zones,), jnp.float32),
        wind_speed=jnp.asarray(wind, jnp.float32),
        wind_direction=jnp.asarray(wdir, jnp.float32),
        sol_front=jnp.asarray(ghi, jnp.float32)[:, None] * jnp.ones((S,), jnp.float32),
        ir_front=jnp.asarray(ir, jnp.float32)[:, None] * jnp.ones((S,), jnp.float32),
    )

    # 7x7 grid: insulation conductance scale x wall solar absorptance scale.
    grid = 3 if os.environ.get("HEATX_EXAMPLE_FAST") == "1" else 7
    u_scales = jnp.linspace(0.4, 2.0, grid)
    a_scales = jnp.linspace(0.3, 1.3, grid)
    uu, aa = jnp.meshgrid(u_scales, a_scales, indexing="ij")
    params_e = {"u_scale": uu.ravel().astype(jnp.float32),
                "alpha_scale": aa.ravel().astype(jnp.float32)}
    E = params_e["u_scale"].shape[0]

    def apply_fn(b, p):
        sb = dataclasses.replace(
            b.surfaces,
            seg_u=b.surfaces.seg_u * p["u_scale"],
            front_alphas=b.surfaces.front_alphas * p["alpha_scale"],
        )
        return dataclasses.replace(b, surfaces=sb)

    # Building/state/inputs ride as traced jit ARGUMENTS (repo convention:
    # pytrees are never closure constants — baked arrays bloat the HLO).
    sweep = jax.jit(lambda bld, s0, sq, pe: ensemble.run_param_ensemble(
        bld, apply_fn, pe, s0, sq, mode="trbdf2", substeps=4))

    t0 = time.time()
    _, hist = sweep(building, st, seq, params_e)  # [E, T, Z]
    np.asarray(hist[0, 0])  # force
    print(f"compile+run {E} variants x {T} h: {time.time() - t0:.1f}s")
    t0 = time.time()
    _, hist = sweep(building, st, seq, params_e)
    zt = np.asarray(hist)[:, 24:, 0]  # skip 1-day warm-up
    wall = time.time() - t0
    print(f"steady-state sweep: {E} one-week simulations in {wall:.2f}s "
          f"({wall / E * 1e3:.1f} ms per variant)")

    # Comfort objective at the fixed 300 W heating budget: squared deviation
    # from 21 C — insulation and solar gain have to do the rest.
    score = ((zt - 21.0) ** 2).mean(axis=1)
    best = int(np.argmin(score))
    bu, ba = float(params_e["u_scale"][best]), float(params_e["alpha_scale"][best])
    print(f"zone-T ranges: coldest variant {zt.min():.1f}C, "
          f"hottest {zt.max():.1f}C")
    print(f"best passive design: u_scale={bu:.2f} alpha_scale={ba:.2f} "
          f"(rms deviation {np.sqrt(score[best]):.2f} K; "
          f"worst design {np.sqrt(score.max()):.2f} K)")
    assert np.all(np.isfinite(zt))
    print("sweep OK")


if __name__ == "__main__":
    main()
