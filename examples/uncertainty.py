"""Monte-Carlo uncertainty quantification of heating demand.

Building-physics inputs are never known exactly: insulation conductivity,
solar absorptance, and infiltration all carry construction-quality
uncertainty.  Because the compiled building is a pytree and the simulator is
pure, a 128-sample Monte-Carlo over those parameters is ONE batched device
program (`heatx.ensemble.run_param_ensemble` with a per-member input axis
for infiltration) — demand percentiles in seconds, where a serial simulator
pays 128 sequential runs.

Run:  python examples/uncertainty.py
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
        Boundary, BuildingModel, Construction, IdealHeaterCooler, Material,
        SpaceDef, Substance, SurfaceDef,
    )

    m = BuildingModel()
    m.add_substance(Substance("concrete", thermal_conductivity=0.816,
                              density=1700.0, specific_heat_capacity=800.0,
                              front_solar_absorbtance=0.7,
                              back_solar_absorbtance=0.7))
    m.add_substance(Substance("poly", thermal_conductivity=0.0252, density=17.5,
                              specific_heat_capacity=2400.0))
    m.add_material(Material("p5", "poly", 0.05))
    m.add_material(Material("c15", "concrete", 0.15))
    m.add_construction(Construction("wall", ["p5", "c15"]))
    m.add_space(SpaceDef("room", 120.0))
    verts = np.array([[0, 0, 0], [5, 0, 0], [5, 0, 3], [0, 0, 3]], float)
    m.add_surface(SurfaceDef("south", "wall", Boundary.outdoor(),
                             Boundary.space_("room"), vertices=verts))
    m.add_hvac(IdealHeaterCooler("tstat", ["room"], heat_setpoint=20.0,
                                 cool_setpoint=26.0))
    return m


def main():
    import heatx
    from heatx import ensemble
    from heatx.build.layout import compile_building
    from heatx.engine import state as state_mod
    from heatx.engine.state import StepInputs

    fast = os.environ.get("HEATX_EXAMPLE_FAST") == "1"
    E = 16 if fast else 128
    T = 48 if fast else 168  # one winter week
    cfg = heatx.SimConfig(dtype=jnp.float32, nomass_fixed_iters=1)
    b = compile_building(build(), n=1, config=cfg).astype(jnp.float32)
    st = state_mod.initial_state(b)

    # Winter-week weather (EPW if present, synthetic otherwise).
    epw_path = os.environ.get(
        "HEATX_EPW", "/root/reference/tests/epw/CHL_Santiago.855740_IWEC.epw")
    if os.path.isfile(epw_path):
        from heatx.weather.epw import read_epw
        from heatx.weather.solar import surface_irradiance

        w = read_epw(epw_path)
        s = 24 * 190
        dry = w.dry_bulb[s : s + T]
        wind = w.wind_speed[s : s + T]
        sol = surface_irradiance(w, b)[s : s + T]
    else:
        t = np.arange(T)
        dry = 4.0 + 7.0 * np.sin(2 * np.pi * (t - 14) / 24.0)
        wind = np.full(T, 3.0)
        sol = np.maximum(0.0, 400.0 * np.sin(2 * np.pi * (t - 6) / 24.0))[:, None]

    one = state_mod.default_inputs(b, inf_mask=np.ones(b.n_zones, bool))
    seq = jax.tree.map(lambda x: jnp.broadcast_to(x, (T,) + jnp.shape(x)), one)
    seq = seq._replace(
        t_out=jnp.asarray(dry, jnp.float32),
        wind_speed=jnp.asarray(wind, jnp.float32),
        sol_front=jnp.asarray(np.broadcast_to(sol, (T, b.n_surfaces)), jnp.float32),
        inf_temp=jnp.asarray(dry, jnp.float32)[:, None]
        * jnp.ones((b.n_zones,), jnp.float32),
    )

    # Parameter uncertainty: conductivity x1.0 +-15% (lognormal), absorptance
    # +-20% (uniform), infiltration 0.003-0.015 m3/s (lognormal around 0.007).
    rng = np.random.default_rng(42)
    u_scale = jnp.asarray(np.exp(rng.normal(0.0, 0.15, E)), jnp.float32)
    a_scale = jnp.asarray(rng.uniform(0.8, 1.2, E), jnp.float32)
    inf_vol = jnp.asarray(
        np.clip(0.007 * np.exp(rng.normal(0.0, 0.4, E)), 0.003, 0.015),
        jnp.float32,
    )
    # Infiltration is an exogenous input: give it a member axis [E, T, Z].
    inf_e = jnp.broadcast_to(inf_vol[:, None, None], (E, T, b.n_zones))
    seq_e = seq._replace(inf_vol=inf_e)
    axes = StepInputs(*([None] * len(StepInputs._fields)))._replace(inf_vol=0)

    def apply_fn(bld, p):
        sb = dataclasses.replace(
            bld.surfaces,
            seg_u=bld.surfaces.seg_u * p["u"],
            front_alphas=bld.surfaces.front_alphas * p["a"],
        )
        return dataclasses.replace(bld, surfaces=sb)

    # Building/state ride as traced jit arguments, never closure constants.
    mc = jax.jit(lambda bld, s0, pe, se: ensemble.run_param_ensemble(
        bld, apply_fn, pe, s0, se, mode="trbdf2", substeps=4,
        collect_loads=True, inputs_axes=axes))

    params_e = {"u": u_scale, "a": a_scale}
    t0 = time.time()
    _, (zt, loads) = mc(b, st, params_e, seq_e)
    np.asarray(zt[0, 0])
    print(f"compile+run {E} Monte-Carlo members x {T} h: {time.time() - t0:.1f}s")
    t0 = time.time()
    _, (zt, loads) = mc(b, st, params_e, seq_e)
    weekly = np.asarray(jnp.clip(loads, min=0).sum(axis=(1, 2))) / 1000.0  # kWh
    print(f"sampled {E} buildings in {time.time() - t0:.2f}s")

    print(f"weekly heating demand: mean {weekly.mean():.1f} kWh, "
          f"p5 {np.percentile(weekly, 5):.1f}, "
          f"p50 {np.percentile(weekly, 50):.1f}, "
          f"p95 {np.percentile(weekly, 95):.1f}")
    for name, v in [("conductivity", u_scale), ("absorptance", a_scale),
                    ("infiltration", inf_vol)]:
        r = np.corrcoef(np.asarray(v), weekly)[0, 1]
        print(f"  demand sensitivity to {name}: r = {r:+.2f}")
    assert np.isfinite(weekly).all() and weekly.min() > 0
    print("UQ OK")


if __name__ == "__main__":
    main()
