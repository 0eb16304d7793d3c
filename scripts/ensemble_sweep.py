"""Ensemble-throughput sweep: members/second vs ensemble size on one chip.

Measures how the vmap ensemble axis (heatx.ensemble) scales: a single-zone
thermostatic building marched through one winter week (168 h, TR-BDF2 at 4
sub-steps/h) for E parameter variants at once.  Run on the TPU:

    python scripts/ensemble_sweep.py [--max-e 2048]

Prints one line per E with wall-clock and members/s; paste into PERF.md.
"""

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-e", type=int, default=2048)
    ap.add_argument("--hours", type=int, default=168)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("HEATX_JAX_CACHE", "/tmp/heatx-jax-cache"),
    )

    import heatx
    from heatx import ensemble
    from heatx.build.layout import compile_building
    from heatx.engine import state as state_mod
    from heatx.model.building import (
        Boundary, BuildingModel, Construction, IdealHeaterCooler, Material,
        SpaceDef, Substance, SurfaceDef,
    )

    m = BuildingModel()
    m.add_substance(Substance("concrete", thermal_conductivity=0.816,
                              density=1700.0, specific_heat_capacity=800.0))
    m.add_substance(Substance("poly", thermal_conductivity=0.0252, density=17.5,
                              specific_heat_capacity=2400.0))
    m.add_material(Material("p5", "poly", 0.05))
    m.add_material(Material("c15", "concrete", 0.15))
    m.add_construction(Construction("wall", ["p5", "c15"]))
    m.add_space(SpaceDef("room", 120.0))
    verts = np.array([[0, 0, 0], [5, 0, 0], [5, 0, 3], [0, 0, 3]], float)
    m.add_surface(SurfaceDef("s", "wall", Boundary.outdoor(),
                             Boundary.space_("room"), vertices=verts))
    m.add_hvac(IdealHeaterCooler("t", ["room"], heat_setpoint=20.0))
    b = compile_building(
        m, n=1, config=heatx.SimConfig(dtype=jnp.float32, nomass_fixed_iters=1)
    ).astype(jnp.float32)
    st = state_mod.initial_state(b)

    T = args.hours
    t = np.arange(T)
    one = state_mod.default_inputs(b)
    seq = jax.tree.map(lambda x: jnp.broadcast_to(x, (T,) + jnp.shape(x)), one)
    seq = seq._replace(
        t_out=jnp.asarray(2.0 + 6.0 * np.sin(2 * np.pi * (t - 14) / 24.0), jnp.float32),
        wind_speed=jnp.full((T,), 3.0, jnp.float32),
        sol_front=jnp.asarray(
            np.maximum(0.0, 400.0 * np.sin(2 * np.pi * (t - 6) / 24.0))[:, None]
            * np.ones((1, b.n_surfaces)), jnp.float32),
    )

    def apply_fn(bld, u):
        sb = dataclasses.replace(bld.surfaces, seg_u=bld.surfaces.seg_u * u)
        return dataclasses.replace(bld, surfaces=sb)

    run = jax.jit(lambda bld, s0, sq, pe: ensemble.run_param_ensemble(
        bld, apply_fn, pe, s0, sq, mode="trbdf2", substeps=4,
        collect_loads=True))

    rng = np.random.default_rng(0)
    E = 16
    while E <= args.max_e:
        pe = jnp.asarray(np.exp(rng.normal(0.0, 0.15, E)), jnp.float32)
        _, (zt, loads) = run(b, st, seq, pe)  # compile+warm for this E
        float(np.asarray(zt)[0, 0, 0])
        t0 = time.time()
        _, (zt, loads) = run(b, st, seq, pe)
        total = float(jnp.sum(loads))  # device reduce; forces completion
        wall = time.time() - t0
        assert np.isfinite(total)
        print(f"E={E:5d}: {wall:6.3f}s  ({E / wall:8.0f} one-week members/s)")
        E *= 4


if __name__ == "__main__":
    main()
