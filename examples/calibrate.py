"""Gradient-based model calibration: recover wall properties from data.

The simulator is a pure, differentiable function of the compiled building
pytree, so unknown physical parameters can be fitted to measured zone
temperatures by reverse-mode autodiff straight through the marching engine
— a capability the reference (a Rust/CPU code) structurally cannot offer.

This example "measures" a day of zone temperatures from a building whose
insulation conductance and wall solar absorptance are known, perturbs both,
and recovers them with Adam.  The same pattern scales to thousands of
parameters (per-surface U-values, infiltration schedules) because one
backward pass prices them all.

Run:  python examples/calibrate.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Float64 + reverse-mode through the 120-iteration optimizer is a CPU-parity
# workload: on a remote TPU the x64 backward-scan compile takes tens of
# minutes (f64 is emulated), while CPU compiles and converges in minutes.
# (optimal_control.py demonstrates TPU-speed gradients in f32.)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)


def build():
    from heatx.model.building import (
        Boundary, BuildingModel, Construction, ElectricHeater, Material,
        SpaceDef, Substance, SurfaceDef,
    )

    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0, front_solar_absorbtance=0.7,
                  back_solar_absorbtance=0.6)
    )
    m.add_substance(
        Substance("poly", thermal_conductivity=0.0252, density=17.5,
                  specific_heat_capacity=2400.0)
    )
    m.add_material(Material("c10", "concrete", 0.1))
    m.add_material(Material("p5", "poly", 0.05))
    m.add_construction(Construction("wall", ["p5", "c10"]))
    m.add_space(SpaceDef("room", 150.0))
    verts = np.array([[0, 0, 0], [6, 0, 0], [6, 0, 3], [0, 0, 3]], float)
    m.add_surface(SurfaceDef("south", "wall", Boundary.outdoor(),
                             Boundary.space_("room"), vertices=verts))
    m.add_hvac(ElectricHeater("h", "room"))
    return m


def main():
    import heatx
    import optax
    from heatx.engine import step as step_mod

    # The adaptive no-mass while_loop is not reverse-differentiable; the
    # replay-gated fixed-iteration regime is (see PERF.md).
    cfg = heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=1)
    tm = heatx.ThermalModel(build(), n=1, config=cfg)
    building = tm._device()
    st = tm.initial_state()

    # One synthetic day: cold morning, sunny noon, heater on all day.
    T = 24
    hours = np.arange(T)
    t_out = 5.0 + 8.0 * np.sin((hours - 8) / 24 * 2 * np.pi)
    sol = np.maximum(0.0, 600.0 * np.sin((hours - 6) / 12 * np.pi))
    one = tm.inputs(t_out=0.0, wind_speed=3.0, wind_direction=45.0,
                    hvac_power=jnp.asarray([800.0]))
    seq = jax.tree.map(lambda x: jnp.broadcast_to(x, (T,) + jnp.shape(x)), one)
    # Direct solar on the facade plus transmitted solar striking the wall's
    # interior face (as through a window) — the interior absorption is what
    # makes the absorptance parameter strongly identified from zone T.
    seq = seq._replace(
        t_out=jnp.asarray(t_out),
        sol_front=jnp.asarray(sol)[:, None],  # [T, S] with S=1 here
        sol_back=0.3 * jnp.asarray(sol)[:, None],
    )

    sb0 = building.surfaces

    def simulate(params):
        sb = dataclasses.replace(
            sb0,
            seg_u=sb0.seg_u * params["u_scale"],
            back_alphas=sb0.back_alphas * params["alpha_scale"],
        )
        _, hist = step_mod.run(
            dataclasses.replace(building, surfaces=sb), st, seq,
            collect_zone_T=True,
        )
        return hist  # [T, zones]

    true_params = {"u_scale": jnp.asarray(1.0), "alpha_scale": jnp.asarray(1.0)}
    measured = simulate(true_params)

    guess = {"u_scale": jnp.asarray(1.5), "alpha_scale": jnp.asarray(0.6)}
    opt = optax.adam(5e-2)

    @jax.jit
    def descend(params, opt_state):
        def loss(p):
            d = simulate(p) - measured
            return jnp.mean(d * d)

        val, g = jax.value_and_grad(loss)(params)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, updates), opt_state, val

    params, opt_state = guess, opt.init(guess)
    for i in range(120):
        params, opt_state, val = descend(params, opt_state)
        if i % 20 == 0 or i == 119:
            print(f"iter {i:3d}  loss {float(val):.3e}  "
                  f"u_scale {float(params['u_scale']):.4f}  "
                  f"alpha_scale {float(params['alpha_scale']):.4f}")

    for k in ("u_scale", "alpha_scale"):
        err = abs(float(params[k]) - 1.0)
        print(f"{k}: recovered to {err * 100:.2f}% of truth")
        assert err < 0.05, (k, params[k])
    print("calibration OK")


if __name__ == "__main__":
    main()
