"""Gradient-based optimal control: minimal-energy heating schedule.

Differentiates the simulator with respect to a 24-hour heater power
schedule and finds the cheapest schedule that keeps the zone at or above a
comfort setpoint through a cold day — the model-predictive-control pattern,
solved directly through the physics instead of against a surrogate model.
Runs the TR-BDF2 fast integrator (heatx/engine/implicit.py), which is
differentiable end-to-end (tests/test_gradients.py).

Run:  python examples/optimal_control.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
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
                  specific_heat_capacity=800.0)
    )
    m.add_substance(
        Substance("poly", thermal_conductivity=0.0252, density=17.5,
                  specific_heat_capacity=2400.0)
    )
    m.add_material(Material("c15", "concrete", 0.15))
    m.add_material(Material("p4", "poly", 0.04))
    m.add_construction(Construction("wall", ["p4", "c15"]))
    m.add_space(SpaceDef("room", 120.0))
    verts = np.array([[0, 0, 0], [6, 0, 0], [6, 0, 3], [0, 0, 3]], float)
    m.add_surface(SurfaceDef("north", "wall", Boundary.outdoor(),
                             Boundary.space_("room"), vertices=verts))
    m.add_hvac(ElectricHeater("h", "room"))
    return m


def main():
    import heatx
    import optax
    from heatx.engine import implicit as imp_mod

    cfg = heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=1)
    tm = heatx.ThermalModel(build(), n=1, config=cfg)
    building = tm._device()
    st = tm.initial_state()

    T = 24
    t_out = -2.0 + 6.0 * np.sin((np.arange(T) - 8) / 24 * 2 * np.pi)  # cold day
    one = tm.inputs(t_out=0.0, wind_speed=3.0, wind_direction=45.0)
    seq = jax.tree.map(lambda x: jnp.broadcast_to(x, (T,) + jnp.shape(x)), one)
    seq = seq._replace(t_out=jnp.asarray(t_out))

    SETPOINT = 20.0
    COMFORT_WEIGHT = 50.0  # K^-2 weighting of violations vs kWh

    def simulate(power_kw):
        def hour(state, xs):
            step_inputs, p = xs
            s = imp_mod.imp_march(
                building, state,
                step_inputs._replace(hvac_power=jnp.atleast_1d(p) * 1e3),
                substeps=8,
            )
            return s, s.zone_T[0]

        _, zT = jax.lax.scan(hour, st, (seq, power_kw))
        return zT

    def objective(raw):
        power_kw = jax.nn.softplus(raw)  # nonnegative power via softplus
        zT = simulate(power_kw)
        energy = jnp.sum(power_kw)  # kWh over the day
        discomfort = jnp.sum(jnp.maximum(SETPOINT - zT, 0.0) ** 2)
        return energy + COMFORT_WEIGHT * discomfort

    opt = optax.adam(0.25)

    @jax.jit
    def descend(raw, opt_state):
        val, g = jax.value_and_grad(objective)(raw)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(raw, updates), opt_state, val

    fast = os.environ.get("HEATX_EXAMPLE_FAST") == "1"
    iters = 10 if fast else 150
    raw = jnp.full((T,), 1.0)  # ~1.3 kW flat start
    opt_state = opt.init(raw)
    for i in range(iters):
        raw, opt_state, val = descend(raw, opt_state)
        if i % 30 == 0 or i == iters - 1:
            print(f"iter {i:3d}  objective {float(val):8.2f}")

    power = jax.nn.softplus(raw)
    zT = simulate(power)
    worst = float(jnp.min(zT))
    kwh = float(jnp.sum(power))
    print(f"optimized schedule: {kwh:.1f} kWh, min zone T {worst:.2f} C "
          f"(setpoint {SETPOINT})")
    print("hourly kW:", np.round(np.asarray(power), 2))
    assert np.isfinite(worst) and np.isfinite(kwh)
    if not fast:  # 10 smoke iterations don't reach the constraint yet
        assert worst > SETPOINT - 0.5, "comfort constraint badly violated"
    flat = jnp.full((T,), kwh / T)
    worst_flat = float(jnp.min(simulate(flat)))
    print(f"same energy as a flat schedule would give min T {worst_flat:.2f} C"
          " — the optimizer shifts heat ahead of the cold hours")
    print("optimal control OK")


if __name__ == "__main__":
    main()
