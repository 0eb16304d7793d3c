"""Gradient-based optimal control: minimal-energy heating schedules.

Two model-predictive-control phases, both solved directly through the
physics instead of against a surrogate model:

1. HEATER POWER schedule (XLA path): differentiate the TR-BDF2 integrator
   (heatx/engine/implicit.py) w.r.t. a 24-hour heater power series and
   find the cheapest schedule holding a comfort setpoint through a cold
   day.
2. THERMOSTAT SETPOINT schedule (kernel-adjoint path): a thermostatic
   (ideal-loads) zone whose heating-setpoint schedule is the optimization
   variable, run through the fused Pallas day kernel on BOTH sweeps —
   FastRunner.chunk_forward/chunk_grad with ``schedule_fn`` pulls the
   per-hour setpoint cotangents (heatx.ops.pallas_adjoint d_sp_heat)
   back into the schedule parameters, with a finite-difference gate on
   the gradient before optimizing.  This is night-setback optimization
   at kernel speed.

The reference has neither autodiff nor a working thermostat (its
IdealHeaterCooler is `todo!()`, heating_cooling.rs:67) — both phases are
heatx capability, not parity.

Run:  python examples/optimal_control.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

# Pin CPU BEFORE any backend-initializing call (sitecustomize would
# otherwise register the remote TPU, where this f64 example cannot run —
# f64 kernels have no Mosaic lowering).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/heatx-jax-cache")

import jax.numpy as jnp
import numpy as np


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
    setpoint_phase(fast)
    print("optimal control OK")


def setpoint_phase(fast):
    """Phase 2: optimize a thermostat heating-SETPOINT schedule through
    the kernel adjoint (chunk_forward/chunk_grad with schedule_fn)."""
    import dataclasses

    import heatx
    import optax
    from heatx.engine.adjoint import chunked_value_and_grad
    from heatx.model.building import IdealHeaterCooler

    m = build()
    # Swap the electric heater for a thermostat: the setpoint schedule
    # becomes the control variable, demand is the in-kernel ideal load.
    m.hvacs = []
    m.add_hvac(IdealHeaterCooler(
        "tstat", ["room"], heat_setpoint=20.0, cool_setpoint=28.0,
        max_heating=1e4, max_cooling=1e4,
    ))
    cfg = heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=1)
    tm = heatx.ThermalModel(m, n=1, config=cfg)
    building = tm._device()
    st = tm.initial_state()
    T = 12 if fast else 24
    SUBS = 4
    t_out = -12.0 + 4.0 * np.sin((np.arange(T) - 8) / 24 * 2 * np.pi)
    seq = tm.inputs_sequence(T, t_out=jnp.asarray(t_out), wind_speed=3.0,
                             wind_direction=45.0)
    xs_chunks = jax.tree.map(lambda v: v[None], seq)  # one chunk

    fr = tm.fast_runner(block_size=8, mode="trbdf2", substeps=SUBS, hours=T,
                        scheduled_setpoints=True)
    Z = building.n_zones
    OCC = (np.arange(T) % 24 >= 8) & (np.arange(T) % 24 < 18)  # occupied
    COMFORT, WEIGHT = 19.0, 20.0

    def schedule_fn(params, xs):
        # Setpoints in (14, 22) C via sigmoid — night setback allowed.
        sp = 14.0 + 8.0 * jax.nn.sigmoid(params["raw"])
        return {"heat_sp": jnp.broadcast_to(sp[:, None], (T, Z))}

    def loss(zt, ld, xs):
        energy_kwh = jnp.sum(ld) / 1e3  # hourly mean W -> kWh
        discomfort = jnp.sum(
            jnp.where(jnp.asarray(OCC)[:, None],
                      jnp.maximum(COMFORT - zt, 0.0) ** 2, 0.0)
        )
        return energy_kwh + WEIGHT * discomfort

    apply_params = lambda p: building  # noqa: E731 — schedule-only control

    kf = fr.chunk_forward(apply_params, loss, collect_loads=True,
                          schedule_fn=schedule_fn)
    kb = fr.chunk_grad(apply_params, loss, collect_loads=True,
                       schedule_fn=schedule_fn)

    # Start at ~20 C (sigmoid(1.1) ~ 0.75): heating must be ACTIVE at the
    # start point — below the free-float band the thermostat never fires
    # and the schedule gradient is genuinely zero (flat landscape).
    params = {"raw": jnp.full((T,), 1.1)}
    val0, g = chunked_value_and_grad(
        None, params, st, xs_chunks, forward_fn=kf, backward_fn=kb
    )
    # FD gate: the kernel-adjoint schedule gradient must match a central
    # finite difference of the kernel forward along a random direction.
    rng = np.random.default_rng(0)
    d = jnp.asarray(rng.normal(size=(T,)))
    eps = 1e-5
    _, vp = kf({"raw": params["raw"] + eps * d}, st, seq)
    _, vm = kf({"raw": params["raw"] - eps * d}, st, seq)
    fd = (float(vp) - float(vm)) / (2 * eps)
    ad = float(jnp.sum(g["raw"] * d))
    assert abs(ad) > 0, "schedule gradient has no signal"
    rel = abs(fd - ad) / max(abs(fd), abs(ad))
    print(f"setpoint-schedule FD gate: fd {fd:.6g}  adjoint {ad:.6g}  "
          f"rel {rel:.2e}")
    assert rel < 1e-3, (fd, ad)

    opt = optax.adam(0.3)
    opt_state = opt.init(params)
    iters = 2 if fast else 25
    for i in range(iters):
        val, g = chunked_value_and_grad(
            None, params, st, xs_chunks, forward_fn=kf, backward_fn=kb
        )
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        if i % 5 == 0 or i == iters - 1:
            print(f"setpoint iter {i:3d}  objective {float(val):8.3f}")
    assert np.isfinite(float(val)) and float(val) <= float(val0)
    sp = 14.0 + 8.0 * jax.nn.sigmoid(np.asarray(params["raw"]))
    print("optimized heating setpoints (C):", np.round(sp, 2))
    if not fast:
        # Night setback: unoccupied-hour setpoints drop below occupied ones.
        assert sp[OCC].mean() > sp[~OCC].mean() + 0.5, sp


if __name__ == "__main__":
    main()
