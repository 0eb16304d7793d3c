"""Calibrate a building to METERED ENERGY — gradients of a kWh objective.

The most common real calibration target is not a zone-temperature trace but
a metered heating/cooling energy series (utility bills, submeter logs).
heatx's thermostatic zone update computes the per-hour mean ideal-load
power in-graph (heatx.engine.zone.zone_update; in-kernel:
heatx.ops.pallas_step._zone_update_ctl), so a demand objective is just a
loss on that history — and it is differentiable end-to-end, through the
setpoint-landing power formula, the zone ODE, and the wall conduction that
determines how much power holding the setpoint costs.

This example "meters" two days of hourly heating energy from a 4-zone
block with known envelope conductance and infiltration, perturbs both, and
recovers them with Adam by fitting the simulated ideal-load series to the
metered one.  The optimization runs both sweeps through the fused Pallas
kernels when on TPU: FastRunner.chunk_forward(collect_loads=True) marches
the forward day kernel and FastRunner.chunk_grad(collect_loads=True) seeds
the per-hour ideal-load cotangent straight into the ADJOINT day kernel
(heatx.ops.pallas_adjoint) — the demand objective at kernel speed on both
sweeps.  On CPU the same contract runs through the XLA adjoint
(chunked_value_and_grad's default backward), in float64.

The reference has no HVAC demand output at all — its IdealHeaterCooler is
`todo!()` (/root/reference/src/heating_cooling.rs:67,106) — so this
workflow is heatx capability, not parity.

Run:  python examples/calibrate_demand.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

FAST = os.environ.get("HEATX_EXAMPLE_FAST") == "1"
# Platform pinned BEFORE any backend-initializing call (see calibrate.py).
USE_TPU = os.environ.get("HEATX_CALIBRATE_TPU") == "1" and not FAST
if not USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/heatx-jax-cache")

import jax.numpy as jnp
import numpy as np


def build(n_zones=4):
    from heatx.model.building import (
        Boundary, BuildingModel, Construction, IdealHeaterCooler, Material,
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
    verts = np.array([[0, 0, 0], [6, 0, 0], [6, 0, 3], [0, 0, 3]], float)
    for z in range(n_zones):
        m.add_space(SpaceDef(f"room{z}", 150.0))
        for s in range(3):
            m.add_surface(SurfaceDef(f"w{z}_{s}", "wall", Boundary.outdoor(),
                                     Boundary.space_(f"room{z}"),
                                     vertices=verts))
        # Thermostatic ideal loads: the demand channel being metered.
        m.add_hvac(IdealHeaterCooler(
            f"h{z}", [f"room{z}"], heat_setpoint=21.0, cool_setpoint=27.0,
            max_heating=1e5, max_cooling=1e5,
        ))
    return m


def main():
    import optax

    import heatx
    from heatx.engine import implicit as imp_mod
    from heatx.engine.adjoint import chunked_value_and_grad

    dtype = np.float32 if USE_TPU else np.float64
    cfg = heatx.SimConfig(dtype=dtype, nomass_fixed_iters=1)
    tm = heatx.ThermalModel(build(), n=1, config=cfg)
    building = tm._device()
    st = tm.initial_state()
    SUBS = 6

    # Two cold days: the thermostats heat most hours, so the metered series
    # carries conductance + infiltration signal every hour.
    T, C = (12, 2) if FAST else (48, 4)
    hours = np.arange(T)
    t_out = -2.0 + 6.0 * np.sin((hours - 8) / 24 * 2 * np.pi)
    sol = np.maximum(0.0, 400.0 * np.sin((hours % 24 - 6) / 12 * np.pi))
    Z = building.n_zones
    seq = tm.inputs_sequence(
        T, t_out=jnp.asarray(t_out), wind_speed=3.0, wind_direction=45.0,
        inf_vol=jnp.full((Z,), 0.02), inf_temp=jnp.asarray(t_out),
        inf_mask=jnp.ones((Z,)),
    )
    S = building.n_surfaces
    seq = seq._replace(
        sol_front=jnp.broadcast_to(jnp.asarray(sol)[:, None], (T, S)),
        sol_back=0.3 * jnp.broadcast_to(jnp.asarray(sol)[:, None], (T, S)),
    )
    xs_chunks = jax.tree.map(
        lambda v: (
            v.reshape((C, T // C) + v.shape[1:])
            if v.ndim and v.shape[0] == T
            else jnp.broadcast_to(v, (C, T // C) + v.shape)
        ),
        seq,
    )

    sb0 = building.surfaces

    def with_params(params):
        sb = dataclasses.replace(sb0, seg_u=sb0.seg_u * params["u_scale"])
        return dataclasses.replace(building, surfaces=sb)

    def hist_fn(params, state, xs):
        b = with_params(params)

        def hour(s, x):
            s = imp_mod.imp_march(b, s, x, substeps=SUBS)
            return s, (s.zone_T, s.ideal_load)

        return jax.lax.scan(hour, state, xs)

    true_params = {"u_scale": jnp.asarray(1.0, dtype)}
    fr = None
    if USE_TPU:
        # Meter with the same kernel the optimization marches (f32 kernel
        # and XLA trajectories differ at fp-noise level; see calibrate.py).
        fr = tm.fast_runner(block_size=16, mode="trbdf2", substeps=SUBS,
                            hours=min(T // C, 24))
        fr.update_building(with_params(true_params))
        _, _, ld = fr.run(st, seq, collect_loads=True)
        metered = ld.reshape(C, T // C, -1)
    else:
        run_hist = jax.jit(hist_fn)
        s, chunks = st, []
        for i in range(C):
            s, (_, ld) = run_hist(true_params, s,
                                  jax.tree.map(lambda x: x[i], xs_chunks))
            chunks.append(ld)
        metered = jnp.concatenate(chunks).reshape(C, T // C, -1)

    def score(ld, target):
        # kW-scaled squared error on the hourly mean power series (the
        # per-hour metered kWh, up to the constant 1 h factor).
        d = (ld - target) / 1000.0
        return jnp.mean(d * d) / C

    def chunk_fn(params, state, xs):
        xs, target = xs
        state, (_, ld) = hist_fn(params, state, xs)
        return state, score(ld, target)

    forward_fn = backward_fn = None
    if USE_TPU:
        _cell = {}

        def _loss_fn(zt, ld, xs):
            return score(ld, _cell["t"])

        _kf = fr.chunk_forward(with_params, _loss_fn, collect_loads=True)
        _kb = fr.chunk_grad(with_params, _loss_fn, collect_loads=True)

        def forward_fn(params, state, xs):
            inner, target = xs
            _cell["t"] = target
            return _kf(params, state, inner)

        def backward_fn(params, state, xs, state_cot, loss_cot):
            inner, target = xs
            _cell["t"] = target
            return _kb(params, state, inner, state_cot, loss_cot)

    guess = {"u_scale": jnp.asarray(1.6, dtype)}
    iters = 8 if FAST else 80
    opt = optax.adam(5e-2)
    params, opt_state = guess, opt.init(guess)
    for i in range(iters):
        val, g = chunked_value_and_grad(
            chunk_fn, params, st, (xs_chunks, metered),
            forward_fn=forward_fn, backward_fn=backward_fn,
        )
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        if i % 10 == 0 or i == iters - 1:
            print(f"iter {i:3d}  loss {float(val):.3e}  "
                  f"u_scale {float(params['u_scale']):.4f}")

    err = abs(float(params["u_scale"]) - 1.0)
    print(f"u_scale: recovered to {err * 100:.2f}% of truth from metered kWh")
    if not FAST:
        assert err < 0.05, params
    assert np.isfinite(float(val))
    print("demand calibration OK")
    return 0


if __name__ == "__main__":
    main()
