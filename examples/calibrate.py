"""Gradient-based model calibration: recover wall properties from data.

The simulator is a pure, differentiable function of the compiled building
pytree, so unknown physical parameters can be fitted to measured zone
temperatures by reverse-mode autodiff straight through the marching engine
— a capability the reference (a Rust/CPU code) structurally cannot offer.

This example "measures" two days of zone temperatures from a 4-zone block
whose insulation conductance and wall solar absorptance are known, perturbs
both, and recovers them with Adam.  The same pattern scales to thousands of
parameters (per-surface U-values, infiltration schedules) because one
backward pass prices them all.

The optimization runs through the CHUNKED KERNEL ADJOINT
(heatx.engine.adjoint.chunked_value_and_grad): the forward sweep marches
the fused Pallas day kernel (FastRunner.chunk_forward) and the backward
sweep runs the ADJOINT day kernel (FastRunner.chunk_grad,
heatx.ops.pallas_adjoint) — both sweeps fused in VMEM, ~43x the old
XLA-backward hybrid at bench scale (PERF.md "Differentiation cost").
By default the example pins CPU + float64 (correct everywhere); set
HEATX_CALIBRATE_TPU=1 on a TPU-attached host to run both kernel sweeps
in float32 — on CPU both sweeps use the XLA path (the interpret-mode
kernels are test vehicles, not fast paths).

Run:  python examples/calibrate.py
"""

import dataclasses
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

FAST = os.environ.get("HEATX_EXAMPLE_FAST") == "1"
# Platform must be pinned BEFORE any backend-initializing call
# (jax.default_backend() would lock in the ambient backend and make a
# later jax_platforms update a no-op).  Default: CPU + float64 — correct
# everywhere.  Set HEATX_CALIBRATE_TPU=1 to run the kernel-forward hybrid
# on an attached TPU in float32 instead.
USE_TPU = os.environ.get("HEATX_CALIBRATE_TPU") == "1" and not FAST
if not USE_TPU:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/tmp/heatx-jax-cache")

import jax.numpy as jnp
import numpy as np


def build(n_zones=4):
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
    verts = np.array([[0, 0, 0], [6, 0, 0], [6, 0, 3], [0, 0, 3]], float)
    for z in range(n_zones):
        m.add_space(SpaceDef(f"room{z}", 150.0))
        for s in range(3):
            m.add_surface(SurfaceDef(f"w{z}_{s}", "wall", Boundary.outdoor(),
                                     Boundary.space_(f"room{z}"),
                                     vertices=verts))
        m.add_hvac(ElectricHeater(f"h{z}", f"room{z}"))
    return m


def main():
    import optax

    import heatx
    from heatx.engine import implicit as imp_mod
    from heatx.engine.adjoint import chunked_value_and_grad

    on_tpu = USE_TPU
    dtype = np.float32 if on_tpu else np.float64
    cfg = heatx.SimConfig(dtype=dtype, nomass_fixed_iters=1)
    tm = heatx.ThermalModel(build(), n=1, config=cfg)
    building = tm._device()
    st = tm.initial_state()
    SUBS = 6

    # Two synthetic days: cold mornings, sunny noons, heaters on all day.
    T, C = (12, 2) if FAST else (48, 4)  # horizon hours, adjoint chunks
    hours = np.arange(T)
    t_out = 5.0 + 8.0 * np.sin((hours - 8) / 24 * 2 * np.pi)
    sol = np.maximum(0.0, 600.0 * np.sin((hours % 24 - 6) / 12 * np.pi))
    seq = tm.inputs_sequence(
        T, t_out=jnp.asarray(t_out), wind_speed=3.0, wind_direction=45.0,
        hvac_power=jnp.full((building.n_hvacs,), 800.0),
    )
    S = building.n_surfaces
    # Direct solar on the facades plus transmitted solar striking interior
    # faces (as through windows) — interior absorption is what makes the
    # absorptance parameter strongly identified from zone T.
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
        sb = dataclasses.replace(
            sb0,
            seg_u=sb0.seg_u * params["u_scale"],
            back_alphas=sb0.back_alphas * params["alpha_scale"],
        )
        return dataclasses.replace(building, surfaces=sb)

    # "Measure" the target trajectory with the true parameters.
    def hist_fn(params, state, xs):
        b = with_params(params)

        def hour(s, x):
            s = imp_mod.imp_march(b, s, x, substeps=SUBS)
            return s, s.zone_T

        return jax.lax.scan(hour, state, xs)

    true_params = {"u_scale": jnp.asarray(1.0, dtype),
                   "alpha_scale": jnp.asarray(1.0, dtype)}
    fr = None
    if on_tpu:
        # On the kernel path, "measure" with the SAME fused kernel that the
        # optimization marches: in float32 the kernel and XLA trajectories
        # differ at fp-noise level, and fitting one model against the
        # other's data floors the loss at that mismatch instead of zero
        # (the recovered parameters then absorb the model error).
        fr = tm.fast_runner(block_size=16, mode="trbdf2", substeps=SUBS,
                            hours=min(T // C, 24))
        fr.update_building(with_params(true_params))
        _, zt = fr.run(st, seq)
        measured = zt.reshape(C, T // C, -1)
    else:
        run_hist = jax.jit(hist_fn)
        s, chunks = st, []
        for i in range(C):
            s, h = run_hist(true_params, s,
                            jax.tree.map(lambda x: x[i], xs_chunks))
            chunks.append(h)
        measured = jnp.concatenate(chunks).reshape(C, T // C, -1)

    def chunk_fn(params, state, xs):
        """Advance one chunk + its additive squared-error contribution.
        The `measured` slice rides inside xs (threaded per chunk)."""
        xs, target = xs
        state, hist = hist_fn(params, state, xs)
        d = hist - target
        return state, jnp.mean(d * d) / C

    # Forward sweep through the fused kernel on TPU; XLA fallback on CPU
    # (the interpret-mode kernel is a test vehicle, not a fast path).
    # chunk_forward consumes plain StepInputs; the per-chunk `measured`
    # target rides to its loss_fn through a closure cell.
    forward_fn = None
    if on_tpu:
        _target_cell = {}

        def _loss_fn(zt, xs):
            d = zt - _target_cell["t"]
            return jnp.mean(d * d) / C

        _kf = fr.chunk_forward(with_params, _loss_fn)
        _kb = fr.chunk_grad(with_params, _loss_fn)

        def forward_fn(params, state, xs):
            inner, target = xs
            _target_cell["t"] = target
            return _kf(params, state, inner)

        def backward_fn(params, state, xs, state_cot, loss_cot):
            inner, target = xs
            _target_cell["t"] = target
            return _kb(params, state, inner, state_cot, loss_cot)

    guess = {"u_scale": jnp.asarray(1.5, dtype),
             "alpha_scale": jnp.asarray(0.6, dtype)}
    # The u/alpha pair trades off along a shallow valley; in float32 the
    # along-valley gradient signal is close to the noise floor, so the TPU
    # path takes more, progressively smaller steps (the f64 CPU path
    # converges in 120 flat-rate iterations).
    iters = 8 if FAST else (300 if on_tpu else 120)
    lr = optax.exponential_decay(5e-2, iters, 0.1) if on_tpu else 5e-2
    opt = optax.adam(lr)
    params, opt_state = guess, opt.init(guess)
    for i in range(iters):
        val, g = chunked_value_and_grad(
            chunk_fn, params, st, (xs_chunks, measured),
            forward_fn=forward_fn,
            backward_fn=(None if forward_fn is None else backward_fn),
        )
        updates, opt_state = opt.update(g, opt_state)
        params = optax.apply_updates(params, updates)
        if i % 20 == 0 or i == iters - 1:
            print(f"iter {i:3d}  loss {float(val):.3e}  "
                  f"u_scale {float(params['u_scale']):.4f}  "
                  f"alpha_scale {float(params['alpha_scale']):.4f}")

    for k in ("u_scale", "alpha_scale"):
        err = abs(float(params[k]) - 1.0)
        print(f"{k}: recovered to {err * 100:.2f}% of truth")
        if not FAST:
            # f32 (TPU): the u/alpha valley's along-floor gradient signal
            # sits near the float32 noise floor, so Adam walks it slowly —
            # the adjoint itself is exact there (loss and gradient are
            # exactly 0 at the true parameters; tests/test_kernel_adjoint
            # gates the gradients against FD and the f64 XLA adjoint).
            assert err < (0.08 if USE_TPU else 0.05), (k, params[k])
    assert np.isfinite(float(val))
    print("calibration OK")


if __name__ == "__main__":
    main()
