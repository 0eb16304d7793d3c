"""Differentiable simulation: gradients through the marching engine.

A capability the Rust reference cannot offer: because the compiled building
is a *traced pytree argument* of pure jitted step functions
(build/layout.py pytree registration), ``jax.grad`` flows end-to-end
through the thermal network — boundary resolution, the no-mass fixed point
(in its statically-unrolled ``nomass_fixed_iters`` regime), the massive RK4
march, and the analytical zone update (model.rs:359-427 equivalents).
This enables gradient-based model calibration (recover U-values from
measured zone temperatures) and optimal control (heating schedules), both
checked here against central finite differences in float64.

The reference-exact adaptive no-mass loop is a ``lax.while_loop`` and is
not reverse-differentiable; calibration workflows use the replay-gated
``nomass_fixed_iters`` regime (see PERF.md) or massive-only constructions.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import heatx
from heatx.engine import state as state_mod, step as step_mod
from heatx.model.building import (
    Boundary, BuildingModel, Construction, ElectricHeater, Material,
    SpaceDef, Substance, SurfaceDef,
)

F64 = heatx.SimConfig(dtype=np.float64)
VERTS = np.array([[0, 0, 0], [5, 0, 0], [5, 0, 3], [0, 0, 3]], float)


def heated_concrete_model():
    """Single heated zone behind one massive (concrete-only) wall: every op
    in the march is smooth and statically loop-free."""
    m = BuildingModel()
    m.add_substance(
        Substance("conc", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0)
    )
    m.add_material(Material("c15", "conc", 0.15))
    m.add_construction(Construction("wall", ["c15"]))
    m.add_space(SpaceDef("room", 120.0))
    m.add_surface(SurfaceDef("ext", "wall", Boundary.outdoor(),
                             Boundary.space_("room"), vertices=VERTS))
    m.add_hvac(ElectricHeater("h", "room"))
    return m


def insulated_model():
    """Concrete + insulation skin: discretizes to massive AND no-mass nodes,
    exercising the fixed-iteration no-mass solve under grad."""
    m = BuildingModel()
    m.add_substance(
        Substance("conc", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0)
    )
    m.add_substance(
        Substance("poly", thermal_conductivity=0.0252, density=17.5,
                  specific_heat_capacity=2400.0)
    )
    m.add_material(Material("c10", "conc", 0.1))
    m.add_material(Material("p5", "poly", 0.05))
    m.add_construction(Construction("wall", ["p5", "c10"]))
    m.add_space(SpaceDef("room", 120.0))
    m.add_surface(SurfaceDef("ext", "wall", Boundary.outdoor(),
                             Boundary.space_("room"), vertices=VERTS))
    m.add_hvac(ElectricHeater("h", "room"))
    return m


def _run_loss(building, state, inputs_seq):
    """Scalar objective: mean zone temperature over the run history."""
    _, hist = step_mod.run(building, state, inputs_seq, collect_zone_T=True)
    return jnp.mean(hist)


def _inputs_seq(tm, T, power):
    """[T]-step input sequence with constant weather and heater power."""
    one = tm.inputs(t_out=0.0, wind_speed=3.0, wind_direction=45.0,
                    hvac_power=jnp.atleast_1d(power))
    return jax.tree.map(lambda x: jnp.broadcast_to(x, (T,) + jnp.shape(x)), one)


def _central_fd(f, x, eps):
    return (f(x + eps) - f(x - eps)) / (2.0 * eps)


def test_grad_wrt_heater_power_matches_fd():
    tm = heatx.ThermalModel(heated_concrete_model(), n=1, config=F64)
    building = tm._device()
    st = tm.initial_state()

    def loss(power):
        return _run_loss(building, st, _inputs_seq(tm, 6, power))

    g = jax.grad(loss)(1500.0)
    fd = _central_fd(loss, 1500.0, 1e-2)
    assert np.isfinite(g)
    # more heat -> warmer zone, and d(meanT)/dP is tiny but strictly positive
    assert g > 0.0
    np.testing.assert_allclose(g, fd, rtol=1e-6)


def test_grad_wrt_weather_series():
    """Reverse-mode through the whole scan gives one gradient per step of
    the outdoor-temperature series in a single backward pass."""
    tm = heatx.ThermalModel(heated_concrete_model(), n=1, config=F64)
    building = tm._device()
    st = tm.initial_state()
    seq = _inputs_seq(tm, 8, 1000.0)

    def loss(t_out_series):
        return _run_loss(building, st, seq._replace(t_out=t_out_series))

    t0 = jnp.full((8,), 2.0)
    g = jax.grad(loss)(t0)
    assert g.shape == (8,)
    assert np.all(np.isfinite(g))
    # warmer outdoors always warms the zone, and earlier steps influence
    # more of the mean-T history than later ones, so the gradient is
    # positive everywhere and decays toward the end of the series.
    assert np.all(np.asarray(g) > 0.0)
    assert float(g[0]) > float(g[-1])
    fd = _central_fd(lambda v: loss(t0.at[3].set(v)), 2.0, 1e-4)
    np.testing.assert_allclose(float(g[3]), fd, rtol=1e-6)


@pytest.mark.parametrize("fixed_iters", [1, 3])
def test_grad_wrt_conductance_matches_fd(fixed_iters):
    """d(loss)/d(scale on seg_u) through massive + no-mass physics."""
    cfg = F64.replace(nomass_fixed_iters=fixed_iters)
    tm = heatx.ThermalModel(insulated_model(), n=1, config=cfg)
    building = tm._device()
    st = tm.initial_state()
    seq = _inputs_seq(tm, 6, 1200.0)
    sb0 = building.surfaces

    def loss(scale):
        sb = dataclasses.replace(sb0, seg_u=sb0.seg_u * scale)
        return _run_loss(dataclasses.replace(building, surfaces=sb), st, seq)

    g = jax.grad(loss)(1.0)
    fd = _central_fd(loss, 1.0, 1e-5)
    assert np.isfinite(g)
    # higher conductance -> heated room loses more heat -> cooler
    assert g < 0.0
    np.testing.assert_allclose(g, fd, rtol=1e-5)


def test_calibration_recovers_conductance():
    """End-to-end calibration: recover an insulation U-value scale factor
    from a 'measured' zone-temperature trajectory by gradient descent —
    the workflow the differentiable design exists for."""
    cfg = F64.replace(nomass_fixed_iters=1)
    tm = heatx.ThermalModel(insulated_model(), n=1, config=cfg)
    building = tm._device()
    st = tm.initial_state()
    seq = _inputs_seq(tm, 12, 1200.0)
    sb0 = building.surfaces

    def trajectory(scale):
        sb = dataclasses.replace(sb0, seg_u=sb0.seg_u * scale)
        _, hist = step_mod.run(
            dataclasses.replace(building, surfaces=sb), st, seq,
            collect_zone_T=True,
        )
        return hist

    target = trajectory(1.0)

    import optax

    opt = optax.adam(5e-2)

    @jax.jit
    def descend(scale, opt_state):
        def loss(s):
            d = trajectory(s) - target
            return jnp.mean(d * d)
        val, g = jax.value_and_grad(loss)(scale)
        updates, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(scale, updates), opt_state, val

    scale = jnp.asarray(1.4)
    opt_state = opt.init(scale)
    loss0 = None
    for _ in range(80):
        scale, opt_state, val = descend(scale, opt_state)
        loss0 = float(val) if loss0 is None else loss0
    assert float(val) < 1e-3 * loss0
    assert abs(float(scale) - 1.0) < 0.02, scale


@pytest.mark.parametrize("mode", ["imp", "exp"])
def test_grad_through_fast_modes_matches_fd(mode):
    """The fast integrators differentiate too: TR-BDF2 (pre-factored stage
    solves) and the exponential integrator (expm/phi1 dense algebra) are
    both built from smooth linear-algebra ops, so calibration can run at
    fast-mode speed rather than parity speed."""
    from heatx.engine import exponential as exp_mod
    from heatx.engine import implicit as imp_mod

    march = imp_mod.imp_march if mode == "imp" else exp_mod.exp_march
    cfg = F64.replace(nomass_fixed_iters=1)
    tm = heatx.ThermalModel(insulated_model(), n=1, config=cfg)
    building = tm._device()
    st = tm.initial_state()
    one = tm.inputs(t_out=0.0, wind_speed=3.0, wind_direction=45.0,
                    hvac_power=jnp.asarray([1200.0]))
    sb0 = building.surfaces

    def loss(scale):
        sb = dataclasses.replace(sb0, seg_u=sb0.seg_u * scale)
        b = dataclasses.replace(building, surfaces=sb)
        s = st
        for _ in range(3):
            s = march(b, s, one, substeps=8)
        return jnp.mean(s.zone_T)

    g = jax.grad(loss)(1.0)
    fd = _central_fd(loss, 1.0, 1e-5)
    assert np.isfinite(g) and g < 0.0
    np.testing.assert_allclose(g, fd, rtol=1e-5)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_gradient_matches_single_device():
    """Gradients compose with GSPMD surface-axis sharding: jit(grad(loss))
    over a sharded building/state produces the single-device gradient (the
    backward pass's zone-reduction transpose becomes sharded broadcasts and
    all-reduces, inserted by the compiler — nothing hand-written)."""
    from jax.sharding import Mesh
    from heatx.build.layout import compile_building
    from heatx.parallel import sharding as sh

    cfg = F64.replace(nomass_fixed_iters=1)
    m = insulated_model()
    # widen to 8 surfaces so the axis shards evenly over 8 devices
    for i in range(7):
        m.add_surface(SurfaceDef(f"w{i}", "wall", Boundary.outdoor(),
                                 Boundary.space_("room"), vertices=VERTS))
    building = compile_building(m, n=1, config=cfg).astype(np.float64)
    st = state_mod.initial_state(building)
    one = state_mod.default_inputs(
        building, t_out=0.0, wind_speed=3.0, wind_direction=45.0,
        hvac_power=np.array([1200.0]),
    )
    seq = jax.tree.map(lambda x: jnp.broadcast_to(jnp.asarray(x),
                                                  (6,) + jnp.shape(x)), one)

    def loss(scale, building):
        sb = building.surfaces
        sb = dataclasses.replace(sb, seg_u=sb.seg_u * scale)
        return _run_loss(dataclasses.replace(building, surfaces=sb), st, seq)

    g_single = jax.jit(jax.grad(loss))(1.0, building)

    mesh = Mesh(np.array(jax.devices()[:8]), ("surfaces",))
    bld_sharded = sh._put_tree(
        building, sh.building_shardings(building, mesh, "surfaces")
    )
    g_sharded = jax.jit(jax.grad(loss))(1.0, bld_sharded)
    np.testing.assert_allclose(float(g_sharded), float(g_single), rtol=1e-12)


def test_chunked_adjoint_matches_monolithic_grad():
    """engine.adjoint.chunked_value_and_grad (bounded per-chunk dispatches
    for horizons whose single-dispatch reverse sweep would trip the remote
    watchdog) reproduces the monolithic jax.grad exactly."""
    from heatx.engine.adjoint import chunked_value_and_grad

    cfg = F64.replace(nomass_fixed_iters=1)
    tm = heatx.ThermalModel(insulated_model(), n=1, config=cfg)
    building = tm._device()
    st = tm.initial_state()
    seq = _inputs_seq(tm, 12, 1200.0)
    sb0 = building.surfaces

    def with_scale(scale):
        sb = dataclasses.replace(sb0, seg_u=sb0.seg_u * scale)
        return dataclasses.replace(building, surfaces=sb)

    def chunk_fn(scale, state, xs):
        state, hist = step_mod.run(with_scale(scale), state, xs,
                                   collect_zone_T=True)
        return state, jnp.sum(hist)

    xs_chunks = jax.tree.map(lambda x: x.reshape((3, 4) + x.shape[1:]), seq)
    val_c, g_c = chunked_value_and_grad(chunk_fn, jnp.asarray(1.0), st,
                                        xs_chunks)

    def monolithic(scale):
        _, hist = step_mod.run(with_scale(scale), st, seq,
                               collect_zone_T=True)
        return jnp.sum(hist)

    val_m, g_m = jax.value_and_grad(monolithic)(jnp.asarray(1.0))
    np.testing.assert_allclose(float(val_c), float(val_m), rtol=1e-14)
    np.testing.assert_allclose(float(g_c), float(g_m), rtol=1e-12)


def test_adaptive_loop_not_differentiable_is_documented():
    """The reference-exact adaptive no-mass while_loop is (by JAX semantics)
    not reverse-differentiable — the error is loud, not silent garbage."""
    tm = heatx.ThermalModel(insulated_model(), n=1, config=F64)
    building = tm._device()
    st = tm.initial_state()
    seq = _inputs_seq(tm, 2, 1200.0)

    def loss(power):
        return _run_loss(building, st,
                         seq._replace(hvac_power=jnp.full((2, 1), power)))

    with pytest.raises(ValueError, match="while_loop|Reverse-mode"):
        jax.grad(loss)(1000.0)


def test_grad_through_interior_mrt_matches_fd():
    """Reverse-mode flows through the Carroll MRT network (the masked
    view-factor/emissivity arithmetic guards its 0/0 branch, so the VJP is
    NaN-free) — gradients with interior_mrt on match finite differences."""
    m = heated_concrete_model()
    # A second wall so the zone has >= 2 participating faces (otherwise the
    # network is inert and the flag changes nothing).
    m.add_surface(SurfaceDef("ext2", "wall", Boundary.outdoor(),
                             Boundary.space_("room"), vertices=VERTS))
    cfg = F64.replace(interior_mrt=True, nomass_fixed_iters=1)
    tm = heatx.ThermalModel(m, n=1, config=cfg)
    building = tm._device()
    st = tm.initial_state()

    def loss(power):
        return _run_loss(building, st, _inputs_seq(tm, 6, power))

    g = jax.grad(loss)(1500.0)
    assert np.isfinite(g) and g > 0.0
    fd = _central_fd(loss, 1500.0, 1e-2)
    np.testing.assert_allclose(g, fd, rtol=1e-6)
    # The MRT physics is actually in the differentiated graph: its gradient
    # differs measurably from the air-bath model's.
    tm0 = heatx.ThermalModel(m, n=1, config=F64.replace(nomass_fixed_iters=1))
    b0 = tm0._device()

    def loss0(power):
        return _run_loss(b0, tm0.initial_state(), _inputs_seq(tm0, 6, power))

    g0 = jax.grad(loss0)(1500.0)
    assert abs(float(g) - float(g0)) > 1e-12


def test_kernel_forward_chunked_grad_matches_xla():
    """The fused day kernel as the FORWARD sweep of the chunked adjoint
    (FastRunner.chunk_forward + chunked_value_and_grad(forward_fn=...)):
    the kernel has no VJP, so the backward sweep re-runs each chunk through
    the XLA TR-BDF2 path at the kernel's chunk-boundary states.  In f64 the
    two implementations are bit-equivalent (tests/test_pallas_imp.py), so
    value AND gradient must match the pure-XLA chunked adjoint to fp
    tolerance — this is what lets calibration run its forward passes at
    kernel speed (examples/calibrate.py)."""
    import bench as B
    from heatx.engine import implicit as imp_mod
    from heatx.engine.adjoint import chunked_value_and_grad

    cfg = F64.replace(nomass_fixed_iters=1)
    tm = heatx.ThermalModel(B.build_city_model(3, 10), n=1, config=cfg)
    building = tm._device()
    st = tm.initial_state()
    sb0 = building.surfaces
    SUBS = 6
    T, C = 8, 2  # 8 hours in 2 chunks

    rng = np.random.default_rng(0)
    seq = tm.inputs_sequence(
        T,
        t_out=jnp.asarray(rng.uniform(-2.0, 10.0, T)),
        wind_speed=jnp.asarray(rng.uniform(1.0, 5.0, T)),
        wind_direction=45.0,
        hvac_power=jnp.full((building.n_hvacs,), 500.0),
        lum_power=jnp.full((building.n_luminaires,), 150.0),
    )
    seq = seq._replace(
        sol_front=jnp.asarray(
            rng.uniform(0.0, 300.0, (T, building.n_surfaces))
        )
    )
    xs_chunks = jax.tree.map(
        lambda v: (
            v.reshape((C, T // C) + v.shape[1:])
            if v.ndim and v.shape[0] == T
            else jnp.broadcast_to(v, (C, T // C) + v.shape)
        ),
        seq,
    )

    def with_params(params):
        sb = dataclasses.replace(sb0, seg_u=sb0.seg_u * params["u_scale"])
        return dataclasses.replace(building, surfaces=sb)

    def chunk_fn(params, state, xs):
        b = with_params(params)

        def hour(s, x):
            s = imp_mod.imp_march(b, s, x, substeps=SUBS)
            return s, s.zone_T

        state, hist = jax.lax.scan(hour, state, xs)
        return state, jnp.mean(hist * hist)

    params = {"u_scale": jnp.asarray(1.3)}
    v_xla, g_xla = chunked_value_and_grad(chunk_fn, params, st, xs_chunks)

    fr = tm.fast_runner(block_size=16, mode="trbdf2", substeps=SUBS, hours=2)
    n_blocked = [0]
    orig = fr.update_building

    def counting(b):
        n_blocked[0] += 1
        return orig(b)

    fr.update_building = counting
    forward_fn = fr.chunk_forward(
        with_params, lambda zt, xs: jnp.mean(zt * zt)
    )
    v_k, g_k = chunked_value_and_grad(
        chunk_fn, params, st, xs_chunks, forward_fn=forward_fn
    )
    # one re-block for both chunks (values unchanged between chunks)
    assert n_blocked[0] == 1
    np.testing.assert_allclose(float(v_k), float(v_xla), rtol=1e-9)
    np.testing.assert_allclose(
        float(g_k["u_scale"]), float(g_xla["u_scale"]), rtol=1e-6
    )
    assert np.isfinite(float(g_k["u_scale"]))

    # second call with DIFFERENT params re-blocks (and moves the value)
    params2 = {"u_scale": jnp.asarray(1.0)}
    v_k2, _ = chunked_value_and_grad(
        chunk_fn, params2, st, xs_chunks, forward_fn=forward_fn
    )
    assert n_blocked[0] == 2
    assert abs(float(v_k2) - float(v_k)) > 1e-9
