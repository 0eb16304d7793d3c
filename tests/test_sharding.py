"""Multi-device sharding tests on the virtual 8-device CPU mesh.

The sharded march must produce the same numbers as the single-device one:
sharding the surface axis only changes where the work runs, the zone
reduction becomes partial-sum + all-reduce under GSPMD.
"""

import jax
import numpy as np
import pytest

import heatx
from heatx.build.layout import compile_building
from heatx.engine import state as state_mod
from heatx.engine import step as step_mod
from heatx.parallel import sharding as sh
from heatx.testing import SingleZoneOptions, TestMat, single_zone_building
from heatx.model.building import Boundary, SurfaceDef


def multi_surface_model(n_surfaces=8):
    opts = SingleZoneOptions(
        zone_volume=600.0,
        surface_height=3.0,
        surface_width=20.0,
        construction=[TestMat.polyurethane(0.02), TestMat.concrete(0.2)],
        emissivity=0.9,
        solar_absorbtance=0.7,
    )
    m = single_zone_building(opts)
    base = m.surfaces[0]
    for i in range(n_surfaces - 1):
        m.add_surface(
            SurfaceDef(
                f"wall{i}",
                base.construction,
                Boundary.outdoor(),
                Boundary.space_("Space"),
                vertices=np.array(
                    [[0, 0, 0], [20, 0, 0], [20, 0, 3], [0, 0, 3]], float
                ),
            )
        )
    return m


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_march_matches_single_device():
    model = multi_surface_model(8)
    building = compile_building(model, n=4, config=heatx.SimConfig(dtype=np.float64))
    assert building.n_surfaces == 8

    state0 = state_mod.initial_state(building)
    inputs = state_mod.default_inputs(
        building,
        t_out=-2.0,
        wind_speed=3.0,
        sol_front=np.full(8, 150.0),
        ir_front=np.full(8, 350.0),
    )

    # single device
    st_ref = state0
    march_ref = step_mod.make_march_fn(building, donate=False)
    for _ in range(10):
        st_ref = march_ref(st_ref, inputs)

    # 8-device mesh
    mesh = sh.make_mesh(jax.devices()[:8])
    march_sh = sh.make_sharded_march(building, mesh)
    st = sh.shard_state(state0, mesh)
    inp = sh.shard_inputs(inputs, mesh)
    for _ in range(10):
        st = march_sh(st, inp)

    np.testing.assert_allclose(
        np.asarray(st.zone_T), np.asarray(st_ref.zone_T), rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(st.node_T), np.asarray(st_ref.node_T), rtol=0, atol=1e-12
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_padding_for_mesh_divisibility():
    model = multi_surface_model(5)  # 5 surfaces -> pad to 8
    building = compile_building(
        model, n=4, config=heatx.SimConfig(dtype=np.float64), pad_surfaces_to=8
    )
    assert building.n_surfaces == 8

    mesh = sh.make_mesh(jax.devices()[:8])
    march_sh = sh.make_sharded_march(building, mesh)
    st = sh.shard_state(state_mod.initial_state(building), mesh)
    inp = sh.shard_inputs(state_mod.default_inputs(building, t_out=0.0), mesh)
    st = march_sh(st, inp)
    assert np.all(np.isfinite(np.asarray(st.zone_T)))


def test_unpadded_rejected():
    model = multi_surface_model(5)
    building = compile_building(model, n=4, config=heatx.SimConfig(dtype=np.float64))
    mesh = sh.make_mesh(jax.devices()[:8]) if len(jax.devices()) >= 8 else None
    if mesh is None:
        pytest.skip("needs 8 devices")
    with pytest.raises(ValueError, match="not divisible"):
        sh.make_sharded_march(building, mesh)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_fast_mode_matches_single_device():
    """The TR-BDF2 fast mode shards like the parity path: identical numbers
    on the 8-device mesh vs one device."""
    from heatx.engine.implicit import imp_march

    model = multi_surface_model(8)
    building = compile_building(model, n=1, config=heatx.SimConfig(dtype=np.float64))
    mesh = sh.make_mesh()
    march = sh.make_sharded_march(building, mesh, mode="trbdf2", substeps=6)

    state = sh.shard_state(state_mod.initial_state(building), mesh)
    inputs = sh.shard_inputs(
        state_mod.default_inputs(
            building,
            t_out=np.float64(-2.0),
            wind_speed=np.float64(4.0),
            sol_front=np.full(8, 150.0),
            ir_front=np.full(8, 330.0),
        ),
        mesh,
    )
    for _ in range(3):
        state = march(state, inputs)

    ref = state_mod.initial_state(building)
    ref_inputs = state_mod.default_inputs(
        building,
        t_out=np.float64(-2.0),
        wind_speed=np.float64(4.0),
        sol_front=np.full(8, 150.0),
        ir_front=np.full(8, 330.0),
    )
    single = jax.jit(imp_march, static_argnames=("substeps",))
    bd = building.astype(np.float64)
    for _ in range(3):
        ref = single(bd, ref, ref_inputs, substeps=6)

    np.testing.assert_allclose(
        np.asarray(state.zone_T), np.asarray(ref.zone_T), atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(state.node_T), np.asarray(ref.node_T), atol=1e-12
    )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_pallas_kernel_matches_unsharded():
    """The fused Pallas day kernel sharded over 8 devices (one block each,
    via shard_map) must reproduce the unsharded kernel bit-for-bit: blocks
    are zone-closed, so sharding only moves work."""
    import jax.numpy as jnp

    from test_pallas_hour import city_model
    from heatx.ops import pallas_step
    from heatx.model.building import BuildingModel, Construction, Material, SpaceDef, Substance

    # 8 independent zones x 3 surfaces; block_size 4 -> one component/block.
    src = city_model(1, 2)  # donor for substances/materials/constructions
    m = BuildingModel()
    for s in src.substances.values():
        m.add_substance(s)
    for mat in src.materials.values():
        m.add_material(mat)
    for c in src.constructions.values():
        m.add_construction(c)
    verts = np.array([[0, 0, 0], [6, 0, 0], [6, 0, 3], [0, 0, 3]], float)
    for z in range(8):
        m.add_space(SpaceDef(f"z{z}", 150.0))
        for si, kind in enumerate(["massive", "massive", "mixed"]):
            m.add_surface(
                SurfaceDef(f"s{z}_{si}", kind, Boundary.outdoor(),
                           Boundary.space_(f"z{z}"), vertices=verts)
            )
    cfg = heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=2)
    building = compile_building(m, n=1, config=cfg).astype(np.float64)
    bb = pallas_step.block_building(building, block_size=4)
    assert bb.n_blocks == 8

    hours, sub = 2, 4
    lay = bb.layout
    SP = lay.padded_surfaces
    NB, ZB = bb.n_blocks, bb.zones_per_block
    st = state_mod.initial_state(building)
    T0 = jnp.asarray(lay.surfaces_to_blocked(np.asarray(st.node_T)))
    zT0 = jnp.asarray(lay.zones_to_blocked(np.asarray(st.zone_T)))
    S = building.n_surfaces
    hi = (
        jnp.full((hours * sub,), 5.0),
        jnp.full((hours * sub,), 3.0),
        jnp.full((hours * sub,), 1.0),
        jnp.tile(jnp.asarray(lay.surfaces_to_blocked(np.full(S, 200.0)))[None], (hours, 1)),
        jnp.zeros((hours, SP)),
        jnp.tile(jnp.asarray(lay.surfaces_to_blocked(np.full(S, 320.0)))[None], (hours, 1)),
        jnp.zeros((hours, SP)),
        jnp.zeros((hours, NB, ZB)),
        jnp.zeros((hours, NB, ZB)),
    )

    hm0, p0 = pallas_step.make_hour_march(
        bb, substeps=sub, mode="trbdf2", hours=hours, interpret=True
    )
    T_a, zT_a, hq_a, hist_a = hm0(p0, T0, zT0, hi)

    mesh = sh.make_mesh(jax.devices()[:8])
    hm1, p1 = sh.make_sharded_hour_march(
        bb, mesh, substeps=sub, mode="trbdf2", hours=hours, interpret=True
    )
    T_b, zT_b, hq_b, hist_b = jax.jit(hm1)(p1, T0, zT0, hi)

    assert np.array_equal(np.asarray(T_a), np.asarray(T_b))
    assert np.array_equal(np.asarray(zT_a), np.asarray(zT_b))
    assert np.array_equal(np.asarray(hist_a), np.asarray(hist_b))
    for a, b in zip(hq_a, hq_b):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    # Determinism regression: the multi-device interpret path once returned
    # DIFFERENT results on identical repeated calls (partially-written
    # output blocks + a PCR-specific interpret race, both fixed/mitigated in
    # round 3 — PERF.md).  Repeat the sharded call and demand bit-equality.
    for _ in range(3):
        T_c, zT_c, _, hist_c = jax.jit(hm1)(p1, T0, zT0, hi)
        assert np.array_equal(np.asarray(T_b), np.asarray(T_c))
        assert np.array_equal(np.asarray(hist_b), np.asarray(hist_c))

    # Collect flags through the sharded wrapper: the per-hour finite count
    # must be all-zero and the h/q history's final hour must equal the final
    # h/q outputs.
    hm2, p2 = sh.make_sharded_hour_march(
        bb, mesh, substeps=sub, mode="trbdf2", hours=hours, interpret=True,
        collect_bad=True, collect_hq=True,
    )
    T_d, zT_d, hq_d, hist_d, hqh_d, bad_d = jax.jit(hm2)(p2, T0, zT0, hi)
    assert np.array_equal(np.asarray(T_d), np.asarray(T_a))
    assert np.asarray(bad_d).sum() == 0
    for a, h in zip(hq_d, hqh_d):
        assert np.array_equal(np.asarray(h)[-1], np.asarray(a))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fast_runner_on_mesh_matches_single_device():
    """The mesh-aware FastRunner (high-level API over the sharded kernel)
    must reproduce the single-device runner exactly — including the
    per-dispatch ground-temperature operand swaps (``ground_hourly``),
    setpoint schedules (the 11-tuple hour-input form), flux collection and
    the ideal-load history."""
    from heatx.api import FastRunner, ThermalModel
    from heatx.model.building import (
        BuildingModel,
        Construction,
        IdealHeaterCooler,
        Material,
        SpaceDef,
        Substance,
        SurfaceDef,
    )

    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0)
    )
    m.add_material(Material("c10", "concrete", 0.1))
    m.add_construction(Construction("wall", ["c10"]))
    verts = np.array([[0, 0, 0], [4, 0, 0], [4, 0, 3], [0, 0, 3]], float)
    for z in range(8):
        m.add_space(SpaceDef(f"z{z}", 100.0))
        for si in range(2):
            m.add_surface(
                SurfaceDef(f"s{z}_{si}", "wall", Boundary.outdoor(),
                           Boundary.space_(f"z{z}"), vertices=verts)
            )
        # One soil-contact face per zone: exercised by ground_hourly below.
        m.add_surface(
            SurfaceDef(f"g{z}", "wall", Boundary.ground(12.0),
                       Boundary.space_(f"z{z}"), vertices=verts)
        )
    m.add_hvac(IdealHeaterCooler(
        "tstat", [f"z{z}" for z in range(8)],
        heat_setpoint=20.0, cool_setpoint=26.0,
    ))
    tm = ThermalModel(m, n=2, config=heatx.SimConfig(dtype=np.float64))
    st = tm.initial_state()

    T = 48
    rng = np.random.default_rng(7)
    seq = tm.inputs_sequence(
        T,
        t_out=np.linspace(-3.0, 12.0, T),
        wind_speed=np.full(T, 3.0),
        sol_front=rng.uniform(0.0, 300.0, (T, tm.building.n_surfaces)),
        heat_sp=np.where(np.arange(T) % 24 < 7, 16.0, 21.0),  # night setback
    )
    # Soil temperature steps at the day boundary (constant within each
    # hours=2 kernel chunk, as run() requires).
    ground = np.where(np.arange(T) < 24, 11.0, 13.0).astype(float)

    kw = dict(block_size=4, mode="trbdf2", substeps=4, hours=2,
              collect_fluxes=True, scheduled_setpoints=True)
    fr0 = FastRunner(tm, **kw)
    mesh = sh.make_mesh(jax.devices()[:8])
    fr1 = FastRunner(tm, mesh=mesh, **kw)
    assert fr0._bb.n_blocks == 8

    run_kw = dict(collect_fluxes=True, collect_loads=True,
                  ground_hourly=ground)
    fin0, zt0, fx0, ld0 = fr0.run(st, seq, **run_kw)
    fin1, zt1, fx1, ld1 = fr1.run(st, seq, **run_kw)

    assert np.array_equal(np.asarray(zt0), np.asarray(zt1))
    assert np.array_equal(np.asarray(ld0), np.asarray(ld1))
    for k in fx0:
        assert np.array_equal(np.asarray(fx0[k]), np.asarray(fx1[k]))
    for leaf0, leaf1 in zip(fin0, fin1):
        if leaf0 is None:
            assert leaf1 is None
            continue
        assert np.array_equal(np.asarray(leaf0), np.asarray(leaf1))
    # The schedule and the ground swap actually did something: the night
    # setback must show in the load history, and the soil step must move
    # the ground-face heat flow between the two days.
    assert np.asarray(ld0).any()
    assert not np.array_equal(np.asarray(zt0)[:24], np.asarray(zt0)[24:])


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_chunk_grad_on_mesh_matches_single_device():
    """The ADJOINT day kernel shards over the mesh exactly like the
    forward (shard_day_adjoint): chunk_grad on a FastRunner(mesh=...)
    reproduces the single-device value AND every parameter/state gradient
    — multi-chip calibration, including the demand (ideal-load) cotangent
    and the compiled-thermostat-setpoint pull-back."""
    import dataclasses

    import jax.numpy as jnp

    from heatx.api import FastRunner, ThermalModel
    from heatx.model.building import (
        BuildingModel,
        Construction,
        IdealHeaterCooler,
        Material,
        SpaceDef,
        Substance,
        SurfaceDef,
    )

    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0)
    )
    m.add_material(Material("c10", "concrete", 0.1))
    m.add_construction(Construction("wall", ["c10"]))
    verts = np.array([[0, 0, 0], [4, 0, 0], [4, 0, 3], [0, 0, 3]], float)
    for z in range(8):
        m.add_space(SpaceDef(f"z{z}", 100.0))
        for si in range(3):
            m.add_surface(
                SurfaceDef(f"s{z}_{si}", "wall", Boundary.outdoor(),
                           Boundary.space_(f"z{z}"), vertices=verts)
            )
        m.add_hvac(IdealHeaterCooler(
            f"t{z}", [f"z{z}"], heat_setpoint=20.0, cool_setpoint=26.0,
            max_heating=1e4, max_cooling=1e4,
        ))
    tm = ThermalModel(m, n=1, config=heatx.SimConfig(dtype=np.float64))
    building = tm._device()
    st = tm.initial_state()
    T = 8
    rng = np.random.default_rng(17)
    seq = tm.inputs_sequence(
        T,
        t_out=np.linspace(-5.0, 4.0, T),
        wind_speed=np.full(T, 3.0),
        sol_front=rng.uniform(0.0, 300.0, (T, tm.building.n_surfaces)),
    )
    sb0 = building.surfaces

    def with_params(p):
        sb = dataclasses.replace(sb0, seg_u=sb0.seg_u * p["u"])
        return dataclasses.replace(
            building, surfaces=sb, ctl_heat_sp=building.ctl_heat_sp + p["sp"]
        )

    def loss(zt, ld, xs):
        return jnp.mean((ld / 1e3) ** 2) + 1e-3 * jnp.mean(zt)

    params = {"u": jnp.asarray(1.2), "sp": jnp.asarray(0.5)}
    zero_cot = jax.tree.map(jnp.zeros_like, st)

    kw = dict(block_size=4, mode="trbdf2", substeps=4, hours=4)
    results = []
    for mesh in (None, sh.make_mesh(jax.devices()[:8])):
        fr = FastRunner(tm, mesh=mesh, **kw)
        if mesh is not None:
            assert fr._bb.n_blocks == 8
        kf = fr.chunk_forward(with_params, loss, collect_loads=True)
        kb = fr.chunk_grad(with_params, loss, collect_loads=True)
        _, val = kf(params, st, seq)
        g, sc = kb(params, st, seq, zero_cot, jnp.asarray(1.0))
        results.append((float(val), g, sc))

    (v0, g0, sc0), (v1, g1, sc1) = results
    assert v0 > 0 and abs(v1 - v0) <= 1e-12 * abs(v0)
    for k in g0:
        a, b = float(g0[k]), float(g1[k])
        assert a != 0.0, k  # both parameters must carry signal
        assert abs(a - b) <= 1e-10 * abs(a), (k, a, b)
    for l0, l1 in zip(sc0, sc1):
        if l0 is None:
            assert l1 is None
            continue
        assert np.allclose(np.asarray(l0), np.asarray(l1), rtol=1e-12,
                           atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_chunk_grad_on_mesh_interior_mrt():
    """interior_mrt + mesh adjoint: the Carroll effective-emissivity
    cotangent operands ride the surface-lane sharding like every other
    DIFF_SURF entry, and the emissivity gradient (direct path + the
    blocking-statics chain) matches the single-device runner."""
    import dataclasses

    import jax.numpy as jnp

    from heatx.api import FastRunner, ThermalModel
    from heatx.model.building import (
        BuildingModel,
        Construction,
        Material,
        SpaceDef,
        Substance,
        SurfaceDef,
    )

    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0)
    )
    m.add_material(Material("c10", "concrete", 0.1))
    m.add_construction(Construction("wall", ["c10"]))
    verts = np.array([[0, 0, 0], [4, 0, 0], [4, 0, 3], [0, 0, 3]], float)
    for z in range(8):
        m.add_space(SpaceDef(f"z{z}", 100.0))
        for si in range(3):
            m.add_surface(
                SurfaceDef(f"s{z}_{si}", "wall", Boundary.outdoor(),
                           Boundary.space_(f"z{z}"), vertices=verts)
            )
    tm = ThermalModel(
        m, n=1, config=heatx.SimConfig(dtype=np.float64, interior_mrt=True)
    )
    building = tm._device()
    st = tm.initial_state()
    T = 4
    seq = tm.inputs_sequence(
        T, t_out=np.linspace(-4.0, 4.0, T), wind_speed=np.full(T, 3.0),
        sol_front=np.full((T, building.n_surfaces), 200.0),
    )
    sb0 = building.surfaces

    def with_params(p):
        sb = dataclasses.replace(sb0, eps_back=sb0.eps_back * p["e"])
        return dataclasses.replace(building, surfaces=sb)

    def loss(zt, xs):
        return jnp.mean(zt)

    params = {"e": jnp.asarray(0.9)}
    zero_cot = jax.tree.map(jnp.zeros_like, st)
    grads = []
    for mesh in (None, sh.make_mesh(jax.devices()[:8])):
        fr = FastRunner(tm, mesh=mesh, block_size=4, mode="trbdf2",
                        substeps=4, hours=2)
        kb = fr.chunk_grad(with_params, loss)
        g, _ = kb(params, st, seq, zero_cot, jnp.asarray(1.0))
        grads.append(float(g["e"]))
    g0, g1 = grads
    assert g0 != 0.0
    assert abs(g1 - g0) <= 1e-10 * abs(g0), (g0, g1)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_chunk_grad_on_mesh_scheduled_setpoints():
    """Mesh + scheduled setpoints + schedule_fn: the sharded adjoint's
    per-hour setpoint channels ride the block-row sharding, and the
    schedule-parameter gradient matches the single-device runner."""
    import dataclasses

    import jax.numpy as jnp

    from heatx.api import FastRunner, ThermalModel
    from heatx.model.building import (
        BuildingModel,
        Construction,
        IdealHeaterCooler,
        Material,
        SpaceDef,
        Substance,
        SurfaceDef,
    )

    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0)
    )
    m.add_material(Material("c10", "concrete", 0.1))
    m.add_construction(Construction("wall", ["c10"]))
    verts = np.array([[0, 0, 0], [4, 0, 0], [4, 0, 3], [0, 0, 3]], float)
    for z in range(8):
        m.add_space(SpaceDef(f"z{z}", 100.0))
        for si in range(2):
            m.add_surface(
                SurfaceDef(f"s{z}_{si}", "wall", Boundary.outdoor(),
                           Boundary.space_(f"z{z}"), vertices=verts)
            )
        m.add_hvac(IdealHeaterCooler(
            f"t{z}", [f"z{z}"], heat_setpoint=20.0, cool_setpoint=26.0,
            max_heating=1e4, max_cooling=1e4,
        ))
    tm = ThermalModel(m, n=1, config=heatx.SimConfig(dtype=np.float64))
    building = tm._device()
    Z = building.n_zones
    st = tm.initial_state()
    T = 4
    seq = tm.inputs_sequence(
        T, t_out=np.linspace(-6.0, 0.0, T), wind_speed=np.full(T, 3.0)
    )

    def schedule_fn(params, xs):
        sp = 16.0 + 6.0 * jax.nn.sigmoid(params["raw"])  # [T]
        return {"heat_sp": jnp.broadcast_to(sp[:, None], (T, Z))}

    apply_params = lambda p: building  # noqa: E731

    def loss(zt, ld, xs):
        return jnp.mean((ld / 1e3) ** 2) + 1e-3 * jnp.mean(zt)

    params = {"raw": jnp.asarray(np.linspace(0.5, 1.5, T))}
    zero_cot = jax.tree.map(jnp.zeros_like, st)
    grads = []
    for mesh in (None, sh.make_mesh(jax.devices()[:8])):
        fr = FastRunner(tm, mesh=mesh, block_size=2, mode="trbdf2",
                        substeps=4, hours=2, scheduled_setpoints=True)
        kb = fr.chunk_grad(apply_params, loss, collect_loads=True,
                           schedule_fn=schedule_fn)
        g, _ = kb(params, st, seq, zero_cot, jnp.asarray(1.0))
        grads.append(np.asarray(g["raw"]))
    g0, g1 = grads
    assert np.abs(g0).max() > 0, g0  # the schedule carries signal
    np.testing.assert_allclose(g1, g0, rtol=1e-10, atol=1e-14)


def fast_runner_comparison_model():
    """The 4-zone soil-contact model the 2-process DCN harness and its
    single-device reference both build (tests/test_distributed.py): one
    definition so the bit-equality comparison cannot drift."""
    from heatx.model.building import (
        BuildingModel, Construction, Material, SpaceDef, Substance,
    )

    m = BuildingModel()
    m.add_substance(Substance("c", thermal_conductivity=0.816, density=1700.,
                              specific_heat_capacity=800.))
    m.add_material(Material("c10", "c", 0.1))
    m.add_construction(Construction("w", ["c10"]))
    verts = np.array([[0, 0, 0], [4, 0, 0], [4, 0, 3], [0, 0, 3]], float)
    for z in range(4):
        m.add_space(SpaceDef(f"fz{z}", 100.0))
        for si in range(2):
            m.add_surface(SurfaceDef(
                f"fs{z}_{si}", "w", Boundary.outdoor(),
                Boundary.space_(f"fz{z}"), vertices=verts,
            ))
        m.add_surface(SurfaceDef(
            f"fg{z}", "w", Boundary.ground(12.0),
            Boundary.space_(f"fz{z}"), vertices=verts,
        ))
    return m


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_fast_runner_on_mesh_interior_mrt_operative():
    """interior_mrt physics + the in-kernel operative observable shard
    bit-exactly over the mesh (the Carroll eps rows ride the lane axis like
    every other per-surface operand, and the network is block-local because
    blocks are zone-closed), and both match the XLA integrator."""
    from heatx.api import FastRunner, ThermalModel
    from heatx.model.building import (
        BuildingModel,
        Construction,
        Material,
        SpaceDef,
        Substance,
        SurfaceDef,
    )

    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0)
    )
    m.add_material(Material("c10", "concrete", 0.1))
    m.add_construction(Construction("wall", ["c10"]))
    verts = np.array([[0, 0, 0], [4, 0, 0], [4, 0, 3], [0, 0, 3]], float)
    for z in range(8):
        m.add_space(SpaceDef(f"z{z}", 100.0))
        for si in range(3):
            m.add_surface(
                SurfaceDef(f"s{z}_{si}", "wall", Boundary.outdoor(),
                           Boundary.space_(f"z{z}"), vertices=verts)
            )
    cfg = heatx.SimConfig(
        dtype=np.float64, interior_mrt=True, nomass_fixed_iters=1
    )
    tm = ThermalModel(m, n=1, config=cfg)
    st = tm.initial_state()
    T = 8
    rng = np.random.default_rng(5)
    seq = tm.inputs_sequence(
        T, t_out=np.linspace(-3.0, 8.0, T), wind_speed=np.full(T, 3.0),
        sol_front=rng.uniform(0.0, 300.0, (T, tm.building.n_surfaces)),
        ir_front=np.full(T, 320.0),
    )
    kw = dict(block_size=4, mode="parity", hours=2, collect_operative=True)
    fr0 = FastRunner(tm, **kw)
    mesh = sh.make_mesh(jax.devices()[:8])
    fr1 = FastRunner(tm, mesh=mesh, **kw)
    fin0, zt0, top0 = fr0.run(st, seq, collect_operative=True)
    fin1, zt1, top1 = fr1.run(st, seq, collect_operative=True)
    assert np.array_equal(np.asarray(zt0), np.asarray(zt1))
    assert np.array_equal(np.asarray(top0), np.asarray(top1))
    stx, (ztx, topx) = tm.run(st, seq, collect_operative=True)
    np.testing.assert_allclose(np.asarray(zt0), np.asarray(ztx), atol=1e-9)
    np.testing.assert_allclose(np.asarray(top0), np.asarray(topx), atol=1e-9)


def test_fast_runner_mesh_update_building_matches_single():
    """update_building on the mesh runner: value-swapped operands re-pin to
    the stored block shardings and reproduce the single-device runner's
    swapped results exactly."""
    import dataclasses

    from heatx.api import ThermalModel
    from heatx.model.building import (
        BuildingModel, Construction, Material, SpaceDef, Substance,
        SurfaceDef,
    )
    from heatx.parallel.sharding import make_mesh

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0)
    )
    m.add_material(Material("c10", "concrete", 0.1))
    m.add_construction(Construction("wall", ["c10"]))
    verts = np.array([[0, 0, 0], [4, 0, 0], [4, 0, 3], [0, 0, 3]], float)
    for z in range(n_dev):
        m.add_space(SpaceDef(f"z{z}", 100.0))
        for si in range(2):
            m.add_surface(
                SurfaceDef(f"s{z}_{si}", "wall", Boundary.outdoor(),
                           Boundary.space_(f"z{z}"), vertices=verts)
            )
    tm = ThermalModel(m, n=1, config=heatx.SimConfig(dtype=np.float64))
    building = tm._device()
    b2 = dataclasses.replace(
        building,
        surfaces=dataclasses.replace(
            building.surfaces, seg_u=building.surfaces.seg_u * 1.5
        ),
    )
    st = tm.initial_state()
    seq = tm.inputs_sequence(4, t_out=-5.0, wind_speed=4.0)

    fr1 = tm.fast_runner(block_size=2, mode="trbdf2", substeps=4, hours=2,
                         interpret=True)
    fr1.update_building(b2)
    _, z1 = fr1.run(st, seq)

    frm = tm.fast_runner(block_size=2, mode="trbdf2", substeps=4, hours=2,
                         interpret=True, mesh=make_mesh())
    frm.update_building(b2)
    _, zm = frm.run(st, seq)
    np.testing.assert_array_equal(np.asarray(zm), np.asarray(z1))
    # and the swap actually changed the physics
    fr0 = tm.fast_runner(block_size=2, mode="trbdf2", substeps=4, hours=2,
                         interpret=True)
    _, z0 = fr0.run(st, seq)
    assert np.abs(np.asarray(z0) - np.asarray(z1)).max() > 1e-6
