"""High-level FastRunner (Pallas hour kernel) vs ThermalModel.march."""

import numpy as np
import pytest

import heatx
from heatx.model.building import (
    Boundary, BuildingModel, Construction, ElectricHeater, Material,
    SpaceDef, Substance, SurfaceDef,
)


def model():
    m = BuildingModel()
    m.add_substance(
        Substance("conc", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0,
                  front_thermal_absorbtance=0.9, back_thermal_absorbtance=0.9,
                  front_solar_absorbtance=0.7, back_solar_absorbtance=0.7)
    )
    m.add_material(Material("c15", "conc", 0.15))
    m.add_construction(Construction("wall", ["c15"]))
    verts = np.array([[0, 0, 0], [4, 0, 0], [4, 0, 3], [0, 0, 3]], float)
    for z in range(3):
        m.add_space(SpaceDef(f"z{z}", 120.0))
        for k in range(2):
            m.add_surface(
                SurfaceDef(f"s{z}{k}", "wall", Boundary.outdoor(),
                           Boundary.space_(f"z{z}"), vertices=verts)
            )
        m.add_hvac(ElectricHeater(f"h{z}", f"z{z}"))
    return m


def test_fast_runner_matches_march():
    cfg = heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=2)
    tm = heatx.ThermalModel(model(), n=4, config=cfg)
    fr = tm.fast_runner(block_size=8)  # auto-interprets on CPU

    st = tm.initial_state()
    inputs = tm.inputs(
        t_out=2.0,
        wind_speed=3.0,
        sol_front=np.full(6, 120.0),
        ir_front=np.full(6, 340.0),
        hvac_power=np.array([600.0, 0.0, 300.0]),
    )
    ref = tm.march(st, inputs)
    fast = fr.march(st, inputs)
    np.testing.assert_allclose(
        np.asarray(fast.zone_T), np.asarray(ref.zone_T), atol=5e-8
    )
    mask = np.asarray(tm.building.surfaces.node_mask)
    np.testing.assert_allclose(
        np.asarray(fast.node_T) * mask, np.asarray(ref.node_T) * mask, atol=5e-8
    )
    np.testing.assert_allclose(
        np.asarray(fast.h_front), np.asarray(ref.h_front), atol=5e-8
    )


def test_fast_runner_trbdf2_matches_march_imp():
    """mode="trbdf2" through the high-level runner == ThermalModel.march_imp
    (the XLA implicit fast path), same arithmetic in f64."""
    cfg = heatx.SimConfig(dtype=np.float64)
    tm = heatx.ThermalModel(model(), n=1, config=cfg)
    fr = tm.fast_runner(block_size=8, mode="trbdf2", substeps=6)

    st = tm.initial_state()
    inputs = tm.inputs(
        t_out=-3.0,
        wind_speed=4.0,
        sol_front=np.full(6, 90.0),
        ir_front=np.full(6, 320.0),
        hvac_power=np.array([600.0, 0.0, 300.0]),
    )
    ref = st
    fast = st
    for _ in range(3):
        ref = tm.march_imp(ref, inputs, substeps=6)
        fast = fr.march(fast, inputs)
    np.testing.assert_allclose(
        np.asarray(fast.zone_T), np.asarray(ref.zone_T), atol=1e-10
    )
    mask = np.asarray(tm.building.surfaces.node_mask)
    np.testing.assert_allclose(
        np.asarray(fast.node_T) * mask, np.asarray(ref.node_T) * mask, atol=1e-10
    )


def test_fast_runner_run_sequence_trbdf2():
    """FastRunner.run over a [T] input sequence (hours=4 day-chunks) ==
    hour-by-hour march_imp, including the collected zone history."""
    import jax.numpy as jnp

    cfg = heatx.SimConfig(dtype=np.float64)
    tm = heatx.ThermalModel(model(), n=1, config=cfg)
    fr = tm.fast_runner(block_size=8, mode="trbdf2", substeps=6)
    fr8 = heatx.api.FastRunner(tm, block_size=8, mode="trbdf2", substeps=6, hours=4)

    T = 8
    rng = np.random.default_rng(5)
    t_out = rng.uniform(-5, 10, T)
    wind = rng.uniform(0.5, 6, T)
    sol = rng.uniform(0, 300, (T, 6))
    hvac = rng.uniform(0, 800, (T, 3))
    inputs_seq = tm.inputs(
        t_out=t_out, wind_speed=wind, sol_front=sol,
        ir_front=np.full((T, 6), 330.0), hvac_power=hvac,
    )

    final, zone_hist = fr8.run(tm.initial_state(), inputs_seq)

    st = tm.initial_state()
    expected = []
    for h in range(T):
        inp = tm.inputs(
            t_out=t_out[h], wind_speed=wind[h], sol_front=sol[h],
            ir_front=np.full(6, 330.0), hvac_power=hvac[h],
        )
        st = tm.march_imp(st, inp, substeps=6)
        expected.append(np.asarray(st.zone_T))

    np.testing.assert_allclose(np.asarray(zone_hist), np.stack(expected), atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(final.zone_T), expected[-1], atol=1e-10
    )
    mask = np.asarray(tm.building.surfaces.node_mask)
    np.testing.assert_allclose(
        np.asarray(final.node_T) * mask, np.asarray(st.node_T) * mask, atol=1e-10
    )

    # indivisible sequence -> clear error
    bad = tm.inputs(t_out=np.zeros(6))
    try:
        fr8.run(tm.initial_state(), bad)
    except ValueError as e:
        assert "divisible" in str(e)
    else:
        raise AssertionError("expected divisibility error")


def test_run_interp_weather_moves_results():
    """interp_weather=True feeds sub-step-interpolated weather to the kernel
    (model.rs:371-374 parity); it must change results measurably when the
    hourly series has structure."""
    import jax.numpy as jnp

    tm, st, seq = _ramp_sequence()
    fr = tm.fast_runner(block_size=8, mode="trbdf2", substeps=4, interpret=True)
    _, h_const = fr.run(st, seq)
    _, h_interp = fr.run(st, seq, interp_weather=True)
    d = np.abs(np.asarray(h_const) - np.asarray(h_interp)).max()
    assert d > 0.0
    assert d < 1.0  # same physics, sub-hour shading only


def test_run_nan_injection_fails_fast_with_hour_index():
    """In-kernel finiteness (model.rs:416-419 analogue): a NaN introduced by
    the hour-2 weather must raise FloatingPointError naming that hour, from
    the per-dispatch-chunk check — BEFORE the remaining chunks run."""
    tm, st, seq = _ramp_sequence(hours=6)
    fr = tm.fast_runner(block_size=8, mode="trbdf2", substeps=4, interpret=True)
    t_out = np.asarray(seq.t_out).copy()
    t_out[2] = np.nan
    bad_seq = seq._replace(t_out=t_out)
    with pytest.raises(FloatingPointError) as ei:
        # hours=1 chunks, 1 invocation per dispatch -> the failure must
        # surface when the hour-2 chunk is checked.
        fr.run(st, bad_seq, dispatch_days=1)
    assert "hour 2" in str(ei.value), str(ei.value)
    # A clean run under the same checking passes.
    fr.run(st, seq, dispatch_days=1)


def test_run_collect_fluxes_matches_xla_channels():
    """collect_fluxes returns the reference's observable per-surface state
    channels (surface_trait.rs:223-354) per hour; they must equal the XLA
    path's post-march h/q at every hour."""
    cfg = heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=2)
    tm = heatx.ThermalModel(model(), n=1, config=cfg)
    fr = tm.fast_runner(block_size=8, collect_fluxes=True)

    T = 4
    rng = np.random.default_rng(7)
    t_out = rng.uniform(-5, 10, T)
    sol = rng.uniform(0, 300, (T, 6))
    seq = tm.inputs(
        t_out=t_out, wind_speed=np.full(T, 3.0), sol_front=sol,
        ir_front=np.full((T, 6), 330.0),
        hvac_power=rng.uniform(0, 500, (T, 3)),
    )
    final, zone_hist, fluxes = fr.run(
        tm.initial_state(), seq, collect_fluxes=True
    )
    assert set(fluxes) == {"h_front", "h_back", "q_front", "q_back"}

    st = tm.initial_state()
    for h in range(T):
        inp = tm.inputs(
            t_out=t_out[h], wind_speed=3.0, sol_front=sol[h],
            ir_front=np.full(6, 330.0),
            hvac_power=np.asarray(seq.hvac_power)[h],
        )
        st = tm.march(st, inp)
        np.testing.assert_allclose(
            fluxes["h_front"][h], np.asarray(st.h_front), atol=5e-9,
            err_msg=f"h_front hour {h}",
        )
        np.testing.assert_allclose(
            fluxes["h_back"][h], np.asarray(st.h_back), atol=5e-9
        )
        np.testing.assert_allclose(
            fluxes["q_front"][h], np.asarray(st.q_front), atol=5e-8
        )
        np.testing.assert_allclose(
            fluxes["q_back"][h], np.asarray(st.q_back), atol=5e-8
        )
    np.testing.assert_allclose(
        np.asarray(final.h_front), fluxes["h_front"][-1], atol=1e-12
    )


def _ramp_sequence(hours=6):
    import jax.numpy as jnp

    tm = heatx.ThermalModel(model(), n=1, config=heatx.SimConfig(dtype=np.float64))
    st = tm.initial_state()
    b = tm.building
    S, Z = b.n_surfaces, b.n_zones
    base = tm.inputs()
    t_out = np.linspace(-10.0, 15.0, hours)
    seq = base._replace(
        t_out=jnp.asarray(t_out),
        wind_speed=jnp.full((hours,), 3.0),
        wind_direction=jnp.zeros((hours,)),
        sol_front=jnp.zeros((hours, S)),
        sol_back=jnp.zeros((hours, S)),
        ir_front=jnp.full((hours, S), 350.0),
        ir_back=jnp.zeros((hours, S)),
        hvac_power=jnp.zeros((hours, b.n_hvacs)),
        lum_power=jnp.zeros((hours, b.n_luminaires)),
        inf_vol=jnp.zeros((hours, Z)),
        inf_temp=jnp.zeros((hours, Z)),
        inf_mask=jnp.zeros((hours, Z)),
        vent_vol=jnp.zeros((hours, Z)),
        vent_temp=jnp.zeros((hours, Z)),
        vent_mask=jnp.zeros((hours, Z)),
    )
    return tm, st, seq


def test_hourly_scalar_series_not_confused_with_surface_map():
    """Regression: a [T] per-hour scalar channel must keep its time-series
    reading in EVERY dispatch chunk, even when a chunk's hour count equals
    the surface count (the per-chunk prep once re-derived the heuristic
    from the chunk length and silently scattered the series across
    surfaces)."""
    import jax
    import jax.numpy as jnp

    tm = heatx.ThermalModel(model(), n=1, config=heatx.SimConfig(dtype=np.float64))
    b = tm.building
    S = b.n_surfaces  # 6 == the chunk hour count below
    T = 12
    ir = np.linspace(100.0, 500.0, T)
    base = tm.inputs(t_out=5.0, wind_speed=3.0)
    seq = jax.tree.map(lambda x: jnp.broadcast_to(x, (T,) + jnp.shape(x)), base)
    seq_scalar = seq._replace(ir_front=jnp.asarray(ir))          # [T] series
    seq_full = seq._replace(                                      # explicit [T, S]
        ir_front=jnp.asarray(np.broadcast_to(ir[:, None], (T, S)))
    )
    fr = tm.fast_runner(block_size=8, mode="trbdf2", substeps=4, hours=1)
    st = tm.initial_state()
    # dispatch chunks of 6 hours == 6 surfaces: the ambiguous case.
    _, zt_a = fr.run(st, seq_scalar, dispatch_days=6)
    _, zt_b = fr.run(st, seq_full, dispatch_days=6)
    np.testing.assert_array_equal(np.asarray(zt_a), np.asarray(zt_b))


def test_full_horizon_T_equals_surface_count_reads_time_series():
    """When the FULL horizon length equals n_surfaces, a 1-D channel is
    ambiguous; the time-series reading must win — the same resolution as
    the XLA path (ThermalModel.inputs_sequence) — with [1, S] as the
    explicit static-map escape hatch."""
    import jax
    import jax.numpy as jnp

    tm = heatx.ThermalModel(model(), n=1, config=heatx.SimConfig(dtype=np.float64))
    b = tm.building
    S = b.n_surfaces
    T = S  # the ambiguous horizon
    ir = np.linspace(100.0, 500.0, T)
    base = tm.inputs(t_out=5.0, wind_speed=3.0)
    seq = jax.tree.map(lambda x: jnp.broadcast_to(x, (T,) + jnp.shape(x)), base)
    seq_scalar = seq._replace(ir_front=jnp.asarray(ir))  # ambiguous [T]==[S]
    seq_full = seq._replace(                             # explicit [T, S]
        ir_front=jnp.asarray(np.broadcast_to(ir[:, None], (T, S)))
    )
    fr = tm.fast_runner(block_size=8, mode="trbdf2", substeps=4, hours=1)
    st = tm.initial_state()
    _, zt_a = fr.run(st, seq_scalar)
    _, zt_b = fr.run(st, seq_full)
    np.testing.assert_array_equal(np.asarray(zt_a), np.asarray(zt_b))

    # XLA path resolves the same ambiguity identically (series, not map).
    seq_xla = tm.inputs_sequence(T, t_out=5.0, wind_speed=3.0, ir_front=ir)
    np.testing.assert_allclose(
        np.asarray(seq_xla.ir_front), np.broadcast_to(ir[:, None], (T, S))
    )

    # The explicit [1, S] static per-surface map still works.
    amap = np.linspace(0.0, 250.0, S)
    _, zt_c = fr.run(st, seq._replace(ir_front=jnp.asarray(amap[None, :])))
    _, zt_d = fr.run(
        st, seq._replace(ir_front=jnp.asarray(np.broadcast_to(amap[None, :], (T, S))))
    )
    np.testing.assert_array_equal(np.asarray(zt_c), np.asarray(zt_d))


def test_run_ground_hourly_matches_xla_leaf_swaps():
    """FastRunner.run(ground_hourly=...) swaps the kernel's ground-contact
    boundary-temperature operands between dispatch chunks and matches the
    XLA march with ThermalModel.set_ground_temperature leaf swaps
    (seasonal EPW soil temperatures at kernel speed)."""
    m = model()
    verts = np.array([[0, 0, 0], [4, 0, 0], [4, 4, 0], [0, 4, 0]], float)
    for z in range(3):
        m.add_surface(
            SurfaceDef(f"floor{z}", "wall", Boundary.ground(10.0),
                       Boundary.space_(f"z{z}"), vertices=verts)
        )
    cfg = heatx.SimConfig(dtype=np.float64)
    tm = heatx.ThermalModel(m, n=1, config=cfg)
    fr = heatx.api.FastRunner(tm, block_size=8, mode="trbdf2", substeps=6,
                              hours=4)

    T, S = 8, 9
    rng = np.random.default_rng(11)
    t_out = rng.uniform(-5, 10, T)
    ground = np.array([6.0] * 4 + [16.0] * 4)
    seq = tm.inputs(t_out=t_out, wind_speed=2.0)
    final, zone_hist = fr.run(tm.initial_state(), seq, ground_hourly=ground)

    st = tm.initial_state()
    expected = []
    for h in range(T):
        if h % 4 == 0:
            tm.set_ground_temperature(float(ground[h]))
        st = tm.march_imp(st, tm.inputs(t_out=t_out[h], wind_speed=2.0),
                          substeps=6)
        expected.append(np.asarray(st.zone_T))
    np.testing.assert_allclose(np.asarray(zone_hist), np.stack(expected),
                               atol=1e-10)
    # The swap must actually matter: a constant-ground run differs.
    _, zh_const = fr.run(
        tm.initial_state(), seq, ground_hourly=np.full(T, 6.0)
    )
    assert np.abs(np.asarray(zh_const)[-1] - np.asarray(zone_hist)[-1]).max() > 1e-3

    # Value changing inside a kernel chunk -> clear error.
    bad = np.array([6.0] * 3 + [16.0] * 5)
    with pytest.raises(ValueError, match="constant within"):
        fr.run(tm.initial_state(), seq, ground_hourly=bad)


def test_update_building_reblocks_at_requested_block_size():
    """update_building must re-block at the REQUESTED block size, not the
    padded per-block lane total: BlockedLayout.block_size is rebound to
    SBtot after the node split, and re-blocking with SBtot as the request
    picks a DIFFERENT auto-split at scale (reproduced at 100k surfaces:
    the original 90-block (6,896)+(2,128)+(25,128) layout re-blocked at
    its own SBtot=1152 into 79 blocks of (6,1024)+(2,128)+(25,128)),
    failing every value-only parameter update with the identical-layout
    error.  Gate: a pure value change on a node-split layout updates
    cleanly, and the runner remembers the requested size."""
    import dataclasses

    import jax.numpy as jnp

    import bench as B

    tm = heatx.ThermalModel(
        B.build_city_model(50, 10), n=1,
        config=heatx.SimConfig(dtype=jnp.float64),
    )
    building = tm._device()
    fr = tm.fast_runner(block_size=256, mode="trbdf2", substeps=4, hours=1)
    assert fr._block_size == 256
    # The layout's stored block size is the padded lane total; on a
    # node-split layout it differs from the request (the bug trigger).
    assert fr._bb.layout.split is not None
    sb = dataclasses.replace(
        building.surfaces, seg_u=building.surfaces.seg_u * 1.3
    )
    fr.update_building(dataclasses.replace(building, surfaces=sb))  # no raise
