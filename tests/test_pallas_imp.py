"""TR-BDF2 fast-mode Pallas kernel: equivalence with the XLA implicit path,
multi-hour marching, and the parity kernel's multi-hour regression."""

import jax
import jax.numpy as jnp
import numpy as np

import heatx
from heatx.build.layout import compile_building
from heatx.engine import implicit as imp_mod
from heatx.engine import state as state_mod
from heatx.engine import step as step_mod
from heatx.model.building import Boundary, SurfaceDef
from heatx.ops import pallas_step
from heatx.testing import SingleZoneOptions, TestMat, single_zone_building


def _city(n_zones=6):
    import bench as B

    return B.build_city_model(n_zones, 10)


def _compiled(model, **cfg_kw):
    cfg = heatx.SimConfig(dtype=jnp.float64, **cfg_kw)
    return compile_building(model, n=1, config=cfg)


def _gains(building):
    a = np.zeros(building.n_zones)
    np.add.at(a, np.asarray(building.hvac_pair_space), 500.0)
    np.add.at(a, np.asarray(building.lum_space), 150.0)
    return a


WEATHER = dict(
    t_out=np.array([2.0, 5.0, 8.0, 3.0]),
    ws=np.array([3.0, 4.0, 2.0, 5.0]),
    wd=np.array([0.7, 0.1, 2.0, 1.5]),
    ir=np.array([320.0, 300.0, 340.0, 310.0]),
)


def _march_xla(building, hours, solf, march):
    base = state_mod.default_inputs(building)._replace(
        hvac_power=jnp.full((building.n_hvacs,), 500.0, jnp.float64),
        lum_power=jnp.full((building.n_luminaires,), 150.0, jnp.float64),
    )
    bd = building.astype(jnp.float64)
    S = building.n_surfaces
    st = state_mod.initial_state(building)
    for h in range(hours):
        inp = base._replace(
            t_out=jnp.asarray(WEATHER["t_out"][h]),
            wind_speed=jnp.asarray(WEATHER["ws"][h]),
            wind_direction=jnp.asarray(WEATHER["wd"][h]),
            sol_front=jnp.asarray(solf[h]),
            ir_front=jnp.full((S,), WEATHER["ir"][h]),
        )
        st = march(bd, st, inp)
    return st


def _kernel_run(building, hours, substeps, solf, mode, refresh_every=None):
    bb = pallas_step.block_building(building, block_size=16)
    hm, params = pallas_step.make_hour_march(
        bb, substeps=substeps, interpret=True, mode=mode, hours=hours,
        refresh_every=refresh_every,
    )
    lay = bb.layout
    SP = lay.padded_surfaces
    st = state_mod.initial_state(building)
    T = jnp.asarray(lay.surfaces_to_blocked(np.asarray(st.node_T)))
    zT = jnp.asarray(lay.zones_to_blocked(np.asarray(st.zone_T)))
    sol_b = np.stack([lay.surfaces_to_blocked(solf[h]) for h in range(hours)])
    ag = np.stack([lay.zones_to_blocked(_gains(building))] * hours)
    hi = (
        jnp.repeat(jnp.asarray(WEATHER["t_out"][:hours]), substeps),
        jnp.repeat(jnp.asarray(WEATHER["ws"][:hours]), substeps),
        jnp.repeat(jnp.asarray(WEATHER["wd"][:hours]), substeps),
        jnp.asarray(sol_b),
        jnp.zeros((hours, SP)),
        jnp.repeat(jnp.asarray(WEATHER["ir"][:hours])[:, None], SP, 1),
        jnp.zeros((hours, SP)),
        jnp.asarray(ag),
        jnp.zeros((hours, bb.n_blocks, bb.zones_per_block)),
    )
    T, zT, _, zt_hist = hm(params, T, zT, hi)
    hist = np.stack(
        [
            np.asarray(lay.zones_from_blocked(np.asarray(zt_hist[h]), building.n_zones))
            for h in range(hours)
        ]
    )
    return (
        np.asarray(lay.zones_from_blocked(np.asarray(zT), building.n_zones)),
        np.asarray(lay.surfaces_from_blocked(np.asarray(T), building.n_surfaces)),
        hist,
    )


def test_trbdf2_kernel_matches_xla_imp_march():
    """4 hours, varying weather: the multi-hour trbdf2 kernel must reproduce
    the XLA implicit path bit-for-bit (same arithmetic, f64)."""
    building = _compiled(_city(), nomass_fixed_iters=1)
    S = building.n_surfaces
    rng = np.random.default_rng(0)
    solf = rng.uniform(0.2, 1.0, (4, S)) * 300.0

    march = jax.jit(imp_mod.imp_march, static_argnames=("substeps",))
    stx = _march_xla(building, 4, solf, lambda b, s, i: march(b, s, i, substeps=12))
    zK, TK, _ = _kernel_run(building, 4, 12, solf, "trbdf2")
    np.testing.assert_allclose(np.asarray(stx.zone_T), zK, atol=1e-12)
    np.testing.assert_allclose(np.asarray(stx.node_T), TK, atol=1e-12)


def test_parity_kernel_multi_hour_matches_xla():
    """The hours>1 generalization must not change the parity kernel's
    arithmetic: 2 kernel-marched hours == 2 sequential XLA main steps."""
    building = _compiled(_city(4), nomass_fixed_iters=2)
    S = building.n_surfaces
    rng = np.random.default_rng(1)
    solf = rng.uniform(0.2, 1.0, (2, S)) * 250.0

    march = jax.jit(step_mod.march)
    stx = _march_xla(building, 2, solf, march)
    zK, TK, _ = _kernel_run(building, 2, building.dt_subdivisions, solf, "parity")
    np.testing.assert_allclose(np.asarray(stx.zone_T), zK, atol=1e-10)
    np.testing.assert_allclose(np.asarray(stx.node_T), TK, atol=1e-10)


def test_trbdf2_kernel_accepts_while_loop_config():
    """trbdf2 mode has no no-mass fixed point, so it must not require
    nomass_fixed_iters (the parity kernel does)."""
    building = _compiled(_city(2))  # nomass_fixed_iters=None
    assert building.config.nomass_fixed_iters is None
    bb = pallas_step.block_building(building, block_size=16)
    pallas_step.make_hour_march(bb, interpret=True, mode="trbdf2")
    try:
        pallas_step.make_hour_march(bb, interpret=True, mode="parity")
    except ValueError as e:
        assert "nomass_fixed_iters" in str(e)
    else:
        raise AssertionError("parity kernel should demand nomass_fixed_iters")


def test_trbdf2_kernel_zone_history():
    """The multi-hour kernel's zone-history output carries the post-hour zone
    temperatures — one entry per marched hour, matching a sequential XLA run
    sampled after every hour."""
    building = _compiled(_city(3), nomass_fixed_iters=1)
    S = building.n_surfaces
    rng = np.random.default_rng(2)
    solf = rng.uniform(0.2, 1.0, (4, S)) * 200.0

    march = jax.jit(imp_mod.imp_march, static_argnames=("substeps",))
    base = state_mod.default_inputs(building)._replace(
        hvac_power=jnp.full((building.n_hvacs,), 500.0, jnp.float64),
        lum_power=jnp.full((building.n_luminaires,), 150.0, jnp.float64),
    )
    bd = building.astype(jnp.float64)
    st = state_mod.initial_state(building)
    expected = []
    for h in range(4):
        inp = base._replace(
            t_out=jnp.asarray(WEATHER["t_out"][h]),
            wind_speed=jnp.asarray(WEATHER["ws"][h]),
            wind_direction=jnp.asarray(WEATHER["wd"][h]),
            sol_front=jnp.asarray(solf[h]),
            ir_front=jnp.full((S,), WEATHER["ir"][h]),
        )
        st = march(bd, st, inp, substeps=6)
        expected.append(np.asarray(st.zone_T))

    _, _, hist = _kernel_run(building, 4, 6, solf, "trbdf2")
    np.testing.assert_allclose(hist, np.stack(expected), atol=1e-12)
    # the last history entry is the final state
    np.testing.assert_allclose(hist[-1], expected[-1], atol=0)


def test_trbdf2_refresh_kernel_matches_xla_refresh_march():
    """mode="trbdf2_refresh": film coefficients / cavity U / stage matrices
    re-evaluated every sub-step.  With hour-constant wind (so the XLA
    path's per-main-step wind freeze agrees with the kernel's per-sub-step
    read) the kernel must reproduce imp_march(refresh_h=True) bit-for-bit,
    and must differ measurably from the frozen-h kernel."""
    building = _compiled(_city(), nomass_fixed_iters=1)
    S = building.n_surfaces
    rng = np.random.default_rng(2)
    solf = rng.uniform(0.2, 1.0, (4, S)) * 300.0

    march = jax.jit(imp_mod.imp_march, static_argnames=("substeps", "refresh_h"))
    stx = _march_xla(
        building, 4, solf,
        lambda b, s, i: march(b, s, i, substeps=12, refresh_h=True),
    )
    zK, TK, _ = _kernel_run(building, 4, 12, solf, "trbdf2_refresh")
    np.testing.assert_allclose(np.asarray(stx.zone_T), zK, atol=1e-12)
    np.testing.assert_allclose(np.asarray(stx.node_T), TK, atol=1e-12)

    zF, _, _ = _kernel_run(building, 4, 12, solf, "trbdf2")
    assert np.abs(zF - zK).max() > 1e-6, "refresh had no effect"


def test_refresh_every_hybrid_kernel_matches_xla():
    """refresh_every=k (hybrid cadence): operators rebuild at the start of
    every group of k sub-steps.  The kernel must reproduce
    imp_march(refresh_every=k) bit-for-bit, and the hybrid trajectory must
    sit strictly between frozen (k=substeps) and full refresh (k=1)."""
    building = _compiled(_city(), nomass_fixed_iters=1)
    S = building.n_surfaces
    rng = np.random.default_rng(3)
    solf = rng.uniform(0.2, 1.0, (4, S)) * 300.0

    march = jax.jit(
        imp_mod.imp_march, static_argnames=("substeps", "refresh_every")
    )
    stx = _march_xla(
        building, 4, solf,
        lambda b, s, i: march(b, s, i, substeps=12, refresh_every=3),
    )
    zK, TK, _ = _kernel_run(building, 4, 12, solf, "trbdf2_refresh",
                            refresh_every=3)
    np.testing.assert_allclose(np.asarray(stx.zone_T), zK, atol=1e-12)
    np.testing.assert_allclose(np.asarray(stx.node_T), TK, atol=1e-12)

    zF, _, _ = _kernel_run(building, 4, 12, solf, "trbdf2")
    z1, _, _ = _kernel_run(building, 4, 12, solf, "trbdf2_refresh")
    assert np.abs(zF - zK).max() > 1e-8, "hybrid identical to frozen"
    assert np.abs(z1 - zK).max() > 1e-8, "hybrid identical to full refresh"
    # the hybrid is the better approximation of the full-refresh trajectory
    assert np.abs(z1 - zK).max() < np.abs(z1 - zF).max()


def test_refresh_every_substeps_is_frozen():
    """k=substeps freezes from the same (state, weather) as mode="trbdf2":
    the two must agree bit-for-bit, on the XLA path and in the kernel."""
    building = _compiled(_city(3), nomass_fixed_iters=1)
    S = building.n_surfaces
    rng = np.random.default_rng(4)
    solf = rng.uniform(0.2, 1.0, (2, S)) * 250.0

    march = jax.jit(
        imp_mod.imp_march, static_argnames=("substeps", "refresh_every")
    )
    st_frozen = _march_xla(
        building, 2, solf, lambda b, s, i: march(b, s, i, substeps=8)
    )
    st_k = _march_xla(
        building, 2, solf,
        lambda b, s, i: march(b, s, i, substeps=8, refresh_every=8),
    )
    np.testing.assert_array_equal(
        np.asarray(st_frozen.zone_T), np.asarray(st_k.zone_T)
    )
    np.testing.assert_array_equal(
        np.asarray(st_frozen.node_T), np.asarray(st_k.node_T)
    )

    zF, TF, _ = _kernel_run(building, 2, 8, solf, "trbdf2")
    zK, TK, _ = _kernel_run(building, 2, 8, solf, "trbdf2_refresh",
                            refresh_every=8)
    np.testing.assert_array_equal(zF, zK)
    np.testing.assert_array_equal(TF, TK)


def test_refresh_every_validation():
    """Non-dividing cadences and mode mismatches fail loudly."""
    import pytest

    building = _compiled(_city(2), nomass_fixed_iters=1)
    bb = pallas_step.block_building(building, block_size=16)
    with pytest.raises(ValueError, match="must divide"):
        pallas_step.make_hour_march(
            bb, substeps=8, interpret=True, mode="trbdf2_refresh",
            refresh_every=3,
        )
    with pytest.raises(ValueError, match="refresh_every"):
        pallas_step.make_hour_march(
            bb, substeps=8, interpret=True, mode="trbdf2", refresh_every=2
        )
    with pytest.raises(ValueError, match="must divide"):
        imp_mod.imp_march(
            building.astype(jnp.float64),
            state_mod.initial_state(building),
            state_mod.default_inputs(building),
            substeps=8,
            refresh_every=3,
        )


def test_trbdf2_refresh_kernel_cavity_matches_xla():
    """Gas-cavity (double-glazing) constructions in refresh mode: the
    cavity U re-evaluates from the marching node temperatures EVERY
    sub-step, in-kernel and on the XLA path, and the two must agree
    bit-for-bit."""
    from heatx.model.building import (
        Boundary as B2, Construction, GasSubstance, Material, Substance,
        SurfaceDef as SD2,
    )
    from test_pallas_hour import city_model

    m = city_model(3, 3)
    m.add_substance(
        Substance("glass", thermal_conductivity=1.0, density=2500.0,
                  specific_heat_capacity=840.0, solar_transmittance=0.7,
                  front_solar_absorbtance=0.1, back_solar_absorbtance=0.1,
                  front_thermal_absorbtance=0.84,
                  back_thermal_absorbtance=0.84)
    )
    m.add_substance(GasSubstance("argon", "argon"))
    m.add_material(Material("pane", "glass", 0.006))
    m.add_material(Material("gap", "argon", 0.012))
    m.add_construction(Construction("igu", ["pane", "gap", "pane"]))
    verts = np.array([[0, 0, 1], [2, 0, 1], [2, 0, 2], [0, 0, 2]], float)
    for z in range(3):
        m.add_fenestration(
            SD2(f"win{z}", "igu", B2.outdoor(), B2.space_(f"z{z}"),
                vertices=verts)
        )

    building = _compiled(m, nomass_fixed_iters=1)
    assert building.surfaces.has_cavity
    S = building.n_surfaces
    rng = np.random.default_rng(4)
    solf = rng.uniform(0.2, 1.0, (3, S)) * 250.0

    march = jax.jit(
        imp_mod.imp_march, static_argnames=("substeps", "refresh_h")
    )
    stx = _march_xla(
        building, 3, solf,
        lambda b, s, i: march(b, s, i, substeps=8, refresh_h=True),
    )
    zK, TK, _ = _kernel_run(building, 3, 8, solf, "trbdf2_refresh")
    np.testing.assert_allclose(np.asarray(stx.zone_T), zK, atol=1e-12)
    mask = np.asarray(building.surfaces.node_mask)
    np.testing.assert_allclose(
        np.asarray(stx.node_T) * mask, TK * mask, atol=1e-12
    )


def test_trbdf2_refresh_per_substep_wind_matches_kernel():
    """Per-sub-step weather series: imp_march accepts [substeps] leading
    axes on t_out AND wind_speed/wind_direction (wind matters only under
    refresh_h, where coefficients rebuild each sub-step), matching the
    fused kernel's native per-sub-step weather reads bit-for-bit."""
    building = _compiled(_city(), nomass_fixed_iters=1)
    S = building.n_surfaces
    hours, substeps = 3, 6
    rng = np.random.default_rng(3)
    solf = rng.uniform(0.2, 1.0, (hours, S)) * 300.0
    t_sub = rng.uniform(0.0, 10.0, (hours, substeps))
    ws_sub = rng.uniform(1.0, 6.0, (hours, substeps))
    wd_sub = rng.uniform(0.0, 2 * np.pi, (hours, substeps))
    ir = rng.uniform(280.0, 340.0, hours)

    base = state_mod.default_inputs(building)._replace(
        hvac_power=jnp.full((building.n_hvacs,), 500.0, jnp.float64),
        lum_power=jnp.full((building.n_luminaires,), 150.0, jnp.float64),
    )
    bd = building.astype(jnp.float64)
    march = jax.jit(
        imp_mod.imp_march, static_argnames=("substeps", "refresh_h")
    )
    st = state_mod.initial_state(building)
    for h in range(hours):
        inp = base._replace(
            t_out=jnp.asarray(t_sub[h]),
            wind_speed=jnp.asarray(ws_sub[h]),
            wind_direction=jnp.asarray(wd_sub[h]),
            sol_front=jnp.asarray(solf[h]),
            ir_front=jnp.full((S,), ir[h]),
        )
        st = march(bd, st, inp, substeps=substeps, refresh_h=True)

    bb = pallas_step.block_building(building, block_size=16)
    hm, params = pallas_step.make_hour_march(
        bb, substeps=substeps, interpret=True, mode="trbdf2_refresh",
        hours=hours,
    )
    lay = bb.layout
    SP = lay.padded_surfaces
    st0 = state_mod.initial_state(building)
    T = jnp.asarray(lay.surfaces_to_blocked(np.asarray(st0.node_T)))
    zT = jnp.asarray(lay.zones_to_blocked(np.asarray(st0.zone_T)))
    sol_b = np.stack([lay.surfaces_to_blocked(solf[h]) for h in range(hours)])
    ag = np.stack([lay.zones_to_blocked(_gains(building))] * hours)
    hi = (
        jnp.asarray(t_sub.reshape(-1)),
        jnp.asarray(ws_sub.reshape(-1)),
        jnp.asarray(wd_sub.reshape(-1)),
        jnp.asarray(sol_b),
        jnp.zeros((hours, SP)),
        jnp.repeat(jnp.asarray(ir)[:, None], SP, 1),
        jnp.zeros((hours, SP)),
        jnp.asarray(ag),
        jnp.zeros((hours, bb.n_blocks, bb.zones_per_block)),
    )
    Tk, zTk, _, _ = hm(params, T, zT, hi)
    zk = lay.zones_from_blocked(np.asarray(zTk), building.n_zones)
    Tk2 = lay.surfaces_from_blocked(np.asarray(Tk), building.n_surfaces)
    np.testing.assert_allclose(np.asarray(st.zone_T), zk, atol=1e-12)
    np.testing.assert_allclose(np.asarray(st.node_T), Tk2, atol=1e-12)
