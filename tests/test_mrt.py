"""Interior longwave radiant exchange (config.interior_mrt, heatx extension).

The reference radiates every interior face against the zone AIR temperature
(surface.rs:611-640) — a non-conservative bath.  heatx's opt-in alternative
is Carroll's (1980) MRT network: each space-facing face exchanges with its
zone's mean-radiant-temperature node through an effective emissivity
(surface resistance in series with the Carroll view resistance), and the
node temperature is the balance point of the linearized conductances, so
the zone's radiant exchange sums to zero at each coefficient evaluation.
"""

import numpy as np
import pytest

import jax.numpy as jnp

import heatx
from heatx.constants import KELVIN, SIGMA
from heatx.engine import state as state_mod
from heatx.engine import step as step_mod
from heatx.engine import surface as surf_mod
from heatx.model.building import (
    Boundary,
    BuildingModel,
    Construction,
    Material,
    SpaceDef,
    Substance,
    SurfaceDef,
)

F64 = heatx.SimConfig(dtype=np.float64)
MRT = heatx.SimConfig(dtype=np.float64, interior_mrt=True)


def test_carroll_view_factors_known_values():
    """Equal areas: n faces give F = n/(n-1) (Carroll 1980)."""
    for n in (2, 3, 6):
        area = jnp.ones(n, np.float64)
        space = jnp.zeros(n, np.int32)
        part = jnp.ones(n, bool)
        F = surf_mod.carroll_view_factors(area, space, part, 1)
        np.testing.assert_allclose(np.asarray(F), n / (n - 1.0), rtol=1e-12)
    # Unequal areas still satisfy the defining fixed point (dominant face
    # comfortably under half the zone total — Carroll's validity domain;
    # at exactly half the factor diverges and the clamp takes over).
    area = jnp.asarray([1.0, 1.2, 1.5])
    F = np.asarray(
        surf_mod.carroll_view_factors(area, space[:3], part[:3], 1, iters=80)
    )
    tot = float((np.asarray(area) * F).sum())
    np.testing.assert_allclose(
        F, 1.0 / (1.0 - np.asarray(area) * F / tot), rtol=1e-9
    )
    # Non-participating faces drop out of the zone total and return F=0.
    F2 = np.asarray(
        surf_mod.carroll_view_factors(
            jnp.ones(3, np.float64), jnp.zeros(3, jnp.int32),
            jnp.asarray([True, True, False]), 1,
        )
    )
    np.testing.assert_allclose(F2[:2], 2.0, rtol=1e-12)
    assert F2[2] == 0.0


def _box_model(n_walls=4, eps=0.9, volume=600.0):
    """One zone boxed by ``n_walls`` identical concrete walls, outdoors on
    the front face, the zone on the back face."""
    m = BuildingModel()
    m.add_substance(Substance(
        "concrete", thermal_conductivity=0.816, density=1700.0,
        specific_heat_capacity=800.0,
    ))
    m.add_material(Material("c10", "concrete", 0.1))
    m.add_construction(Construction("wall", ["c10"]))
    m.add_space(SpaceDef("room", volume))
    verts = np.array([[0, 0, 0], [5, 0, 0], [5, 0, 3], [0, 0, 3]], float)
    for i in range(n_walls):
        m.add_surface(SurfaceDef(
            f"w{i}", "wall", Boundary.outdoor(), Boundary.space_("room"),
            vertices=verts,
        ))
    return m


def test_mrt_context_balances_exactly():
    """The MRT node temperature balances the linearized exchange: with the
    rad_hs the wall equations compute from the returned (rad, eps), the
    zone's area-weighted radiant flux sums to zero."""
    tm = heatx.ThermalModel(_box_model(), n=4, config=MRT)
    b = tm.building
    sb = b.surfaces
    st = tm.initial_state()
    # Perturb the surfaces so they actually disagree.
    node_T = np.asarray(st.node_T).copy()
    rng = np.random.default_rng(0)
    node_T += rng.uniform(-6.0, 6.0, node_T.shape)
    node_T = jnp.asarray(node_T)

    mf, tmf, ef, mb, tmb, eb = surf_mod.interior_mrt(
        sb, node_T, st.zone_T, b.n_zones
    )
    mb = np.asarray(mb)
    assert mb.all() and not np.asarray(mf).any()  # back faces bound the zone
    ts_b = np.asarray(surf_mod._last_node(sb, node_T))
    h = 4.0 * SIGMA * np.asarray(eb) * (
        KELVIN + (np.asarray(tmb) + ts_b) / 2.0
    ) ** 3
    flux = (np.asarray(sb.area) * h * (np.asarray(tmb) - ts_b))[mb]
    assert abs(flux.sum()) < 1e-8 * np.abs(flux).sum()
    # The MRT node sits strictly inside the surface-temperature span.
    assert ts_b.min() - 1e-9 <= np.asarray(tmb)[0] <= ts_b.max() + 1e-9


def test_mrt_couples_hot_and_cold_walls():
    """The discriminating experiment: a zone whose two walls face 60 C and
    0 C ambients, interior films pinned to ~0 so the only interior coupling
    is RADIATION and the zone air is inert (B ~ 0 holds it at 22 C, the
    reference's degenerate-ODE rule).

    * Air-bath (the reference's model): both interior faces radiate against
      the frozen 22 C air — the walls never talk to each other.
    * MRT: the faces exchange with their common radiant node, which sits at
      the conductance-weighted mean of the two faces (ABOVE 22 here), so
      BOTH inside faces end warmer than the air-bath run, and the heat
      actually crossing the zone into the cold wall increases.
    """
    m = BuildingModel()
    m.add_substance(Substance(
        "concrete", thermal_conductivity=0.816, density=1700.0,
        specific_heat_capacity=800.0,
    ))
    m.add_material(Material("c10", "concrete", 0.1))
    m.add_construction(Construction("wall", ["c10"]))
    m.add_space(SpaceDef("room", 100.0))
    verts = np.array([[0, 0, 0], [5, 0, 0], [5, 0, 3], [0, 0, 3]], float)
    m.add_surface(SurfaceDef(
        "hot", "wall", Boundary.ambient(60.0), Boundary.space_("room"),
        vertices=verts,
    ))
    m.add_surface(SurfaceDef(
        "cold", "wall", Boundary.ambient(0.0), Boundary.space_("room"),
        vertices=verts,
    ))

    def run(cfg):
        tm = heatx.ThermalModel(m, n=4, config=cfg)
        tm.building.set_fixed_h(back=0.0)  # interior film off
        tm.invalidate()
        st = tm.initial_state()
        inp = tm.inputs(t_out=20.0, wind_speed=0.0)
        for _ in range(24 * 6 * 4):
            st = tm.march(st, inp)
        return tm, st

    tm_air, st_air = run(F64)
    tm_mrt, st_mrt = run(MRT)
    b = tm_mrt.building
    in_air = np.asarray(surf_mod._last_node(b.surfaces, st_air.node_T))
    in_mrt = np.asarray(surf_mod._last_node(b.surfaces, st_mrt.node_T))
    # Zone air held at its initial 22 C in both runs (B ~ 0 rule).
    assert abs(float(st_air.zone_T[0]) - 22.0) < 1e-6
    assert abs(float(st_mrt.zone_T[0]) - 22.0) < 1e-6
    # The radiant node sits above the frozen 22 C bath, so both faces warm.
    assert in_mrt[0] > in_air[0] + 0.3
    assert in_mrt[1] > in_air[1] + 0.3
    # Conservation at the final state: the hot face's linearized radiant
    # loss equals the cold face's gain (the air-bath books these against
    # an infinite reservoir instead).
    mf, tmf, ef, mb, tmb, eb = surf_mod.interior_mrt(
        b.surfaces, st_mrt.node_T, st_mrt.zone_T, b.n_zones
    )
    h = 4.0 * SIGMA * np.asarray(eb) * (
        KELVIN + (np.asarray(tmb) + in_mrt) / 2.0
    ) ** 3
    flux = np.asarray(b.surfaces.area) * h * (np.asarray(tmb) - in_mrt)
    assert abs(flux.sum()) < 1e-9 * np.abs(flux).sum() + 1e-12
    assert flux[1] > 1.0  # real watts flow into the cold wall
    # More heat crosses the zone with the radiant path in place: the cold
    # wall conducts more to its 0 C ambient than under the air bath.
    q_air = float(st_air.q_front[1])
    q_mrt = float(st_mrt.q_front[1])
    assert q_mrt > q_air + 0.1


def test_mrt_skips_singleton_and_zero_eps_zones():
    """A zone with a single participating face keeps the air-bath behavior
    (bit-identical to interior_mrt=False), as does an eps=0 model."""
    m = _box_model(n_walls=1)
    tm_off = heatx.ThermalModel(m, n=4, config=F64)
    tm_on = heatx.ThermalModel(m, n=4, config=MRT)
    st0 = tm_off.initial_state()
    inp = tm_off.inputs(t_out=-5.0, wind_speed=3.0, ir_front=300.0)
    a, b_ = st0, st0
    for _ in range(48):
        a = tm_off.march(a, inp)
        b_ = tm_on.march(b_, inp)
    np.testing.assert_array_equal(np.asarray(a.node_T), np.asarray(b_.node_T))
    np.testing.assert_array_equal(np.asarray(a.zone_T), np.asarray(b_.zone_T))


def test_mrt_on_fast_integrators():
    """TR-BDF2 and exponential fast modes apply the same MRT coefficients
    (frozen per main step): both move the inside faces the same direction
    as the parity march and stay within the usual coefficient-freeze drift."""
    from heatx.engine.exponential import exp_march
    from heatx.engine.implicit import imp_march

    m = _box_model()
    sol = np.array([500.0, 0.0, 0.0, 0.0])
    tm = heatx.ThermalModel(m, n=1, config=MRT)
    b = tm.building
    st0 = tm.initial_state()
    inp = tm.inputs(
        t_out=10.0, wind_speed=2.0, sol_front=sol,
        ir_front=SIGMA * (KELVIN + 10.0) ** 4,
    )

    sts = {"parity": st0, "imp": st0, "exp": st0}
    import jax

    march_imp = jax.jit(lambda s: imp_march(b, s, inp, 8))
    march_exp = jax.jit(lambda s: exp_march(b, s, inp, 8))
    march_par = jax.jit(lambda s: step_mod.march(b, s, inp))
    for _ in range(48):
        sts["parity"] = march_par(sts["parity"])
        sts["imp"] = march_imp(sts["imp"])
        sts["exp"] = march_exp(sts["exp"])
    ref = np.asarray(surf_mod._last_node(b.surfaces, sts["parity"].node_T))
    for k in ("imp", "exp"):
        got = np.asarray(surf_mod._last_node(b.surfaces, sts[k].node_T))
        np.testing.assert_allclose(got, ref, atol=0.5)
        assert got[0] == got.max()  # sun-struck face stays the hottest


def test_zone_mrt_and_operative_observables():
    """zone_mrt / run(collect_operative=True) report the comfort MRT and
    operative temperature regardless of the physics flag: the MRT sits
    inside the span of the zone's inside-face temperatures, the operative
    temperature is the air/MRT mean, and a singleton zone reports air."""
    tm = heatx.ThermalModel(_box_model(), n=1, config=F64)
    T = 48
    sol = np.zeros((T, 4))
    sol[:, 0] = 400.0
    seq = tm.inputs_sequence(
        T, t_out=-5.0, wind_speed=3.0, sol_front=sol,
        ir_front=SIGMA * (KELVIN - 5.0) ** 4,
    )
    st, hist = tm.run(tm.initial_state(), seq, collect_operative=True)
    zt, top = (np.asarray(h) for h in hist)
    assert zt.shape == top.shape == (T, 1)
    mrt_final = float(tm.zone_mrt(st)[0])
    faces = np.asarray(surf_mod._last_node(tm.building.surfaces, st.node_T))
    assert faces.min() - 1e-9 <= mrt_final <= faces.max() + 1e-9
    np.testing.assert_allclose(
        top[-1, 0], (float(st.zone_T[0]) + mrt_final) / 2.0, rtol=1e-12
    )
    # The radiant environment differs measurably from the air node (three
    # outdoor-losing faces pull MRT below air in this cold-sky setup).
    assert abs(top[-1, 0] - zt[-1, 0]) > 0.05
    # With loads collection the operative history rides third.
    from heatx.model.building import IdealHeaterCooler

    m2 = _box_model()
    m2.add_hvac(IdealHeaterCooler("t", ["room"], heat_setpoint=20.0))
    tm2 = heatx.ThermalModel(m2, n=1, config=F64)
    seq2 = tm2.inputs_sequence(8, t_out=-5.0, wind_speed=3.0)
    _, (zt2, loads2, top2) = tm2.run(
        tm2.initial_state(), seq2, collect_loads=True, collect_operative=True
    )
    assert np.asarray(loads2).shape == np.asarray(top2).shape == (8, 1)
    # Singleton zone: MRT falls back to the air temperature.
    tm1 = heatx.ThermalModel(_box_model(n_walls=1), n=1, config=F64)
    st1 = tm1.initial_state()
    np.testing.assert_allclose(
        np.asarray(tm1.zone_mrt(st1)), np.asarray(st1.zone_T), rtol=0, atol=0
    )


def _two_zone_model():
    """Two zones x (2 massive + 1 mixed) outdoor walls + a massive partition
    between them: multiple participating faces per zone, two node heights
    (exercises the kernel's node-split parts), and a both-sides-participating
    face (the partition)."""
    m = BuildingModel()
    m.add_substance(Substance(
        "concrete", thermal_conductivity=0.816, density=1700.0,
        specific_heat_capacity=800.0,
    ))
    m.add_substance(Substance(
        "poly", thermal_conductivity=0.0252, density=17.5,
        specific_heat_capacity=2400.0,
    ))
    m.add_material(Material("c15", "concrete", 0.15))
    m.add_material(Material("p2", "poly", 0.02))
    m.add_construction(Construction("wall", ["c15"]))
    m.add_construction(Construction("mixed", ["p2", "c15"]))
    verts = np.array([[0, 0, 0], [5, 0, 0], [5, 0, 3], [0, 0, 3]], float)
    for z in range(2):
        m.add_space(SpaceDef(f"z{z}", 200.0 + 50.0 * z))
        for i, kind in enumerate(("wall", "wall", "mixed")):
            m.add_surface(SurfaceDef(
                f"s{z}_{i}", kind, Boundary.outdoor(),
                Boundary.space_(f"z{z}"), vertices=verts,
            ))
    m.add_surface(SurfaceDef(
        "partition", "wall", Boundary.space_("z0"), Boundary.space_("z1"),
        vertices=verts,
    ))
    return m


def _kernel_vs_xla(mode, xla_march, substeps=None, atol=1e-10, hours=3):
    """March ``hours`` varying-weather hours through the fused kernel
    (interpret, f64, interior_mrt) and the matching XLA integrator;
    assert node/zone temperatures agree."""
    import jax

    from heatx.build.layout import compile_building
    from heatx.ops import pallas_step

    cfg = heatx.SimConfig(
        dtype=np.float64, interior_mrt=True, nomass_fixed_iters=2
    )
    b = compile_building(_two_zone_model(), n=1, config=cfg).astype(np.float64)
    S = b.n_surfaces
    sub = substeps or b.dt_subdivisions
    t_out = np.array([-3.0, 2.0, 6.0])[:hours]
    ws = np.array([3.0, 1.0, 5.0])[:hours]
    rng = np.random.default_rng(7)
    solf = rng.uniform(0.0, 1.0, (hours, S)) * 350.0
    ir = SIGMA * (KELVIN + t_out - 15.0) ** 4

    st = state_mod.initial_state(b)
    base = state_mod.default_inputs(b)
    march = jax.jit(xla_march)
    for h in range(hours):
        inp = base._replace(
            t_out=jnp.asarray(t_out[h]), wind_speed=jnp.asarray(ws[h]),
            sol_front=jnp.asarray(solf[h]),
            ir_front=jnp.full((S,), ir[h]),
        )
        st = march(b, st, inp)

    bb = pallas_step.block_building(b, block_size=8)
    assert bb.mrt_eps is not None and np.asarray(bb.mrt_eps[0]).max() > 0
    hm, params = pallas_step.make_hour_march(
        bb, substeps=sub, interpret=True, mode=mode, hours=hours
    )
    lay = bb.layout
    SP = lay.padded_surfaces
    st0 = state_mod.initial_state(b)
    T = jnp.asarray(lay.surfaces_to_blocked(np.asarray(st0.node_T)))
    zT = jnp.asarray(lay.zones_to_blocked(np.asarray(st0.zone_T)))
    az = jnp.zeros((hours, bb.n_blocks, bb.zones_per_block))
    hi = (
        jnp.repeat(jnp.asarray(t_out), sub),
        jnp.repeat(jnp.asarray(ws), sub),
        jnp.zeros((hours * sub,)),
        jnp.asarray(np.stack([lay.surfaces_to_blocked(solf[h]) for h in range(hours)])),
        jnp.zeros((hours, SP)),
        jnp.asarray(np.repeat(ir[:, None], SP, 1)),
        jnp.zeros((hours, SP)),
        az, az,
    )
    Tk, zTk, _, _ = hm(params, T, zT, hi)
    np.testing.assert_allclose(
        np.asarray(lay.zones_from_blocked(np.asarray(zTk), b.n_zones)),
        np.asarray(st.zone_T), atol=atol,
    )
    np.testing.assert_allclose(
        np.asarray(lay.surfaces_from_blocked(np.asarray(Tk), S)),
        np.asarray(st.node_T), atol=atol,
    )
    return b, bb


def test_mrt_kernel_statics_match_xla():
    """block_building's host-side Carroll statics equal the XLA path's
    (participation-filtered effective emissivities), blocked layout-wise."""
    from heatx.build.layout import compile_building
    from heatx.ops import pallas_step

    b = compile_building(_two_zone_model(), n=1, config=MRT).astype(np.float64)
    st = state_mod.initial_state(b)
    _, _, eps_eff, _, _, _ = surf_mod._mrt_solve(
        b.surfaces, st.node_T, st.zone_T, b.n_zones
    )
    S = b.n_surfaces
    bb = pallas_step.block_building(b, block_size=8)
    lay = bb.layout
    np.testing.assert_allclose(
        np.asarray(bb.mrt_eps[0]),
        lay.surfaces_to_blocked(np.asarray(eps_eff[:S])), atol=1e-12,
    )
    np.testing.assert_allclose(
        np.asarray(bb.mrt_eps[1]),
        lay.surfaces_to_blocked(np.asarray(eps_eff[S:])), atol=1e-12,
    )
    # The partition participates on BOTH faces; outdoor fronts on neither.
    assert (np.asarray(bb.mrt_eps[0]) > 0).sum() == 1  # partition front
    assert (np.asarray(bb.mrt_eps[1]) > 0).sum() == S  # every back face


def test_mrt_kernel_matches_xla_parity():
    """The parity hour kernel under config.interior_mrt reproduces the XLA
    sub-step path (same 4-iteration linearized fixed point, f64)."""
    _kernel_vs_xla("parity", step_mod.march, atol=1e-9)


def test_mrt_kernel_matches_xla_trbdf2():
    """The TR-BDF2 kernel freezes the MRT context with the other
    coefficients, like implicit.build_operators."""
    from heatx.engine import implicit as imp_mod

    _kernel_vs_xla(
        "trbdf2",
        lambda b, s, i: imp_mod.imp_march(b, s, i, substeps=8),
        substeps=8, atol=1e-11,
    )


def test_fast_runner_collect_operative():
    """FastRunner.run(collect_operative=True): the in-kernel hour-boundary
    Carroll MRT solve reproduces the XLA run(collect_operative=True)
    history (no interior_mrt physics — observable only)."""
    from heatx.api import FastRunner

    tm = heatx.ThermalModel(
        _two_zone_model(), n=1,
        config=heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=2),
    )
    T = 6
    rng = np.random.default_rng(3)
    solf = rng.uniform(0.0, 1.0, (T, tm.building.n_surfaces)) * 300.0
    seq = tm.inputs_sequence(
        T, t_out=np.linspace(-5.0, 5.0, T), wind_speed=np.full(T, 3.0),
        sol_front=solf, ir_front=np.full(T, 320.0),
    )
    st, (zt, top) = tm.run(tm.initial_state(), seq, collect_operative=True)

    fr = FastRunner(tm, block_size=8, hours=3, collect_operative=True)
    stk, ztk, topk = fr.run(
        tm.initial_state(), seq, collect_operative=True
    )
    np.testing.assert_allclose(np.asarray(ztk), np.asarray(zt), atol=1e-9)
    np.testing.assert_allclose(np.asarray(topk), np.asarray(top), atol=1e-9)
    # Radiant environment measurably differs from air in this cold setup.
    assert np.abs(np.asarray(topk) - np.asarray(ztk)).max() > 0.01
    # Per-call flag demands the construction-time one.
    with pytest.raises(ValueError, match="collect_operative=True"):
        FastRunner(tm, block_size=8).run(
            tm.initial_state(), seq, collect_operative=True
        )


def test_mrt_kernel_matches_xla_trbdf2_refresh():
    """Refresh mode re-evaluates the MRT network every sub-step, like the
    XLA refresh path (build_operators per sub-step)."""
    from heatx.engine import implicit as imp_mod

    _kernel_vs_xla(
        "trbdf2_refresh",
        lambda b, s, i: imp_mod.imp_march(b, s, i, substeps=8, refresh_h=True),
        substeps=8, atol=1e-11,
    )


def test_fast_runner_march_loads_with_operative():
    """FastRunner.march seeds SimState.ideal_load from the LOADS output even
    when the runner also collects the operative history (the operative
    output rides after the loads in the kernel outputs)."""
    from heatx.api import FastRunner
    from heatx.model.building import IdealHeaterCooler

    m = _two_zone_model()
    # Heating setpoint above the 22 C initialization so the very first hour
    # demands real power.
    m.add_hvac(IdealHeaterCooler("t", ["z0", "z1"], heat_setpoint=25.0,
                                 cool_setpoint=28.0))
    tm = heatx.ThermalModel(
        m, n=1,
        config=heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=1),
    )
    inp = tm.inputs(t_out=-10.0, wind_speed=3.0)
    st0 = tm.initial_state()
    fr_plain = FastRunner(tm, block_size=8, mode="trbdf2", substeps=4)
    fr_op = FastRunner(tm, block_size=8, mode="trbdf2", substeps=4,
                       collect_operative=True)
    ld_plain = np.asarray(fr_plain.march(st0, inp).ideal_load)
    ld_op = np.asarray(fr_op.march(st0, inp).ideal_load)
    np.testing.assert_allclose(ld_op, ld_plain, rtol=0, atol=0)
    assert ld_plain.max() > 50.0  # real heating W, not a temperature
