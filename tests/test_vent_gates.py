"""In-run ventilation temperature gates (heatx extension; EnergyPlus's
ZoneVentilation:DesignFlowRate limit fields — Minimum/Maximum Indoor
Temperature, Delta Temperature, Minimum/Maximum Outdoor Temperature,
Maximum Wind Speed).  A host-side ventilation series cannot express the
indoor gates — they read the MARCHING zone temperature — so the control
runs inside the compiled scan: each main step starts by masking each
controlled zone's ventilation channel off unless every gate passes,
evaluated from the previous step's zone temperature (EnergyPlus's own
previous-timestep control convention) and the step-mean outdoor
conditions.

Contracts:
* a default-constructed control (EnergyPlus's no-op limits) is
  bit-identical to the uncontrolled building, on every XLA integrator;
* an always-failing gate is bit-identical to masking the ventilation
  channel off;
* dynamic gating (min_indoor / delta crossings) matches a host loop
  applying the rule by hand, bit-for-bit;
* the whole-run scan matches the host loop of marches;
* sharded march stays bit-equal to single-device;
* infiltration is never gated;
* the kernel engine (FastRunner) applies the gates in-kernel, bit-equal to
  the XLA integrators (and to its own sharded variant).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import heatx
from heatx.build.layout import compile_building
from heatx.engine import state as state_mod
from heatx.engine import step as step_mod
from heatx.engine.exponential import exp_march
from heatx.engine.implicit import imp_march
from heatx.model.building import ZoneVentilationControl
from heatx.testing import SingleZoneOptions, TestMat, single_zone_building

VENT = 0.02  # m3/s


def _model(ctl=None):
    opts = SingleZoneOptions(construction=[TestMat.concrete(0.15)])
    m = single_zone_building(opts)
    if ctl is not None:
        m.add_vent_control(ctl)
    return m


def _compile(m):
    cfg = heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1)
    return compile_building(m, n=1, config=cfg).astype(jnp.float64)


def _inputs(b, t_out=0.0, wind=2.0, sol=0.0, vent=True):
    # Ambient blackbody IR: without it the zero-IR default is a 0 K sky
    # whose radiative sink drags the zone below ambient and inverts the
    # sign of the ventilation effect.
    ir = 5.670374419e-8 * (273.15 + t_out) ** 4
    return state_mod.default_inputs(
        b,
        t_out=t_out,
        wind_speed=wind,
        ir_front=np.full(b.n_surfaces, ir),
        ir_back=np.full(b.n_surfaces, ir),
        sol_front=np.full(b.n_surfaces, sol),
        vent_vol=np.full(b.n_zones, VENT),
        vent_temp=np.full(b.n_zones, t_out),
        vent_mask=np.full(b.n_zones, bool(vent)),
        inf_vol=np.full(b.n_zones, 0.005),
        inf_temp=np.full(b.n_zones, t_out),
        inf_mask=np.ones(b.n_zones, bool),
    )


_MARCHES = {
    "parity": step_mod.march,
    "trbdf2": partial(imp_march, substeps=6),
    "trbdf2_refresh": partial(imp_march, substeps=6, refresh_h=True),
    "exp": partial(exp_march, substeps=6),
}


def test_compile_lowers_gate_arrays():
    b = _compile(_model(ZoneVentilationControl(
        "Space", min_indoor=16.0, max_indoor=28.0, delta=2.0,
        min_outdoor=-5.0, max_outdoor=30.0, max_wind=10.0,
    )))
    assert b.has_vent_gates
    np.testing.assert_allclose(np.asarray(b.vent_min_tin), [16.0])
    np.testing.assert_allclose(np.asarray(b.vent_max_tin), [28.0])
    np.testing.assert_allclose(np.asarray(b.vent_delta), [2.0])
    np.testing.assert_allclose(np.asarray(b.vent_min_tout), [-5.0])
    np.testing.assert_allclose(np.asarray(b.vent_max_tout), [30.0])
    np.testing.assert_allclose(np.asarray(b.vent_max_wind), [10.0])

    b0 = _compile(_model())
    assert not b0.has_vent_gates
    # Uncontrolled zones compile EnergyPlus's no-op limits.
    np.testing.assert_allclose(np.asarray(b0.vent_min_tin), [-100.0])
    np.testing.assert_allclose(np.asarray(b0.vent_max_wind), [40.0])

    with pytest.raises(ValueError, match="min_indoor"):
        _model().add_vent_control(
            ZoneVentilationControl("Space", min_indoor=25.0, max_indoor=20.0)
        )
    with pytest.raises(ValueError, match="min_outdoor"):
        _model().add_vent_control(
            ZoneVentilationControl("Space", min_outdoor=35.0, max_outdoor=30.0)
        )
    dup = _model(ZoneVentilationControl("Space", min_indoor=16.0))
    with pytest.raises(ValueError, match="already has"):
        dup.add_vent_control(ZoneVentilationControl("Space"))


@pytest.mark.parametrize("mode", list(_MARCHES))
def test_noop_and_blocking_limits_bracket(mode):
    """Default limits == uncontrolled (bit-exact); an always-failing gate
    (max_wind=0) == the vent channel masked off — per integrator."""
    march = jax.jit(_MARCHES[mode])
    b_noop = _compile(_model(ZoneVentilationControl("Space")))
    b_block = _compile(_model(ZoneVentilationControl("Space", max_wind=0.0)))
    b_plain = _compile(_model())
    st = state_mod.initial_state(b_plain)

    s_noop, s_block, s_plain, s_masked = st, st, st, st
    for _ in range(12):
        s_noop = march(b_noop, s_noop, _inputs(b_noop))
        s_block = march(b_block, s_block, _inputs(b_block))
        s_plain = march(b_plain, s_plain, _inputs(b_plain))
        s_masked = march(b_plain, s_masked, _inputs(b_plain, vent=False))
    np.testing.assert_array_equal(
        np.asarray(s_noop.zone_T), np.asarray(s_plain.zone_T)
    )
    np.testing.assert_array_equal(
        np.asarray(s_noop.node_T), np.asarray(s_plain.node_T)
    )
    np.testing.assert_array_equal(
        np.asarray(s_block.zone_T), np.asarray(s_masked.zone_T)
    )
    np.testing.assert_array_equal(
        np.asarray(s_block.node_T), np.asarray(s_masked.node_T)
    )
    # The ventilation channel genuinely matters in this scenario.
    assert float(s_block.zone_T[0]) > float(s_plain.zone_T[0]) + 0.2


def _host_gate(ctl, zT, t_out, wind):
    return (
        zT > ctl.min_indoor
        and zT < ctl.max_indoor
        and (zT - t_out) > ctl.delta
        and t_out > ctl.min_outdoor
        and t_out < ctl.max_outdoor
        and wind < ctl.max_wind
    )


@pytest.mark.parametrize("mode", ["parity", "trbdf2"])
def test_min_indoor_crossing_matches_host_rule(mode):
    """Cold-air ventilation pulls the zone down through min_indoor; the
    in-run gate must match a host loop applying the previous-timestep
    rule by hand — and the trajectory must actually cross the limit."""
    march = jax.jit(_MARCHES[mode])
    ctl = ZoneVentilationControl("Space", min_indoor=16.0)
    b = _compile(_model(ctl))
    b_plain = _compile(_model())
    st = state_mod.initial_state(b)

    T = 40
    s_ctl, s_host, s_un = st, st, st
    gated = 0
    max_gap = 0.0
    for _ in range(T):
        s_ctl = march(b, s_ctl, _inputs(b, t_out=0.0))
        on = _host_gate(ctl, float(s_host.zone_T[0]), 0.0, 2.0)
        gated += not on
        s_host = march(b_plain, s_host, _inputs(b_plain, t_out=0.0, vent=on))
        s_un = march(b_plain, s_un, _inputs(b_plain, t_out=0.0))
        max_gap = max(
            max_gap, float(s_ctl.zone_T[0]) - float(s_un.zone_T[0])
        )
    assert 0 < gated < T  # the gate actually toggled
    np.testing.assert_array_equal(
        np.asarray(s_ctl.zone_T), np.asarray(s_host.zone_T)
    )
    np.testing.assert_array_equal(
        np.asarray(s_ctl.node_T), np.asarray(s_host.node_T)
    )
    # And the gate genuinely held the zone warmer than ungated venting
    # somewhere along the trajectory (both settle toward t_out at the
    # end, so compare the peak gap, not the final state).
    assert max_gap > 0.2


def test_delta_gate_free_cooling():
    """delta > 0 admits outdoor air only while the zone is warmer than
    outdoors by that margin: with T_zone - T_out below the margin the
    channel is off (== masked), above it on (== uncontrolled)."""
    march = jax.jit(step_mod.march)
    ctl = ZoneVentilationControl("Space", delta=2.0)
    b = _compile(_model(ctl))
    b_plain = _compile(_model())
    st = state_mod.initial_state(b)  # zone starts near 22 C

    # Outdoor warmer than the zone: gate fails from step one.
    warm = march(b, st, _inputs(b, t_out=30.0))
    warm_ref = march(b_plain, st, _inputs(b_plain, t_out=30.0, vent=False))
    np.testing.assert_array_equal(
        np.asarray(warm.zone_T), np.asarray(warm_ref.zone_T)
    )
    # Outdoor well below the zone: gate passes (first step).
    cool = march(b, st, _inputs(b, t_out=10.0))
    cool_ref = march(b_plain, st, _inputs(b_plain, t_out=10.0))
    np.testing.assert_array_equal(
        np.asarray(cool.zone_T), np.asarray(cool_ref.zone_T)
    )


def test_run_scan_matches_host_loop():
    """The whole-sequence scan carries the gate state exactly like a
    host loop of march calls."""
    ctl = ZoneVentilationControl("Space", min_indoor=16.0)
    b = _compile(_model(ctl))
    st = state_mod.initial_state(b)
    T = 32
    one = _inputs(b, t_out=0.0)
    seq = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (T,) + jnp.shape(x)), one
    )
    final, hist = jax.jit(step_mod.run)(b, st, seq)
    s = st
    host = []
    march = jax.jit(step_mod.march)
    for _ in range(T):
        s = march(b, s, one)
        host.append(np.asarray(s.zone_T))
    np.testing.assert_array_equal(np.asarray(hist), np.stack(host))
    np.testing.assert_array_equal(
        np.asarray(final.zone_T), np.asarray(s.zone_T)
    )


def test_infiltration_not_gated():
    """An always-failing gate kills ventilation but leaves infiltration:
    the gated building must equal (vent off, infiltration ON), not
    (both off)."""
    march = jax.jit(step_mod.march)
    b = _compile(_model(ZoneVentilationControl("Space", max_wind=0.0)))
    b_plain = _compile(_model())
    st = state_mod.initial_state(b)
    s_ctl = march(b, st, _inputs(b, t_out=0.0))
    inp_no_both = _inputs(b_plain, t_out=0.0, vent=False)._replace(
        inf_mask=jnp.zeros((1,), bool)
    )
    s_none = march(b_plain, st, inp_no_both)
    s_inf = march(b_plain, st, _inputs(b_plain, t_out=0.0, vent=False))
    np.testing.assert_array_equal(
        np.asarray(s_ctl.zone_T), np.asarray(s_inf.zone_T)
    )
    assert not np.array_equal(
        np.asarray(s_ctl.zone_T), np.asarray(s_none.zone_T)
    )


def test_sharded_march_bit_equal():
    """The gate arrays are [Z] (replicated over the surface-axis mesh):
    sharded == single-device bit-exact."""
    from heatx.parallel.sharding import make_mesh, make_sharded_march
    from heatx.parallel.sharding import shard_inputs, shard_state

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs >= 2 devices")
    cfg = heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1)
    mesh = make_mesh()
    # One gate that passes at the start state (min_indoor=16 < 22 C) and
    # one that fails (max_indoor=16): both must shard bit-exactly.
    for ctl in (
        ZoneVentilationControl("Space", min_indoor=16.0),
        ZoneVentilationControl("Space", max_indoor=16.0),
    ):
        b = compile_building(
            _model(ctl), n=1, config=cfg, pad_surfaces_to=n_dev
        ).astype(jnp.float64)
        st = state_mod.initial_state(b)
        one = _inputs(b, t_out=0.0)
        sh = make_sharded_march(b, mesh, mode="parity")(
            shard_state(st, mesh), shard_inputs(one, mesh)
        )
        un = jax.jit(step_mod.march)(b, st, one)
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(sh.zone_T)), np.asarray(un.zone_T)
        )
        # GSPMD may reassociate per-surface fmas: allow ~1 ulp on nodes.
        np.testing.assert_allclose(
            np.asarray(jax.device_get(sh.node_T)),
            np.asarray(un.node_T), rtol=1e-13,
        )


def _fast_seq(tm, T=48):
    """A 48 h sequence whose gates toggle: cold nights / warm days with
    steady cold-air ventilation."""
    b = tm.building
    t_out = 8.0 + 14.0 * np.sin(np.arange(T) / 24 * 2 * np.pi)  # [-6, 22] C
    ir = 5.670374419e-8 * (273.15 + t_out) ** 4
    return tm.inputs_sequence(
        T, t_out=t_out, wind_speed=2.0,
        ir_front=np.broadcast_to(ir[:, None], (T, b.n_surfaces)),
        ir_back=np.broadcast_to(ir[:, None], (T, b.n_surfaces)),
        vent_vol=np.full(b.n_zones, VENT),
        vent_temp=t_out[:, None] * np.ones((1, b.n_zones)),
        vent_mask=np.ones(b.n_zones, bool),
        inf_vol=np.full(b.n_zones, 0.005),
        inf_temp=t_out[:, None] * np.ones((1, b.n_zones)),
        inf_mask=np.ones(b.n_zones, bool),
    )


@pytest.mark.parametrize("mode", ["parity", "trbdf2"])
def test_fused_kernel_matches_xla(mode):
    """The in-run gates inside the Pallas day kernel: the carry zone
    temperature gates the hour's ventilation A/B terms each main step,
    matching the XLA integrators through a run whose min-indoor gate
    toggles dynamically."""
    cfg = heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1)
    ctl = ZoneVentilationControl("Space", min_indoor=15.0)
    tm = heatx.ThermalModel(_model(ctl), n=1, config=cfg)
    seq = _fast_seq(tm)
    st0 = tm.initial_state()
    kw = dict(substeps=6) if mode != "parity" else {}
    _, zx = tm.run(st0, seq, mode=mode, **kw)
    fr = tm.fast_runner(block_size=8, mode=mode, hours=4, interpret=True,
                        **kw)
    _, zk = fr.run(st0, seq)
    # The run must actually exercise BOTH branches of the gate.
    on = np.asarray(zx) > 15.0
    assert 0.05 < on.mean() < 0.95, "gate never toggled — test is vacuous"
    np.testing.assert_allclose(np.asarray(zk), np.asarray(zx), atol=5e-8)


def test_fused_kernel_outdoor_gate_matches_xla():
    """Weather-only gates (min/max outdoor, wind) are pre-applied to the
    kernel's vent rows host-side: a max_outdoor gate must match the XLA
    path through a warm/cold-toggling run."""
    cfg = heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1)
    ctl = ZoneVentilationControl("Space", max_outdoor=12.0, delta=-2.0)
    tm = heatx.ThermalModel(_model(ctl), n=1, config=cfg)
    seq = _fast_seq(tm)
    st0 = tm.initial_state()
    _, zx = tm.run(st0, seq, mode="trbdf2", substeps=6)
    fr = tm.fast_runner(block_size=8, mode="trbdf2", substeps=6, hours=4,
                        interpret=True)
    _, zk = fr.run(st0, seq)
    np.testing.assert_allclose(np.asarray(zk), np.asarray(zx), atol=5e-8)


def test_fused_kernel_noop_control_matches_uncontrolled():
    """A default (no-op limits) control through the kernel engine equals
    the uncontrolled building's kernel run."""
    cfg = heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1)
    tm = heatx.ThermalModel(
        _model(ZoneVentilationControl("Space")), n=1, config=cfg
    )
    tm0 = heatx.ThermalModel(_model(), n=1, config=cfg)
    st0 = tm.initial_state()
    fr = tm.fast_runner(block_size=8, mode="trbdf2", substeps=6, hours=4,
                        interpret=True)
    fr0 = tm0.fast_runner(block_size=8, mode="trbdf2", substeps=6, hours=4,
                          interpret=True)
    _, zk = fr.run(st0, _fast_seq(tm))
    _, zk0 = fr0.run(tm0.initial_state(), _fast_seq(tm0))
    np.testing.assert_allclose(
        np.asarray(zk), np.asarray(zk0), rtol=0, atol=1e-12
    )


def test_fused_kernel_sharded_bit_equal():
    """The gated kernel under shard_map over the block axis: bit-equal to
    the single-device kernel run."""
    from heatx.parallel.sharding import make_mesh

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs >= 2 devices")
    cfg = heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1)
    # enough single-zone copies to give every device a block, with
    # per-zone gate limits that straddle the trajectory
    m = _model(ZoneVentilationControl("Space", min_indoor=15.0))
    from heatx.model.building import Boundary, SpaceDef, SurfaceDef

    verts = np.array([[0, 0, 0], [4, 0, 0], [4, 0, 3], [0, 0, 3]], float)
    for z in range(n_dev * 2 - 1):
        m.add_space(SpaceDef(f"extra{z}", 60.0))
        m.add_surface(
            SurfaceDef(f"wall{z}", m.surfaces[0].construction,
                       Boundary.outdoor(), Boundary.space_(f"extra{z}"),
                       vertices=verts)
        )
        m.add_vent_control(
            ZoneVentilationControl(f"extra{z}", min_indoor=13.0 + 0.5 * z)
        )
    tm = heatx.ThermalModel(m, n=1, config=cfg)
    st0 = tm.initial_state()
    seq = _fast_seq(tm)
    fr1 = tm.fast_runner(block_size=2, hours=4, mode="trbdf2", substeps=4,
                         interpret=True)
    assert fr1.layout.n_blocks % n_dev == 0, fr1.layout.n_blocks
    _, z1 = fr1.run(st0, seq)
    mesh = make_mesh()
    frm = tm.fast_runner(block_size=2, hours=4, mode="trbdf2", substeps=4,
                         interpret=True, mesh=mesh)
    _, zm = frm.run(st0, seq)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(zm)), np.asarray(z1)
    )
