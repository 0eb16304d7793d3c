"""In-run zone-state window-shading controls (heatx extension; the
EnergyPlus WindowShadingControl zone-state family, e.g.
OnIfHighZoneAirTemperature).  A host-side shading series cannot express
these — deployment reads the MARCHING zone temperature — so the control
runs inside the compiled scan: each main step starts by scaling the
controlled panes' incident front solar by the device transmittance
wherever the controlling zone's previous-step air temperature exceeds
the setpoint (EnergyPlus's own previous-timestep control convention).

Contracts:
* always-deployed (setpoint -1e9) is bit-identical to pre-scaling the
  pane's incident solar by the transmittance, on every XLA integrator;
* never-deployed (setpoint +1e9) is bit-identical to the uncontrolled
  building;
* dynamic deployment matches a host loop applying the rule by hand;
* the whole-run scan matches the host loop of marches;
* StepInputs.shade_sp schedules override the compiled setpoint;
* sharded march stays bit-equal to single-device;
* the fused Pallas kernel runs the control in-VMEM: it matches the XLA
  integrators through a dynamically-toggling run, honors schedule gates,
  places remote controlling zones block-locally, and shards bit-exactly.
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
from heatx.model.building import ZoneShadingControl
from heatx.testing import SingleZoneOptions, TestMat, single_zone_building

TAU = 0.3
SP = 23.0


def _model(setpoint=SP, controlled=True):
    opts = SingleZoneOptions(
        construction=[TestMat.concrete(0.15)],
        infiltration_rate=0.01,
    )
    m = single_zone_building(opts)
    if controlled:
        m.add_zone_shading(
            ZoneShadingControl("the surface", "Space", TAU, setpoint)
        )
    return m


def _compile(m):
    cfg = heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1)
    return compile_building(m, n=1, config=cfg).astype(jnp.float64)


def _inputs(b, sol=600.0, t_out=18.0):
    return state_mod.default_inputs(
        b,
        t_out=t_out,
        wind_speed=2.0,
        sol_front=np.full(b.n_surfaces, sol),
        inf_vol=np.full(b.n_zones, 0.01),
        inf_temp=np.full(b.n_zones, t_out),
        inf_mask=np.ones(b.n_zones, bool),
    )


_MARCHES = {
    "parity": step_mod.march,
    "trbdf2": partial(imp_march, substeps=6),
    "trbdf2_refresh": partial(imp_march, substeps=6, refresh_h=True),
    "exp": partial(exp_march, substeps=6),
}


def test_compile_lowers_control_arrays():
    b = _compile(_model())
    assert b.has_zone_shading
    np.testing.assert_array_equal(np.asarray(b.shade_zone), [0])
    np.testing.assert_allclose(np.asarray(b.shade_tau), [TAU])
    np.testing.assert_allclose(np.asarray(b.shade_sp), [SP])
    b0 = _compile(_model(controlled=False))
    assert not b0.has_zone_shading

    bad = _model(controlled=False)
    bad.add_zone_shading(ZoneShadingControl("nope", "Space", TAU, SP))
    with pytest.raises(ValueError, match="unknown surface"):
        _compile(bad)
    with pytest.raises(ValueError, match="transmittance"):
        _model(controlled=False).add_zone_shading(
            ZoneShadingControl("the surface", "Space", 1.5, SP)
        )
    dup = _model()
    with pytest.raises(ValueError, match="already has"):
        dup.add_zone_shading(
            ZoneShadingControl("the surface", "Space", TAU, SP)
        )


@pytest.mark.parametrize("mode", list(_MARCHES))
def test_limit_setpoints_bracket_the_control(mode):
    """Always-deployed == pre-scaled solar; never-deployed == unshaded —
    both bit-exact, per integrator."""
    march = jax.jit(_MARCHES[mode])
    b_on = _compile(_model(setpoint=-1e9))
    b_off = _compile(_model(setpoint=1e9))
    b_none = _compile(_model(controlled=False))
    st = state_mod.initial_state(b_on)

    s_on, s_off, s_none = st, st, st
    for _ in range(12):
        s_on = march(b_on, s_on, _inputs(b_on))
        s_off = march(b_off, s_off, _inputs(b_off))
        s_none = march(b_none, s_none, _inputs(b_none, sol=600.0 * TAU))
    # setpoint +1e9 never deploys: identical to the uncontrolled building
    # under full sun (same compiled layout, sol differs only via control).
    s_plain = st
    for _ in range(12):
        s_plain = march(b_none, s_plain, _inputs(b_none))
    np.testing.assert_array_equal(
        np.asarray(s_off.zone_T), np.asarray(s_plain.zone_T)
    )
    np.testing.assert_array_equal(
        np.asarray(s_off.node_T), np.asarray(s_plain.node_T)
    )
    # setpoint -1e9 always deploys: identical to pre-scaling the solar.
    np.testing.assert_array_equal(
        np.asarray(s_on.zone_T), np.asarray(s_none.zone_T)
    )
    np.testing.assert_array_equal(
        np.asarray(s_on.node_T), np.asarray(s_none.node_T)
    )


@pytest.mark.parametrize("mode", ["parity", "trbdf2"])
def test_dynamic_deployment_matches_host_rule(mode):
    """Strong sun heats the zone across the setpoint; the in-run control
    must match a host loop that applies the previous-timestep rule by
    hand (scale sol where zone_T > setpoint).  The trajectory must
    actually cross the setpoint for the test to bite."""
    march = jax.jit(_MARCHES[mode])
    b = _compile(_model(setpoint=SP))
    b_plain = _compile(_model(controlled=False))
    st = state_mod.initial_state(b)

    T = 60
    s_ctl = st
    s_host = st
    deployed_hours = 0
    for _ in range(T):
        s_ctl = march(b, s_ctl, _inputs(b, sol=900.0, t_out=26.0))
        scale = TAU if float(s_host.zone_T[0]) > SP else 1.0
        deployed_hours += scale == TAU
        s_host = march(
            b_plain, s_host, _inputs(b_plain, sol=900.0 * scale, t_out=26.0)
        )
    assert 0 < deployed_hours < T  # the rule actually toggled
    np.testing.assert_array_equal(
        np.asarray(s_ctl.zone_T), np.asarray(s_host.zone_T)
    )
    np.testing.assert_array_equal(
        np.asarray(s_ctl.node_T), np.asarray(s_host.node_T)
    )
    # And the control genuinely cooled the zone vs running unshaded.
    s_un = st
    for _ in range(T):
        s_un = march(b_plain, s_un, _inputs(b_plain, sol=900.0, t_out=26.0))
    assert float(s_ctl.zone_T[0]) < float(s_un.zone_T[0]) - 0.2


def test_run_scan_matches_host_loop():
    """The whole-sequence scan (ThermalModel.run's engine) carries the
    deployment state exactly like a host loop of march calls."""
    b = _compile(_model(setpoint=SP))
    st = state_mod.initial_state(b)
    T = 48
    one = _inputs(b, sol=900.0, t_out=26.0)
    seq = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (T,) + jnp.shape(x)), one
    )
    final, hist = jax.jit(step_mod.run)(b, st, seq)
    s = st
    host = []
    for _ in range(T):
        s = jax.jit(step_mod.march)(b, s, one)
        host.append(np.asarray(s.zone_T))
    np.testing.assert_array_equal(np.asarray(hist), np.stack(host))
    np.testing.assert_array_equal(
        np.asarray(final.zone_T), np.asarray(s.zone_T)
    )


def test_shade_sp_schedule_overrides_compiled_setpoint():
    """A +1e9 shade_sp series hour blocks deployment (schedule gate);
    a -1e9 hour forces it — equal to the compiled-limit buildings."""
    b = _compile(_model(setpoint=SP))
    st = state_mod.initial_state(b)
    one = _inputs(b, sol=900.0, t_out=26.0)

    march = jax.jit(step_mod.march)
    blocked = march(b, st, one._replace(shade_sp=jnp.full((1,), 1e9)))
    forced = march(b, st, one._replace(shade_sp=jnp.full((1,), -1e9)))
    ref_off = march(_compile(_model(setpoint=1e9)), st, one)
    ref_on = march(_compile(_model(setpoint=-1e9)), st, one)
    np.testing.assert_array_equal(
        np.asarray(blocked.zone_T), np.asarray(ref_off.zone_T)
    )
    np.testing.assert_array_equal(
        np.asarray(forced.zone_T), np.asarray(ref_on.zone_T)
    )

    # Through the whole-run scan: a static [S] shade_sp broadcasts over T.
    T = 24
    seq = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (T,) + jnp.shape(x)), one
    )
    seq = seq._replace(shade_sp=jnp.full((1,), -1e9))
    _, hist = jax.jit(step_mod.run)(b, st, seq)
    seq_ref = jax.tree.map(
        lambda x: jnp.broadcast_to(x, (T,) + jnp.shape(x)), one
    )
    _, hist_ref = jax.jit(step_mod.run)(
        _compile(_model(setpoint=-1e9)), st, seq_ref
    )
    np.testing.assert_array_equal(np.asarray(hist), np.asarray(hist_ref))


def test_sharded_march_bit_equal():
    """The in-run control shards over the surface axis (the zone gather
    reads the replicated zone row): sharded == single-device bit-exact."""
    from heatx.parallel.sharding import make_mesh, make_sharded_march

    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    m = _model(setpoint=-1e9)  # always deployed: the scale must survive
    b = compile_building(
        m, n=1,
        config=heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1),
        pad_surfaces_to=n_dev,
    ).astype(jnp.float64)
    st = state_mod.initial_state(b)
    one = _inputs(b, sol=900.0, t_out=26.0)
    sh = make_sharded_march(b, make_mesh())(st, one)
    un = jax.jit(step_mod.march)(b, st, one)
    np.testing.assert_array_equal(np.asarray(sh.zone_T), np.asarray(un.zone_T))
    # GSPMD may reassociate per-surface fmas: allow ~1 ulp on node temps.
    np.testing.assert_allclose(
        np.asarray(sh.node_T), np.asarray(un.node_T), rtol=1e-13
    )


def _fast_seq(tm, T=48, seed=3):
    """A 48 h sequence whose control crosses the setpoint dynamically."""
    b = tm.building
    rng = np.random.default_rng(seed)
    sol = rng.uniform(0, 800, (T, b.n_surfaces))
    t_out = 18.0 + 8 * np.sin(np.arange(T) / 24 * 2 * np.pi)
    return tm.inputs_sequence(T, t_out=t_out, wind_speed=2.0, sol_front=sol)


@pytest.mark.parametrize("mode", ["parity", "trbdf2"])
def test_fused_kernel_matches_xla(mode):
    """The in-run control inside the Pallas day kernel: the controlling
    zone's carry temperature gates the solar scale each main step, matching
    the XLA integrators through a run that crosses the setpoint both ways
    (the tolerance covers the kernel's series-form expm1)."""
    cfg = heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1)
    tm = heatx.ThermalModel(_model(setpoint=22.4), n=1, config=cfg)
    seq = _fast_seq(tm)
    st0 = tm.initial_state()
    kw = dict(substeps=6) if mode != "parity" else {}
    _, zx = tm.run(st0, seq, mode=mode, **kw)
    fr = tm.fast_runner(block_size=8, mode=mode, hours=4, interpret=True,
                        **kw)
    _, zk = fr.run(st0, seq)
    # The run must actually exercise BOTH branches of the control.
    on = np.asarray(zx) > 22.4
    assert 0.05 < on.mean() < 0.95, "control never toggled — test is vacuous"
    np.testing.assert_allclose(np.asarray(zk), np.asarray(zx), atol=5e-8)


def test_fused_kernel_schedule_gate():
    """A +1e9 shade_sp series through FastRunner.run blocks deployment:
    bit-comparable to the uncontrolled building on the same kernel."""
    cfg = heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1)
    tm = heatx.ThermalModel(_model(setpoint=-1e9), n=1, config=cfg)
    seq = _fast_seq(tm)
    st0 = tm.initial_state()
    fr = tm.fast_runner(block_size=8, mode="trbdf2", substeps=6, hours=4,
                        interpret=True)
    gate = np.full((48, tm.building.n_surfaces), 1e9)
    _, z_gated = fr.run(st0, seq._replace(shade_sp=gate))

    tm0 = heatx.ThermalModel(_model(controlled=False), n=1, config=cfg)
    fr0 = tm0.fast_runner(block_size=8, mode="trbdf2", substeps=6, hours=4,
                          interpret=True)
    _, z_off = fr0.run(tm0.initial_state(), _fast_seq(tm0))
    np.testing.assert_array_equal(np.asarray(z_gated), np.asarray(z_off))

    # And without a series, the compiled always-on setpoint deploys: equal
    # to pre-scaling the pane's solar by tau on the uncontrolled building.
    _, z_on = fr.run(st0, seq)
    seq_scaled = _fast_seq(tm0)
    seq_scaled = seq_scaled._replace(sol_front=seq_scaled.sol_front * TAU)
    _, z_ref = fr0.run(tm0.initial_state(), seq_scaled)
    np.testing.assert_allclose(np.asarray(z_on), np.asarray(z_ref),
                               rtol=0, atol=1e-12)


def test_fused_kernel_remote_control_zone_blocks_together():
    """A pane whose controlling zone is ANOTHER zone: blocking must place
    the pane with that zone's component and the kernel must read it."""
    opts = SingleZoneOptions(construction=[TestMat.concrete(0.15)])
    m = single_zone_building(opts)
    # second zone with its own wall; its temperature controls the first
    # zone's pane
    from heatx.model.building import Boundary, SpaceDef, SurfaceDef

    m.add_space(SpaceDef("ctl_zone", 80.0))
    m.add_surface(
        SurfaceDef(
            "ctl wall", m.surfaces[0].construction, Boundary.outdoor(),
            Boundary.space_("ctl_zone"),
            vertices=np.array(
                [[0, 0, 0], [4, 0, 0], [4, 0, 3], [0, 0, 3]], float
            ),
        )
    )
    m.add_zone_shading(
        ZoneShadingControl("the surface", "ctl_zone", TAU, -1e9)
    )
    cfg = heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1)
    tm = heatx.ThermalModel(m, n=1, config=cfg)
    st0 = tm.initial_state()
    seq = _fast_seq(tm, T=24)
    _, zx = tm.run(st0, seq, mode="trbdf2", substeps=6)
    fr = tm.fast_runner(block_size=8, mode="trbdf2", substeps=6, hours=4,
                        interpret=True)
    # both zones (and both surfaces) must share a block
    zt = fr.layout.zone_table
    assert (zt[0] >= 0).sum() == 2, zt
    _, zk = fr.run(st0, seq)
    np.testing.assert_allclose(np.asarray(zk), np.asarray(zx), atol=5e-8)


def test_fused_kernel_sharded_bit_equal():
    """Mesh-sharded FastRunner with zone shading == single-device kernel."""
    n_dev = len(jax.devices())
    if n_dev < 2:
        pytest.skip("needs a multi-device mesh")
    from heatx.parallel.sharding import make_mesh

    cfg = heatx.SimConfig(dtype=jnp.float64, nomass_fixed_iters=1)
    # enough single-zone copies to give every device a block
    m = _model(setpoint=22.4)
    from heatx.model.building import Boundary, SpaceDef, SurfaceDef

    verts = np.array([[0, 0, 0], [4, 0, 0], [4, 0, 3], [0, 0, 3]], float)
    for z in range(n_dev * 2 - 1):
        m.add_space(SpaceDef(f"extra{z}", 60.0))
        m.add_surface(
            SurfaceDef(f"wall{z}", m.surfaces[0].construction,
                       Boundary.outdoor(), Boundary.space_(f"extra{z}"),
                       vertices=verts)
        )
        m.add_zone_shading(
            ZoneShadingControl(f"wall{z}", f"extra{z}", TAU, 22.0 + 0.1 * z)
        )
    tm = heatx.ThermalModel(m, n=1, config=cfg)
    seq = _fast_seq(tm)
    st0 = tm.initial_state()
    fr1 = tm.fast_runner(block_size=2, mode="trbdf2", substeps=4, hours=4,
                         interpret=True)
    assert fr1.layout.n_blocks % n_dev == 0, fr1.layout.n_blocks
    _, z1 = fr1.run(st0, seq)
    frm = tm.fast_runner(block_size=2, mode="trbdf2", substeps=4, hours=4,
                         interpret=True, mesh=make_mesh())
    _, zm = frm.run(st0, seq)
    np.testing.assert_array_equal(np.asarray(zm), np.asarray(z1))
