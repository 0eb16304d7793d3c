"""The adjoint day kernel (heatx.ops.pallas_adjoint): kernel-speed
reverse-mode gradients for the TR-BDF2 fast modes.

Contracts:

* directional derivatives of the FORWARD kernel (central finite
  differences in f64) match the adjoint kernel's gradients for every
  differentiated input group — day-start state, building parameter
  operands, per-hour channels — on all coefficient cadences;
* the full hybrid (``chunk_forward`` + ``chunk_grad`` through
  ``chunked_value_and_grad``) reproduces the pure-XLA chunked adjoint's
  value and parameter gradients to fp-exactness in f64, including on a
  thermostatic (ideal-loads) building;
* thermostat setpoints differentiate: the compiled ctl rows and (on
  scheduled runners) the per-hour schedule channels are FD-gated, and the
  chunk_grad schedule_fn / ctl_heat_sp pull-backs match the XLA adjoint;
* out-of-scope configurations (parity mode, in-run shading / vent gates,
  apply_params feeding non-differentiated arrays) raise instead of
  silently dropping gradients.

The reference has no autodiff at all (SURVEY.md §2) — these gate heatx's
own capability bar: the calibration/optimal-control workflow at fused-
kernel speed on both sweeps.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import heatx
from heatx.build.layout import compile_building
from heatx.engine import implicit as imp_mod
from heatx.engine import state as state_mod
from heatx.engine.adjoint import chunked_value_and_grad
from heatx.model.building import (
    Boundary,
    BuildingModel,
    Construction,
    ElectricHeater,
    IdealHeaterCooler,
    Material,
    SpaceDef,
    Substance,
    SurfaceDef,
)
from heatx.ops import pallas_adjoint, pallas_step


def _city(n_zones=6):
    import bench as B

    return B.build_city_model(n_zones, 10)


def _setup(mode, refresh_every=None, hours=2, substeps=4):
    model = _city(6)
    cfg = heatx.SimConfig(dtype=jnp.float64)
    building = compile_building(model, n=1, config=cfg)
    bb = pallas_step.block_building(building, block_size=16)
    hm, params = pallas_step.make_hour_march(
        bb, substeps=substeps, interpret=True, mode=mode, hours=hours,
        refresh_every=refresh_every,
    )
    adj = pallas_adjoint.make_day_adjoint(
        bb, substeps=substeps, mode=mode, hours=hours, interpret=True,
        refresh_every=refresh_every,
    )
    rng = np.random.default_rng(0)
    lay = bb.layout
    SP = lay.padded_surfaces
    NB, ZB, N = bb.n_blocks, bb.zones_per_block, bb.max_nodes
    st = state_mod.initial_state(building)
    T0 = jnp.asarray(lay.surfaces_to_blocked(np.asarray(st.node_T)))
    zT0 = jnp.asarray(lay.zones_to_blocked(np.asarray(st.zone_T)))
    solf = rng.uniform(0, 500, (hours, SP))
    a_g = np.zeros(building.n_zones)
    np.add.at(a_g, np.asarray(building.hvac_pair_space), 500.0)
    hi = (
        jnp.repeat(jnp.asarray([2.0, 5.0, 8.0, 3.0][:hours]), substeps),
        jnp.repeat(jnp.asarray([3.0, 4.0, 2.0, 5.0][:hours]), substeps),
        jnp.repeat(jnp.asarray([0.7, 0.1, 2.0, 1.5][:hours]), substeps),
        jnp.asarray(solf),
        jnp.zeros((hours, SP)),
        jnp.full((hours, SP), 320.0),
        jnp.zeros((hours, SP)),
        jnp.asarray(np.stack([lay.zones_to_blocked(a_g)] * hours)),
        jnp.zeros((hours, NB, ZB)),
    )
    WT = jnp.asarray(rng.normal(size=(N, SP)))
    Wz = jnp.asarray(rng.normal(size=(NB, ZB)))
    Wh = jnp.asarray(rng.normal(size=(hours, NB, ZB)))

    def loss(params, T, zT, hi):
        Tn, zTn, _, zth = hm(params, T, zT, hi)[:4]
        return (
            jnp.sum(Tn * WT)
            + jnp.sum(zTn.reshape(NB, ZB) * Wz)
            + jnp.sum(zth * Wh)
        )

    g = adj(params, T0, zT0, hi, (WT, Wz, Wh, None))
    return SimpleNS(
        hm=hm, adj=adj, params=params, T0=T0, zT0=zT0, hi=hi, loss=loss,
        g=g, rng=rng, bb=bb, N=N, SP=SP, NB=NB, ZB=ZB,
        parts_meta=adj.parts_meta,
    )


class SimpleNS(dict):
    __getattr__ = dict.__getitem__


def _fd(ns, dirfun, eps=1e-5):
    p_p, T_p, z_p, h_p = dirfun(+eps)
    p_m, T_m, z_m, h_m = dirfun(-eps)
    return (
        float(ns.loss(p_p, T_p, z_p, h_p)) - float(ns.loss(p_m, T_m, z_m, h_m))
    ) / (2 * eps)


def _perturb_param(ns, name, D_full, eps):
    newp = list(ns.params)
    pidx = ns.hm.param_index
    for pi, (rows, lo, w) in enumerate(ns.parts_meta):
        j = pidx[(pi, name)]
        a = np.asarray(ns.params[j])
        if np.asarray(D_full).ndim == 2:
            d = np.asarray(D_full).reshape(-1, ns.NB, ns.bb.block_size)[
                : a.shape[0], :, lo : lo + w
            ].reshape(a.shape[0], ns.NB * w)
        else:
            d = np.asarray(D_full).reshape(ns.NB, ns.bb.block_size)[
                :, lo : lo + w
            ].reshape(1, ns.NB * w)
        newp[j] = jnp.asarray(a + eps * d)
    return tuple(newp)


@pytest.mark.parametrize(
    "mode,revery",
    [("trbdf2", None), ("trbdf2_refresh", 2)],
    ids=["frozen", "hybrid2"],
)
def test_day_adjoint_matches_finite_differences(mode, revery):
    ns = _setup(mode, refresh_every=revery)
    rng, g = ns.rng, ns.g

    # day-start node state
    D = jnp.asarray(rng.normal(size=(ns.N, ns.SP)))
    fd = _fd(ns, lambda e: (ns.params, ns.T0 + e * D, ns.zT0, ns.hi))
    ad = float(jnp.sum(g["dT0"] * D))
    assert abs(fd - ad) / max(abs(fd), abs(ad)) < 2e-5, (fd, ad)

    # day-start zone state
    Dz = jnp.asarray(rng.normal(size=(ns.NB, ns.ZB)))
    fd = _fd(ns, lambda e: (ns.params, ns.T0, ns.zT0 + e * Dz, ns.hi))
    ad = float(jnp.sum(g["d_zT0"] * Dz))
    assert abs(fd - ad) / max(abs(fd), abs(ad)) < 2e-5, (fd, ad)

    # building parameters.  The frozen variant sweeps the full DIFF set
    # (incl. area/perimeter — the inputs the forced-convection double-where
    # guard protects: an unguarded sqrt at P*v/A = 0 NaN-poisons exactly
    # these two cotangents and nothing the forward tests observe); the
    # hybrid variant keeps the two cheapest as a cadence gate.  Scales put
    # the FD perturbation at a meaningful relative size per parameter.
    node_names = [("seg_u", 1.0), ("front_alphas", 1.0)]
    surf_names = []
    if revery is None:
        node_names.append(("mass", 1e4))
        surf_names = [("area", 0.1), ("perimeter", 0.1), ("eps_front", 0.05)]
    for name, scale in node_names:
        Dp = rng.normal(size=(ns.N, ns.SP)) * scale
        ad = float(jnp.sum(g["d_params"][name] * jnp.asarray(Dp)))
        fd = _fd(ns, lambda e: (_perturb_param(ns, name, Dp, e), ns.T0, ns.zT0, ns.hi))
        # k=1/k=2 cadences carry large curvature in the alphas direction;
        # the FD error is O(eps^2) (verified to converge to the adjoint
        # value at eps -> 0), so the gate is looser there.
        assert abs(fd - ad) / max(abs(fd), abs(ad), 1e-12) < 5e-4, (name, fd, ad)
    for name, scale in surf_names:
        Dp = rng.normal(size=(ns.SP,)) * scale
        ad = float(jnp.sum(g["d_params"][name] * jnp.asarray(Dp)))
        fd = _fd(ns, lambda e: (_perturb_param(ns, name, Dp, e), ns.T0, ns.zT0, ns.hi))
        assert np.isfinite(ad), (name, ad)  # the NaN-poisoning regression
        assert abs(fd - ad) / max(abs(fd), abs(ad), 1e-12) < 5e-4, (name, fd, ad)

    # per-hour channels: front solar + zone gain rows
    Ds = rng.normal(size=(ns.hi[3].shape)) * 10
    fd = _fd(ns, lambda e: (ns.params, ns.T0, ns.zT0,
                            ns.hi[:3] + (ns.hi[3] + e * jnp.asarray(Ds),) + ns.hi[4:]))
    ad = float(jnp.sum(g["d_sol_front"] * jnp.asarray(Ds)))
    assert abs(fd - ad) / max(abs(fd), abs(ad)) < 2e-5, (fd, ad)

    Da = rng.normal(size=ns.hi[7].shape) * 10
    fd = _fd(ns, lambda e: (ns.params, ns.T0, ns.zT0,
                            ns.hi[:7] + (ns.hi[7] + e * jnp.asarray(Da), ns.hi[8])))
    ad = float(jnp.sum(g["d_a_extra"] * jnp.asarray(Da)))
    assert abs(fd - ad) / max(abs(fd), abs(ad)) < 2e-5, (fd, ad)


def _calib_model(n_zones=4, ideal=False):
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
        if ideal:
            m.add_hvac(IdealHeaterCooler(
                f"h{z}", [f"room{z}"], heat_setpoint=19.0, cool_setpoint=27.0,
                max_heating=2000.0, max_cooling=2000.0,
            ))
        else:
            m.add_hvac(ElectricHeater(f"h{z}", f"room{z}"))
    return m


@pytest.mark.parametrize(
    "ideal,demand",
    [(False, False), (True, False), (True, True)],
    ids=["heater", "thermostat", "demand"],
)
def test_chunk_grad_matches_xla_adjoint(ideal, demand):
    """Kernel forward + kernel backward == pure-XLA chunked adjoint (f64).

    ``demand=True`` scores a metered-energy objective on the per-hour
    ideal-load history (plus a small zone-T term so both cotangent
    channels are live) — the chunk_forward/chunk_grad(collect_loads=True)
    contract, seeding the adjoint kernel's d_ld input."""
    SUBS = 6
    cfg = heatx.SimConfig(dtype=np.float64)
    tm = heatx.ThermalModel(_calib_model(ideal=ideal), n=1, config=cfg)
    building = tm._device()
    st = tm.initial_state()
    T, C = 16, 2
    hours = np.arange(T)
    t_out = 5.0 + 8.0 * np.sin((hours - 8) / 24 * 2 * np.pi)
    sol = np.maximum(0.0, 600.0 * np.sin((hours % 24 - 6) / 12 * np.pi))
    kw = {} if ideal else dict(
        hvac_power=jnp.full((building.n_hvacs,), 800.0)
    )
    seq = tm.inputs_sequence(
        T, t_out=jnp.asarray(t_out), wind_speed=3.0, wind_direction=45.0, **kw
    )
    S = building.n_surfaces
    seq = seq._replace(
        sol_front=jnp.broadcast_to(jnp.asarray(sol)[:, None], (T, S)),
        sol_back=0.3 * jnp.broadcast_to(jnp.asarray(sol)[:, None], (T, S)),
    )
    xs_chunks = jax.tree.map(
        lambda v: (v.reshape((C, T // C) + v.shape[1:])
                   if v.ndim and v.shape[0] == T
                   else jnp.broadcast_to(v, (C, T // C) + v.shape)),
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

    def hist_fn(params, state, xs):
        b = with_params(params)

        def hour(s, x):
            s = imp_mod.imp_march(b, s, x, substeps=SUBS)
            return s, (s.zone_T, s.ideal_load) if demand else s.zone_T

        return jax.lax.scan(hour, state, xs)

    def score(zt, ld, target):
        if demand:
            d = (ld - target) / 1000.0
            return jnp.mean(d * d) / C + 1e-4 * jnp.mean(zt) / C
        d = zt - target
        return jnp.mean(d * d) / C

    def chunk_fn(params, state, xs):
        xs, target = xs
        state, hist = hist_fn(params, state, xs)
        zt, ld = hist if demand else (hist, None)
        return state, score(zt, ld, target)

    true_params = {"u_scale": jnp.asarray(1.0), "alpha_scale": jnp.asarray(1.0)}
    run_hist = jax.jit(hist_fn)
    s, chunks = st, []
    for i in range(C):
        s, h = run_hist(true_params, s, jax.tree.map(lambda x: x[i], xs_chunks))
        chunks.append(h[1] if demand else h)
    measured = jnp.concatenate(chunks).reshape(C, T // C, -1)
    guess = {"u_scale": jnp.asarray(1.4), "alpha_scale": jnp.asarray(0.7)}

    val_ref, g_ref = chunked_value_and_grad(
        chunk_fn, guess, st, (xs_chunks, measured)
    )

    fr = tm.fast_runner(block_size=16, mode="trbdf2", substeps=SUBS, hours=T // C)
    cell = {}

    if demand:
        def loss(zt, ld, xs):
            return score(zt, ld, cell["t"])
    else:
        def loss(zt, xs):
            return score(zt, None, cell["t"])

    kf = fr.chunk_forward(with_params, loss, collect_loads=demand)
    kb = fr.chunk_grad(with_params, loss, collect_loads=demand)

    def forward_fn(params, state, xs):
        inner, target = xs
        cell["t"] = target
        return kf(params, state, inner)

    def backward_fn(params, state, xs, state_cot, loss_cot):
        inner, target = xs
        cell["t"] = target
        return kb(params, state, inner, state_cot, loss_cot)

    val_k, g_k = chunked_value_and_grad(
        chunk_fn, guess, st, (xs_chunks, measured),
        forward_fn=forward_fn, backward_fn=backward_fn,
    )
    assert abs(float(val_k) - float(val_ref)) / abs(float(val_ref)) < 1e-9
    for k in g_ref:
        rel = abs(float(g_k[k]) - float(g_ref[k])) / max(
            abs(float(g_ref[k])), 1e-12
        )
        assert rel < 1e-9, (k, float(g_k[k]), float(g_ref[k]))


def _tstat_city(n_zones=6, heat=25.0, cool=35.0):
    """City model + per-zone thermostats whose heating setpoint sits ABOVE
    the free-float band, so every zone heats on every sub-step — FD
    directions stay inside one smooth branch of the ideal-loads clip."""
    from heatx.model.building import IdealHeaterCooler

    model = _city(n_zones)
    for z in range(n_zones):
        model.add_hvac(IdealHeaterCooler(
            f"t{z}", [f"z{z}"], heat_setpoint=heat, cool_setpoint=cool,
            max_heating=1e5, max_cooling=1e5,
        ))
    return model


def _tstat_setup(hours=2, substeps=4, scheduled=False, seed=3):
    """Shared fixture for the thermostat-gradient FD gates: blocked city
    model, forward + adjoint kernels, and randomized day inputs."""
    model = _tstat_city(6)
    cfg = heatx.SimConfig(dtype=jnp.float64)
    building = compile_building(model, n=1, config=cfg)
    bb = pallas_step.block_building(building, block_size=16)
    hm, params = pallas_step.make_hour_march(
        bb, substeps=substeps, interpret=True, mode="trbdf2", hours=hours,
        scheduled_setpoints=scheduled,
    )
    adj = pallas_adjoint.make_day_adjoint(
        bb, substeps=substeps, mode="trbdf2", hours=hours, interpret=True,
        scheduled_setpoints=scheduled,
    )
    rng = np.random.default_rng(seed)
    lay = bb.layout
    SP = lay.padded_surfaces
    NB, ZB, N = bb.n_blocks, bb.zones_per_block, bb.max_nodes
    st = state_mod.initial_state(building)
    T0 = jnp.asarray(lay.surfaces_to_blocked(np.asarray(st.node_T)))
    zT0 = jnp.asarray(lay.zones_to_blocked(np.asarray(st.zone_T)))
    hi = (
        jnp.repeat(jnp.asarray([2.0, 5.0][:hours]), substeps),
        jnp.repeat(jnp.asarray([3.0, 4.0][:hours]), substeps),
        jnp.repeat(jnp.asarray([0.7, 0.1][:hours]), substeps),
        jnp.asarray(rng.uniform(0, 400, (hours, SP))),
        jnp.zeros((hours, SP)),
        jnp.full((hours, SP), 320.0),
        jnp.zeros((hours, SP)),
        jnp.zeros((hours, NB, ZB)),
        jnp.zeros((hours, NB, ZB)),
    )
    if scheduled:
        zmask = np.asarray(lay.zone_table) >= 0
        sp_h = np.where(zmask, 25.0, 0.0)[None].repeat(hours, 0)
        sp_c = np.where(zmask, 35.0, 0.0)[None].repeat(hours, 0)
        hi = hi + (jnp.asarray(sp_h), jnp.asarray(sp_c))
    return SimpleNS(
        hm=hm, adj=adj, params=params, T0=T0, zT0=zT0, hi=hi, rng=rng,
        bb=bb, N=N, SP=SP, NB=NB, ZB=ZB, parts_meta=adj.parts_meta,
        building=building, hours=hours,
    )


def test_day_adjoint_loads_cotangent_fd():
    """FD gate for the ideal-load-history cotangent: a loss with a demand
    term (sum ld*Wl) differentiates correctly through the adjoint kernel
    (round-4 gap: chunk_grad hardwired this cotangent to None even though
    the kernel accepts it)."""
    ns0 = _tstat_setup()
    hm, adj, params, T0, zT0, hi = (
        ns0.hm, ns0.adj, ns0.params, ns0.T0, ns0.zT0, ns0.hi
    )
    rng = ns0.rng
    N, SP, NB, ZB, hours = ns0.N, ns0.SP, ns0.NB, ns0.ZB, ns0.hours
    WT = jnp.asarray(rng.normal(size=(N, SP)))
    Wz = jnp.asarray(rng.normal(size=(NB, ZB)))
    Wh = jnp.asarray(rng.normal(size=(hours, NB, ZB)))
    # The load weight is scaled down so the W-magnitude load terms do not
    # swamp the temperature terms in the FD quotient.
    Wl = jnp.asarray(rng.normal(size=(hours, NB, ZB))) * 1e-3

    def loss(params, T, zT, hi):
        Tn, zTn, _, zth, ld = hm(params, T, zT, hi)[:5]
        return (
            jnp.sum(Tn * WT)
            + jnp.sum(zTn.reshape(NB, ZB) * Wz)
            + jnp.sum(zth * Wh)
            + jnp.sum(ld * Wl)
        )

    g = adj(params, T0, zT0, hi, (WT, Wz, Wh, Wl))
    ns = SimpleNS(
        hm=hm, params=params, T0=T0, zT0=zT0, hi=hi, loss=loss, NB=NB,
        ZB=ZB, bb=ns0.bb, parts_meta=adj.parts_meta,
    )

    # day-start state direction (flows into the loads through the free-float
    # temperature and the required-power formula)
    D = jnp.asarray(rng.normal(size=(N, SP)))
    fd = _fd(ns, lambda e: (params, T0 + e * D, zT0, hi))
    ad = float(jnp.sum(g["dT0"] * D))
    assert abs(fd - ad) / max(abs(fd), abs(ad)) < 2e-5, (fd, ad)

    # conductance direction (building-parameter pull-back through the loads)
    Dp = rng.normal(size=(N, SP))
    ad = float(jnp.sum(g["d_params"]["seg_u"] * jnp.asarray(Dp)))
    fd = _fd(ns, lambda e: (_perturb_param(ns, "seg_u", Dp, e), T0, zT0, hi))
    assert abs(fd - ad) / max(abs(fd), abs(ad), 1e-12) < 5e-4, (fd, ad)

    # zone-gain channel direction (a_extra enters the required power directly)
    Da = rng.normal(size=(hours, NB, ZB)) * 10
    fd = _fd(ns, lambda e: (params, T0, zT0,
                            hi[:7] + (hi[7] + e * jnp.asarray(Da), hi[8])))
    ad = float(jnp.sum(g["d_a_extra"] * jnp.asarray(Da)))
    assert abs(fd - ad) / max(abs(fd), abs(ad)) < 2e-5, (fd, ad)


def _rows0(D, NB, ZB):
    """[NB, ZB] zone values -> the kernel's [NB*8, ZB] zone-row operand
    layout (data on row 0 of each 8-row tile)."""
    out = np.zeros((NB, 8, ZB))
    out[:, 0] = np.asarray(D)
    return out.reshape(NB * 8, ZB)


def test_day_adjoint_compiled_setpoint_fd():
    """FD gate for the compiled thermostat setpoint rows (d_ctl_heat):
    the setpoint-landing power formula is smooth in the setpoint, so the
    adjoint kernel now differentiates the ctl rows instead of treating
    them as structure (round-4 weak #1)."""
    ns = _tstat_setup(seed=5)
    hm, adj, params = ns.hm, ns.adj, ns.params
    rng = ns.rng
    NB, ZB, hours = ns.NB, ns.ZB, ns.hours
    Wz = jnp.asarray(rng.normal(size=(NB, ZB)))
    Wh = jnp.asarray(rng.normal(size=(hours, NB, ZB)))
    Wl = jnp.asarray(rng.normal(size=(hours, NB, ZB))) * 1e-3

    def loss(params, T, zT, hi):
        _, zTn, _, zth, ld = hm(params, T, zT, hi)[:5]
        return (
            jnp.sum(zTn.reshape(NB, ZB) * Wz)
            + jnp.sum(zth * Wh)
            + jnp.sum(ld * Wl)
        )

    g = adj(params, ns.T0, ns.zT0, ns.hi, (None, Wz, Wh, Wl))
    assert hm.ctl_param_base is not None
    base = hm.ctl_param_base

    # Perturb only REAL zone slots (padded slots carry -1e9 sentinels whose
    # loads never trigger; their gradient is structurally zero).
    zmask = np.asarray(ns.bb.layout.zone_table) >= 0
    D = rng.normal(size=(NB, ZB)) * zmask
    ad = float(jnp.sum(g["d_ctl_heat"] * jnp.asarray(D)))

    def perturbed(e):
        newp = list(params)
        newp[base] = params[base] + e * jnp.asarray(_rows0(D, NB, ZB))
        return tuple(newp)

    eps = 1e-5
    fd = (
        float(loss(perturbed(+eps), ns.T0, ns.zT0, ns.hi))
        - float(loss(perturbed(-eps), ns.T0, ns.zT0, ns.hi))
    ) / (2 * eps)
    assert abs(fd - ad) / max(abs(fd), abs(ad)) < 5e-4, (fd, ad)
    # The cooling branch never activates in this always-heating regime:
    # its gradient must be exactly zero (and finite).
    assert float(jnp.max(jnp.abs(g["d_ctl_cool"]))) == 0.0


def test_day_adjoint_scheduled_setpoint_fd():
    """FD gate for the per-hour setpoint schedule channels (d_sp_heat):
    scheduled-setpoints buildings differentiate their heat/cool schedule
    series through the adjoint kernel — the optimal-control gradient."""
    ns = _tstat_setup(scheduled=True, seed=7)
    hm, adj, params = ns.hm, ns.adj, ns.params
    rng = ns.rng
    NB, ZB, hours = ns.NB, ns.ZB, ns.hours
    Wz = jnp.asarray(rng.normal(size=(NB, ZB)))
    Wh = jnp.asarray(rng.normal(size=(hours, NB, ZB)))
    Wl = jnp.asarray(rng.normal(size=(hours, NB, ZB))) * 1e-3

    def loss(params, T, zT, hi):
        _, zTn, _, zth, ld = hm(params, T, zT, hi)[:5]
        return (
            jnp.sum(zTn.reshape(NB, ZB) * Wz)
            + jnp.sum(zth * Wh)
            + jnp.sum(ld * Wl)
        )

    g = adj(params, ns.T0, ns.zT0, ns.hi, (None, Wz, Wh, Wl))
    zmask = np.asarray(ns.bb.layout.zone_table) >= 0
    Ds = rng.normal(size=(hours, NB, ZB)) * zmask[None]
    ad = float(jnp.sum(g["d_sp_heat"] * jnp.asarray(Ds)))

    def perturbed(e):
        return ns.hi[:9] + (ns.hi[9] + e * jnp.asarray(Ds), ns.hi[10])

    eps = 1e-5
    fd = (
        float(loss(params, ns.T0, ns.zT0, perturbed(+eps)))
        - float(loss(params, ns.T0, ns.zT0, perturbed(-eps)))
    ) / (2 * eps)
    assert abs(fd - ad) / max(abs(fd), abs(ad)) < 5e-4, (fd, ad)
    # Scheduled mode: the (unused) compiled ctl rows pull zero gradient.
    assert float(jnp.max(jnp.abs(g["d_ctl_heat"]))) == 0.0


def test_chunk_grad_setpoint_params_match_xla():
    """Full-pipeline gate: calibrating the COMPILED thermostat setpoints
    (building.ctl_heat_sp via apply_params) through chunk_grad matches the
    pure-XLA chunked adjoint in f64."""
    SUBS = 6
    cfg = heatx.SimConfig(dtype=np.float64)
    tm = heatx.ThermalModel(_calib_model(ideal=True), n=1, config=cfg)
    building = tm._device()
    st = tm.initial_state()
    T, C = 8, 2
    t_out = -5.0 + 3.0 * np.sin(np.arange(T) / 4)
    seq = tm.inputs_sequence(
        T, t_out=jnp.asarray(t_out), wind_speed=3.0, wind_direction=45.0
    )
    xs_chunks = jax.tree.map(
        lambda v: (v.reshape((C, T // C) + v.shape[1:])
                   if v.ndim and v.shape[0] == T
                   else jnp.broadcast_to(v, (C, T // C) + v.shape)),
        seq,
    )

    def with_params(params):
        return dataclasses.replace(
            building, ctl_heat_sp=building.ctl_heat_sp + params["sp_shift"]
        )

    def chunk_fn(params, state, xs):
        b = with_params(params)

        def hour(s, x):
            s = imp_mod.imp_march(b, s, x, substeps=SUBS)
            return s, (s.zone_T, s.ideal_load)

        state, (zt, ld) = jax.lax.scan(hour, state, xs)
        return state, (jnp.mean(ld) / 1e3 + jnp.mean(zt)) / C

    guess = {"sp_shift": jnp.asarray(1.5)}
    val_ref, g_ref = chunked_value_and_grad(chunk_fn, guess, st, xs_chunks)

    fr = tm.fast_runner(block_size=16, mode="trbdf2", substeps=SUBS,
                        hours=T // C)

    def loss(zt, ld, xs):
        return (jnp.mean(ld) / 1e3 + jnp.mean(zt)) / C

    kf = fr.chunk_forward(with_params, loss, collect_loads=True)
    kb = fr.chunk_grad(with_params, loss, collect_loads=True)
    val_k, g_k = chunked_value_and_grad(
        chunk_fn, guess, st, xs_chunks, forward_fn=kf, backward_fn=kb
    )
    assert abs(float(val_k) - float(val_ref)) / abs(float(val_ref)) < 1e-9
    rel = abs(float(g_k["sp_shift"]) - float(g_ref["sp_shift"])) / max(
        abs(float(g_ref["sp_shift"])), 1e-12
    )
    assert rel < 1e-9, (float(g_k["sp_shift"]), float(g_ref["sp_shift"]))


def test_chunk_grad_schedule_fn_matches_xla():
    """Full-pipeline gate: optimizing a SETPOINT SCHEDULE (schedule_fn on a
    scheduled-setpoints runner) through chunk_grad matches the pure-XLA
    chunked adjoint in f64 — the optimal-control contract."""
    SUBS = 6
    cfg = heatx.SimConfig(dtype=np.float64)
    tm = heatx.ThermalModel(_calib_model(ideal=True), n=1, config=cfg)
    building = tm._device()
    Z = building.n_zones
    st = tm.initial_state()
    T, C = 8, 2
    H = T // C
    t_out = -5.0 + 3.0 * np.sin(np.arange(T) / 4)
    seq = tm.inputs_sequence(
        T, t_out=jnp.asarray(t_out), wind_speed=3.0, wind_direction=45.0
    )
    xs_chunks = jax.tree.map(
        lambda v: (v.reshape((C, T // C) + v.shape[1:])
                   if v.ndim and v.shape[0] == T
                   else jnp.broadcast_to(v, (C, T // C) + v.shape)),
        seq,
    )
    # Thread the chunk index through xs so schedule_fn can slice its chunk.
    xs_chunks = (xs_chunks, jnp.arange(C))

    def schedule(params):  # [T, Z] heating-setpoint schedule
        return jnp.broadcast_to((18.0 + params["sp_raw"])[:, None], (T, Z))

    def apply_params(params):
        return building  # the schedule is the only optimization variable

    def chunk_fn(params, state, xs):
        xs, ci = xs
        sp = jax.lax.dynamic_slice_in_dim(schedule(params), ci * H, H)

        def hour(s, x):
            x_in, sp_row = x
            s = imp_mod.imp_march(
                building, s, x_in._replace(heat_sp=sp_row), substeps=SUBS
            )
            return s, (s.zone_T, s.ideal_load)

        state, (zt, ld) = jax.lax.scan(hour, state, (xs, sp))
        return state, (jnp.mean(ld) / 1e3 + jnp.mean(zt)) / C

    guess = {"sp_raw": jnp.asarray(np.linspace(0.0, 3.0, T))}
    val_ref, g_ref = chunked_value_and_grad(chunk_fn, guess, st, xs_chunks)

    fr = tm.fast_runner(block_size=16, mode="trbdf2", substeps=SUBS,
                        hours=H, scheduled_setpoints=True)

    def schedule_fn(params, xs):
        xs, ci = xs
        return {
            "heat_sp": jax.lax.dynamic_slice_in_dim(
                schedule(params), ci * H, H
            )
        }

    def loss(zt, ld, xs):
        return (jnp.mean(ld) / 1e3 + jnp.mean(zt)) / C

    def forward_fn(params, state, xs):
        kf = fr.chunk_forward(
            apply_params, loss, collect_loads=True,
            schedule_fn=lambda p, inner: schedule_fn(p, xs),
        )
        return kf(params, state, xs[0])

    def backward_fn(params, state, xs, state_cot, loss_cot):
        kb = fr.chunk_grad(
            apply_params, loss, collect_loads=True,
            schedule_fn=lambda p, inner: schedule_fn(p, xs),
        )
        return kb(params, state, xs[0], state_cot, loss_cot)

    val_k, g_k = chunked_value_and_grad(
        chunk_fn, guess, st, xs_chunks,
        forward_fn=forward_fn, backward_fn=backward_fn,
    )
    assert abs(float(val_k) - float(val_ref)) / abs(float(val_ref)) < 1e-9
    gr = np.asarray(g_ref["sp_raw"])
    gk = np.asarray(g_k["sp_raw"])
    assert np.allclose(gk, gr, rtol=1e-9, atol=1e-12), (gk, gr)


def test_chunk_grad_fixed_schedule_in_xs_matches_xla():
    """A scheduled-setpoints runner whose schedule rides in ``xs`` as a
    [T] scalar series (NOT optimized — no schedule_fn): the backward's
    trajectory recompute must honor the schedule through _day_tuples'
    normalization, and building-parameter gradients must match the XLA
    adjoint."""
    SUBS = 6
    cfg = heatx.SimConfig(dtype=np.float64)
    tm = heatx.ThermalModel(_calib_model(ideal=True), n=1, config=cfg)
    building = tm._device()
    st = tm.initial_state()
    T, C = 8, 2
    t_out = -5.0 + 3.0 * np.sin(np.arange(T) / 4)
    sched = np.where(np.arange(T) % 4 < 2, 21.0, 18.0)  # [T] setback
    seq = tm.inputs_sequence(
        T, t_out=jnp.asarray(t_out), wind_speed=3.0, wind_direction=45.0,
        heat_sp=jnp.asarray(sched),
    )
    xs_chunks = jax.tree.map(
        lambda v: (v.reshape((C, T // C) + v.shape[1:])
                   if v.ndim and v.shape[0] == T
                   else jnp.broadcast_to(v, (C, T // C) + v.shape)),
        seq,
    )
    sb0 = building.surfaces

    def with_params(params):
        sb = dataclasses.replace(sb0, seg_u=sb0.seg_u * params["u"])
        return dataclasses.replace(building, surfaces=sb)

    def chunk_fn(params, state, xs):
        b = with_params(params)

        def hour(s, x):
            s = imp_mod.imp_march(b, s, x, substeps=SUBS)
            return s, (s.zone_T, s.ideal_load)

        state, (zt, ld) = jax.lax.scan(hour, state, xs)
        return state, (jnp.mean(ld) / 1e3 + jnp.mean(zt)) / C

    guess = {"u": jnp.asarray(1.3)}
    val_ref, g_ref = chunked_value_and_grad(chunk_fn, guess, st, xs_chunks)

    fr = tm.fast_runner(block_size=16, mode="trbdf2", substeps=SUBS,
                        hours=T // C, scheduled_setpoints=True)

    def loss(zt, ld, xs):
        return (jnp.mean(ld) / 1e3 + jnp.mean(zt)) / C

    kf = fr.chunk_forward(with_params, loss, collect_loads=True)
    kb = fr.chunk_grad(with_params, loss, collect_loads=True)
    val_k, g_k = chunked_value_and_grad(
        chunk_fn, guess, st, xs_chunks, forward_fn=kf, backward_fn=kb
    )
    assert abs(float(val_k) - float(val_ref)) / abs(float(val_ref)) < 1e-9
    rel = abs(float(g_k["u"]) - float(g_ref["u"])) / max(
        abs(float(g_ref["u"])), 1e-12
    )
    assert rel < 1e-9, (float(g_k["u"]), float(g_ref["u"]))


def test_chunk_grad_scope_probe_raises():
    """apply_params feeding a NON-differentiated building array (capacity
    clamps) raises on the first backward call instead of silently pulling
    zero gradient."""
    SUBS = 4
    cfg = heatx.SimConfig(dtype=np.float64)
    tm = heatx.ThermalModel(_calib_model(ideal=True), n=1, config=cfg)
    building = tm._device()
    st = tm.initial_state()
    T = 4
    seq = tm.inputs_sequence(T, t_out=0.0, wind_speed=3.0)

    def bad_apply(params):
        return dataclasses.replace(
            building, ctl_max_heat=building.ctl_max_heat * params["cap"]
        )

    fr = tm.fast_runner(block_size=16, mode="trbdf2", substeps=SUBS, hours=T)
    kb = fr.chunk_grad(bad_apply, lambda z, xs: jnp.sum(z))
    zero_cot = jax.tree.map(jnp.zeros_like, st)
    with pytest.raises(ValueError, match="does not differentiate"):
        kb({"cap": jnp.asarray(1.2)}, st, seq, zero_cot, jnp.asarray(1.0))


def test_day_adjoint_interior_mrt_fd():
    """config.interior_mrt buildings differentiate through the adjoint
    kernel: the Carroll effective-emissivity operands (mrt_eps_b for these
    outdoor-front/space-back surfaces) carry FD-correct gradients, and the
    in-kernel 4-iteration MRT fixed point is part of the vjp (round-4
    weak: interior_mrt was rejected)."""
    model = _city(6)
    cfg = heatx.SimConfig(dtype=jnp.float64, interior_mrt=True)
    building = compile_building(model, n=1, config=cfg)
    bb = pallas_step.block_building(building, block_size=16)
    hours, substeps = 2, 4
    hm, params = pallas_step.make_hour_march(
        bb, substeps=substeps, interpret=True, mode="trbdf2", hours=hours
    )
    adj = pallas_adjoint.make_day_adjoint(
        bb, substeps=substeps, mode="trbdf2", hours=hours, interpret=True
    )
    rng = np.random.default_rng(11)
    lay = bb.layout
    SP = lay.padded_surfaces
    NB, ZB, N = bb.n_blocks, bb.zones_per_block, bb.max_nodes
    st = state_mod.initial_state(building)
    T0 = jnp.asarray(lay.surfaces_to_blocked(np.asarray(st.node_T)))
    zT0 = jnp.asarray(lay.zones_to_blocked(np.asarray(st.zone_T)))
    hi = (
        jnp.repeat(jnp.asarray([2.0, 5.0]), substeps),
        jnp.repeat(jnp.asarray([3.0, 4.0]), substeps),
        jnp.repeat(jnp.asarray([0.7, 0.1]), substeps),
        jnp.asarray(rng.uniform(0, 400, (hours, SP))),
        jnp.zeros((hours, SP)),
        jnp.full((hours, SP), 320.0),
        jnp.zeros((hours, SP)),
        jnp.zeros((hours, NB, ZB)),
        jnp.zeros((hours, NB, ZB)),
    )
    WT = jnp.asarray(rng.normal(size=(N, SP)))
    Wz = jnp.asarray(rng.normal(size=(NB, ZB)))
    Wh = jnp.asarray(rng.normal(size=(hours, NB, ZB)))

    def loss(params, T, zT, hi):
        Tn, zTn, _, zth = hm(params, T, zT, hi)[:4]
        return (
            jnp.sum(Tn * WT)
            + jnp.sum(zTn.reshape(NB, ZB) * Wz)
            + jnp.sum(zth * Wh)
        )

    g = adj(params, T0, zT0, hi, (WT, Wz, Wh, None))
    ns = SimpleNS(
        hm=hm, params=params, T0=T0, zT0=zT0, hi=hi, loss=loss, NB=NB,
        ZB=ZB, bb=bb, parts_meta=adj.parts_meta,
    )
    assert "mrt_eps_b" in g["d_params"], sorted(g["d_params"])

    # Effective-emissivity operand direction (the MRT network chain).
    Dp = rng.normal(size=(SP,)) * 0.05
    ad = float(jnp.sum(g["d_params"]["mrt_eps_b"] * jnp.asarray(Dp)))
    fd = _fd(ns, lambda e: (
        _perturb_param(ns, "mrt_eps_b", Dp, e), T0, zT0, hi))
    assert abs(fd - ad) / max(abs(fd), abs(ad), 1e-12) < 5e-4, (fd, ad)

    # Direct emissivity operand still FD-correct alongside the MRT path.
    Dp2 = rng.normal(size=(SP,)) * 0.05
    ad = float(jnp.sum(g["d_params"]["eps_back"] * jnp.asarray(Dp2)))
    fd = _fd(ns, lambda e: (
        _perturb_param(ns, "eps_back", Dp2, e), T0, zT0, hi))
    assert abs(fd - ad) / max(abs(fd), abs(ad), 1e-12) < 5e-4, (fd, ad)


def test_chunk_grad_interior_mrt_matches_xla():
    """Full-pipeline gate for interior-MRT calibration: eps_back gradients
    through chunk_grad (direct path + Carroll-statics chain via
    mrt_eps_blocked_jnp) match the pure-XLA chunked adjoint, which
    differentiates the whole composition natively."""
    SUBS = 6
    cfg = heatx.SimConfig(dtype=np.float64, interior_mrt=True)
    tm = heatx.ThermalModel(_calib_model(), n=1, config=cfg)
    building = tm._device()
    st = tm.initial_state()
    T, C = 8, 2
    t_out = 5.0 + 8.0 * np.sin(np.arange(T) / 4)
    seq = tm.inputs_sequence(
        T, t_out=jnp.asarray(t_out), wind_speed=3.0, wind_direction=45.0,
        hvac_power=jnp.full((building.n_hvacs,), 800.0),
    )
    xs_chunks = jax.tree.map(
        lambda v: (v.reshape((C, T // C) + v.shape[1:])
                   if v.ndim and v.shape[0] == T
                   else jnp.broadcast_to(v, (C, T // C) + v.shape)),
        seq,
    )
    sb0 = building.surfaces

    def with_params(params):
        sb = dataclasses.replace(sb0, eps_back=sb0.eps_back * params["e"])
        return dataclasses.replace(building, surfaces=sb)

    def chunk_fn(params, state, xs):
        b = with_params(params)

        def hour(s, x):
            s = imp_mod.imp_march(b, s, x, substeps=SUBS)
            return s, s.zone_T

        state, zt = jax.lax.scan(hour, state, xs)
        return state, jnp.mean(zt) / C

    guess = {"e": jnp.asarray(0.9)}
    val_ref, g_ref = chunked_value_and_grad(chunk_fn, guess, st, xs_chunks)

    fr = tm.fast_runner(block_size=16, mode="trbdf2", substeps=SUBS,
                        hours=T // C)

    def loss(zt, xs):
        return jnp.mean(zt) / C

    kf = fr.chunk_forward(with_params, loss)
    kb = fr.chunk_grad(with_params, loss)
    val_k, g_k = chunked_value_and_grad(
        chunk_fn, guess, st, xs_chunks, forward_fn=kf, backward_fn=kb
    )
    assert abs(float(val_k) - float(val_ref)) / abs(float(val_ref)) < 1e-9
    rel = abs(float(g_k["e"]) - float(g_ref["e"])) / max(
        abs(float(g_ref["e"])), 1e-12
    )
    assert rel < 1e-8, (float(g_k["e"]), float(g_ref["e"]))


#: Coarse-discretization config: max_dx/min_dt relaxed so the stability
#: search lands at dt_subdivisions=6 instead of the default ~118 (the
#: insulation layer's no-mass classification descends to the min_dt
#: floor) — the parity adjoint unrolls the sub-step count, so tests run
#: it at a tractable trace size (the physics paths exercised — massive
#: RK4 + relaxed no-mass fixed point — are identical).
def _coarse_cfg(**kw):
    return heatx.SimConfig(
        dtype=np.float64, max_dx=0.5, min_dt=900.0, nomass_fixed_iters=2,
        **kw,
    )


def test_day_adjoint_parity_fd():
    """FD gate for the PARITY-mode adjoint: the reference-parity sub-step
    composition (TARP border conditions + RK4 massive march + the relaxed
    no-mass fixed point at nomass_fixed_iters=2, unrolled) differentiates
    correctly (round-4 next-step #5)."""
    model = _calib_model()
    cfg = _coarse_cfg()
    building = compile_building(model, n=1, config=cfg)
    assert building.dt_subdivisions <= 8, building.dt_subdivisions
    substeps = building.dt_subdivisions
    hours = 2
    bb = pallas_step.block_building(building, block_size=16)
    hm, params = pallas_step.make_hour_march(
        bb, substeps=None, interpret=True, mode="parity", hours=hours
    )
    adj = pallas_adjoint.make_day_adjoint(
        bb, substeps=substeps, mode="parity", hours=hours, interpret=True
    )
    rng = np.random.default_rng(13)
    lay = bb.layout
    SP = lay.padded_surfaces
    NB, ZB, N = bb.n_blocks, bb.zones_per_block, bb.max_nodes
    st = state_mod.initial_state(building)
    T0 = jnp.asarray(lay.surfaces_to_blocked(np.asarray(st.node_T)))
    zT0 = jnp.asarray(lay.zones_to_blocked(np.asarray(st.zone_T)))
    hi = (
        jnp.repeat(jnp.asarray([2.0, 5.0]), substeps),
        jnp.repeat(jnp.asarray([3.0, 4.0]), substeps),
        jnp.repeat(jnp.asarray([0.7, 0.1]), substeps),
        jnp.asarray(rng.uniform(0, 400, (hours, SP))),
        jnp.zeros((hours, SP)),
        jnp.full((hours, SP), 320.0),
        jnp.zeros((hours, SP)),
        jnp.zeros((hours, NB, ZB)),
        jnp.zeros((hours, NB, ZB)),
    )
    WT = jnp.asarray(rng.normal(size=(N, SP)))
    Wz = jnp.asarray(rng.normal(size=(NB, ZB)))
    Wh = jnp.asarray(rng.normal(size=(hours, NB, ZB)))

    def loss(params, T, zT, hi):
        Tn, zTn, _, zth = hm(params, T, zT, hi)[:4]
        return (
            jnp.sum(Tn * WT)
            + jnp.sum(zTn.reshape(NB, ZB) * Wz)
            + jnp.sum(zth * Wh)
        )

    g = adj(params, T0, zT0, hi, (WT, Wz, Wh, None))
    ns = SimpleNS(
        hm=hm, params=params, T0=T0, zT0=zT0, hi=hi, loss=loss, NB=NB,
        ZB=ZB, bb=bb, parts_meta=adj.parts_meta,
    )

    D = jnp.asarray(rng.normal(size=(N, SP)))
    fd = _fd(ns, lambda e: (params, T0 + e * D, zT0, hi))
    ad = float(jnp.sum(g["dT0"] * D))
    assert abs(fd - ad) / max(abs(fd), abs(ad)) < 2e-5, (fd, ad)

    Dp = rng.normal(size=(N, SP))
    ad = float(jnp.sum(g["d_params"]["seg_u"] * jnp.asarray(Dp)))
    fd = _fd(ns, lambda e: (_perturb_param(ns, "seg_u", Dp, e), T0, zT0, hi))
    assert abs(fd - ad) / max(abs(fd), abs(ad), 1e-12) < 5e-4, (fd, ad)

    Ds = rng.normal(size=(ns.hi[3].shape)) * 10
    fd = _fd(ns, lambda e: (params, T0, zT0,
                            hi[:3] + (hi[3] + e * jnp.asarray(Ds),) + hi[4:]))
    ad = float(jnp.sum(g["d_sol_front"] * jnp.asarray(Ds)))
    assert abs(fd - ad) / max(abs(fd), abs(ad)) < 2e-5, (fd, ad)


def test_chunk_grad_parity_matches_xla():
    """Full-pipeline gate: chunk_grad on a PARITY-mode runner matches the
    pure-XLA chunked adjoint over the reference-parity integrator
    (engine.step.march), f64.  Calibration against the replay-validated
    physics at kernel speed — the api.py parity rejection is gone."""
    from heatx.engine import step as step_mod

    cfg = _coarse_cfg()
    tm = heatx.ThermalModel(_calib_model(), n=1, config=cfg)
    building = tm._device()
    st = tm.initial_state()
    T, C = 8, 2
    t_out = 5.0 + 8.0 * np.sin(np.arange(T) / 4)
    sol = np.maximum(0.0, 600.0 * np.sin((np.arange(T) - 2) / 6 * np.pi))
    seq = tm.inputs_sequence(
        T, t_out=jnp.asarray(t_out), wind_speed=3.0, wind_direction=45.0,
        hvac_power=jnp.full((building.n_hvacs,), 800.0),
    )
    S = building.n_surfaces
    seq = seq._replace(
        sol_front=jnp.broadcast_to(jnp.asarray(sol)[:, None], (T, S)),
    )
    xs_chunks = jax.tree.map(
        lambda v: (v.reshape((C, T // C) + v.shape[1:])
                   if v.ndim and v.shape[0] == T
                   else jnp.broadcast_to(v, (C, T // C) + v.shape)),
        seq,
    )
    sb0 = building.surfaces

    def with_params(params):
        sb = dataclasses.replace(
            sb0,
            seg_u=sb0.seg_u * params["u_scale"],
            front_alphas=sb0.front_alphas * params["alpha_scale"],
        )
        return dataclasses.replace(building, surfaces=sb)

    def chunk_fn(params, state, xs):
        b = with_params(params)

        def hour(s, x):
            s = step_mod.march(b, s, x)
            return s, s.zone_T

        state, zt = jax.lax.scan(hour, state, xs)
        return state, jnp.mean(zt) / C

    guess = {"u_scale": jnp.asarray(1.3), "alpha_scale": jnp.asarray(0.8)}
    val_ref, g_ref = chunked_value_and_grad(chunk_fn, guess, st, xs_chunks)

    fr = tm.fast_runner(block_size=16, mode="parity", hours=T // C)

    def loss(zt, xs):
        return jnp.mean(zt) / C

    kf = fr.chunk_forward(with_params, loss)
    kb = fr.chunk_grad(with_params, loss)
    val_k, g_k = chunked_value_and_grad(
        chunk_fn, guess, st, xs_chunks, forward_fn=kf, backward_fn=kb
    )
    assert abs(float(val_k) - float(val_ref)) / abs(float(val_ref)) < 1e-9
    for k in g_ref:
        rel = abs(float(g_k[k]) - float(g_ref[k])) / max(
            abs(float(g_ref[k])), 1e-12
        )
        assert rel < 1e-8, (k, float(g_k[k]), float(g_ref[k]))


@pytest.mark.slow
@pytest.mark.parametrize("seed", [0, 1])
def test_fuzz_chunk_grad_matches_xla(seed):
    """Randomized adjoint gate: a random small building (zone count,
    surface mix, volumes, thermostats on/off, interior MRT on/off,
    random weather/solar) must produce kernel-adjoint gradients matching
    the pure-XLA chunked adjoint — the same discipline as the forward
    fuzz suite (test_fuzz_parity), pointed at the backward sweep."""
    rng = np.random.default_rng(seed)
    nz = int(rng.integers(2, 5))
    ideal = bool(rng.integers(0, 2))
    mrt = bool(rng.integers(0, 2))

    from heatx.model.building import IdealHeaterCooler

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
    m.add_material(Material("c6", "concrete", 0.06))
    m.add_material(Material("p5", "poly", 0.05))
    m.add_construction(Construction("wallA", ["p5", "c10"]))
    m.add_construction(Construction("wallB", ["c6"]))
    verts = np.array([[0, 0, 0], [6, 0, 0], [6, 0, 3], [0, 0, 3]], float)
    for z in range(nz):
        m.add_space(SpaceDef(f"r{z}", float(rng.uniform(80, 250))))
        for s in range(int(rng.integers(2, 5))):
            m.add_surface(SurfaceDef(
                f"w{z}_{s}", "wallA" if rng.integers(0, 2) else "wallB",
                Boundary.outdoor(), Boundary.space_(f"r{z}"), vertices=verts,
            ))
        if ideal:
            m.add_hvac(IdealHeaterCooler(
                f"h{z}", [f"r{z}"], heat_setpoint=float(rng.uniform(18, 21)),
                cool_setpoint=float(rng.uniform(25, 28)),
                max_heating=3000.0, max_cooling=3000.0,
            ))

    SUBS = 4
    cfg = heatx.SimConfig(dtype=np.float64, interior_mrt=mrt)
    tm = heatx.ThermalModel(m, n=1, config=cfg)
    building = tm._device()
    st = tm.initial_state()
    T, C = 8, 2
    S = building.n_surfaces
    seq = tm.inputs_sequence(
        T,
        t_out=jnp.asarray(rng.uniform(-8, 12, T)),
        wind_speed=jnp.asarray(rng.uniform(0.5, 8, T)),
        wind_direction=float(rng.uniform(0, 6)),
        sol_front=jnp.asarray(rng.uniform(0, 500, (T, S))),
        ir_front=jnp.asarray(rng.uniform(280, 380, (T, S))),
    )
    xs_chunks = jax.tree.map(
        lambda v: (v.reshape((C, T // C) + v.shape[1:])
                   if v.ndim and v.shape[0] == T
                   else jnp.broadcast_to(v, (C, T // C) + v.shape)),
        seq,
    )
    sb0 = building.surfaces

    def with_params(p):
        sb = dataclasses.replace(
            sb0,
            seg_u=sb0.seg_u * p["u"],
            eps_back=sb0.eps_back * p["e"],
        )
        return dataclasses.replace(building, surfaces=sb)

    def chunk_fn(params, state, xs):
        b = with_params(params)

        def hour(s, x):
            s = imp_mod.imp_march(b, s, x, substeps=SUBS)
            return s, (s.zone_T, s.ideal_load) if ideal else s.zone_T

        state, hist = jax.lax.scan(hour, state, xs)
        if ideal:
            zt, ld = hist
            return state, (jnp.mean(ld) / 1e3 + jnp.mean(zt)) / C
        return state, jnp.mean(hist * hist) / C

    guess = {"u": jnp.asarray(float(rng.uniform(0.8, 1.4))),
             "e": jnp.asarray(float(rng.uniform(0.8, 1.1)))}
    val_ref, g_ref = chunked_value_and_grad(chunk_fn, guess, st, xs_chunks)

    fr = tm.fast_runner(block_size=16, mode="trbdf2", substeps=SUBS,
                        hours=T // C)
    if ideal:
        def loss(zt, ld, xs):
            return (jnp.mean(ld) / 1e3 + jnp.mean(zt)) / C
    else:
        def loss(zt, xs):
            return jnp.mean(zt * zt) / C
    kf = fr.chunk_forward(with_params, loss, collect_loads=ideal)
    kb = fr.chunk_grad(with_params, loss, collect_loads=ideal)
    val_k, g_k = chunked_value_and_grad(
        chunk_fn, guess, st, xs_chunks, forward_fn=kf, backward_fn=kb
    )
    assert abs(float(val_k) - float(val_ref)) / max(
        abs(float(val_ref)), 1e-12
    ) < 1e-8, (seed, float(val_k), float(val_ref))
    for k in g_ref:
        rel = abs(float(g_k[k]) - float(g_ref[k])) / max(
            abs(float(g_ref[k])), 1e-12
        )
        assert rel < 1e-7, (seed, k, float(g_k[k]), float(g_ref[k]))


def test_chunk_grad_contract_mismatch_raises():
    """A backward whose trajectory options diverge from the runner's last
    chunk_forward raises instead of silently differentiating a different
    trajectory (ADVICE r4)."""
    cfg = heatx.SimConfig(dtype=np.float64)
    tm = heatx.ThermalModel(_calib_model(ideal=True), n=1, config=cfg)
    building = tm._device()
    fr = tm.fast_runner(block_size=16, mode="trbdf2", substeps=4, hours=2)
    fr.chunk_forward(lambda p: building, lambda z, l, xs: jnp.sum(l),
                     collect_loads=True)
    with pytest.raises(ValueError, match="differ from this runner"):
        fr.chunk_grad(lambda p: building, lambda z, xs: jnp.sum(z))
    # Matching contracts build fine.
    fr.chunk_grad(lambda p: building, lambda z, l, xs: jnp.sum(l),
                  collect_loads=True)


def test_adjoint_scope_raises():
    model = _city(6)
    cfg = heatx.SimConfig(dtype=jnp.float64)
    building = compile_building(model, n=1, config=cfg)
    bb = pallas_step.block_building(building, block_size=16)
    # Parity mode needs the sub-step count and, on no-mass buildings, the
    # fixed-iteration fixed point (the adaptive while_loop has no VJP).
    with pytest.raises(ValueError, match="stability-dictated"):
        pallas_adjoint.make_day_adjoint(bb, mode="parity", interpret=True)
    with pytest.raises(ValueError, match="nomass_fixed_iters"):
        pallas_adjoint.make_day_adjoint(
            bb, mode="parity", substeps=4, interpret=True
        )
