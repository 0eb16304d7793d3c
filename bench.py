"""heatx headline benchmark: annual 8760 h EPW simulation of a 10k-surface
building on one chip.

Target (BASELINE.json north star): < 10 s wall-clock on a single TPU v5e,
metric = wall-node updates/sec/chip.  The reference publishes no performance
numbers (BASELINE.md), so vs_baseline is measured against the 10 s target.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def build_city_model(n_zones: int, surfaces_per_zone: int, orientations: bool = False):
    """A synthetic city-block building: per zone, massive concrete walls, one
    mixed (insulated) wall, and a glazed window — exercising the massive RK4
    path, the no-mass fixed point, and glazing optics together.

    ``orientations=True`` rotates successive surfaces through the four
    compass facades (used with heatx.weather.solar for orientation-resolved
    irradiance; the default keeps every facade south-facing, matching the
    scored bench workload)."""
    from heatx.model.building import (
        Boundary,
        BuildingModel,
        Construction,
        ElectricHeater,
        Luminaire,
        Material,
        SpaceDef,
        Substance,
        SurfaceDef,
    )

    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0,
                  specific_heat_capacity=800.0, front_thermal_absorbtance=0.9,
                  back_thermal_absorbtance=0.9, front_solar_absorbtance=0.7,
                  back_solar_absorbtance=0.7)
    )
    m.add_substance(
        Substance("poly", thermal_conductivity=0.0252, density=17.5,
                  specific_heat_capacity=2400.0, front_thermal_absorbtance=0.9,
                  back_thermal_absorbtance=0.9, front_solar_absorbtance=0.7,
                  back_solar_absorbtance=0.7)
    )
    m.add_substance(
        Substance("glass", thermal_conductivity=1.0, density=2500.0,
                  specific_heat_capacity=840.0, solar_transmittance=0.8,
                  front_solar_absorbtance=0.1, back_solar_absorbtance=0.1,
                  front_thermal_absorbtance=0.84, back_thermal_absorbtance=0.84)
    )
    m.add_material(Material("c20", "concrete", 0.2))
    m.add_material(Material("p2", "poly", 0.02))
    m.add_material(Material("g6", "glass", 0.006))
    m.add_construction(Construction("massive", ["c20"]))
    m.add_construction(Construction("mixed", ["p2", "c20", "p2"]))
    m.add_construction(Construction("window", ["g6"]))

    base = np.array([[0, 0, 0], [6, 0, 0], [6, 0, 3], [0, 0, 3]], float)
    rots = [base]
    if orientations:
        for _ in range(3):  # rotate 90 deg about z: (x, y) -> (-y, x)
            prev = rots[-1]
            rots.append(np.stack([-prev[:, 1], prev[:, 0], prev[:, 2]], axis=1))
    kinds = ["massive"] * (surfaces_per_zone - 2) + ["mixed", "window"]
    for z in range(n_zones):
        zone = f"z{z}"
        m.add_space(SpaceDef(zone, 200.0))
        for si, kind in enumerate(kinds):
            m.add_surface(
                SurfaceDef(
                    f"s{z}_{si}", kind, Boundary.outdoor(), Boundary.space_(zone),
                    vertices=rots[(z + si) % len(rots)],
                )
            )
        m.add_hvac(ElectricHeater(f"h{z}", zone))
        m.add_luminaire(Luminaire(f"l{z}", zone))
    return m


def load_weather(hours: int):
    """EPW weather if the reference fixture is available, synthetic otherwise."""
    epw_path = os.environ.get(
        "HEATX_EPW", "/root/reference/tests/epw/CHL_Santiago.855740_IWEC.epw"
    )
    if os.path.isfile(epw_path):
        from heatx.weather.epw import read_epw

        w = read_epw(epw_path)
        reps = int(np.ceil(hours / w.n_hours))
        return (
            np.tile(w.dry_bulb, reps)[:hours],
            np.tile(w.wind_speed, reps)[:hours],
            np.tile(w.wind_direction_rad, reps)[:hours],
            np.tile(w.global_horizontal, reps)[:hours],
            np.tile(w.horizontal_ir, reps)[:hours],
        )
    t = np.arange(hours)
    return (
        10.0 + 10.0 * np.sin(2 * np.pi * t / 24.0),
        3.0 + 2.0 * np.sin(2 * np.pi * t / 17.0),
        np.radians((t * 7.0) % 360.0),
        np.maximum(0.0, 600.0 * np.sin(2 * np.pi * (t % 24) / 24.0 - np.pi / 2)),
        np.full(hours, 350.0),
    )


def run_demand_bench(args, dtype, block_size, dry, wind, wdir, ghi, ir):
    """Annual heating/cooling demand with a thermostat per zone, computed
    inside the fused day kernel (the EnergyPlus ideal-loads pattern;
    heating_cooling.rs:66-90 is todo!() in the reference).  Returns the
    demand_* fields for the bench JSON line."""
    import time

    import jax
    import jax.numpy as jnp

    import heatx
    from heatx.model.building import IdealHeaterCooler

    model = build_city_model(args.zones, args.surfaces_per_zone)
    for z in range(args.zones):
        model.add_hvac(IdealHeaterCooler(
            f"tstat{z}", [f"z{z}"], heat_setpoint=20.0, cool_setpoint=26.0))
    tm = heatx.ThermalModel(
        model, n=1,
        config=heatx.SimConfig(
            dtype=dtype,
            # 0 = reference-exact adaptive loop, same mapping as the headline
            # rows (silently coercing 0 -> 1 mixed regimes in one JSON line).
            nomass_fixed_iters=args.nomass_iters if args.nomass_iters > 0 else None,
        ),
    )
    b = tm.building
    S = b.n_surfaces
    T = args.hours
    rng = np.random.default_rng(0)
    sf = rng.uniform(0.2, 1.0, S)
    # NO leaf-wise broadcast to [T, ...]: FastRunner accepts channels
    # without a time axis and broadcasts them lazily per dispatch chunk.
    # Materializing every channel annually at 100k surfaces (sol_back /
    # ir_back alone are 3.5 GB each) exhausts HBM.  Only sol_front is
    # genuinely per-surface-per-hour; IR rides as a [T] per-hour scalar.
    seq = tm.inputs(lum_power=np.full(b.n_luminaires, 150.0))._replace(
        t_out=jnp.asarray(dry, dtype),
        wind_speed=jnp.asarray(wind, dtype),
        wind_direction=jnp.asarray(wdir, dtype),
        sol_front=jnp.asarray(
            np.asarray(ghi[:, None] * sf[None, :], np.float32), dtype
        ),
        ir_front=jnp.asarray(ir, dtype),
    )
    fr = tm.fast_runner(
        block_size=block_size, mode="trbdf2", substeps=args.exp_substeps,
        hours=args.kernel_hours,
    )
    st = tm.initial_state()
    kw = dict(dispatch_days=args.dispatch_days, collect_loads=True)

    def timed():
        t0 = time.time()
        final, zt, loads = fr.run(st, seq, **kw)
        heat = float(jnp.sum(jnp.clip(loads, min=0))) / 1000.0 / b.n_zones
        cool = float(-jnp.sum(jnp.clip(loads, max=0))) / 1000.0 / b.n_zones
        return time.time() - t0, heat, cool

    # Warm up the FULL timed computation (run + the kWh reductions): the
    # first reduction call compiles inside the timed region otherwise, and
    # the first post-compile rep carries process-state noise through the
    # remote tunnel (measured 12.5 s for a 0.85 s steady-state run).
    t0 = time.time()
    timed()
    print(f"# demand compile+run: {time.time() - t0:.1f}s", file=sys.stderr)
    wall, heat, cool = timed()
    wall2, h2, c2 = timed()
    if wall2 < wall:
        wall, heat, cool = wall2, h2, c2
    assert np.isfinite(heat) and np.isfinite(cool) and heat > 0
    print(
        f"# demand kernel {T}h x {b.n_zones} thermostats: {wall:.2f}s; "
        f"heating {heat:.0f} kWh/zone, cooling {cool:.0f} kWh/zone",
        file=sys.stderr,
    )
    return dict(
        demand_wall_clock_s=round(wall, 3),
        demand_heating_kwh_per_zone=round(heat, 1),
        demand_cooling_kwh_per_zone=round(cool, 1),
    )


def run_grad_bench(args, dtype, block_size, dry, wind, wdir, ghi, ir):
    """Annual reverse-mode value_and_grad through the kernel adjoint
    (heatx.ops.pallas_adjoint): forward sweep = fused day kernel, backward
    sweep = adjoint day kernel, chunked (heatx.engine.adjoint).  The
    calibration workload: gradient of an annual zone-temperature objective
    w.r.t. a conductance scale and a solar-absorptance scale (one backward
    pass prices every parameter; these two are the observables).  Returns
    the grad_* fields for the bench JSON line.  The XLA-backward hybrid
    measured 137 s on this workload (PERF.md 'Differentiation cost')."""
    import dataclasses
    import time

    import jax
    import jax.numpy as jnp

    import heatx
    from heatx.engine.adjoint import chunked_value_and_grad

    model = build_city_model(args.zones, args.surfaces_per_zone)
    tm = heatx.ThermalModel(
        model, n=1, config=heatx.SimConfig(dtype=dtype),
    )
    b = tm.building
    building = tm._device()
    S = b.n_surfaces
    T = args.hours
    # Chunk count: bounded backward dispatches; chunks must be whole
    # kernel-hours multiples (5 chunks of 73 days for the annual horizon).
    C = 5 if T % (5 * args.kernel_hours) == 0 else 1
    rng = np.random.default_rng(0)
    sf = rng.uniform(0.2, 1.0, S)
    seq = tm.inputs(hvac_power=np.full(b.n_hvacs, 500.0))._replace(
        t_out=jnp.asarray(dry, dtype),
        wind_speed=jnp.asarray(wind, dtype),
        wind_direction=jnp.asarray(wdir, dtype),
        sol_front=jnp.asarray(
            np.asarray(ghi[:, None] * sf[None, :], np.float32), dtype
        ),
        ir_front=jnp.asarray(ir, dtype),
    )
    def chunkize(v):
        v = jnp.asarray(v)
        if v.ndim and v.shape[0] == T:
            return v.reshape((C, T // C) + v.shape[1:])
        # Static channel: compact [C, ...] broadcast only — the runner
        # broadcasts over hours lazily per dispatch chunk.  A full
        # [C, T//C, S] materialization is 3.5 GB per channel at 100k
        # surfaces (the same HBM hazard the demand row documents).
        return jnp.broadcast_to(v, (C,) + v.shape)

    xs_chunks = jax.tree.map(chunkize, seq)
    sb0 = building.surfaces

    def with_params(p):
        sb = dataclasses.replace(
            sb0,
            seg_u=sb0.seg_u * p["u_scale"],
            front_alphas=sb0.front_alphas * p["alpha_scale"],
        )
        return dataclasses.replace(building, surfaces=sb)

    def loss_fn(zt, xs):
        return jnp.mean((zt - 21.0) ** 2) / C

    fr = tm.fast_runner(
        block_size=block_size, mode="trbdf2_refresh",
        refresh_every=args.refresh_every, substeps=args.exp_substeps,
        hours=args.kernel_hours,
    )
    kf = fr.chunk_forward(with_params, loss_fn)
    kb = fr.chunk_grad(with_params, loss_fn)
    st = tm.initial_state()
    params = {"u_scale": jnp.asarray(1.2, dtype),
              "alpha_scale": jnp.asarray(0.8, dtype)}

    def timed():
        t0 = time.time()
        val, g = chunked_value_and_grad(
            None, params, st, xs_chunks, forward_fn=kf, backward_fn=kb
        )
        gu, ga = float(g["u_scale"]), float(g["alpha_scale"])
        return time.time() - t0, float(val), gu, ga

    t0 = time.time()
    timed()
    print(f"# grad compile+run: {time.time() - t0:.1f}s", file=sys.stderr)
    wall, val, gu, ga = timed()
    wall2, v2, gu2, ga2 = timed()
    if wall2 < wall:
        wall, val, gu, ga = wall2, v2, gu2, ga2
    assert np.isfinite(val) and np.isfinite(gu) and np.isfinite(ga)
    print(
        f"# grad kernel-adjoint annual value_and_grad: {wall:.2f}s "
        f"(loss {val:.1f}, dL/du {gu:.1f}, dL/dalpha {ga:.1f})",
        file=sys.stderr,
    )
    out = dict(
        grad_wall_clock_s=round(wall, 3),
        grad_chunks=C,
        grad_loss=round(val, 3),
    )
    try:
        out.update(_grad_demand_variant(
            args, dtype, block_size, C, (dry, wind, wdir, ghi, ir), sf,
            chunkize,
        ))
    except Exception as e:  # the zt-objective row survives a demand failure
        print(f"# grad-demand variant failed: {e}", file=sys.stderr)
        out["grad_demand_error"] = str(e)[:200]
    return out


def _grad_demand_variant(args, dtype, block_size, C, weather, sf, chunkize):
    """The DEMAND-objective gradient at bench scale: a thermostat per zone,
    a metered-energy loss on the in-kernel ideal-load history
    (chunk_forward/chunk_grad(collect_loads=True) — the d_ld cotangent
    path), and a thermostat-setpoint calibration parameter (the ctl
    pull-back) alongside the conductance scale.  The most common real
    calibration target, timed on hardware; returns grad_demand_* fields."""
    import dataclasses
    import time

    import jax
    import jax.numpy as jnp

    import heatx
    from heatx.engine.adjoint import chunked_value_and_grad
    from heatx.model.building import IdealHeaterCooler

    model = build_city_model(args.zones, args.surfaces_per_zone)
    for z in range(args.zones):
        model.add_hvac(IdealHeaterCooler(
            f"tstat{z}", [f"z{z}"], heat_setpoint=20.0, cool_setpoint=26.0,
        ))
    tm = heatx.ThermalModel(model, n=1, config=heatx.SimConfig(dtype=dtype))
    building = tm._device()
    sb0 = building.surfaces
    dry, wind, wdir, ghi, ir = weather
    # Own input set: this model carries 2x the hvac units (heater +
    # thermostat per zone), so the zt-row's seq shapes do not transfer.
    seq = tm.inputs(
        lum_power=np.full(building.n_luminaires, 150.0),
    )._replace(
        t_out=jnp.asarray(dry, dtype),
        wind_speed=jnp.asarray(wind, dtype),
        wind_direction=jnp.asarray(wdir, dtype),
        sol_front=jnp.asarray(
            np.asarray(ghi[:, None] * sf[None, :], np.float32), dtype
        ),
        ir_front=jnp.asarray(ir, dtype),
    )
    xs_chunks = jax.tree.map(chunkize, seq)

    def with_params(p):
        sb = dataclasses.replace(sb0, seg_u=sb0.seg_u * p["u_scale"])
        return dataclasses.replace(
            building, surfaces=sb,
            ctl_heat_sp=building.ctl_heat_sp + p["sp_shift"],
        )

    def loss_fn(zt, ld, xs):
        return jnp.mean((ld / 1e3) ** 2) / C + 1e-4 * jnp.mean(zt) / C

    fr = tm.fast_runner(
        block_size=block_size, mode="trbdf2_refresh",
        refresh_every=args.refresh_every, substeps=args.exp_substeps,
        hours=args.kernel_hours,
    )
    kf = fr.chunk_forward(with_params, loss_fn, collect_loads=True)
    kb = fr.chunk_grad(with_params, loss_fn, collect_loads=True)
    st = tm.initial_state()
    params = {"u_scale": jnp.asarray(1.2, dtype),
              "sp_shift": jnp.asarray(0.5, dtype)}

    def timed():
        t0 = time.time()
        val, g = chunked_value_and_grad(
            None, params, st, xs_chunks, forward_fn=kf, backward_fn=kb
        )
        return (time.time() - t0, float(val), float(g["u_scale"]),
                float(g["sp_shift"]))

    t0 = time.time()
    timed()
    print(f"# grad-demand compile+run: {time.time() - t0:.1f}s",
          file=sys.stderr)
    wall, val, gu, gsp = timed()
    wall2, v2, gu2, gsp2 = timed()
    if wall2 < wall:
        wall, val, gu, gsp = wall2, v2, gu2, gsp2
    assert np.isfinite(val) and np.isfinite(gu) and np.isfinite(gsp)
    assert gsp != 0.0, "setpoint gradient carries no signal"
    print(
        f"# grad-demand kernel-adjoint annual value_and_grad: {wall:.2f}s "
        f"(loss {val:.3f}, dL/du {gu:.3g}, dL/dsp {gsp:.3g})",
        file=sys.stderr,
    )
    return dict(
        grad_demand_wall_clock_s=round(wall, 3),
        grad_demand_loss=round(val, 4),
    )


def run_office_bench(args, dtype):
    """The complete EnergyPlus-file workflow, timed on hardware: the
    committed ``examples/data/office.idf`` (envelope + windows with an
    argon cavity + internal mass + zone-list gains on office schedules +
    scheduled infiltration/ventilation + night-setback thermostats) runs a
    full year under real EPW weather — computed solar, monthly soil
    temperatures via per-dispatch operand swaps, imported schedules as
    input channels, demand collected in-kernel.  Returns office_* fields."""
    import time

    import jax
    import jax.numpy as jnp

    import heatx
    from heatx.build.layout import B_GROUND, B_OUTDOOR
    from heatx.model.idf import load_idf
    from heatx.weather.epw import _MONTH_HOURS, read_epw
    from heatx.weather.solar import surface_irradiance

    epw_path = os.environ.get(
        "HEATX_EPW", "/root/reference/tests/epw/CHL_Santiago.855740_IWEC.epw"
    )
    if not os.path.isfile(epw_path):
        return {}
    idf = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "examples", "data", "office.idf")
    loaded = load_idf(idf)
    tm = heatx.ThermalModel(
        loaded.model, n=1, config=heatx.SimConfig(dtype=dtype)
    )
    b = tm.building
    T = min(args.hours, 8760)
    w = read_epw(epw_path)
    reps = -(-T // w.n_hours)
    tile = lambda v: np.tile(np.asarray(v, np.float64), reps)[:T]  # noqa: E731
    sb = b.surfaces
    out_f = np.asarray(sb.front_code) == B_OUTDOOR
    sol_f = surface_irradiance(w, b, hours=T) * out_f
    ch = loaded.hourly_channels(T)
    air = loaded.airflow_series(T)
    dry = tile(w.dry_bulb)
    Z = b.n_zones
    t_in = np.repeat(dry[:, None], Z, axis=1)
    seq = tm.inputs()._replace(
        t_out=jnp.asarray(dry, dtype),
        wind_speed=jnp.asarray(tile(w.wind_speed), dtype),
        wind_direction=jnp.asarray(tile(np.radians(w.wind_direction_deg)), dtype),
        sol_front=jnp.asarray(sol_f, dtype),
        ir_front=jnp.asarray(tile(w.horizontal_ir), dtype),
        inf_vol=air["inf_vol"], inf_mask=air["inf_vol"] > 0, inf_temp=t_in,
        vent_vol=air["vent_vol"], vent_mask=air["vent_vol"] > 0, vent_temp=t_in,
        **{k: jnp.asarray(v, dtype) for k, v in ch.items()},
    )
    ground = None
    if ((np.asarray(sb.front_code) == B_GROUND).any()
            or (np.asarray(sb.back_code) == B_GROUND).any()) and w.ground_temps:
        ground = w.ground_temperature(None)[_MONTH_HOURS[np.arange(T) % 8760]]
    fr = tm.fast_runner(
        mode="trbdf2", substeps=args.exp_substeps, hours=24,
        scheduled_setpoints="heat_sp" in ch,
    )
    st = tm.initial_state()
    kw = dict(ground_hourly=ground, collect_loads=True)

    def timed():
        t0 = time.time()
        final, zt, loads = fr.run(st, seq, **kw)
        heat = float(jnp.sum(jnp.clip(loads, min=0))) / 1000.0
        cool = float(-jnp.sum(jnp.clip(loads, max=0))) / 1000.0
        return time.time() - t0, heat, cool

    # Warm the FULL timed computation, then keep the better of two reps —
    # the first post-compile rep can carry process-state noise through the
    # remote tunnel (same discipline as the demand/kernel rows).
    t0 = time.time()
    timed()
    print(f"# office-idf compile+run: {time.time() - t0:.1f}s", file=sys.stderr)
    wall, heat, cool = timed()
    w2, h2, c2 = timed()
    if w2 < wall:
        wall, heat, cool = w2, h2, c2
    assert np.isfinite(heat) and np.isfinite(cool)
    print(
        f"# office-idf workflow: {T}h x {Z} zones in {wall:.2f}s; "
        f"heating {heat:.0f} kWh, cooling {cool:.0f} kWh",
        file=sys.stderr,
    )
    return dict(
        office_idf_wall_clock_s=round(wall, 3),
        office_idf_heating_kwh=round(heat, 1),
        office_idf_cooling_kwh=round(cool, 1),
    )


def run_accuracy_bench(args, dtype):
    """Hardware-measured accuracy: replay the regime-gate workload (3 weeks
    of real EPW weather, the 4-zone/40-surface city of
    tests/test_fast_regime.py) through the fused Pallas kernels on the REAL
    chip in float32, and report the zone-temperature RMSE against the
    committed f64 reference-exact golden
    (tests/data/accuracy_golden_504h.npz, regenerated by
    scripts/make_accuracy_golden.py).  This puts an accuracy number measured
    on the benched hardware next to the wall-clock ones in the scored JSON:
    the parity row's f32+fixed-iteration drift and the TR-BDF2 fast-regime
    error (CPU-f64-measured at 0.33 K in tests/test_fast_regime.py)."""
    import jax.numpy as jnp

    import heatx

    golden_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "data", "accuracy_golden_504h.npz",
    )
    with np.load(golden_path) as g:
        zhist_gold = g["zhist_par"]
        hours, warm = int(g["hours"]), int(g["warmup"])
        zones, spz = int(g["zones"]), int(g["surfaces_per_zone"])

    dry, wind, wdir, ghi, ir = (v[:hours] for v in load_weather(hours))
    model = build_city_model(zones, spz)
    tm = heatx.ThermalModel(
        model, n=1,
        config=heatx.SimConfig(
            dtype=dtype,
            nomass_fixed_iters=args.nomass_iters if args.nomass_iters > 0 else None,
        ),
    )
    b = tm.building
    # Same per-surface solar factors as compute_regime_runs (seed 0).
    sf = np.random.default_rng(0).uniform(0.2, 1.0, b.n_surfaces)
    seq = tm.inputs(
        hvac_power=np.full(b.n_hvacs, 500.0),
        lum_power=np.full(b.n_luminaires, 150.0),
    )._replace(
        t_out=jnp.asarray(dry, dtype),
        wind_speed=jnp.asarray(wind, dtype),
        wind_direction=jnp.asarray(wdir, dtype),
        sol_front=jnp.asarray(np.asarray(ghi[:, None] * sf[None, :]), dtype),
        ir_front=jnp.asarray(ir, dtype),
    )
    st = tm.initial_state()
    rng_T = float(zhist_gold[warm:].max() - zhist_gold[warm:].min())
    out = dict(accuracy_hours=hours)
    rows = [
        ("parity", None, "accuracy_parity_rmse_K"),
        ("trbdf2", None, "accuracy_trbdf2_rmse_K"),
        ("trbdf2_refresh", None, "accuracy_refresh_rmse_K"),
    ]
    if args.refresh_every > 1:
        # The scored headline config (hybrid cadence).
        rows.append(
            ("trbdf2_refresh", args.refresh_every, "accuracy_headline_rmse_K")
        )
    for mode, k, field in rows:
        fr = tm.fast_runner(
            block_size=128, mode=mode, hours=24,
            substeps=None if mode == "parity" else args.exp_substeps,
            refresh_every=k,
        )
        _, zt = fr.run(st, seq, interp_weather=True)
        d = np.asarray(zt, np.float64)[warm:] - zhist_gold[warm:]
        rmse = float(np.sqrt((d**2).mean()))
        tag = mode if k is None else f"{mode}@{k}"
        print(
            f"# accuracy {tag} kernel ({args.dtype}) vs f64-exact golden, "
            f"{hours}h: rmse {rmse:.4f} K ({rmse / rng_T * 100:.2f}% of "
            f"{rng_T:.1f} K range), bias {d.mean():+.4f} K",
            file=sys.stderr,
        )
        out[field] = round(rmse, 4)
        out[field.replace("_K", "_frac_of_range")] = round(rmse / rng_T, 5)
    if args.refresh_every == 1:
        out["accuracy_headline_rmse_K"] = out["accuracy_refresh_rmse_K"]
        out["accuracy_headline_rmse_frac_of_range"] = out[
            "accuracy_refresh_rmse_frac_of_range"
        ]
    # Sanity bombs, generous vs the CPU-measured 0.33 K fast-regime error:
    # a solver regression shows up here as Kelvins, not millikelvins.
    assert out["accuracy_parity_rmse_K"] < 0.75, out
    assert out["accuracy_trbdf2_rmse_K"] < 1.0, out
    assert out["accuracy_refresh_rmse_K"] < 0.3, out
    if "accuracy_headline_rmse_K" in out:
        # The round-4 headline claim: fast AND accurate (<= 0.1 K f32).
        assert out["accuracy_headline_rmse_K"] < 0.15, out
    return out


def run_annual_accuracy_bench(args, dtype):
    """Annual-horizon accuracy: the headline f32 kernel cadence over a FULL
    8760 h of EPW weather on a reduced city model (2 zones x 10 surfaces),
    scored against the committed f64 reference-exact golden
    (tests/data/accuracy_golden_annual.npz, regenerated by
    scripts/make_accuracy_golden.py — the state carries through ~1M parity
    sub-steps there).  The 504 h row (run_accuracy_bench) measures
    per-regime accuracy at bench scale; THIS row measures what the
    headline actually claims: the error at the annual horizon, including
    any f32 accumulation across the carried state — reported whole-year
    and per season (Jan/Apr/Jul/Oct windows), plus a first-half vs
    second-half split that would expose drift."""
    import jax.numpy as jnp

    import heatx

    golden_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "tests", "data", "accuracy_golden_annual.npz",
    )
    with np.load(golden_path) as g:
        zhist_gold = g["zhist_par"]
        hours, warm = int(g["hours"]), int(g["warmup"])
        zones, spz = int(g["zones"]), int(g["surfaces_per_zone"])

    dry, wind, wdir, ghi, ir = (v[:hours] for v in load_weather(hours))
    model = build_city_model(zones, spz)
    tm = heatx.ThermalModel(
        model, n=1,
        config=heatx.SimConfig(
            dtype=dtype,
            nomass_fixed_iters=args.nomass_iters if args.nomass_iters > 0 else None,
        ),
    )
    b = tm.building
    sf = np.random.default_rng(0).uniform(0.2, 1.0, b.n_surfaces)
    seq = tm.inputs(
        hvac_power=np.full(b.n_hvacs, 500.0),
        lum_power=np.full(b.n_luminaires, 150.0),
    )._replace(
        t_out=jnp.asarray(dry, dtype),
        wind_speed=jnp.asarray(wind, dtype),
        wind_direction=jnp.asarray(wdir, dtype),
        sol_front=jnp.asarray(np.asarray(ghi[:, None] * sf[None, :]), dtype),
        ir_front=jnp.asarray(ir, dtype),
    )
    st = tm.initial_state()
    k = args.refresh_every if args.refresh_every > 1 else None
    fr = tm.fast_runner(
        block_size=128, mode="trbdf2_refresh", hours=24,
        substeps=args.exp_substeps, refresh_every=k,
    )
    _, zt = fr.run(st, seq, interp_weather=True)
    err = np.asarray(zt, np.float64) - zhist_gold
    rng_T = float(zhist_gold[warm:].max() - zhist_gold[warm:].min())

    def rmse(sl):
        d = err[sl]
        return float(np.sqrt((d**2).mean()))

    out = {
        "accuracy_annual_hours": hours,
        "accuracy_annual_rmse_K": round(rmse(slice(warm, None)), 4),
        "accuracy_annual_bias_K": round(float(err[warm:].mean()), 4),
        "accuracy_annual_rmse_frac_of_range": round(
            rmse(slice(warm, None)) / rng_T, 5
        ),
    }
    # Seasonal windows (month starts in a non-leap year).
    for name, h0 in (("jan", 0), ("apr", 2160), ("jul", 4344), ("oct", 6552)):
        out[f"accuracy_annual_{name}_rmse_K"] = round(
            rmse(slice(max(h0, warm), h0 + 504)), 4
        )
    half = (hours - warm) // 2
    first, second = rmse(slice(warm, warm + half)), rmse(slice(warm + half, None))
    out["accuracy_annual_firsthalf_rmse_K"] = round(first, 4)
    out["accuracy_annual_secondhalf_rmse_K"] = round(second, 4)
    print(
        f"# annual accuracy ({args.dtype}, trbdf2_refresh@{k or 1}) vs "
        f"f64-exact golden, {hours}h: rmse {out['accuracy_annual_rmse_K']} K "
        f"({out['accuracy_annual_rmse_frac_of_range'] * 100:.2f}% of "
        f"{rng_T:.1f} K range), halves "
        f"{first:.4f}/{second:.4f} K, seasons "
        + " ".join(
            f"{m} {out[f'accuracy_annual_{m}_rmse_K']}"
            for m in ("jan", "apr", "jul", "oct")
        ),
        file=sys.stderr,
    )
    # Gates: the annual error stays in the headline class, and the second
    # half shows no accumulation blow-up relative to the first.
    assert out["accuracy_annual_rmse_K"] < 0.3, out
    assert second < 2.0 * first + 0.05, out
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--zones", type=int, default=1000)
    ap.add_argument("--surfaces-per-zone", type=int, default=10)
    ap.add_argument("--hours", type=int, default=8760)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument(
        "--nomass-iters",
        type=int,
        default=1,
        help="fixed no-mass iterations per sub-step (0 = reference-exact "
        "while_loop); the default 1 passes the full 14-case EnergyPlus "
        "replay suite at the same thresholds as the exact loop "
        "(tests/test_eplus_replay.py, fixed1 variant)",
    )
    ap.add_argument(
        "--refresh-every",
        type=int,
        default=2,
        help="headline hybrid cadence: re-evaluate film h / cavity U / stage "
        "factorizations every k sub-steps in the scored TR-BDF2 row (must "
        "divide --exp-substeps; 1 = parity coefficient cadence; PERF.md "
        "carries the measured accuracy/cost curve)",
    )
    ap.add_argument(
        "--frozen-headline",
        action="store_true",
        help="score the frozen-h TR-BDF2 kernel as the headline row (the "
        "round-3 default) instead of the hybrid-cadence refresh kernel",
    )
    ap.add_argument(
        "--skip-frozen",
        action="store_true",
        help="skip the frozen-h TR-BDF2 row (frozen_* fields)",
    )
    ap.add_argument(
        "--skip-refresh",
        action="store_true",
        help="skip the full-refresh TR-BDF2 row (refresh_* fields)",
    )
    ap.add_argument(
        "--skip-parity",
        action="store_true",
        help="emit only the headline TR-BDF2 row (skip the parity-kernel "
        "run normally included as parity_* fields in the JSON line)",
    )
    ap.add_argument(
        "--skip-demand",
        action="store_true",
        help="skip the annual ideal-loads demand run (thermostats in-kernel) "
        "normally included as demand_* fields in the JSON line",
    )
    ap.add_argument(
        "--skip-office",
        action="store_true",
        help="skip the EnergyPlus-workflow row (examples/data/office.idf "
        "annual run) normally included as office_idf_* fields",
    )
    ap.add_argument(
        "--skip-grad",
        action="store_true",
        help="skip the annual reverse-mode value_and_grad row (kernel "
        "forward + adjoint day kernel backward) normally included as "
        "grad_* fields in the JSON line",
    )
    ap.add_argument(
        "--skip-accuracy",
        action="store_true",
        help="skip the hardware accuracy row (3-week regime-gate workload "
        "through both kernels vs the committed f64-exact golden) normally "
        "included as accuracy_* fields in the JSON line",
    )
    ap.add_argument(
        "--xla-path",
        action="store_true",
        help="reference-parity numerics on the plain XLA substep path",
    )
    ap.add_argument(
        "--parity-kernel",
        action="store_true",
        help="reference-parity numerics in the fused Pallas day kernel "
        "(~120 sub-steps/hour, --kernel-hours hours per invocation)",
    )
    ap.add_argument(
        "--block-size",
        type=int,
        default=4096,
        help="surfaces per zone-closed kernel block; the bench probes "
        "downward from this (halving to 512) and records the selected "
        "size in the JSON line (4096 measures ~7%% faster than 2048 at "
        "10k-surface scale now that zone vectors are rank-2 rows — the "
        "old rank-1 Mosaic crash was the original 2048 ceiling; very "
        "large grids still exceed compiler capacity and probe down — "
        "PERF.md)",
    )
    ap.add_argument(
        "--kernel-hours",
        type=int,
        default=24,
        help="hours marched per Pallas kernel invocation (day chunks "
        "amortize the fixed per-call launch + HBM streaming cost)",
    )
    ap.add_argument(
        "--dispatch-days",
        type=int,
        default=37,
        help="day-chunks per device dispatch on the kernel paths (bounds "
        "single-call run time under the remote runtime's watchdog)",
    )
    ap.add_argument(
        "--trace-dir",
        default=None,
        help="capture an XLA profiler trace of the timed region into this "
        "directory (view with xprof/TensorBoard); best-effort — some remote "
        "runtimes cannot profile",
    )
    ap.add_argument(
        "--no-interp-weather",
        action="store_true",
        help="hold weather constant within each hour instead of linearly "
        "interpolating the hourly EPW series to sub-steps (the reference "
        "re-queries weather every sub-step, model.rs:371-374)",
    )
    ap.add_argument(
        "--exp-path",
        action="store_true",
        help="exponential-integrator fast mode: exact matrix-exponential "
        "propagation with h frozen per hour (EnergyPlus-style), "
        "--exp-substeps sub-steps/hour instead of the stability-dictated "
        "count; see heatx/engine/exponential.py",
    )
    ap.add_argument(
        "--exp-substeps",
        type=int,
        default=8,
        help="fast-mode sub-steps per hour (default 8, dt=450s: accuracy is "
        "frozen-h dominated and flat in this knob — annual zone temps move "
        "<0.05 K between 6 and 12 — while the analytical zone update keeps "
        "the zone exchange exact at any step)",
    )
    ap.add_argument(
        "--imp-path",
        action="store_true",
        help="TR-BDF2 implicit fast mode: L-stable two-stage solves on the "
        "fully-coupled node system, h frozen per hour, --exp-substeps "
        "sub-steps/hour; see heatx/engine/implicit.py",
    )
    args = ap.parse_args()
    if args.exp_substeps < 1:
        ap.error("--exp-substeps must be >= 1")
    if args.refresh_every < 1 or args.exp_substeps % args.refresh_every:
        ap.error("--refresh-every must divide --exp-substeps")

    import jax
    import jax.numpy as jnp

    if args.dtype == "float64":
        jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("HEATX_JAX_CACHE", "/tmp/heatx-jax-cache"),
    )

    import heatx
    from heatx.build.layout import compile_building
    from heatx.engine import state as state_mod
    from heatx.engine import step as step_mod

    dtype = jnp.float64 if args.dtype == "float64" else jnp.float32

    t0 = time.time()
    model = build_city_model(args.zones, args.surfaces_per_zone)
    cfg = heatx.SimConfig(
        dtype=dtype,
        nomass_fixed_iters=args.nomass_iters if args.nomass_iters > 0 else None,
    )
    building = compile_building(model, n=1, config=cfg)
    S, N = building.n_surfaces, building.max_nodes
    n_nodes_total = int(np.sum(building.surfaces.n_nodes))
    subs = building.dt_subdivisions
    print(
        f"# compiled {S} surfaces x {N} max nodes ({n_nodes_total} real nodes), "
        f"{building.n_zones} zones, dt={building.dt:.1f}s x {subs} substeps/hour, "
        f"build {time.time() - t0:.1f}s",
        file=sys.stderr,
    )

    dry, wind, wdir, ghi, ir = load_weather(args.hours)
    # Static per-surface scale factors for solar/IR (a real deployment feeds
    # per-surface irradiance from the solar module; the bench synthesizes it).
    rng = np.random.default_rng(0)
    sol_factor = jnp.asarray(rng.uniform(0.2, 1.0, S), dtype)
    state0 = state_mod.initial_state(building)
    base = state_mod.default_inputs(building)
    base = base._replace(
        hvac_power=jnp.full((building.n_hvacs,), 500.0, dtype),
        lum_power=jnp.full((building.n_luminaires,), 150.0, dtype),
    )

    if not (args.exp_path or args.imp_path or args.xla_path):
        # Fused Pallas day-kernel paths.  Default: the TR-BDF2 fast mode
        # (heatx/engine/implicit.py + heatx/ops/pallas_step.py mode="trbdf2")
        # as the headline row, PLUS a reference-parity day-kernel run
        # (reference sub-step physics at the stability-dictated ~120
        # sub-steps/hour, no-mass solve at --nomass-iters fixed relaxed
        # iterations — the regime gated by tests/test_eplus_replay.py) emitted
        # as parity_* fields in the same JSON line.  --parity-kernel makes
        # parity the headline instead.  Either way one Pallas invocation
        # marches --kernel-hours hours per block so the fixed per-call launch
        # + HBM streaming cost amortizes.  Accuracy of the fast regime is
        # measured against the parity path in tests/test_fast_regime.py;
        # parity-vs-reference in tests/test_eplus_replay.py.
        from heatx.ops import pallas_step
        from heatx.weather.epw import interpolate_to_steps

        H = args.kernel_hours
        days = (args.hours + H - 1) // H
        span = days * H

        def build_runner(block_size, mode, SUBF, refresh_every=None,
                         vmem_mb=None):
            bb = pallas_step.block_building(building, block_size=block_size)
            hm, params = pallas_step.make_hour_march(
                bb, substeps=(None if mode == "parity" else SUBF), mode=mode,
                hours=H, refresh_every=refresh_every, vmem_limit_mb=vmem_mb,
            )
            lay = bb.layout
            SP = lay.padded_surfaces
            sol_factor_b = jnp.asarray(
                lay.surfaces_to_blocked(np.asarray(sol_factor)), dtype
            )
            a_gain = np.zeros(building.n_zones)
            np.add.at(a_gain, np.asarray(building.hvac_pair_space), 500.0)
            np.add.at(a_gain, np.asarray(building.lum_space), 150.0)
            a_gain_b = jnp.asarray(lay.zones_to_blocked(a_gain), dtype)
            ag_day = jnp.broadcast_to(a_gain_b[None], (H,) + a_gain_b.shape)
            az_day = jnp.zeros((H, bb.n_blocks, bb.zones_per_block), dtype)
            zeros_hsp = jnp.zeros((H, SP), dtype)
            T0 = jnp.asarray(lay.surfaces_to_blocked(np.asarray(state0.node_T)), dtype)
            zT0 = jnp.asarray(lay.zones_to_blocked(np.asarray(state0.zone_T)), dtype)

            def pad_hours(v):
                v = np.asarray(v, np.float64)
                return np.concatenate([v, np.repeat(v[-1:], span - len(v))])

            def per_substep(v):
                # weather per sub-step (model.rs:371-374): the kernel takes a
                # [H*SUBF] series per day chunk; interpolate the hourly EPW
                # series unless pinned to hour-constant.
                if args.no_interp_weather:
                    s = np.repeat(pad_hours(v), SUBF)
                else:
                    s = interpolate_to_steps(pad_hours(v), SUBF)
                return jnp.asarray(s.reshape(days, H * SUBF), dtype)

            def per_hour(v):
                return jnp.asarray(pad_hours(v).reshape(days, H), dtype)

            W = tuple(per_substep(v) for v in (dry, wind, wdir)) + tuple(
                per_hour(v) for v in (ghi, ir)
            )

            def run_days(params, T, zT, xs):
                def body(carry, day):
                    T, zT = carry
                    d_t, d_w, d_d, d_g, d_i = day
                    hi = (
                        d_t, d_w, d_d,
                        d_g[:, None] * sol_factor_b[None, :], zeros_hsp,
                        jnp.broadcast_to(d_i[:, None], (H, SP)), zeros_hsp,
                        ag_day, az_day,
                    )
                    T, zT, _, _ = hm(params, T, zT, hi)
                    return (T, zT), None

                (T, zT), _ = jax.lax.scan(body, (T, zT), xs)
                return T, zT

            f = jax.jit(run_days)

            # Host loop over bounded dispatch chunks: one dispatch per ~37 days.
            # A single XLA call spanning minutes (the annual parity kernel) trips
            # the remote runtime's watchdog and kills the worker; chunked
            # dispatches queue asynchronously so there is no pipeline bubble.
            chunk = min(args.dispatch_days, days)

            def run_all(T, zT):
                for i in range(0, days, chunk):
                    xs = tuple(w[i : i + chunk] for w in W)
                    T, zT = f(params, T, zT, xs)
                return T, zT

            return run_all, T0, zT0

        def run_kernel_bench(mode, trace_dir=None, refresh_every=None):
            """Build, warm up, and time one kernel mode; returns a dict of
            (wall, rate, substeps, zone0, block_size).  The timed region
            runs twice and keeps the better run (the refresh rows showed a
            ~15% run-to-run spread in round 3; two reps bound it)."""
            SUBF = subs if mode == "parity" else args.exp_substeps
            # Probe (block size, vmem limit) pairs largest-first: build +
            # full-schedule warmup IS the probe (every dispatch shape must
            # compile before timing anyway).  The many-block rejection at
            # very large grids is the compiler's default scoped-VMEM
            # heuristic (clean exit-code-1), so each rejected block size
            # retries once with a raised 100 MB scoped limit — measured
            # round 4 to admit block 2048/4096 at 100k surfaces — before
            # halving.  The chosen configuration is a first-class tuning
            # decision recorded in the JSON line, not a silent degradation.
            candidates = [(args.block_size, None), (args.block_size, 100)]
            bs = args.block_size
            while bs > 512:
                bs //= 2
                candidates += [(bs, None), (bs, 100)]
            t0 = time.time()
            last_err = None
            for bs, vmem_mb in candidates:
                try:
                    run_all, T0, zT0 = build_runner(
                        bs, mode, SUBF, refresh_every, vmem_mb
                    )
                    # Warm up with the full chunk schedule: every dispatch
                    # shape (the fixed chunk and any remainder) must be
                    # compiled before timing.
                    T1, zT1 = run_all(T0, zT0)
                    zone0 = float(zT1[0, 0])  # force: block_until_ready unreliable
                    block_size = bs
                    block_vmem = vmem_mb
                    break
                except Exception as e:  # noqa: PERF203 - probe loop
                    last_err = e
                    print(
                        f"# block-size probe: {bs} (vmem "
                        f"{vmem_mb or 'default'}) rejected "
                        f"({type(e).__name__}: {str(e)[:160]})",
                        file=sys.stderr,
                    )
            else:
                raise last_err
            print(
                f"# {mode}-kernel block {block_size}, compile+{days}-day "
                f"warmup: {time.time() - t0:.1f}s",
                file=sys.stderr,
            )
            def timed_once(T, zT, trace=None):
                t0 = time.time()
                if trace:
                    try:
                        from heatx.utils.profiling import profile_trace

                        with profile_trace(trace):
                            T, zT = run_all(T, zT)
                            z0 = float(zT[0, 0])
                        return time.time() - t0, T, zT, z0
                    except Exception as e:  # remote runtimes may not profile
                        print(
                            f"# profiler trace failed ({e}); timing without it",
                            file=sys.stderr,
                        )
                        t0 = time.time()
                T, zT = run_all(T, zT)
                z0 = float(zT[0, 0])
                return time.time() - t0, T, zT, z0

            w1, T1, zT1, zone0 = timed_once(T1, zT1, trace=trace_dir)
            w2, T1, zT1, zone0 = timed_once(T1, zT1)
            wall = min(w1, w2)
            node_updates = n_nodes_total * span * SUBF
            rate = node_updates / wall
            tag = mode if refresh_every is None else f"{mode}@{refresh_every}"
            print(
                f"# {tag} kernel {span}h x {SUBF} substeps, {node_updates:.3e} "
                f"node-updates in {wall:.2f}s (reps {w1:.2f}/{w2:.2f}) -> "
                f"{rate:.3e} node-updates/s; zone_T[0] final {zone0:.2f}C",
                file=sys.stderr,
            )
            assert np.isfinite(zone0), f"{mode} simulation diverged"
            return dict(
                wall=wall, rate=rate, substeps=SUBF, zone0=zone0,
                block_size=block_size, block_vmem=block_vmem,
                reps=(round(w1, 3), round(w2, 3)),
            )

        # Headline: the hybrid-cadence TR-BDF2 kernel (coefficients
        # re-evaluated every --refresh-every sub-steps) — fast AND accurate
        # (0.03 K f32 RMSE at k=2 vs 0.33 K frozen on the 3-week regime
        # gate; PERF.md cadence ablation).  --frozen-headline restores the
        # round-3 frozen-h headline; --parity-kernel makes parity the
        # headline.
        if args.parity_kernel:
            headline_mode, headline_k = "parity", None
        elif args.frozen_headline:
            headline_mode, headline_k = "trbdf2", None
        else:
            headline_mode, headline_k = "trbdf2_refresh", args.refresh_every
        res = run_kernel_bench(
            headline_mode, trace_dir=args.trace_dir, refresh_every=headline_k
        )
        row = {
            "metric": f"annual_{span}h_{S}surface_sim_wall_clock",
            "value": round(res["wall"], 3),
            "unit": "s",
            "vs_baseline": round(10.0 / res["wall"], 3),
            "node_updates_per_sec_per_chip": round(res["rate"], 1),
            "mode": headline_mode,
            "substeps_per_hour": res["substeps"],
            "block_size": res["block_size"],
        }
        if res.get("block_vmem"):
            row["block_vmem_mb"] = res["block_vmem"]
        if headline_k is not None:
            row["refresh_every"] = headline_k
        if (not args.parity_kernel and not args.frozen_headline
                and not args.skip_frozen):
            # The frozen-h TR-BDF2 row (the round-3 headline): the speed
            # ceiling of the fast mode, kept for the cadence ablation.
            try:
                fres = run_kernel_bench("trbdf2")
                row.update(
                    frozen_wall_clock_s=round(fres["wall"], 3),
                    frozen_node_updates_per_sec_per_chip=round(fres["rate"], 1),
                    frozen_vs_baseline=round(10.0 / fres["wall"], 3),
                )
            except Exception as e:  # headline row survives a frozen failure
                print(f"# frozen kernel row failed: {e}", file=sys.stderr)
                row.update(frozen_error=str(e)[:200])
        if not args.parity_kernel and not args.skip_parity:
            # Reference-parity numerics in the same scored artifact: the
            # regime (nomass_fixed_iters=args.nomass_iters, ~120 stability
            # sub-steps/hour) is the one tests/test_eplus_replay.py gates
            # against all 14 EnergyPlus fixtures.
            try:
                pres = run_kernel_bench("parity")
                row.update(
                    parity_wall_clock_s=round(pres["wall"], 3),
                    parity_node_updates_per_sec_per_chip=round(pres["rate"], 1),
                    parity_substeps_per_hour=pres["substeps"],
                    parity_nomass_fixed_iters=args.nomass_iters,
                    parity_vs_baseline=round(10.0 / pres["wall"], 3),
                )
            except Exception as e:  # headline row survives a parity failure
                print(f"# parity kernel row failed: {e}", file=sys.stderr)
                row.update(parity_error=str(e)[:200])
        if (not args.parity_kernel and not args.skip_parity
                and not args.skip_refresh):
            # The refresh middle point: film coefficients re-evaluated every
            # sub-step (parity cadence) at the fast mode's sub-step count —
            # 0.05 K vs parity where frozen-h sits at 0.33 K.
            try:
                rres = run_kernel_bench("trbdf2_refresh")
                row.update(
                    refresh_wall_clock_s=round(rres["wall"], 3),
                    refresh_node_updates_per_sec_per_chip=round(rres["rate"], 1),
                    refresh_vs_baseline=round(10.0 / rres["wall"], 3),
                )
            except Exception as e:
                print(f"# refresh kernel row failed: {e}", file=sys.stderr)
                row.update(refresh_error=str(e)[:200])
        if not args.parity_kernel and not args.skip_demand:
            # Annual ideal-loads demand (thermostats in-kernel,
            # heatx.engine.zone.zone_update semantics): the production load-
            # calculation workload, through the high-level FastRunner API.
            try:
                dres = run_demand_bench(
                    args, dtype, row["block_size"], dry, wind, wdir, ghi, ir
                )
                row.update(dres)
            except Exception as e:  # headline row survives a demand failure
                print(f"# demand row failed: {e}", file=sys.stderr)
                row.update(demand_error=str(e)[:200])
        if not args.parity_kernel and not args.skip_grad:
            # Annual reverse-mode value_and_grad through the adjoint day
            # kernel (the calibration workload; PERF.md "Differentiation").
            try:
                row.update(run_grad_bench(
                    args, dtype, row["block_size"], dry, wind, wdir, ghi, ir
                ))
            except Exception as e:  # headline row survives a grad failure
                print(f"# grad row failed: {e}", file=sys.stderr)
                row.update(grad_error=str(e)[:200])
        if not args.parity_kernel and not args.skip_accuracy:
            # Hardware-measured accuracy vs the committed f64-exact golden.
            try:
                row.update(run_accuracy_bench(args, dtype))
            except Exception as e:  # headline row survives an accuracy failure
                print(f"# accuracy row failed: {e}", file=sys.stderr)
                row.update(accuracy_error=str(e)[:200])
            # Annual-horizon accuracy (f32 accumulation gate) vs the
            # committed annual golden on the reduced model.
            try:
                row.update(run_annual_accuracy_bench(args, dtype))
            except Exception as e:
                print(f"# annual accuracy row failed: {e}", file=sys.stderr)
                row.update(accuracy_annual_error=str(e)[:200])
        if not args.parity_kernel and not args.skip_office:
            # The complete EnergyPlus-file workflow (examples/data/office.idf)
            # timed on hardware.
            try:
                row.update(run_office_bench(args, dtype))
            except Exception as e:  # headline row survives an office failure
                print(f"# office-idf row failed: {e}", file=sys.stderr)
                row.update(office_idf_error=str(e)[:200])
        print(json.dumps(row))
        return

    if args.exp_path or args.imp_path:
        if args.imp_path:
            from heatx.engine.implicit import imp_march as fast_march
        else:
            from heatx.engine.exponential import exp_march as fast_march

        subs = args.exp_substeps
        building_dev = building.astype(dtype)
        base_dev = jax.device_put(base)
        sol_factor_dev = jax.device_put(sol_factor)
        xs_dev = tuple(jnp.asarray(v, dtype) for v in (dry, wind, wdir, ghi, ir))

        def run_scan(bld, state, base_inputs, s_factor, xs):
            # device-side scan over hours: per-call dispatch on this remote
            # runtime costs ~60 ms, a scanned hour costs ~8 ms
            def body(carry, x):
                t_out, ws, wd, g, q_ir = x
                inputs = base_inputs._replace(
                    t_out=t_out,
                    wind_speed=ws,
                    wind_direction=wd,
                    sol_front=g * s_factor,
                    ir_front=jnp.broadcast_to(q_ir, (S,)),
                )
                return fast_march(bld, carry, inputs, subs), None

            state, _ = jax.lax.scan(body, state, xs)
            return state

        run_jit = jax.jit(run_scan)

        t0 = time.time()
        state = run_jit(building_dev, state0, base_dev, sol_factor_dev,
                        tuple(x[:24] for x in xs_dev))
        float(state.zone_T[0])  # force: block_until_ready unreliable here
        print(f"# fast-mode compile+warmup pass: {time.time() - t0:.1f}s", file=sys.stderr)
        t0 = time.time()
        state = run_jit(building_dev, state, base_dev, sol_factor_dev, xs_dev)
        zone0 = float(state.zone_T[0])
        wall = time.time() - t0
        node_updates = n_nodes_total * args.hours * subs
        print(
            f"# fast {args.hours}h x {subs} substeps, {node_updates:.3e} node-updates "
            f"in {wall:.2f}s -> {node_updates / wall:.3e} node-updates/s; "
            f"zone_T[0] final {zone0:.2f}C",
            file=sys.stderr,
        )
        assert np.isfinite(zone0), "simulation diverged"
        print(
            json.dumps(
                {
                    "metric": f"annual_{args.hours}h_{S}surface_sim_wall_clock",
                    "value": round(wall, 3),
                    "unit": "s",
                    "vs_baseline": round(10.0 / wall, 3),
                    "node_updates_per_sec_per_chip": round(node_updates / wall, 1),
                }
            )
        )
        return

    # One jitted main step (hour), driven by an async host loop: on this
    # runtime repeated jit dispatches pipeline ~13x faster than a lax.scan
    # over hours, and buffer donation serializes execution — so neither is
    # used.  The building rides as a traced pytree argument so the HLO stays
    # small.
    def hour(bld, state, base_inputs, s_factor, h, xs):
        # Everything rides as arguments: on this runtime, device-array
        # constants embedded in the HLO (closures) slow every execution ~30x,
        # and per-call host->device uploads serialize on the tunnel — so the
        # weather lives on device and is indexed by a device-resident hour
        # counter.
        t_out, ws, wd, g, q_ir = (x[h] for x in xs)
        inputs = base_inputs._replace(
            t_out=t_out,
            wind_speed=ws,
            wind_direction=wd,
            sol_front=g * s_factor,
            ir_front=jnp.broadcast_to(q_ir, (S,)),
        )
        return step_mod.march(bld, state, inputs), h + 1

    hour_jit = jax.jit(hour)
    building_dev = building.astype(dtype)
    base_dev = jax.device_put(base)
    sol_factor_dev = jax.device_put(sol_factor)
    xs_dev = tuple(jnp.asarray(v, dtype) for v in (dry, wind, wdir, ghi, ir))

    def run_hours(state, n_hours, h0=0):
        h = jnp.asarray(h0, jnp.int32)
        for _ in range(n_hours):
            state, h = hour_jit(building_dev, state, base_dev, sol_factor_dev, h, xs_dev)
        # float() forces the chain; block_until_ready is unreliable here.
        float(state.zone_T[0])
        return state

    t0 = time.time()
    state = run_hours(state0, min(24, args.hours))
    print(f"# compile+warmup pass: {time.time() - t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    state = run_hours(state, args.hours)
    wall = time.time() - t0

    total_substeps = args.hours * subs
    node_updates = n_nodes_total * total_substeps
    rate = node_updates / wall
    print(
        f"# {args.hours}h x {subs} substeps, {node_updates:.3e} node-updates "
        f"in {wall:.2f}s -> {rate:.3e} node-updates/s; "
        f"zone_T[0] final {float(state.zone_T[0]):.2f}C",
        file=sys.stderr,
    )
    assert np.isfinite(float(state.zone_T[0])), "simulation diverged"

    print(
        json.dumps(
            {
                "metric": f"annual_{args.hours}h_{S}surface_sim_wall_clock",
                "value": round(wall, 3),
                "unit": "s",
                "vs_baseline": round(10.0 / wall, 3),
                "node_updates_per_sec_per_chip": round(rate, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
