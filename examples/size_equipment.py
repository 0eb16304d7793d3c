"""Size the HVAC, then prove the sizes hold up over the whole year.

The complete equipment-sizing workflow on the 3-zone office IDF:

1. ``heatx.sizing.design_days_from_epw`` + ``design_day_loads`` give the
   classic ASHRAE design-day peaks (winter 99.6 % dry-bulb / summer 0.4 %
   with the ASHRAE clear sky) — same as the shell's

       python -m heatx size examples/data/office.idf weather.epw

2. ``annual_peak_loads`` sizes by simulation: the actual EPW year with
   unlimited ideal loads, taking the 99.6th-percentile demand.  On this
   office the ASHRAE days oversize 2-6x (constant design extremes +
   full-on gains that the real year never coincides); the annual method
   right-sizes with the weather, gain coincidence, and multi-day mass
   effects exact by construction.

3. The year then re-runs with every thermostat capped at the sized
   capacities (heating at the winter design-day value — the stricter,
   since the year never quite reaches the 99.6 % design temperature;
   cooling at the annual percentile) and reports unmet setpoint hours:
   0 heating, single-digit cooling (the 99.6 % coverage deliberately
   concedes up to ~35).

Everything uses the same physics configuration (interior MRT network) —
sizing with one interior-radiant model and verifying with another skews
the comparison.

Run:  python examples/size_equipment.py [--epw path.epw] [--margin 1.0]
(try ``--margin 0.5`` to watch half-sized equipment fail)
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

HERE = os.path.dirname(os.path.abspath(__file__))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--epw",
        default=os.environ.get(
            "HEATX_EPW",
            "/root/reference/tests/epw/CHL_Santiago.855740_IWEC.epw",
        ),
    )
    ap.add_argument(
        "--margin", type=float, default=1.0,
        help="capacity = margin x sized peak (try 0.5 to see failures)",
    )
    args = ap.parse_args()
    fast = os.environ.get("HEATX_EXAMPLE_FAST") == "1"
    if not os.path.isfile(args.epw):
        print(f"EPW not found: {args.epw} (set --epw)", file=sys.stderr)
        return 2

    import numpy as np

    import heatx
    from heatx.build.layout import B_OUTDOOR
    from heatx.model.idf import load_idf
    from heatx.sizing import (
        annual_peak_loads,
        design_day_loads,
        design_days_from_epw,
        sizing_hvac_power,
        slice_time,
    )
    from heatx.weather.epw import monthly_to_hourly, read_epw
    from heatx.weather.solar import (
        model_ground_views,
        surface_irradiance,
        surface_longwave,
    )

    loaded = load_idf(os.path.join(HERE, "data", "office.idf"))
    model = loaded.model
    epw = read_epw(args.epw)
    Z = len(model.spaces)
    zidx = {sp.name: z for z, sp in enumerate(model.spaces)}
    cfg = heatx.SimConfig(interior_mrt=True)  # one physics for everything
    HEAT_SP, COOL_SP = 21.0, 26.0  # the office's own daytime band

    # Scheduled gains / airflows as input channels (annual length).
    T = 8760
    ch = loaded.hourly_channels(T)
    ch.pop("heat_sp", None)
    ch.pop("cool_sp", None)  # the sizing/capped thermostats rule
    air = loaded.airflow_series(T)
    t_in = np.repeat(epw.dry_bulb[:T, None], Z, axis=1)
    airflow_kw = dict(
        inf_vol=air["inf_vol"], inf_mask=air["inf_vol"] > 0.0,
        inf_temp=t_in, vent_vol=air["vent_vol"],
        vent_mask=air["vent_vol"] > 0.0, vent_temp=t_in,
    )
    # The hvac_power channel is laid out per hvac device, so the sizing
    # copy (thermostats removed, sizing unit appended) and the original
    # verification model need different layouts of the same gains.
    sizing_extra = dict(
        ch, hvac_power=sizing_hvac_power(model, ch["hvac_power"]),
        **airflow_kw,
    )
    annual_extra = dict(ch, **airflow_kw)

    # -- 1. classic design days ----------------------------------------------
    days = design_days_from_epw(epw)
    inf = np.zeros(Z)
    for src in (loaded.infiltration, loaded.ventilation):
        for zname, v in src.items():
            inf[zidx[zname]] += v
    dd = {}
    for season, day in days.items():
        extra = {
            "inf_vol": inf, "inf_mask": inf > 0.0,
            "inf_temp": np.repeat(day.dry_bulb_profile[:, None], Z, axis=1),
        }
        if season == "summer":
            extra["hvac_power"] = np.asarray(
                sizing_extra["hvac_power"]).max(0)
            extra["lum_power"] = np.asarray(ch["lum_power"]).max(0)
        dd[season] = design_day_loads(
            model, day, heat_sp=HEAT_SP, cool_sp=COOL_SP, epw=epw,
            config=cfg, extra_channels=extra,
        )
        print(dd[season].summary())

    # -- 2. sizing by simulation ---------------------------------------------
    if fast:
        # Smoke-test path: size from the design days alone (the annual
        # march is the expensive step; it is exercised by bench.py and the
        # sizing tests).
        heat_cap = dd["winter"].peak_W * args.margin
        cool_cap = dd["summer"].peak_W * args.margin
    else:
        ann = annual_peak_loads(
            model, epw, heat_sp=HEAT_SP, cool_sp=COOL_SP, coverage=99.6,
            config=cfg, extra_channels=sizing_extra,
        )
        print(ann.summary())

        # Heating: the winter design day is the stricter test (the year may
        # never reach the 99.6% design temperature); cooling: the annual
        # percentile (the design day's constant-max assumptions oversize).
        heat_cap = (
            np.maximum(dd["winter"].peak_W, ann.peak_heating_W) * args.margin
        )
        cool_cap = ann.peak_cooling_W * args.margin

    # -- 3. the year at the sized capacities ---------------------------------
    for h in model.hvacs:
        if getattr(h, "heat_setpoint", None) is None and (
            getattr(h, "cool_setpoint", None) is None
        ):
            continue
        (zname,) = h.target_spaces
        h.heat_setpoint, h.cool_setpoint = HEAT_SP, COOL_SP
        h.max_heating = float(heat_cap[zidx[zname]])
        h.max_cooling = float(cool_cap[zidx[zname]])

    tm = heatx.ThermalModel(model, n=1, config=cfg)
    b = tm.building
    outf = np.asarray(b.surfaces.front_code) == B_OUTDOOR
    sol = surface_irradiance(
        epw, b, hours=T, sky="perez", ground_view=model_ground_views(model)
    )
    ir = surface_longwave(epw, b, hours=T)
    seq = tm.inputs_sequence(
        T, t_out=epw.dry_bulb[:T], wind_speed=epw.wind_speed[:T],
        wind_direction=np.radians(epw.wind_direction_deg[:T]),
        sol_front=sol * outf, ir_front=ir * outf, **annual_extra,
    )

    def _sl(s, lo, hi):
        return slice_time(s, lo, hi, T)

    # Monthly soil from the EPW when available (office.idf has slab
    # floors; a ground-less model or a header-less EPW simply skips this
    # — set_ground_temperature itself invalidates the cached callables).
    soil = None
    if epw.ground_temps:
        try:
            soil = monthly_to_hourly(epw.ground_temperature(), hours=T)
            tm.set_ground_temperature(float(soil[0]))
        except ValueError:
            soil = None  # model has no ground boundaries
    day1 = _sl(seq, 0, 24)
    state, reps = tm.warmup(
        tm.initial_state(), day1,
        run=lambda s: tm.run(s, day1, collect_zone_T=False, mode="trbdf2")[0],
    )
    T_run = 72 if fast else T  # smoke-test: 3 verification days
    if soil is not None:
        soil = soil[:T_run]
    if soil is None:
        state, zt = tm.run(state, _sl(seq, 0, T_run), mode="trbdf2")
        zt = np.asarray(zt)
    else:
        bounds = np.concatenate(
            [[0], np.flatnonzero(np.diff(soil)) + 1, [T_run]]
        )
        zt_parts = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            tm.set_ground_temperature(float(soil[lo]))
            state, zt_m = tm.run(state, _sl(seq, lo, hi), mode="trbdf2")
            zt_parts.append(np.asarray(zt_m))
        zt = np.concatenate(zt_parts, axis=0)

    unmet_h = (zt < HEAT_SP - 0.5).sum(axis=0)
    unmet_c = (zt > COOL_SP + 0.5).sum(axis=0)
    print(f"\nannual check at {args.margin:.2f} x sized capacity "
          f"(warm-up {reps} days):")
    for z, sp in enumerate(model.spaces):
        print(
            f"  {sp.name}: heating cap {heat_cap[z]:,.0f} W -> "
            f"{int(unmet_h[z])} unmet heating h; cooling cap "
            f"{cool_cap[z]:,.0f} W -> {int(unmet_c[z])} unmet cooling h"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
