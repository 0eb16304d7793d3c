"""Thermal comfort: operative temperature with interior radiant exchange.

Air temperature alone misstates comfort next to a cold window or a
sun-struck wall: ASHRAE 55 rates spaces by OPERATIVE temperature, the mean
of the air and mean-radiant temperatures.  The reference radiates interior
faces against the zone air (surface.rs:611-640) and exposes no radiant
observable; heatx models the interior longwave exchange with Carroll's MRT
network (``SimConfig(interior_mrt=True)``) and reports the per-hour
operative temperature from inside the fused Pallas kernel
(``FastRunner(collect_operative=True)``) — a week of comfort analysis for a
glazed corner office in under a second of device time.

The experiment: a winter week for two otherwise-identical offices, one with
double glazing, one with a much larger single-pane window.  Their AIR
temperatures are held identical by an ideal heater at 21 C; the radiant
environment is what differs — the single-pane room's operative temperature
sags below the air temperature exactly when it is coldest outside.

Run:  python examples/comfort.py [--epw path.epw]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def office(glazing: str) -> "heatx.model.building.BuildingModel":
    from heatx.model.building import (
        Boundary, BuildingModel, Construction, GasSubstance,
        IdealHeaterCooler, Material, SpaceDef, Substance, SurfaceDef,
    )

    m = BuildingModel()
    m.add_substance(Substance(
        "concrete", thermal_conductivity=0.816, density=1700.0,
        specific_heat_capacity=800.0, front_thermal_absorbtance=0.9,
        back_thermal_absorbtance=0.9, front_solar_absorbtance=0.7,
        back_solar_absorbtance=0.7,
    ))
    m.add_substance(Substance(
        "glass", thermal_conductivity=1.0, density=2500.0,
        specific_heat_capacity=840.0, solar_transmittance=0.7,
        front_solar_absorbtance=0.1, back_solar_absorbtance=0.1,
        front_thermal_absorbtance=0.84, back_thermal_absorbtance=0.84,
    ))
    m.add_substance(GasSubstance("argon", "argon"))
    m.add_material(Material("c15", "concrete", 0.15))
    m.add_material(Material("pane", "glass", 0.006))
    m.add_material(Material("gap", "argon", 0.012))
    m.add_construction(Construction("wall", ["c15"]))
    m.add_construction(Construction("igu", ["pane", "gap", "pane"]))
    m.add_construction(Construction("single", ["pane"]))

    m.add_space(SpaceDef("office", 150.0))
    wall = np.array([[0, 0, 0], [5, 0, 0], [5, 0, 3], [0, 0, 3]], float)
    slab = np.array([[0, 0, 0], [5, 0, 0], [5, 5, 0], [0, 5, 0]], float)
    # One exterior facade; the other partitions/slabs face conditioned
    # neighbors (21 C ambient), like a real mid-floor corner office.
    m.add_surface(SurfaceDef("facade", "wall", Boundary.outdoor(),
                             Boundary.space_("office"), vertices=wall))
    for i in range(2):
        m.add_surface(SurfaceDef(f"part{i}", "wall", Boundary.ambient(21.0),
                                 Boundary.space_("office"), vertices=wall))
    for nm in ("floor", "ceiling"):
        m.add_surface(SurfaceDef(nm, "wall", Boundary.ambient(21.0),
                                 Boundary.space_("office"), vertices=slab))
    if glazing == "igu":
        win = np.array([[1, 0, 1], [4, 0, 1], [4, 0, 2], [1, 0, 2]], float)
        m.add_fenestration(SurfaceDef("win", "igu", Boundary.outdoor(),
                                      Boundary.space_("office"), vertices=win))
    else:  # a floor-to-ceiling single pane
        win = np.array([[0.5, 0, 0.2], [4.5, 0, 0.2], [4.5, 0, 2.8],
                        [0.5, 0, 2.8]], float)
        m.add_fenestration(SurfaceDef("win", "single", Boundary.outdoor(),
                                      Boundary.space_("office"), vertices=win))
    # Ideal heater pins the AIR temperature; comfort differences are radiant.
    m.add_hvac(IdealHeaterCooler("t", ["office"], heat_setpoint=21.0,
                                 cool_setpoint=27.0))
    return m


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--epw",
        default="/root/reference/tests/epw/CHL_Santiago.855740_IWEC.epw",
    )
    ap.add_argument("--hours", type=int, default=168)
    args = ap.parse_args()
    if os.environ.get("HEATX_EXAMPLE_FAST") == "1":  # smoke-test settings
        args.hours = min(args.hours, 48)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/heatx-jax-cache")
    import heatx
    from heatx.weather.epw import read_epw

    T = args.hours
    start = 150 * 24  # a winter week (southern hemisphere EPW)
    if os.path.isfile(args.epw):
        w = read_epw(args.epw)
        dry = w.dry_bulb[start : start + T]
        wind = w.wind_speed[start : start + T]
        ir = w.horizontal_ir[start : start + T]
    else:
        t = np.arange(T)
        dry = 2.0 + 6.0 * np.sin(2 * np.pi * t / 24.0)
        wind = np.full(T, 3.0)
        ir = np.full(T, 290.0)

    cfg = heatx.SimConfig(interior_mrt=True, nomass_fixed_iters=1)
    for label, kind in (("double glazing", "igu"), ("single pane", "single")):
        tm = heatx.ThermalModel(office(kind), n=1, config=cfg)
        fr = tm.fast_runner(mode="trbdf2", substeps=8, hours=24,
                            collect_operative=True)
        seq = tm.inputs_sequence(T, t_out=dry, wind_speed=wind, ir_front=ir)
        # EnergyPlus-style warm-up: repeat the first day until the envelope
        # converges, so the stats below are weather, not the 22 C init.
        day = tm.inputs_sequence(24, t_out=dry[:24], wind_speed=wind[:24],
                                 ir_front=ir[:24])
        st, _ = tm.warmup(
            tm.initial_state(), day,
            run=lambda s: fr.run(s, day, collect_zone_T=False)[0],
        )
        t0 = time.time()
        final, zt, top = fr.run(st, seq, collect_operative=True)
        zt, top = np.asarray(zt)[:, 0], np.asarray(top)[:, 0]
        wall = time.time() - t0
        gap = zt - top  # air minus operative: the radiant comfort deficit
        # Fanger PMV/PPD over the same history (office occupant: 1.2 met,
        # winter clothing 1.0 clo; indoor RH assumed 40% — heatx does not
        # model moisture).  operative = (air + MRT)/2, so MRT = 2*op - air.
        from heatx.comfort import zone_comfort_history

        pmv, ppd = zone_comfort_history(
            zt, 2.0 * top - zt, 40.0, met=1.2, clo=1.0
        )
        work = slice(8, 18)  # working hours of each day
        pmv_w = pmv.reshape(-1, 24)[:, work]
        ppd_w = ppd.reshape(-1, 24)[:, work]
        print(
            f"{label:>15}: air {zt.min():.1f}..{zt.max():.1f} C held by the "
            f"heater; operative {top.min():.1f}..{top.max():.1f} C; worst "
            f"radiant deficit {gap.max():.2f} K; working-hours PMV "
            f"{pmv_w.mean():+.2f} (worst {pmv_w.min():+.2f}), PPD "
            f"{ppd_w.mean():.0f}% ({wall:.2f}s for {T} h)"
        )


if __name__ == "__main__":
    main()
