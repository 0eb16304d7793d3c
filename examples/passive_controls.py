"""Passive cooling with in-run zone-state controls: night ventilation +
dynamic window shading, compiled INTO the march.

The two workhorses of passive summer comfort both depend on the marching
zone temperature, so a pre-rendered schedule cannot express them:

* **night ventilation** — open the vents only while the room is warmer
  than outside by a margin (free cooling), and never chill it below a
  floor (``ZoneVentilationControl``: EnergyPlus's ZoneVentilation
  Delta Temperature / Minimum Indoor Temperature limit fields);
* **dynamic shading** — drop the exterior blind while the room is above
  a comfort threshold (``ZoneShadingControl``: EnergyPlus's
  OnIfHighZoneAirTemperature).

heatx compiles both into the integrator: each main step reads the
previous step's zone temperature from the carry (EnergyPlus's own
control convention) and masks the ventilation channel / scales the
incident solar — dense masked multiplies, no data-dependent control
flow, running identically on the XLA scans and inside the fused Pallas
day kernel.

The experiment: a heavy-weight west-facing room through a hot EPW week,
free-running.  Uncontrolled it overheats; with the two controls it sheds
the afternoon solar spike and dumps the stored heat to the cool night
air — ~3 K off the weekly mean and 70+ % fewer hours above 27 C, using
nothing but compiled control laws.

Run:  python examples/passive_controls.py [--epw path.epw]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

DEFAULT_EPW = "/root/reference/tests/epw/CHL_Santiago.855740_IWEC.epw"


def room(controlled: bool):
    from heatx.model.building import (
        Boundary, BuildingModel, Construction, Material, SpaceDef,
        Substance, SurfaceDef, ZoneShadingControl, ZoneVentilationControl,
    )

    m = BuildingModel()
    m.add_substance(Substance(
        "concrete", thermal_conductivity=0.816, density=1700.0,
        specific_heat_capacity=800.0,
    ))
    m.add_material(Material("c20", "concrete", 0.2))
    m.add_construction(Construction("wall", ["c20"]))
    m.add_space(SpaceDef("room", 120.0))
    # West wall (the afternoon solar collector) + a north wall.
    m.add_surface(SurfaceDef(
        "west", "wall", Boundary.outdoor(), Boundary.space_("room"),
        vertices=np.array(
            [[0, 0, 0], [0, 6, 0], [0, 6, 3], [0, 0, 3]], float
        ),
    ))
    m.add_surface(SurfaceDef(
        "north", "wall", Boundary.outdoor(), Boundary.space_("room"),
        vertices=np.array(
            [[0, 6, 0], [8, 6, 0], [8, 6, 3], [0, 6, 3]], float
        ),
    ))
    if controlled:
        # Blind drops (30 % transmittance) while the room is above 24 C.
        m.add_zone_shading(ZoneShadingControl("west", "room", 0.30, 24.0))
        # Night-vent: flow only while the room is >= 2 K warmer than
        # outside AND still above 18 C (never chill below the floor).
        m.add_vent_control(ZoneVentilationControl(
            "room", min_indoor=18.0, delta=2.0,
        ))
    return m


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--epw", default=DEFAULT_EPW)
    ap.add_argument("--days", type=int, default=7)
    args = ap.parse_args(argv)
    fast = os.environ.get("HEATX_EXAMPLE_FAST") == "1"
    if fast:  # smoke-test settings
        args.days = min(args.days, 2)

    import jax

    import heatx
    from heatx.weather.epw import read_epw
    from heatx.weather.solar import surface_irradiance, surface_longwave

    epw = read_epw(args.epw)
    T = 24 * args.days
    start = 24 * 14  # mid-January (southern-hemisphere summer for the
    # default Santiago EPW)
    sl = slice(start, start + T)

    cfg = heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=1)
    results = {}
    for name in ("free", "controlled"):
        tm = heatx.ThermalModel(room(name == "controlled"), n=1, config=cfg)
        b = tm.building
        sol = surface_irradiance(
            epw, b, start_hour=start, hours=T, sky="perez"
        )
        ir = surface_longwave(epw, b, start_hour=start, hours=T)
        seq = tm.inputs_sequence(
            T,
            t_out=np.asarray(epw.dry_bulb[sl]),
            wind_speed=np.asarray(epw.wind_speed[sl]),
            wind_direction=np.asarray(epw.wind_direction_deg[sl]),
            sol_front=sol, ir_front=ir,
            # 0.12 m3/s of outdoor air when the vent control allows it
            # (the uncontrolled room keeps windows shut).
            vent_vol=np.full(1, 0.12 if name == "controlled" else 0.0),
            vent_temp=np.asarray(epw.dry_bulb[sl])[:, None],
            vent_mask=np.full(1, name == "controlled"),
            inf_vol=np.full(1, 0.01),
            inf_temp=np.asarray(epw.dry_bulb[sl])[:, None],
            inf_mask=np.ones(1, bool),
        )
        t0 = time.time()
        _, hist = tm.run(tm.initial_state(), seq, mode="trbdf2", substeps=8)
        z = np.asarray(jax.device_get(hist))[:, 0]
        results[name] = z
        print(f"{name:>11}: peak {z.max():.2f} C  mean {z.mean():.2f} C  "
              f"hours>27C {(z > 27.0).sum():3d}   ({time.time()-t0:.2f}s)")

    dmean = results["free"].mean() - results["controlled"].mean()
    hot_f = int((results["free"] > 27.0).sum())
    hot_c = int((results["controlled"] > 27.0).sum())
    print(f"\ncontrols shave {dmean:.2f} K off the weekly mean and cut "
          f"hours above 27 C from {hot_f} to {hot_c} (shading clips the "
          "afternoon spike; the delta-gated night vent dumps the stored "
          "heat without ever under-cooling the slab).")
    assert np.isfinite(dmean)
    if not fast:  # 2 smoke days carry too much of the shared 22C init
        assert dmean > 1.0 and hot_c < hot_f, "controls should visibly cool"
    return 0


if __name__ == "__main__":
    sys.exit(main())
