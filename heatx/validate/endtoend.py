"""Full-stack EnergyPlus comparison: EPW weather in, zone temperature out.

The replay harness (heatx.validate.replay) feeds EnergyPlus's own logged
boundary conditions — its incident solar, its per-step net IR — so it
isolates the wall+zone solver, exactly like the reference's march_model
(tests/validate_wall_heat_transfer.rs:615-711).  This module closes the
loop the reference never does: heatx computes the incident solar
(heatx.weather.solar, Perez sky) and incident longwave (tilted
view-factor blend) from the same CHL_Santiago EPW EnergyPlus ran with,
marches the fixture model, and compares zone temperature against
eplusout.csv.  A miss here implicates the *weather-model stack* (sun
position, transposition, sky/ground longwave), not the solver.

Two alignment details matter and are deliberate:

* Outdoor dry-bulb / wind come from the fixture log (they ARE the EPW
  series, resampled by EnergyPlus's own hourly->timestep interpolation —
  regenerating them would test an interpolation convention, not physics;
  tests/test_e2e_eplus.py checks they match the EPW to ~0.1 K).
* The fixture IDFs pin "View Factor to Ground" = 0.5 on every surface
  and EnergyPlus honors it even on the tilted/horizontal variants where
  it disagrees with the tilt (0.146 / 0.0 geometric), worth ~10 % of GHI
  on the roof.  The model is built via the fixture's own in.idf so the
  importer carries the factor into the solar input (longwave stays
  geometric — EnergyPlus's IR sky/ground view factors are, matching its
  internals; pinning the IR split to 0.5 measures ~2 K worse).
"""

from __future__ import annotations

import numpy as np

import heatx
from heatx.build.layout import B_OUTDOOR
from heatx.io.eplus import read_eplusout
from heatx.validate.replay import WALL_CASES, build_case_model
from heatx.weather.epw import read_epw
from heatx.weather.solar import (
    model_ground_views,
    surface_irradiance,
    surface_longwave,
)

#: The fixtures whose physics the weather stack fully drives (the no_ir /
#: no_solar variants zero the corresponding coupling via eps/alpha, so
#: they add nothing beyond the replay suite here).
FULL_CASES = ("massive_full", "nomass_full", "mixed_full", "tilted", "horizontal")

HOURS = 21 * 24  # every fixture: a 21-day January run period


def weather_model_inputs(epw, model, building, sky="perez"):
    """The [T, S] incident solar and longwave heatx computes for a fixture
    model from the EPW alone (T = the 21-day horizon + 1 hour for
    sub-hour interpolation past the last record)."""
    from heatx.weather.solar import sun_and_sky

    gv = model_ground_views(model)
    sun = sun_and_sky(epw, hours=HOURS + 1)  # shared by both faces
    sol = {}
    ir = {}
    for side in ("front", "back"):
        sol[side] = surface_irradiance(
            epw, building, hours=HOURS + 1, sky=sky, side=side,
            ground_view=gv, sun=sun,
        )
        ir[side] = surface_longwave(epw, building, hours=HOURS + 1, side=side)
    return sol, ir


def run_end_to_end_case(
    name: str,
    fixtures_root: str,
    n: int = 20,
    dtype=np.float64,
    sky: str = "perez",
    passes: int = 1,
):
    """March one fixture under heatx's own weather models.

    Returns ``(expected, found)`` zone-temperature series after the
    reference's 5000-step warm-up skip — same scoring as the replay suite.

    ``passes`` replays the 21-day series that many times back-to-back and
    scores the LAST pass (heatx.validate.replay.run_case semantics): a
    converged initial state, removing the protocol's 22 C cold-start
    transient so the residual isolates the weather-model stack
    (tests/test_e2e_eplus.py derives its warm-start thresholds from this).
    """
    import jax
    import jax.numpy as jnp

    from heatx.engine import state as state_mod
    from heatx.engine import step as step_mod

    case = WALL_CASES[name]
    # Build from the fixture's own in.idf: the importer carries the
    # explicit View Factor to Ground the .spl/hand models don't have.
    model = build_case_model(case, fixtures_root, via_idf=True)
    tm = heatx.ThermalModel(model, n=n, config=heatx.SimConfig(dtype=dtype))
    b = tm.building
    # Single-surface convention shared with the replay harness: EnergyPlus
    # assumes zero IR indoors (validate_wall_heat_transfer.rs:629-630) —
    # zero the INTERIOR face's emissivity, whichever side that is (all
    # current fixtures are front-outdoor; keep the side logic honest).
    front_outdoor = bool(np.asarray(b.surfaces.front_code)[0] == B_OUTDOOR)
    if front_outdoor:
        b.surfaces.eps_back[:] = 0.0
    else:
        b.surfaces.eps_front[:] = 0.0

    epw = read_epw(f"{fixtures_root}/epw/CHL_Santiago.855740_IWEC.epw")
    run = read_eplusout(f"{fixtures_root}/{name}/eplusout.csv")
    T = run.n_steps
    steps_per_hour = T // HOURS

    sol, ir = weather_model_inputs(epw, model, b, sky=sky)
    # Hour-mid values -> the fixture's sub-hour mid-step grid.
    t_mid = (np.arange(T) + 0.5) / steps_per_hour
    hr_mid = np.arange(HOURS + 1) + 0.5

    def to_steps(a):  # [H+1, S] hourly -> [T, S]
        return np.stack(
            [np.interp(t_mid, hr_mid, a[:, s]) for s in range(a.shape[1])], 1
        )

    front_out = front_outdoor
    side = "front" if front_out else "back"
    sol_s = to_steps(np.asarray(sol[side]))
    ir_s = to_steps(np.asarray(ir[side]))

    base = state_mod.default_inputs(b)
    skey = "sol_front" if front_out else "sol_back"
    ikey = "ir_front" if front_out else "ir_back"

    def tile(v):  # [T, ...] -> [passes*T, ...] (replay.run_case semantics)
        return np.tile(np.asarray(v), (passes,) + (1,) * (np.ndim(v) - 1))

    xs = (
        jnp.asarray(tile(run.outdoor_temp), dtype),
        jnp.asarray(tile(run.site_wind_speed), dtype),
        jnp.asarray(np.radians(tile(run.site_wind_direction)), dtype),
        jnp.asarray(tile(sol_s), dtype),
        jnp.asarray(tile(ir_s), dtype),
    )

    def scan_fn(building, state, xs):
        def body(carry, x):
            t_out, ws, wd, s_, i_ = x
            inputs = base._replace(
                t_out=t_out, wind_speed=ws, wind_direction=wd,
                **{skey: s_, ikey: i_},
            )
            # Record the pre-march state, like the reference (:667).
            return step_mod.march(building, carry, inputs), carry.zone_T[0]

        return jax.lax.scan(body, state, xs)

    st = state_mod.initial_state(b)
    st = st._replace(zone_T=jnp.full_like(st.zone_T, run.zone_air_temp[0]))
    _, found = jax.jit(scan_fn)(b, st, xs)
    warmup = 5000
    # Score the LAST pass with the reference's warm-up skip applied inside
    # it (identical scoring window for every passes value).
    found_last = np.asarray(found)[-T:][warmup + 1 :]
    return run.zone_air_temp[warmup + 1 :], found_last
