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


def fixture_anomaly_sun(epw, steps_per_hour, hours, day_fixed=11.0):
    """The 21-day fixtures' APPARENT sun path: frozen near mid-run.

    Best-fit analysis of the logged per-timestep incident solar (round 5)
    shows the fixtures' sun path does NOT advance with the calendar: for
    run days 1-20 the logged series best matches a sun position computed
    for day ~10-13 (fitting each day independently: [10, 10, 9, 10, 10,
    9, 10, 11, 11, 11, 11, 11, 11, 11, 11, 11, 12, 13, 13, 12]), while
    day 21 matches the TRUE day-21 path exactly.  No smooth solar model
    drifts 7x slower than the January declination rate, and heatx's own
    path checks out against the closed-form geometry (Santiago noon
    altitude Jan 1: computed 79.63 deg vs 90-|lat-dec| = 79.55), so this
    is an EnergyPlus-side run-period quirk in the pre-baked fixtures.
    This helper reproduces it (sun frozen at ``day_fixed`` through day
    20, live afterwards) so the attribution is a checked, reproducible
    experiment (tests/test_e2e_eplus.py): with it, the tilted fixture's
    zone-T residual drops 0.217 -> 0.079 K RMSE and its -0.17 K bias
    vanishes — i.e. the residual is the fixtures' sun, not heatx's."""
    from heatx.weather.solar import solar_position, sun_and_sky_steps

    sph = int(steps_per_hour)
    dni, dhi, ghi, alt, az, day = sun_and_sky_steps(epw, sph, hours=hours)
    dayf = np.where(day <= 20, float(day_fixed), day)
    t = (np.arange(hours * sph, dtype=np.float64) + 1.0) / sph
    alt2, az2 = solar_position(
        epw.latitude_deg, epw.longitude_deg, epw.tz_hours, dayf, t % 24.0
    )
    return dni, dhi, ghi, alt2, az2, dayf


def weather_model_inputs(epw, model, building, sky="perez",
                         steps_per_hour=None, mimic_fixture_sun=False):
    """The incident solar and longwave heatx computes for a fixture model
    from the EPW alone.

    ``steps_per_hour=None``: hourly [HOURS+1, S] arrays (one extra hour
    for sub-hour interpolation past the last record).
    ``steps_per_hour=k``: the solar comes from the SUB-HOUR EnergyPlus-
    convention chain (heatx.weather.solar.surface_irradiance_steps — the
    fixtures run Timestep 20, and EnergyPlus computes per-timestep solar
    from mid-hour-centered interpolated irradiance with a per-timestep sun
    position; matching it halves the incident-solar residual and removes
    the -1.1..+1.5 W/m2 mean offsets the round-4 attribution measured) as
    [HOURS*k, S]; the longwave stays hourly [HOURS+1, S] (it is a smooth
    blend of T^4 terms — the round-4 decomposition exonerated it to
    < 0.06 W/m2 bias)."""
    from heatx.weather.solar import sun_and_sky, surface_irradiance_steps

    gv = model_ground_views(model)
    sun = sun_and_sky(epw, hours=HOURS + 1)  # shared by both faces
    sol = {}
    ir = {}
    for side in ("front", "back"):
        if steps_per_hour is None:
            sol[side] = surface_irradiance(
                epw, building, hours=HOURS + 1, sky=sky, side=side,
                ground_view=gv, sun=sun,
            )
        else:
            sun_steps = (
                fixture_anomaly_sun(epw, steps_per_hour, HOURS)
                if mimic_fixture_sun
                else None
            )
            sol[side] = surface_irradiance_steps(
                epw, building, steps_per_hour, hours=HOURS, side=side,
                ground_view=gv, sun=sun_steps,
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
    mimic_fixture_sun: bool = False,
):
    """March one fixture under heatx's own weather models.

    ``mimic_fixture_sun`` substitutes the fixtures' apparent frozen sun
    path (:func:`fixture_anomaly_sun`) for heatx's correct one — the
    attribution experiment isolating the fixture-side sun-path share of
    the residual.

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

    # Solar at the fixture's own sub-hour resolution (EnergyPlus
    # convention); longwave hourly, interpolated to the mid-step grid.
    sol, ir = weather_model_inputs(
        epw, model, b, sky=sky, steps_per_hour=steps_per_hour,
        mimic_fixture_sun=mimic_fixture_sun,
    )
    t_mid = (np.arange(T) + 0.5) / steps_per_hour
    hr_mid = np.arange(HOURS + 1) + 0.5

    def to_steps(a):  # [H+1, S] hourly -> [T, S]
        return np.stack(
            [np.interp(t_mid, hr_mid, a[:, s]) for s in range(a.shape[1])], 1
        )

    front_out = front_outdoor
    side = "front" if front_out else "back"
    sol_s = np.asarray(sol[side])
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
