"""EnergyPlus fixture replay harness.

heatx equivalent of the reference's ``march_model`` validation driver
(tests/validate_wall_heat_transfer.rs:615-750): replay EnergyPlus's own
boundary conditions — site wind, incident solar, outdoor dry-bulb, and the
logged net IR gain converted back to incident IR irradiance via
``gain/(A*eps) + sigma*T_s^4`` — through the wall+zone solver, and compare
the resulting zone temperature series after a 5000-step warm-up skip.

Where the reference loops on the host per CSV row, heatx runs the whole
21-day replay as ONE ``lax.scan`` on device: the IR back-conversion reads the
front-node temperature from the scan carry.
"""

from __future__ import annotations

from dataclasses import dataclass, replace as dc_replace
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

import heatx
from heatx.constants import SIGMA
from heatx.engine import state as state_mod
from heatx.engine import step as step_mod
from heatx.io.eplus import EPlusWallRun, read_eplusout
from heatx.model.spl import load_spl
from heatx.testing import SingleZoneOptions, TestMat, single_zone_building


def replay_wall_run(
    tm: "heatx.ThermalModel",
    run: EPlusWallRun,
    emissivity: float,
    surface_area: float,
    warmup: int = 5000,
    march_fn=None,
    pin_h_inside: bool = False,
    pin_h_outside: bool = False,
    passes: int = 1,
    collect_channels: bool = False,
):
    """March the compiled model through the fixture's boundary conditions.

    Returns (expected, found) zone-temperature series with the first
    ``warmup`` steps skipped, exactly like the reference
    (validate_wall_heat_transfer.rs:662-709).

    ``march_fn(building, state, inputs) -> state`` overrides the main-step
    integrator (default: the reference-parity ``step_mod.march``); used to
    validate the fast modes against the same EnergyPlus evidence.

    ``pin_h_inside`` / ``pin_h_outside`` drive the inside (back) / outside
    (front) film coefficient from the fixture's logged per-step h series
    instead of heatx's own TARP evaluation — the diagnostic experiment that
    separates film-coefficient disagreement from solver error (the per-step
    analogue of the reference's debug-only fixed-h override,
    surface.rs:374-381).  The fixed-h channels are pytree leaves of the
    compiled building, so the per-step values ride as scan inputs.

    ``passes`` replays the fixture series that many times back-to-back and
    scores the LAST pass: ``passes=2`` hands the solver a converged initial
    state, removing the cold-start transient of the reference protocol
    (nodes initialized to 22 C vs EnergyPlus's 25 warm-up days — decisive
    for the insulated mixed wall, whose ~6.6-day time constant outlives the
    5000-step warm-up skip; see tests/test_eplus_replay.py).

    ``collect_channels`` records every observable channel the fixture logs
    (zone T, outside/inside face temperatures, h out/in) and returns a dict
    of (ours, energyplus) series pairs instead — so a zone-temperature
    disagreement can be localized to the physics channel it enters through
    (one scan body serves both uses; the channel variant used to be a
    drifting copy).
    """
    from heatx.engine import surface as surf_mod

    if march_fn is None:
        march_fn = step_mod.march
    building = tm.building
    dtype = building.config.dtype
    S = building.n_surfaces

    state = state_mod.initial_state(building)
    state = state._replace(
        zone_T=jnp.full_like(state.zone_T, run.zone_air_temp[0])
    )
    base = state_mod.default_inputs(building)

    nan_s = np.full(run.n_steps, np.nan)

    def tile(v):
        return np.tile(np.asarray(v), passes)

    xs = (
        jnp.asarray(tile(run.outdoor_temp), dtype),
        jnp.asarray(tile(run.site_wind_speed), dtype),
        jnp.asarray(np.radians(tile(run.site_wind_direction)), dtype),
        jnp.asarray(tile(run.incident_solar), dtype),
        jnp.asarray(tile(run.outdoor_thermal_gain), dtype),
        jnp.asarray(tile(run.hs_inside if pin_h_inside else nan_s), dtype),
        jnp.asarray(tile(run.hs_outside if pin_h_outside else nan_s), dtype),
    )
    use_ir = emissivity > 1e-3

    # The building rides as a traced ARGUMENT of the jitted scan (repo
    # convention: never a closure constant — that bakes every array into
    # the executable and retraces per model / per pin-h configuration).
    def scan_fn(building, state, xs):
        def body(carry, x):
            t_out, ws, wd, sol, gain, h_in, h_out = x
            ts = carry.node_T[0]
            if use_ir:
                ir = (
                    gain / (surface_area * emissivity)
                    + SIGMA * (ts + 273.15) ** 4
                )
            else:
                ir = jnp.zeros((S,), dtype)
            inputs = base._replace(
                t_out=t_out,
                wind_speed=ws,
                wind_direction=wd,
                sol_front=jnp.broadcast_to(sol, (S,)),
                ir_front=ir,
            )
            bld = building
            if pin_h_inside or pin_h_outside:
                sb = bld.surfaces
                if pin_h_inside:  # inside film = the back (space-facing) face
                    sb = dc_replace(sb, fixed_h_back=jnp.broadcast_to(h_in, (S,)))
                if pin_h_outside:
                    sb = dc_replace(sb, fixed_h_front=jnp.broadcast_to(h_out, (S,)))
                bld = dc_replace(bld, surfaces=sb, discretizations=[])
            new = march_fn(bld, carry, inputs)
            # Record the state *before* this march, like the reference.
            out = carry.zone_T[0]
            if collect_channels:
                out = (
                    out,
                    carry.node_T[0, 0],
                    surf_mod._last_node(building.surfaces, carry.node_T)[0],
                    carry.h_front[0],
                    carry.h_back[0],
                )
            return new, out

        return jax.lax.scan(body, state, xs)

    _, found = jax.jit(scan_fn)(building, state, xs)

    def last_pass(a):
        # Score the LAST replayed pass, skipping the warm-up steps
        # (i > warmup strict, matching validate_wall_heat_transfer.rs:669).
        return np.asarray(a)[-run.n_steps :][warmup + 1 :]

    if collect_channels:
        zT, t_of, t_if, h_f, h_b = found
        sl = slice(warmup + 1, None)
        return {
            "zone_T": (last_pass(zT), run.zone_air_temp[sl]),
            "outside_face_T": (last_pass(t_of), run.outside_surface_temp[sl]),
            "inside_face_T": (last_pass(t_if), run.inside_surface_temp[sl]),
            "h_outside": (last_pass(h_f), run.hs_outside[sl]),
            "h_inside": (last_pass(h_b), run.hs_inside[sl]),
        }
    return run.zone_air_temp[warmup + 1 :], last_pass(found)


def replay_wall_channels(
    tm: "heatx.ThermalModel",
    run: EPlusWallRun,
    emissivity: float,
    surface_area: float,
    warmup: int = 5000,
    **kw,
):
    """Channel-localizing replay: :func:`replay_wall_run` with
    ``collect_channels=True`` (kept as a named entry point; extra keywords
    — march_fn, pin_h, passes — pass through)."""
    return replay_wall_run(
        tm, run, emissivity, surface_area, warmup=warmup,
        collect_channels=True, **kw,
    )


# ---------------------------------------------------------------------------
# The 13 fixture cases (validate_wall_heat_transfer.rs:817-994)
# ---------------------------------------------------------------------------


@dataclass
class WallCase:
    name: str  # fixture directory
    emissivity: float
    solar_abs: float
    construction: Optional[List[TestMat]] = None  # None -> .spl model
    spl_file: str = "back"
    surface_area: float = 60.0


CONCRETE = [TestMat.concrete(0.2)]
MIXED = [TestMat.polyurethane(0.02), TestMat.concrete(0.2), TestMat.polyurethane(0.02)]
NOMASS = [TestMat.polyurethane(0.02)]

WALL_CASES: Dict[str, WallCase] = {
    c.name: c
    for c in [
        WallCase("massive_full", 0.9, 0.7, CONCRETE),
        WallCase("massive_no_ir_no_solar", 0.0, 0.0, CONCRETE),
        WallCase("massive_no_ir_yes_solar", 0.0, 0.7, CONCRETE),
        WallCase("massive_yes_ir_no_solar", 0.9, 0.0, CONCRETE),
        WallCase("mixed_full", 0.9, 0.7, MIXED),
        WallCase("mixed_no_ir_no_solar", 0.0, 0.0, MIXED),
        WallCase("mixed_no_ir_yes_solar", 0.0, 0.7, MIXED),
        WallCase("mixed_yes_ir_no_solar", 0.9, 0.0, MIXED),
        WallCase("nomass_full", 0.9, 0.7, NOMASS),
        WallCase("nomass_no_ir_no_solar", 0.0, 0.0, NOMASS),
        WallCase("nomass_no_ir_yes_solar", 0.0, 0.7, NOMASS),
        WallCase("nomass_yes_ir_no_solar", 0.9, 0.0, NOMASS),
        WallCase("tilted", 0.9, 0.7, None),
        WallCase("horizontal", 0.9, 0.7, None),
    ]
}


def build_case_model(case: WallCase, fixtures_root: str, via_idf: bool = False):
    """march_test_model / march_simple_model equivalents
    (validate_wall_heat_transfer.rs:713-750).

    ``via_idf=True`` builds the model from the fixture's own ``in.idf``
    (heatx.model.idf) instead of the hand-authored equivalent — the full
    loop EnergyPlus input file -> heatx -> EnergyPlus output, which the
    reference cannot close (it re-authors every fixture in Rust)."""
    if via_idf:
        from heatx.model.idf import load_idf

        return load_idf(f"{fixtures_root}/{case.name}/in.idf").model
    if case.construction is not None:
        opts = SingleZoneOptions(
            zone_volume=600.0,
            surface_height=3.0,
            surface_width=20.0,
            construction=case.construction,
            emissivity=case.emissivity,
            solar_absorbtance=case.solar_abs,
        )
        return single_zone_building(opts)
    return load_spl(f"{fixtures_root}/{case.name}/{case.spl_file}.spl")


def run_case(
    case: WallCase,
    fixtures_root: str,
    n: int = 20,
    dtype=np.float64,
    march_fn=None,
    nomass_fixed_iters: Optional[int] = None,
    pin_h_inside: bool = False,
    pin_h_outside: bool = False,
    passes: int = 1,
    via_idf: bool = False,
):
    """Compile + replay one fixture case; returns (expected, found).

    ``nomass_fixed_iters`` selects the no-mass solve regime: None runs the
    reference-exact adaptive while_loop; an integer runs that many fixed
    relaxed iterations — the regime the fused parity kernel executes
    (heatx.ops.pallas_step requires a static iteration count), so the bench
    configuration is gated against the same fixtures as the exact loop."""
    model = build_case_model(case, fixtures_root, via_idf=via_idf)
    tm = heatx.ThermalModel(
        model,
        n=n,
        config=heatx.SimConfig(dtype=dtype, nomass_fixed_iters=nomass_fixed_iters),
    )
    # "in models like these — a single surface — EnergyPlus assumes zero IR
    # radiation indoors" (validate_wall_heat_transfer.rs:629-630)
    tm.building.surfaces.eps_back[:] = 0.0
    run = read_eplusout(f"{fixtures_root}/{case.name}/eplusout.csv")
    return replay_wall_run(
        tm, run, case.emissivity, case.surface_area, march_fn=march_fn,
        pin_h_inside=pin_h_inside, pin_h_outside=pin_h_outside, passes=passes,
    )
