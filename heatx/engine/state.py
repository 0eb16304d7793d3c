"""Simulation state and exogenous inputs.

The reference keeps *all* mutable simulation state in one flat
``SimulationState`` vector with indices registered at build time
(surface_trait.rs:223-378, zone.rs:45-50).  heatx keeps the same central idea
— immutable compiled model + one state container that is the ``lax.scan``
carry — but the container is a named pytree of arrays instead of a flat
vector, which doubles as the metrics/observability schema (SURVEY.md section
5): convection coefficients and convective heat flows per face, node
temperatures, zone temperatures.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from heatx.constants import INITIAL_CONVECTION_COEFFICIENT, INITIAL_TEMPERATURE


class SimState(NamedTuple):
    """The scan carry: everything that evolves during the simulation."""

    node_T: jnp.ndarray  # [N, S] node temperatures (node-major), C
    zone_T: jnp.ndarray  # [Z] zone dry-bulb temperatures, C
    h_front: jnp.ndarray  # [S] front convection coefficient, W/m2.K
    h_back: jnp.ndarray  # [S]
    q_front: jnp.ndarray  # [S] front convective heat flow, W/m2
    q_back: jnp.ndarray  # [S]
    # [Z] ideal-loads power (W, heating +, cooling -) when the building has
    # setpoint-driven HVAC (heatx extension; see zone.zone_update):
    # instantaneous per sub-step, mean over the main step after a march.
    # None on uncontrolled buildings (absent from the pytree).
    ideal_load: jnp.ndarray = None


class StepInputs(NamedTuple):
    """Exogenous inputs for one main timestep (what other SIMPLE modules or
    the weather file write into the state between ``march`` calls).

    Weather entries may be scalars (held constant over the sub-steps of the
    main step, like SyntheticWeather in the reference tests) or arrays of
    shape [dt_subdivisions] (one value per sub-step, like an interpolated
    EPW).  Everything else is held constant within the main step, mirroring
    the reference where those channels are only written between marches.
    """

    t_out: jnp.ndarray  # scalar or [sub]
    wind_speed: jnp.ndarray  # scalar or [sub]
    wind_direction: jnp.ndarray  # scalar or [sub], radians
    sol_front: jnp.ndarray  # [S] incident solar irradiance, W/m2
    sol_back: jnp.ndarray  # [S]
    ir_front: jnp.ndarray  # [S] incident infrared irradiance, W/m2
    ir_back: jnp.ndarray  # [S]
    hvac_power: jnp.ndarray  # [H] heating(+)/cooling(-) delivered, W
    lum_power: jnp.ndarray  # [L] lighting power, W
    inf_vol: jnp.ndarray  # [Z] infiltration volume flow, m3/s
    inf_temp: jnp.ndarray  # [Z] infiltration inlet temperature, C
    inf_mask: jnp.ndarray  # [Z] bool: space has infiltration state
    vent_vol: jnp.ndarray  # [Z]
    vent_temp: jnp.ndarray  # [Z]
    vent_mask: jnp.ndarray  # [Z] bool
    mix_vol: jnp.ndarray = None  # [M] inter-zone mixing flows, m3/s (heatx extension)
    # Optional thermostat setpoint schedules ([Z] per main step; heatx
    # extension): override the building's compiled ctl_heat_sp/ctl_cool_sp
    # for this step (night setback etc.).  None = use the compiled values.
    # All XLA integrators; the fused kernel takes [T, Z] schedules via
    # FastRunner(scheduled_setpoints=True).
    heat_sp: jnp.ndarray = None
    cool_sp: jnp.ndarray = None
    # Optional per-main-step override of the compiled zone-shading
    # setpoints ([S]; heatx extension, buildings with in-run
    # ZoneShadingControl only): schedule gates render blocked hours as
    # +1e9 (never deploy).  None = use the compiled setpoints.
    shade_sp: jnp.ndarray = None


def initial_state(building, dtype=None) -> SimState:
    """Fresh state with the reference's registered initial values
    (node/zone T = 22 C, h = 1.739658084820765)."""
    dtype = dtype or building.config.dtype
    S = building.n_surfaces
    N = building.max_nodes
    Z = building.n_zones
    node_T = np.where(building.surfaces.node_mask, INITIAL_TEMPERATURE, 0.0)
    return SimState(
        node_T=jnp.asarray(node_T, dtype=dtype),
        zone_T=jnp.full((Z,), INITIAL_TEMPERATURE, dtype=dtype),
        h_front=jnp.full((S,), INITIAL_CONVECTION_COEFFICIENT, dtype=dtype),
        h_back=jnp.full((S,), INITIAL_CONVECTION_COEFFICIENT, dtype=dtype),
        q_front=jnp.zeros((S,), dtype=dtype),
        q_back=jnp.zeros((S,), dtype=dtype),
        ideal_load=(
            jnp.zeros((Z,), dtype=dtype) if building.has_ideal_hvac else None
        ),
    )


def default_inputs(building, dtype=None, **overrides) -> StepInputs:
    """Zero-filled StepInputs; override individual channels by name."""
    dtype = dtype or building.config.dtype
    S = building.n_surfaces
    Z = building.n_zones
    H = building.n_hvacs
    L = building.n_luminaires
    base = StepInputs(
        t_out=jnp.asarray(0.0, dtype=dtype),
        wind_speed=jnp.asarray(0.0, dtype=dtype),
        wind_direction=jnp.asarray(0.0, dtype=dtype),
        sol_front=jnp.zeros((S,), dtype=dtype),
        sol_back=jnp.zeros((S,), dtype=dtype),
        ir_front=jnp.zeros((S,), dtype=dtype),
        ir_back=jnp.zeros((S,), dtype=dtype),
        hvac_power=jnp.zeros((H,), dtype=dtype),
        lum_power=jnp.zeros((L,), dtype=dtype),
        inf_vol=jnp.zeros((Z,), dtype=dtype),
        inf_temp=jnp.zeros((Z,), dtype=dtype),
        inf_mask=jnp.zeros((Z,), dtype=bool),
        vent_vol=jnp.zeros((Z,), dtype=dtype),
        vent_temp=jnp.zeros((Z,), dtype=dtype),
        vent_mask=jnp.zeros((Z,), dtype=bool),
        mix_vol=jnp.asarray(building.mix_vol, dtype=dtype),
    )
    for k, v in overrides.items():
        if v is None:
            continue  # explicit None = keep the default / leave absent
        base = base._replace(**{k: jnp.asarray(v, dtype=bool if k.endswith("mask") else dtype)})
    return base
