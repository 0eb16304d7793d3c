"""heatx — TPU-native whole-building transient thermal simulation.

A brand-new JAX/XLA/Pallas framework with the capabilities of SIMPLE's `heat`
module (the Rust reference surveyed in SURVEY.md): every wall and window is a
1-D finite-difference thermal network (auto-discretized into massive and
no-mass layers, marched with RK4 and steady-state solves respectively), zone
air follows an analytical exponential energy balance, and the physics — TARP
convection, ISO 15099 gas-cavity convection, ISO 9050 glazing optics,
HVAC/luminaire/infiltration gains — matches the reference and its EnergyPlus
validation suite.

Design: the building compiles to a static padded ``[n_surfaces, max_nodes]``
node layout; each timestep is one batched XLA computation over every surface;
time is a ``lax.scan``; scale-out shards the surface axis over a device mesh
with a ``segment_sum`` + ``psum`` zone reduction.
"""

__version__ = "0.5.0"

from heatx import config, constants, ensemble  # noqa: F401
from heatx.api import ThermalModel  # noqa: F401
from heatx.model.idf import LoadedIdf, load_idf  # noqa: F401
from heatx.model.spl import load_spl  # noqa: F401
from heatx.config import DEFAULT_CONFIG, SimConfig  # noqa: F401
from heatx.engine.state import SimState, StepInputs  # noqa: F401
from heatx.model.building import (  # noqa: F401
    Boundary,
    BuildingModel,
    Construction,
    ElectricHeater,
    GasSubstance,
    IdealHeaterCooler,
    Luminaire,
    Material,
    SiteDetails,
    SpaceDef,
    Substance,
    SurfaceDef,
    ZoneShadingControl,
    ZoneVentilationControl,
)
