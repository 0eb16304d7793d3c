"""Minimal EnergyPlus IDF reader: the thermal-envelope subset.

The reference validates against EnergyPlus fixtures whose models are
re-authored by hand in Rust (tests/validate_wall_heat_transfer.rs:95-613 and
the ``simple_test_models`` dev-crate) — the ``in.idf`` files themselves are
only consumed by EnergyPlus.  heatx closes that loop: :func:`load_idf` parses
the envelope subset of an IDF directly into a :class:`BuildingModel`, so the
validation fixtures (and any IDF restricted to the same object set) can be
simulated without re-authoring.  Supported objects:

* ``Material`` / ``Material:NoMass`` / ``WindowMaterial:Glazing``
* ``Construction``
* ``Zone`` (volume required — ``autocalculate`` is rejected)
* ``BuildingSurface:Detailed`` (Outdoors / Ground / Zone / Surface outside
  boundary conditions)
* ``FenestrationSurface:Detailed`` (window hosted in a wall; its area is
  subtracted from the host, matching the reference's window-as-a-hole model,
  validate_wall_heat_transfer.rs:106-118)
* ``ZoneInfiltration:DesignFlowRate`` (Flow/Zone or AirChanges/Hour; the
  resulting design m3/s is *reported*, not compiled — infiltration is a
  per-step input channel in heatx, ``StepInputs.inf_vol``)
* ``Building`` (terrain -> :class:`SiteDetails` wind profile),
  ``Timestep`` (main steps per hour, the ``n`` of ``ThermalModel``),
  ``SurfaceConvectionAlgorithm:*`` (must be TARP — the only algorithm the
  reference and heatx implement, convection.rs:1-22)

Everything else (RunPeriod, Output:*, schedules other than the constants
referenced by infiltration, GlobalGeometryRules) is ignored; geometry is
assumed world-coordinate counter-clockwise-from-outside, the convention of
every reference fixture.

Mapping notes (documented deviations, all lossless for the fixture set):

* ``Material:NoMass`` carries only a thermal resistance.  heatx's
  discretizer (like the reference's, discretization.rs:410-544) decides
  massive-vs-no-mass from layer properties, so the R-value is realized as an
  equivalent slab of a standard light insulator (polyurethane-like:
  k=0.0252 W/m.K, rho=17.5 kg/m3, cp=2400 J/kg.K — the exact substance the
  reference's own "nomass" fixture models use,
  validate_wall_heat_transfer.rs:949) with thickness ``R*k``.  Its time
  constant is far below any simulation dt, so it discretizes to a pure-R
  no-mass segment either way.
* The fixtures' ``WindowMaterial:Glazing`` objects omit thickness and
  conductivity (a truncated field list); standard-schema objects are parsed
  in full, truncated ones fall back to 6 mm / k=1.0 glass (the reference's
  in-source test glass, surface.rs:1048-1075).  Solar absorptance per side is
  ``1 - tau - reflectance``.
"""

from __future__ import annotations

import os
import warnings
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from heatx.model.building import (
    Boundary,
    BuildingModel,
    Construction,
    Material,
    SiteDetails,
    SpaceDef,
    Substance,
    SurfaceDef,
)

# Equivalent-slab properties for Material:NoMass (see module docstring).
NOMASS_CONDUCTIVITY = 0.0252
NOMASS_DENSITY = 17.5
NOMASS_SPECIFIC_HEAT = 2400.0

# Fallback pane properties for truncated WindowMaterial:Glazing objects.
GLAZING_THICKNESS = 0.006
GLAZING_CONDUCTIVITY = 1.0
GLAZING_DENSITY = 2500.0
GLAZING_SPECIFIC_HEAT = 840.0

_TERRAINS = {"country", "suburbs", "city", "ocean", "urban"}


@dataclass
class LoadedIdf:
    """Result of :func:`load_idf`."""

    model: BuildingModel
    timestep: int = 1  # main steps per hour (E+ ``Timestep``)
    #: zone name -> design infiltration flow, m3/s (drive it through
    #: ``StepInputs.inf_vol``; heatx does not compile schedules).
    infiltration: Dict[str, float] = field(default_factory=dict)
    #: object type (lower-case) -> count parsed, for diagnostics.
    counts: Dict[str, int] = field(default_factory=dict)


def _tokenize(text: str) -> List[List[str]]:
    """IDF statements as lists of stripped fields.

    An IDF is ``Type, f1, f2, ... ;`` with ``!`` comments to end-of-line."""
    lines = []
    for raw in text.splitlines():
        bang = raw.find("!")
        lines.append(raw if bang < 0 else raw[:bang])
    objects = []
    for stmt in "\n".join(lines).split(";"):
        fields = [f.strip() for f in stmt.split(",")]
        if fields and fields[0]:
            objects.append(fields)
    return objects


def _num(fields: List[str], i: int, default: Optional[float] = None) -> Optional[float]:
    if i >= len(fields) or fields[i] == "":
        return default
    return float(fields[i])


def _str(fields: List[str], i: int, default: str = "") -> str:
    return fields[i] if i < len(fields) else default


def _vertices(fields: List[str], n_field: int) -> np.ndarray:
    n = _num(fields, n_field)
    coords = [float(f) for f in fields[n_field + 1 :] if f != ""]
    if n is not None and len(coords) != int(n) * 3:
        raise ValueError(
            f"surface '{fields[1]}': {len(coords)} coordinates for "
            f"{int(n)} declared vertices"
        )
    return np.asarray(coords, dtype=np.float64).reshape(-1, 3)


def _polygon_area(v: np.ndarray) -> float:
    c = np.zeros(3)
    for i in range(len(v)):
        c += np.cross(v[i], v[(i + 1) % len(v)])
    return float(np.linalg.norm(c)) / 2.0


def load_idf(path_or_text: str) -> LoadedIdf:
    """Parse an EnergyPlus IDF (path or raw text) into a ``LoadedIdf``.

    Raises ``ValueError`` on objects outside the supported envelope subset
    that affect the thermal model (unknown boundary conditions, gas layers,
    autocalculated volumes); ignores purely-reporting objects."""
    if "\n" not in path_or_text and os.path.exists(path_or_text):
        with open(path_or_text) as f:
            text = f.read()
    else:
        text = path_or_text

    objs = _tokenize(text)
    counts: Dict[str, int] = {}
    by_type: Dict[str, List[List[str]]] = {}
    for o in objs:
        t = o[0].lower()
        counts[t] = counts.get(t, 0) + 1
        by_type.setdefault(t, []).append(o)

    m = BuildingModel()
    out = LoadedIdf(model=m, counts=counts)

    for o in by_type.get("timestep", []):
        out.timestep = int(_num(o, 1, 1.0))

    for o in by_type.get("building", []):
        terrain = _str(o, 3).lower()
        if terrain in _TERRAINS:
            m.site_details = SiteDetails(terrain=terrain)

    for kind in ("surfaceconvectionalgorithm:inside",
                 "surfaceconvectionalgorithm:outside"):
        for o in by_type.get(kind, []):
            if _str(o, 1).upper() != "TARP":
                warnings.warn(
                    f"{o[0]} {o[1]!r}: heatx implements TARP only (like the "
                    "reference, convection.rs); simulating with TARP",
                    stacklevel=2,
                )

    schedule_constants: Dict[str, float] = {}
    for o in by_type.get("schedule:constant", []):
        schedule_constants[o[1]] = _num(o, 3, 1.0)

    # -- materials -> Substance + Material -----------------------------------
    for o in by_type.get("material", []):
        name = o[1]
        # Name, Roughness, Thickness, Conductivity, Density, Specific Heat,
        # Thermal Absorptance, Solar Absorptance, Visible Absorptance.
        eps = _num(o, 7, 0.9)
        alpha = _num(o, 8, 0.7)
        m.add_substance(Substance(
            f"{name} substance",
            thermal_conductivity=_num(o, 4),
            density=_num(o, 5),
            specific_heat_capacity=_num(o, 6),
            front_thermal_absorbtance=eps,
            back_thermal_absorbtance=eps,
            front_solar_absorbtance=alpha,
            back_solar_absorbtance=alpha,
            solar_transmittance=0.0,
        ))
        m.add_material(Material(name, f"{name} substance", _num(o, 3)))

    for o in by_type.get("material:nomass", []):
        name = o[1]
        # Name, Roughness, Thermal Resistance, Thermal Abs, Solar Abs, Vis.
        r_value = _num(o, 3)
        eps = _num(o, 4, 0.9)
        alpha = _num(o, 5, 0.7)
        m.add_substance(Substance(
            f"{name} substance",
            thermal_conductivity=NOMASS_CONDUCTIVITY,
            density=NOMASS_DENSITY,
            specific_heat_capacity=NOMASS_SPECIFIC_HEAT,
            front_thermal_absorbtance=eps,
            back_thermal_absorbtance=eps,
            front_solar_absorbtance=alpha,
            back_solar_absorbtance=alpha,
            solar_transmittance=0.0,
        ))
        m.add_material(Material(name, f"{name} substance",
                                r_value * NOMASS_CONDUCTIVITY))

    for o in by_type.get("windowmaterial:glazing", []):
        name = o[1]
        # Standard schema: Name, Optical Data Type, Spectral Data Set,
        # Thickness, tau_sol, refl_f, refl_b, tau_vis, vrefl_f, vrefl_b,
        # tau_ir, eps_f, eps_b, Conductivity.  The fixtures ship a truncated
        # variant with no Thickness field (field 4 is already tau_sol <= 1
        # and only 9 data fields follow the name) — detect by field count.
        # Plausibility guard: a real Thickness field is metres (< 0.1);
        # a truncated object's field 4 is already tau_sol (0..1-ish, but
        # >= 0.1 in practice), so a trailing-comma-padded truncated object
        # cannot masquerade as standard.
        t4 = _num(o, 4)
        standard = len(o) >= 12 and t4 is not None and t4 < 0.1
        if standard:
            thickness = _num(o, 4, GLAZING_THICKNESS)
            tau = _num(o, 5, 0.0)
            refl_f, refl_b = _num(o, 6, 0.0), _num(o, 7, 0.0)
            eps_f = _num(o, 12, 0.84)
            eps_b = _num(o, 13, 0.84)
            k = _num(o, 14, GLAZING_CONDUCTIVITY)
        else:
            thickness = GLAZING_THICKNESS
            tau = _num(o, 4, 0.0)
            refl_f, refl_b = _num(o, 5, 0.0), _num(o, 6, 0.0)
            eps_f = eps_b = 0.84
            k = GLAZING_CONDUCTIVITY
        m.add_substance(Substance(
            f"{name} substance",
            thermal_conductivity=k,
            density=GLAZING_DENSITY,
            specific_heat_capacity=GLAZING_SPECIFIC_HEAT,
            front_thermal_absorbtance=eps_f,
            back_thermal_absorbtance=eps_b,
            front_solar_absorbtance=max(0.0, 1.0 - tau - refl_f),
            back_solar_absorbtance=max(0.0, 1.0 - tau - refl_b),
            solar_transmittance=tau,
        ))
        m.add_material(Material(name, f"{name} substance", thickness))

    for o in by_type.get("construction", []):
        # Name, then layers outside -> inside == heatx front -> back.
        layers = [f for f in o[2:] if f]
        if not layers:
            raise ValueError(f"Construction {o[1]!r} has no layers")
        m.add_construction(Construction(o[1], layers))

    # -- zones ----------------------------------------------------------------
    zone_floor_area: Dict[str, float] = {}
    for o in by_type.get("zone", []):
        name = o[1]
        vol = _str(o, 9).lower()
        if vol in ("", "autocalculate"):
            raise ValueError(
                f"Zone {name!r}: heatx requires an explicit Volume "
                "(autocalculate is not supported)"
            )
        m.add_space(SpaceDef(name, float(vol)))
        fa = _str(o, 10).lower()
        if fa not in ("", "autocalculate"):
            zone_floor_area[name] = float(fa)

    # -- surfaces --------------------------------------------------------------
    surf_zone: Dict[str, str] = {}  # surface name -> zone (for OBC=Surface)
    surf_front: Dict[str, Boundary] = {}
    pending = []  # (SurfaceDef, obc_surface_name) resolved after the loop
    known_obc = {"outdoors", "ground", "zone", "surface", "adiabatic",
                 "othersidecoefficients", "othersideconditionsmodel"}
    for o in by_type.get("buildingsurface:detailed", []):
        # Name, Surface Type, Construction, Zone, [Space — added in E+ 22.1,
        # absent in older IDFs], OBC, OBC Object, Sun Exposure, Wind
        # Exposure, View Factor to Ground, N, coords...
        name, construction, zone = o[1], o[3], o[4]
        if _str(o, 6).lower() in known_obc:
            shift = 1
        elif _str(o, 5).lower() in known_obc:
            shift = 0
        else:
            # Unknown OBC either way: disambiguate by which index makes the
            # declared vertex count match the trailing coordinates.
            n1 = _num(o, 11, -1.0)
            shift = 1 if len(o) - 12 == int(n1) * 3 else 0
        obc, obc_obj = _str(o, 5 + shift).lower(), _str(o, 6 + shift)
        surf_zone[name] = zone
        if obc == "outdoors":
            front: Optional[Boundary] = Boundary.outdoor()
        elif obc == "ground":
            front = Boundary.ground()
        elif obc == "zone":
            front = Boundary.space_(obc_obj)
        elif obc == "surface":
            front = None  # the OBC object is a surface; resolve below
        else:
            raise ValueError(
                f"BuildingSurface {name!r}: unsupported Outside Boundary "
                f"Condition {obc!r} (supported: Outdoors/Ground/Zone/Surface)"
            )
        verts = _vertices(o, 10 + shift)
        sd = SurfaceDef(name, construction, front or Boundary.outdoor(),
                        Boundary.space_(zone), vertices=verts)
        if front is None:
            pending.append((sd, obc_obj))
        else:
            surf_front[name] = front
        m.add_surface(sd)
    for sd, other in pending:
        if other not in surf_zone:
            raise ValueError(
                f"BuildingSurface {sd.name!r}: OBC Object {other!r} names no "
                "parsed surface"
            )
        sd.front_boundary = Boundary.space_(surf_zone[other])

    # -- fenestration: a window hosted in a wall ------------------------------
    host_area_cut: Dict[str, float] = {}
    for o in by_type.get("fenestrationsurface:detailed", []):
        # Name, Surface Type, Construction, Building Surface Name,
        # OBC Object, View Factor, Frame, Multiplier, N, coords...
        name, construction, host = o[1], o[3], o[4]
        verts = _vertices(o, 9)
        if host not in surf_zone:
            raise ValueError(
                f"FenestrationSurface {name!r}: host surface {host!r} not found"
            )
        mult = _num(o, 8, 1.0)
        front = surf_front.get(host, Boundary.outdoor())
        m.add_fenestration(SurfaceDef(
            name, construction, front, Boundary.space_(surf_zone[host]),
            vertices=verts,
        ))
        host_area_cut[host] = (
            host_area_cut.get(host, 0.0) + _polygon_area(verts) * mult
        )
    if host_area_cut:
        # The window is a hole in its host: net the host's heat-transfer
        # area (validate_wall_heat_transfer.rs:106-118 does the same).
        for sd in m.surfaces:
            if sd.name in host_area_cut:
                area, per, normal, height = sd.resolved_geometry()
                sd.area = area - host_area_cut[sd.name]
                if sd.area <= 0.0:
                    raise ValueError(
                        f"surface {sd.name!r}: fenestration area exceeds "
                        "the host polygon"
                    )

    # -- infiltration (reported, not compiled) ---------------------------------
    vol_by_zone = {s.name: s.volume for s in m.spaces}
    for o in by_type.get("zoneinfiltration:designflowrate", []):
        zone = o[2]
        sched = schedule_constants.get(_str(o, 3), 1.0)
        method = _str(o, 4).lower()
        if method in ("flow/zone", ""):
            flow = _num(o, 5, 0.0)
        elif method == "airchanges/hour":
            if zone not in vol_by_zone:
                raise ValueError(
                    f"ZoneInfiltration {o[1]!r}: unknown zone {zone!r}"
                )
            flow = _num(o, 8, 0.0) * vol_by_zone[zone] / 3600.0
        elif method == "flow/area":
            if zone not in zone_floor_area:
                raise ValueError(
                    f"ZoneInfiltration {o[1]!r}: Flow/Area needs the zone's "
                    "Floor Area"
                )
            flow = _num(o, 6, 0.0) * zone_floor_area[zone]
        else:
            raise ValueError(
                f"ZoneInfiltration {o[1]!r}: unsupported calculation method "
                f"{method!r}"
            )
        out.infiltration[zone] = out.infiltration.get(zone, 0.0) + flow * sched

    return out
