"""Test-building factory: the heatx equivalent of SIMPLE's
``simple_test_models`` dev-crate.

The reference's analytical and EnergyPlus validation suites build a
single-zone box with one exterior wall (optionally holed by a window), an
electric heater, a luminaire and infiltration
(tests/validate_wall_heat_transfer.rs:95-613, SingleZoneTestBuildingOptions).
Material properties mirror the fixtures' IDFs (tests/massive_full/in.idf:46-57)
and the reference's in-source test substances (surface.rs:1048-1075):

* polyurethane: k=0.0252 W/m.K, rho=17.5 kg/m3, cp=2400 J/kg.K
* concrete:     k=0.816  W/m.K, rho=1700 kg/m3, cp=800  J/kg.K
* glass:        k=1.0    W/m.K, rho=2500 kg/m3, cp=840  J/kg.K (tau per layer)
* air:          standard AIR gas cavity
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from heatx.model.building import (
    Boundary,
    BuildingModel,
    Construction,
    ElectricHeater,
    GasSubstance,
    Luminaire,
    Material,
    SpaceDef,
    Substance,
    SurfaceDef,
)


@dataclass
class TestMat:
    """One construction layer: kind in {polyurethane, concrete, glass, air}."""

    kind: str
    thickness: float
    tau: float = 0.0  # solar transmittance (glass only)

    @staticmethod
    def polyurethane(thickness: float) -> "TestMat":
        return TestMat("polyurethane", thickness)

    @staticmethod
    def concrete(thickness: float) -> "TestMat":
        return TestMat("concrete", thickness)

    @staticmethod
    def glass(thickness: float, tau: float = 0.82) -> "TestMat":
        return TestMat("glass", thickness, tau)

    @staticmethod
    def air(thickness: float) -> "TestMat":
        return TestMat("air", thickness)


@dataclass
class SingleZoneOptions:
    """Mirror of SingleZoneTestBuildingOptions."""

    zone_volume: float = 40.0
    surface_height: float = 2.0
    surface_width: float = 2.0
    window_height: float = 0.0
    window_width: float = 0.0
    construction: List[TestMat] = field(default_factory=list)
    emissivity: float = 0.84  # front/back thermal absorbtance of solid layers
    solar_absorbtance: float = 0.7  # front/back solar absorbtance
    heating_power: float = 0.0  # > 0 adds an ElectricHeater
    lighting_power: float = 0.0  # > 0 adds a Luminaire
    infiltration_rate: float = 0.0  # m3/s (driven through StepInputs)


_PROPS = {
    "polyurethane": dict(thermal_conductivity=0.0252, density=17.5, specific_heat_capacity=2400.0),
    "concrete": dict(thermal_conductivity=0.816, density=1700.0, specific_heat_capacity=800.0),
    "glass": dict(thermal_conductivity=1.0, density=2500.0, specific_heat_capacity=840.0),
}


def single_zone_building(opts: SingleZoneOptions) -> BuildingModel:
    """Build the single-zone test model: one south-facing exterior wall whose
    back bounds the zone, optionally with a window hole of the same
    construction (the closed-form tests treat the window as a hole: total heat
    transfer area stays height*width)."""
    m = BuildingModel()

    mats: List[str] = []
    for i, layer in enumerate(opts.construction):
        name = f"layer{i}"
        if layer.kind == "air":
            sub = GasSubstance(f"{name}-sub", "air")
            m.add_substance(sub)
        else:
            props = _PROPS[layer.kind]
            sub = Substance(
                f"{name}-sub",
                front_thermal_absorbtance=opts.emissivity,
                back_thermal_absorbtance=opts.emissivity,
                front_solar_absorbtance=opts.solar_absorbtance,
                back_solar_absorbtance=opts.solar_absorbtance,
                solar_transmittance=layer.tau if layer.kind == "glass" else 0.0,
                **props,
            )
            m.add_substance(sub)
        m.add_material(Material(name, sub.name, layer.thickness))
        mats.append(name)
    m.add_construction(Construction("the construction", mats))

    m.add_space(SpaceDef("Space", opts.zone_volume))

    w, h = opts.surface_width, opts.surface_height
    wall_area = w * h - opts.window_width * opts.window_height
    # South-facing vertical wall (normal (0,-1,0)), like the fixture IDFs.
    m.add_surface(
        SurfaceDef(
            "the surface",
            "the construction",
            Boundary.outdoor(),
            Boundary.space_("Space"),
            vertices=np.array([[0, 0, 0], [w, 0, 0], [w, 0, h], [0, 0, h]], float),
            area=wall_area,
            perimeter=2.0 * (w + h),
            height=h / 2.0,
        )
    )
    if opts.window_width > 0.0 and opts.window_height > 0.0:
        ww, wh = opts.window_width, opts.window_height
        m.add_fenestration(
            SurfaceDef(
                "the window",
                "the construction",
                Boundary.outdoor(),
                Boundary.space_("Space"),
                vertices=np.array(
                    [[0, 0, 0], [ww, 0, 0], [ww, 0, wh], [0, 0, wh]], float
                ),
                height=h / 2.0,
            )
        )

    if opts.heating_power > 0.0:
        m.add_hvac(ElectricHeater("heater", "Space"))
    if opts.lighting_power > 0.0:
        m.add_luminaire(Luminaire("luminaire", "Space"))
    return m
