"""Discretization tests: segment building, chunk splitting, stability search.

Mirrors discretization.rs:707-1558 (build_normal_mass, test_build_normal_no_mass,
build_normal_gas_normal_*, test_get_chunks) plus the recursion invariants of
discretize_construction.
"""

import math

import numpy as np
import pytest

from heatx.build import discretize as dz
from heatx.constants import MAX_RS
from heatx.model.building import (
    BuildingModel,
    Construction,
    GasSubstance,
    Material,
    Substance,
)


def normal_model(k=1.0, rho=2.1, cp=1.312, thickness=12.5 / 1000.0):
    m = BuildingModel()
    m.add_substance(
        Substance("the substance", thermal_conductivity=k, density=rho, specific_heat_capacity=cp)
    )
    m.add_material(Material("the mat", "the substance", thickness))
    c = m.add_construction(Construction("the construction", ["the mat"]))
    return m, c


def gas_sandwich_model(k=1.0, rho=2.1, cp=1.312, thickness=12.5 / 1000.0, fta=0.9, bta=0.8):
    m = BuildingModel()
    m.add_substance(
        Substance(
            "the substance",
            thermal_conductivity=k,
            density=rho,
            specific_heat_capacity=cp,
            front_thermal_absorbtance=fta,
            back_thermal_absorbtance=bta,
        )
    )
    m.add_material(Material("the mat", "the substance", thickness))
    m.add_substance(GasSubstance("the gas", "air"))
    m.add_material(Material("the_gas", "the gas", thickness))
    c = m.add_construction(
        Construction("the construction", ["the mat", "the_gas", "the mat"])
    )
    return m, c


def test_build_normal_mass():
    k, rho, cp, thickness = 1.0, 2.1, 1.312, 12.5 / 1000.0
    m, c = normal_model(k, rho, cp, thickness)
    d = dz.build_segments(c, m, 10, [1], 1.0, 0.0)
    assert d.tstep_subdivision == 10
    assert len(d.segments) == 2

    exp_mass = thickness * rho * cp / 2.0
    assert abs(d.segments[0].mass - exp_mass) < 1e-17
    assert d.segments[0].kind == "solid"
    assert abs(d.segments[0].u - k / thickness) < 1e-16
    assert abs(d.segments[1].mass - exp_mass) < 1e-17
    assert d.segments[1].kind == "back"


def test_build_normal_no_mass():
    k, rho, cp, thickness = 1.0, 2.1, 1.312, 12.5 / 1000.0
    m, c = normal_model(k, rho, cp, thickness)
    d = dz.build_segments(c, m, 10, [0], 1.0, 0.0)
    assert len(d.segments) == 2
    assert d.segments[0].mass == 0.0
    assert d.segments[0].kind == "solid"
    assert abs(d.segments[0].u - k / thickness) < 1e-16
    assert d.segments[1].mass == 0.0
    assert d.segments[1].kind == "back"


@pytest.mark.parametrize("n_el", [[1, 1, 1], [0, 0, 0]])
def test_build_normal_gas_normal(n_el):
    k, rho, cp, thickness = 1.0, 2.1, 1.312, 12.5 / 1000.0
    m, c = gas_sandwich_model(k, rho, cp, thickness)
    d = dz.build_segments(c, m, 10, n_el, 1.0, 0.0)
    assert len(d.segments) == 4  # normal, gas, normal, back
    exp_mass = thickness * rho * cp / 2.0 if n_el[0] else 0.0
    for i in range(4):
        assert abs(d.segments[i].mass - exp_mass) < 1e-17
    assert d.segments[0].kind == "solid"
    assert d.segments[1].kind == "cavity"
    # emissivities: ein from NEXT layer front, eout from PREV layer back
    assert d.segments[1].cavity.ein == 0.9
    assert d.segments[1].cavity.eout == 0.8
    assert d.segments[2].kind == "solid"
    assert d.segments[3].kind == "back"


def test_gas_layer_errors():
    m = BuildingModel()
    m.add_substance(Substance("s", thermal_conductivity=1.0, density=1.0, specific_heat_capacity=1.0))
    m.add_material(Material("solid", "s", 0.01))
    m.add_substance(GasSubstance("g", "air"))
    m.add_material(Material("gas", "g", 0.01))

    first = m.add_construction(Construction("gas first", ["gas", "solid"]))
    with pytest.raises(ValueError, match="first layer"):
        dz.build_segments(first, m, 1, [0, 1], 1.0, 0.0)

    last = m.add_construction(Construction("gas last", ["solid", "gas"]))
    with pytest.raises(ValueError, match="last layer"):
        dz.build_segments(last, m, 1, [1, 0], 1.0, 0.0)

    double = m.add_construction(Construction("two gas", ["solid", "gas", "gas", "solid"]))
    with pytest.raises(ValueError, match="two gases"):
        dz.build_segments(double, m, 1, [1, 0, 0, 1], 1.0, 0.0)


def _chunks_of(masses):
    d = dz.Discretization(
        segments=[dz.Segment(mass=float(x)) for x in masses],
        tstep_subdivision=1,
        n_elements=[1],
    )
    return d.get_chunks()


def test_get_chunks():
    # single node, massive
    mass, nomass = _chunks_of([1.0])
    assert mass == [(0, 1)] and nomass == []
    # single node, no-mass
    mass, nomass = _chunks_of([0.0])
    assert mass == [] and nomass == [(0, 1)]
    # several nodes, massive
    mass, nomass = _chunks_of([1.0] * 10)
    assert mass == [(0, 10)] and nomass == []
    # several nodes, no-mass
    mass, nomass = _chunks_of([0.0] * 10)
    assert mass == [] and nomass == [(0, 10)]
    # mixed 1
    mass, nomass = _chunks_of([0.0, 1.0, 1.0, 0.0, 0.0])
    assert mass == [(1, 3)] and nomass == [(0, 1), (3, 5)]
    # mixed 2
    mass, nomass = _chunks_of([1.0, 1.0, 1.0, 0.0, 0.0])
    assert mass == [(0, 3)] and nomass == [(3, 5)]


def test_discretize_construction_stability():
    """The found (dt, dx) must satisfy the Euler eigenvalue bounds the
    reference asserts in debug builds (discretization.rs:505-538)."""
    m = BuildingModel()
    m.add_substance(
        Substance("concrete", thermal_conductivity=0.816, density=1700.0, specific_heat_capacity=800.0)
    )
    m.add_material(Material("c20", "concrete", 0.2))
    c = m.add_construction(Construction("massive", ["c20"]))

    main_dt = 3600.0
    n, n_elements = dz.discretize_construction(c, m, main_dt, 0.04, 60.0)
    assert n_elements[0] > 0
    dt = main_dt / n
    dx = 0.2 / n_elements[0]
    assert dx <= 0.04
    k, rho, cp = 0.816, 1700.0, 800.0
    lambda1 = -dt / (MAX_RS * rho * cp * dx)
    r = dx / k
    lambda2 = lambda1 - 2.0 * dt / (r * rho * cp * dx)
    assert -2.0 <= lambda1 <= 0.0
    assert -2.0 <= lambda2 <= 0.0


def test_discretize_nomass_when_dt_floor():
    """A thin layer whose stable dx exceeds its thickness at the dt floor is
    marked no-mass (discretization.rs:467-479)."""
    m = BuildingModel()
    m.add_substance(
        Substance("poly", thermal_conductivity=0.0252, density=17.5, specific_heat_capacity=2400.0)
    )
    m.add_material(Material("p2", "poly", 0.02))
    c = m.add_construction(Construction("nomass", ["p2"]))
    n, n_elements = dz.discretize_construction(c, m, 3600.0, 0.04, 60.0)
    assert n_elements == [0]


def test_r_value():
    m, c = normal_model(k=1.0, thickness=0.0125)
    d = dz.build_segments(c, m, 1, [5], 1.0, 0.0)
    # 5 elements of thickness/5 each: R = 5 * (thickness/5)/k = thickness/k
    assert abs(d.r_value() - 0.0125) < 1e-15

    m2, c2 = gas_sandwich_model()
    d2 = dz.build_segments(c2, m2, 1, [1, 1, 1], 1.0, 0.0)
    # Gas-cavity r-value: the reference panics (todo!(), discretization.rs:310);
    # heatx evaluates the ISO 15099 cavity U at given face temperatures.
    r2 = d2.r_value()
    assert r2 > 0.025  # two solid panes alone
    assert d2.r_value(t_front=40.0, t_back=30.0) < r2  # hotter cavity -> lower R
