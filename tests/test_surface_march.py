"""Single-wall march tests (surface.rs:1087-1556).

The reference drives hand-built single surfaces through iterate_surfaces;
heatx compiles tiny one-surface buildings and marches them:

* massive wall, 10 C both sides -> all nodes converge to 10 C, flux -> 0;
* massive wall, 10/30 C -> steady flux with q_front = -q_back;
* no-mass wall -> instantaneous steady state.
"""

import numpy as np
import pytest

import heatx
from heatx import (
    Boundary,
    BuildingModel,
    Construction,
    Material,
    Substance,
    SurfaceDef,
    ThermalModel,
)
from heatx.constants import SIGMA


def wall_model(substance_kwargs, thickness, layers, front_b, back_b):
    m = BuildingModel()
    m.add_substance(Substance("sub", **substance_kwargs))
    m.add_material(Material("m1", "sub", thickness))
    m.add_construction(Construction("c", ["m1"] * layers))
    m.add_surface(
        SurfaceDef(
            "wall", "c", front_b, back_b,
            area=4.0, perimeter=8.0, normal=(0.0, 0.0, 1.0), height=10.0,
        )
    )
    return m


BRICK = dict(
    thermal_conductivity=0.816, density=1700.0, specific_heat_capacity=800.0,
    front_thermal_absorbtance=0.0, back_thermal_absorbtance=0.0,
)
POLY = dict(
    thermal_conductivity=0.0252, density=17.5, specific_heat_capacity=2400.0,
    front_thermal_absorbtance=0.0, back_thermal_absorbtance=0.0,
)


def test_march_massive_equilibrium():
    """surface.rs:1087-1225 test_march_massive_1."""
    m = wall_model(BRICK, 20.0 / 1000.0, 1, Boundary.outdoor(), Boundary.outdoor())
    cfg = heatx.SimConfig(dtype=np.float64, max_dx=0.01, min_dt=1.0, safety=1)
    tm = ThermalModel(m, n=12, config=cfg)  # main_dt = 300 s
    tm.building.set_fixed_h(10.0, 10.0)

    st = tm.initial_state(dtype=np.float64)
    ir = SIGMA * (10.0 + 273.15) ** 4
    inp = tm.inputs(
        dtype=np.float64, t_out=10.0, ir_front=np.array([ir]), ir_back=np.array([ir])
    )

    q = 1e9
    count = 0
    while abs(q) > 0.00015:
        st = tm.march(st, inp)
        q_in = float(st.q_back[0])
        q_out = float(st.q_front[0])
        assert abs(q_in - q_out) < 0.5
        assert q_in >= 0.0 and q_out >= 0.0
        q = q_in
        count += 1
        assert count < 10000, f"no convergence, q={q}"

    temps = np.asarray(st.node_T[:, 0])
    np.testing.assert_allclose(temps, 10.0, atol=0.002)


def test_march_massive_asymmetric():
    """surface.rs:1227-1342 test_march_massive_2: ambient 30 front, outdoor 10
    back -> steady opposite fluxes."""
    m = wall_model(
        BRICK, 20.0 / 1000.0, 1, Boundary.ambient(30.0), Boundary.outdoor()
    )
    cfg = heatx.SimConfig(dtype=np.float64, max_dx=0.01, min_dt=1.0, safety=1)
    tm = ThermalModel(m, n=12, config=cfg)
    tm.building.set_fixed_h(10.0, 10.0)

    st = tm.initial_state(dtype=np.float64)
    inp = tm.inputs(
        dtype=np.float64,
        t_out=10.0,
        ir_front=np.array([SIGMA * (10.0 + 273.15) ** 4]),
        ir_back=np.array([SIGMA * (30.0 + 273.15) ** 4]),
    )

    change, prev_q = 99.0, -125.0
    count = 0
    while abs(change) > 1e-10:
        st = tm.march(st, inp)
        q_front = float(st.q_front[0])
        change = q_front - prev_q
        prev_q = q_front
        count += 1
        assert count < 10000

    # Steady state: heat enters the 30 C front (negative front flow, the
    # surface is colder than its air) and leaves at the 10 C back, with
    # |q| = dT / R_total.  (The reference's own test_march_massive_2 never
    # attaches its Ambient boundary to the ThermalSurface — set_front_boundary
    # is not called, surface.rs:1252-1285 — so it only checks the
    # Outdoor/Outdoor default; here the boundary is applied for real.)
    r_total = 0.1 + 0.02 / 0.816 + 0.1
    q_exp = 20.0 / r_total
    assert abs(float(st.q_front[0]) + q_exp) < 0.05
    assert abs(float(st.q_back[0]) - q_exp) < 0.05
    assert abs(float(st.q_front[0]) + float(st.q_back[0])) < 1e-6


def test_march_nomass_instantaneous():
    """surface.rs:1344-1443 test_march_nomass: equal temperatures on both
    sides reach steady state in a single step."""
    m = wall_model(POLY, 3.0 / 1000.0, 2, Boundary.outdoor(), Boundary.outdoor())
    cfg = heatx.SimConfig(dtype=np.float64, max_dx=3e-3 / 7.0, min_dt=10.0, safety=1)
    tm = ThermalModel(m, n=1200, config=cfg)  # main_dt = 3 s
    tm.building.set_fixed_h(10.0, 10.0)
    assert not tm.building.surfaces.has_massive

    st = tm.initial_state(dtype=np.float64)
    ir = SIGMA * (10.0 + 273.15) ** 4
    inp = tm.inputs(
        dtype=np.float64, t_out=10.0, ir_front=np.array([ir]), ir_back=np.array([ir])
    )
    st = tm.march(st, inp)
    temps = np.asarray(st.node_T[:, 0])
    assert abs(temps[0] - 10.0) < 0.2
    assert abs(temps[-1] - 10.0) < 0.2
    assert abs(float(st.q_front[0])) < 0.07
    assert abs(float(st.q_back[0])) < 0.07


def test_march_nomass_asymmetric():
    """surface.rs:1445-1556 test_march_nomass_2: 10 C outdoor front, 30 C
    ambient back -> instant steady flux, q_front = -q_back = dT/R."""
    m = wall_model(
        POLY, 3.0 / 1000.0, 2, Boundary.outdoor(), Boundary.ambient(30.0)
    )
    cfg = heatx.SimConfig(dtype=np.float64, max_dx=3e-3 / 7.0, min_dt=10.0, safety=1)
    tm = ThermalModel(m, n=1200, config=cfg)
    tm.building.set_fixed_h(10.0, 10.0)

    st = tm.initial_state(dtype=np.float64)
    inp = tm.inputs(dtype=np.float64, t_out=10.0)
    st = tm.march(st, inp)

    q_front = float(st.q_front[0])
    q_back = float(st.q_back[0])
    assert q_front > -3e-2
    assert q_back < 3e-2
    assert abs(q_front + q_back) < 0.08

    # Quantitative check: q = dT / R_total
    r = 2 * 0.003 / 0.0252 + 0.1 + 0.1
    assert abs(q_front - 20.0 / r) < 0.1


def test_mixed_wall_marches():
    """A mixed massive/no-mass construction marches without blowing up and
    reaches equilibrium at uniform boundary temperature."""
    m = BuildingModel()
    m.add_substance(Substance("poly", **POLY))
    m.add_substance(Substance("conc", **BRICK))
    m.add_material(Material("p", "poly", 0.02))
    m.add_material(Material("c", "conc", 0.2))
    m.add_construction(Construction("mix", ["p", "c", "p"]))
    m.add_surface(
        SurfaceDef(
            "wall", "mix", Boundary.outdoor(), Boundary.outdoor(),
            area=4.0, perimeter=8.0, normal=(0.0, 0.0, 1.0), height=10.0,
        )
    )
    cfg = heatx.SimConfig(dtype=np.float64)
    tm = ThermalModel(m, n=4, config=cfg)
    tm.building.set_fixed_h(10.0, 10.0)
    sb = tm.building.surfaces
    assert sb.has_massive and sb.has_nomass

    st = tm.initial_state(dtype=np.float64)
    ir = SIGMA * (10.0 + 273.15) ** 4
    inp = tm.inputs(
        dtype=np.float64, t_out=10.0, ir_front=np.array([ir]), ir_back=np.array([ir])
    )
    # The insulated concrete core has a time constant of tens of hours; march
    # until the flux through both faces vanishes.
    q = 1e9
    for _ in range(5000):
        st = tm.march(st, inp)
        q = max(abs(float(st.q_front[0])), abs(float(st.q_back[0])))
        if q < 1e-4:
            break
    assert q < 1e-4
    temps = np.asarray(st.node_T[:, 0])[np.asarray(sb.node_mask[:, 0])]
    np.testing.assert_allclose(temps, 10.0, atol=0.01)
