"""Closed-form analytical zone validation.

Mirrors the reference's `theoretical()` suite
(tests/validate_wall_heat_transfer.rs:36-86, 193-613): a single-zone no-mass
building whose heat balance C dT/dt = A - B T has the exact solution
T(t) = A/B + (T0 - A/B) e^(-Bt/C).  Convection coefficients are pinned to 10
so the facade resistance is exact.  Five variants: walls only, +window,
+luminaire, +heater, +heater+infiltration.
"""

import numpy as np
import pytest

import heatx
from heatx.physics import gas
from heatx.testing import SingleZoneOptions, TestMat, single_zone_building


def closed_solution(
    zone_volume,
    surface_area,
    facade_r,
    temp_out,
    temp_start,
    heating_power=0.0,
    lighting_power=0.0,
    infiltration_rate=0.0,
):
    """SingleZoneTestModel::get_closed_solution (validate_wall_heat_transfer.rs:62-86)."""
    rho = float(gas.density(gas.AIR, 22.0 + 273.15))
    cp = float(gas.heat_capacity(gas.AIR, 22.0 + 273.15))
    u = 1.0 / facade_r
    c = zone_volume * rho * cp
    a = (
        heating_power
        + lighting_power
        + temp_out * u * surface_area
        + infiltration_rate * rho * cp * temp_out
    )
    b = u * surface_area + rho * infiltration_rate * cp
    k1 = temp_start - a / b

    def f(t):
        return a / b + k1 * np.exp(-b * t / c)

    return f


def march_case(
    n,
    steps,
    heating_power=0.0,
    lighting_power=0.0,
    infiltration_rate=0.0,
    window=False,
):
    opts = SingleZoneOptions(
        zone_volume=40.0,
        surface_height=2.0,
        surface_width=2.0,
        window_height=1.0 if window else 0.0,
        window_width=1.0 if window else 0.0,
        construction=[TestMat.polyurethane(0.02)],
        emissivity=0.0,
        heating_power=heating_power,
        lighting_power=lighting_power,
        infiltration_rate=infiltration_rate,
    )
    model = single_zone_building(opts)
    tm = heatx.ThermalModel(model, n=n, config=heatx.SimConfig(dtype=np.float64))
    tm.building.set_fixed_h(10.0, 10.0)

    r = tm.building.discretizations[0].r_value() + 1.0 / 10.0 + 1.0 / 10.0
    t_out = 30.0
    t_start = 22.0

    exact = closed_solution(
        zone_volume=40.0,
        surface_area=2.0 * 2.0,  # window is a hole: total area unchanged
        facade_r=r,
        temp_out=t_out,
        temp_start=t_start,
        heating_power=heating_power,
        lighting_power=lighting_power,
        infiltration_rate=infiltration_rate,
    )

    state = tm.initial_state()
    Z = tm.building.n_zones
    overrides = dict(t_out=t_out)
    if heating_power:
        overrides["hvac_power"] = np.array([heating_power])
    if lighting_power:
        overrides["lum_power"] = np.array([lighting_power])
    if infiltration_rate:
        overrides["inf_vol"] = np.full(Z, infiltration_rate)
        overrides["inf_temp"] = np.full(Z, t_out)
        overrides["inf_mask"] = np.ones(Z, dtype=bool)
    inputs = tm.inputs(**overrides)

    main_dt = 3600.0 / n
    found, expected = [], []
    for i in range(steps):
        t = i * main_dt
        found.append(float(state.zone_T[0]))
        expected.append(exact(t))
        state = tm.march(state, inputs)
    return np.array(expected), np.array(found)


def check_series(expected, found, rmse_frac=0.01, bias_frac=0.005):
    """SeriesValidator-style check: RMSE and mean bias relative to the range
    of the expected series (the validate crate's default-threshold spirit)."""
    err = found - expected
    rng = float(np.max(expected) - np.min(expected))
    rng = max(rng, 1.0)
    rmse = float(np.sqrt(np.mean(err**2)))
    bias = float(np.mean(err))
    assert rmse < rmse_frac * rng, f"RMSE {rmse} (tol {rmse_frac * rng}, range {rng})"
    assert abs(bias) < bias_frac * rng, f"bias {bias} (tol {bias_frac * rng})"


def test_nomass_wall_only():
    expected, found = march_case(n=60, steps=1000)
    check_series(expected, found)


def test_nomass_wall_and_window():
    expected, found = march_case(n=6, steps=80, window=True)
    check_series(expected, found, rmse_frac=0.03, bias_frac=0.03)


def test_window_and_luminaire():
    expected, found = march_case(n=20, steps=800, lighting_power=100.0)
    check_series(expected, found)


def test_wall_window_heater():
    expected, found = march_case(n=20, steps=800, heating_power=100.0)
    check_series(expected, found)


def test_window_heater_infiltration():
    expected, found = march_case(
        n=20, steps=22, heating_power=10.0, infiltration_rate=0.1
    )
    check_series(expected, found, rmse_frac=0.02, bias_frac=0.02)
