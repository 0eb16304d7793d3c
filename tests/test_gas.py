"""Gas property and Nusselt-number tests.

Mirrors the reference unit suite gas.rs:321-512: property polynomials vs
tabulated values (1% rel), Nusselt numbers vs LBNL Windows-CalcEngine unit
test values (1e-5 abs).
"""

import math

import numpy as np
import pytest

from heatx.physics import gas


def check_rel(expected, found, tol=1e-2):
    assert abs(expected - found) / abs(expected) <= tol, (expected, found)


def test_thermal_conductivity():
    cases = [
        (gas.AIR, 0.0, 0.0241),
        (gas.AIR, 10.0, 0.0248),
        (gas.ARGON, 0.0, 0.0163),
        (gas.ARGON, 10.0, 0.0169),
        (gas.KRYPTON, 0.0, 0.0087),
        (gas.KRYPTON, 10.0, 0.0089),
        (gas.XENON, 0.0, 0.0052),
        (gas.XENON, 10.0, 0.0053),
    ]
    for g, t_c, exp in cases:
        check_rel(exp, float(gas.thermal_conductivity(g, t_c + 273.15)))


def test_dynamic_viscosity():
    cases = [
        (gas.AIR, 0.0, 1.722e-5),
        (gas.AIR, 10.0, 1.771e-5),
        (gas.ARGON, 0.0, 2.1e-5),
        (gas.ARGON, 10.0, 2.165e-5),
        (gas.KRYPTON, 0.0, 2.346e-5),
        (gas.KRYPTON, 10.0, 2.423e-5),
        (gas.XENON, 0.0, 2.132e-5),
        (gas.XENON, 10.0, 2.206e-5),
    ]
    for g, t_c, exp in cases:
        check_rel(exp, float(gas.dynamic_viscosity(g, t_c + 273.15)))


def test_heat_capacity():
    cases = [
        (gas.AIR, 0.0, 1006.1034),
        (gas.AIR, 10.0, 1006.2265),
        (gas.ARGON, 0.0, 521.9285),
        (gas.KRYPTON, 0.0, 248.0907),
        (gas.XENON, 0.0, 158.3397),
    ]
    for g, t_c, exp in cases:
        check_rel(exp, float(gas.heat_capacity(g, t_c + 273.15)))


def test_density():
    rho = float(gas.density(gas.AIR, 293.15))
    assert abs(1.2041 - rho) < 1e-3


# LBNL Windows-CalcEngine NusseltNumber.unit.cpp values (gas.rs:407-511)
NUSSELT_CASES = [
    # (ra, a_gi, gamma_deg, expected)
    (3638.21667064528, 83.3333333333333, 30.0, 1.40474349200254),
    (3638.21667064528, 83.3333333333333, 60.0, 1.08005742342789),
    (3638.21667064528, 83.3333333333333, 73.0, 1.05703042079892),
    (3638.21667064528, 83.3333333333333, 90.0, 1.02691818659179),
    (3638.21667064528, 83.3333333333333, 134.0, 1.01936332296842),
    (140.779077041012, 200.0, 30.0, 1.0),
    (140.779077041012, 200.0, 60.0, 1.00002777439094),
    (140.779077041012, 200.0, 73.0, 1.00002235511865),
    (140.779077041012, 200.0, 90.0, 1.00001526837795),
    (140.779077041012, 200.0, 134.0, 1.00001098315195),
    (4633340.8866717, 10.0, 30.0, 10.2680981545288),
    (4633340.8866717, 10.0, 60.0, 11.5975502261096),
    (4633340.8866717, 10.0, 73.0, 11.4398529673101),
    (4633340.8866717, 10.0, 90.0, 11.2336334750340),
    (4633340.8866717, 10.0, 134.0, 8.361460),
]


@pytest.mark.parametrize("ra,a_gi,gamma_deg,expected", NUSSELT_CASES)
def test_nusselt_scalar(ra, a_gi, gamma_deg, expected):
    nu = float(gas.nusselt(ra, math.radians(gamma_deg), a_gi))
    assert abs(nu - expected) < 1e-5, (nu, expected)


def test_nusselt_vectorized_matches_scalar():
    ras = np.array([c[0] for c in NUSSELT_CASES])
    a_gis = np.array([c[1] for c in NUSSELT_CASES])
    gammas = np.radians([c[2] for c in NUSSELT_CASES])
    exp = np.array([c[3] for c in NUSSELT_CASES])
    nus = np.asarray(gas.nusselt(ras, gammas, a_gis))
    np.testing.assert_allclose(nus, exp, atol=1e-5)


def test_rayleigh_isothermal_guard():
    assert float(gas.rayleigh(gas.AIR, 20.0, 20.0, 0.01)) == 1e-7
