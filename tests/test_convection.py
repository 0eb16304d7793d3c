"""TARP convection correlation tests (convection.rs:54-168)."""

import numpy as np

from heatx.constants import MIN_H
from heatx.physics import convection as conv


def test_natural_floor():
    # |dT| ~ 0 -> h floored at MIN_H (convection.rs:105-109)
    h = float(conv.tarp_natural_convection_coefficient(20.0, 20.0, 0.5))
    assert abs(h - MIN_H) < 1e-12


def test_natural_cases():
    # aux == 0 (vertical wall): h = 1.31 |dT|^(1/3)
    h = float(conv.tarp_natural_convection_coefficient(25.0, 20.0, 0.0))
    assert abs(h - 1.31 * 5.0 ** (1 / 3)) < 1e-12

    # same sign (dT>0, cos>0): enhanced
    h = float(conv.tarp_natural_convection_coefficient(25.0, 20.0, 1.0))
    assert abs(h - 9.482 * 5.0 ** (1 / 3) / (7.238 - 1.0)) < 1e-12

    # opposite sign (dT>0, cos<0): stable
    h = float(conv.tarp_natural_convection_coefficient(25.0, 20.0, -1.0))
    assert abs(h - 1.81 * 5.0 ** (1 / 3) / (1.382 + 1.0)) < 1e-12


def test_forced_plus_natural():
    area, perimeter, speed = 6.0, 10.0, 3.0
    h = float(
        conv.tarp_convection_coefficient(
            25.0, 20.0, 0.0, speed, area, perimeter, windward=True, roughness_index=1
        )
    )
    forced = 2.537 * 1.0 * 1.67 * np.sqrt(perimeter * speed / area)
    natural = 1.31 * 5.0 ** (1 / 3)
    assert abs(h - (forced + natural)) < 1e-12

    h_lee = float(
        conv.tarp_convection_coefficient(
            25.0, 20.0, 0.0, speed, area, perimeter, windward=False, roughness_index=1
        )
    )
    assert abs(h_lee - (0.5 * forced + natural)) < 1e-12


def test_is_windward():
    # Vertical wall facing south (normal (0,-1,0)); wind from the north
    # (direction 0 rad = blowing from north... direction vector (sin, cos, 0))
    assert not bool(conv.is_windward(0.0, 0.0, 0.0, -1.0))
    assert bool(conv.is_windward(np.pi, 0.0, 0.0, -1.0))
    # horizontal: always windward
    assert bool(conv.is_windward(0.0, 1.0, 0.0, 0.0))


def test_vectorized():
    air = np.array([25.0, 15.0, 20.0])
    surf = np.array([20.0, 20.0, 20.0])
    cos = np.array([1.0, -1.0, 0.0])
    h = np.asarray(conv.tarp_natural_convection_coefficient(air, surf, cos))
    exp = [
        float(conv.tarp_natural_convection_coefficient(a, s, c))
        for a, s, c in zip(air, surf, cos)
    ]
    np.testing.assert_allclose(h, exp, rtol=1e-14)
