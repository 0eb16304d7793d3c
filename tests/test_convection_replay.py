"""Convection-coefficient validation against EnergyPlus TARP logs.

Mirrors tests/validate_convection.rs: recompute h from EnergyPlus's logged
surface/air temperatures and compare with its logged coefficients, for
vertical / tilted / horizontal walls.  All 10080 steps evaluate as one
vectorized call.
"""

import numpy as np
import pytest

from heatx.io.eplus import read_eplusout
from heatx.physics import convection as conv

AREA = 20.0 * 3.0
PERIMETER = (20.0 + 3.0) * 2.0

CASES = [
    ("massive_full", np.array([0.0, -1.0, 0.0])),  # vertical, south
    ("tilted", np.array([0.0, -1.0, 1.0]) / np.sqrt(2.0)),  # south, 45 deg
    ("horizontal", np.array([0.0, 0.0, 1.0])),  # up
]


@pytest.mark.parametrize("dirname,normal", CASES, ids=[c[0] for c in CASES])
def test_tarp_vs_energyplus(dirname, normal, ref_fixtures):
    run = read_eplusout(f"{ref_fixtures}/{dirname}/eplusout.csv")
    cos_tilt = normal[2]

    # Interior: natural convection with zone air vs inside face
    found_in = np.asarray(
        conv.tarp_natural_convection_coefficient(
            run.zone_air_temp, run.inside_surface_temp, cos_tilt
        )
    )
    # Exterior: forced + natural with the logged *surface* wind speed and the
    # flipped tilt cosine (surface.rs:652, validate_convection.rs:69-76)
    windward = np.asarray(
        conv.is_windward(
            np.radians(run.site_wind_direction), cos_tilt, normal[0], normal[1]
        )
    )
    found_out = np.asarray(
        conv.tarp_convection_coefficient(
            run.outdoor_temp,
            run.outside_surface_temp,
            -cos_tilt,
            run.surface_wind_speed,
            AREA,
            PERIMETER,
            windward,
            roughness_index=1,
        )
    )

    for found, exp, label, tol in [
        (found_in, run.hs_inside, "natural", 0.05),
        (found_out, run.hs_outside, "forced", 0.10),
    ]:
        err = found - exp
        rng = float(exp.max() - exp.min())
        rmse = float(np.sqrt(np.mean(err**2)))
        assert rmse < tol * rng, f"{dirname}/{label}: rmse {rmse} range {rng}"
