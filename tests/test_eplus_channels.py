"""Channel-level EnergyPlus replay: localize WHERE disagreement enters.

The fixtures log, besides zone temperature, the outside/inside face
temperatures and both convection coefficients.  Replaying and comparing each
channel pins zone-temperature error to the physics term it enters through.
For the worst zone-T case (mixed_no_ir_yes_solar, -0.13 K bias) this proves
the wall/convection physics match EnergyPlus — outside face unbiased to
0.05 K, h within ~1% — and the bias arises only in the near-zero-flux inside
film equilibrium (see tests/test_eplus_replay.py docstring).
"""

import numpy as np
import pytest

import heatx
from heatx.io.eplus import read_eplusout
from heatx.validate.replay import WALL_CASES, build_case_model, replay_wall_channels


@pytest.mark.slow
@pytest.mark.parametrize(
    "name", ["mixed_no_ir_yes_solar", "massive_no_ir_yes_solar", "mixed_full"]
)
def test_channel_agreement(name, ref_fixtures):
    case = WALL_CASES[name]
    model = build_case_model(case, ref_fixtures)
    tm = heatx.ThermalModel(model, n=20, config=heatx.SimConfig(dtype=np.float64))
    tm.building.surfaces.eps_back[:] = 0.0
    run = read_eplusout(f"{ref_fixtures}/{name}/eplusout.csv")
    ch = replay_wall_channels(tm, run, case.emissivity, case.surface_area)

    def bias(k):
        ours, theirs = ch[k]
        return float((ours - theirs).mean())

    # The wall + exterior-convection physics must track EnergyPlus with no
    # systematic shift; the inside face may carry the documented small bias.
    assert abs(bias("outside_face_T")) < 0.05, bias("outside_face_T")
    assert abs(bias("h_outside")) < 0.15, bias("h_outside")
    assert abs(bias("h_inside")) < 0.08, bias("h_inside")
    assert abs(bias("inside_face_T")) < 0.2, bias("inside_face_T")
    assert abs(bias("zone_T")) < 0.2, bias("zone_T")
