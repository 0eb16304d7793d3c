"""EnergyPlus-style warm-up (ThermalModel.warmup / CLI --warmup-days).

The replay analysis proved the 22 C initialization transient is the
dominant replay error for massive/insulated envelopes
(tests/test_eplus_replay.py: a converged initial state collapses the
mixed-case bias); EnergyPlus cures it by repeating the first day until
convergence (max 25).  The reference has no warm-up mechanism.
"""

import numpy as np

import heatx
from heatx.testing import SingleZoneOptions, TestMat, single_zone_building

F64 = heatx.SimConfig(dtype=np.float64)


def _slab_model():
    return single_zone_building(SingleZoneOptions(
        zone_volume=600.0, surface_width=20.0, surface_height=3.0,
        construction=[TestMat.concrete(0.2)],
        emissivity=0.9, solar_absorbtance=0.7,
    ))


def test_warmup_converges_and_changes_the_start():
    tm = heatx.ThermalModel(_slab_model(), n=1, config=F64)
    day = tm.inputs_sequence(
        24,
        t_out=np.full(24, -5.0),
        wind_speed=3.0,
        ir_front=heatx.constants.SIGMA * (273.15 - 5.0) ** 4,
    )
    st0 = tm.initial_state()
    warm, reps = tm.warmup(st0, day, max_repeats=25, tol=0.01)
    # The 0.2 m concrete slab converges well inside the cap but not in one
    # day (its transient outlives 24 h from a 27 K offset).
    assert 2 <= reps < 25
    # Warm state is a fixed point of the repeated day within tol.
    again, reps2 = tm.warmup(warm, day, max_repeats=25, tol=0.01)
    assert reps2 <= 2
    # Cold vs warm: the first reported day differs materially.
    _, zt_cold = tm.run(st0, day)
    _, zt_warm = tm.run(warm, day)
    assert abs(float(zt_cold[0, 0]) - float(zt_warm[0, 0])) > 3.0
    # And the warm first day is near-periodic (end ~ start), the cold not.
    drift_warm = abs(float(zt_warm[-1, 0]) - float(zt_warm[0, 0]))
    drift_cold = abs(float(zt_cold[-1, 0]) - float(zt_cold[0, 0]))
    assert drift_warm < drift_cold


def test_warmup_through_fast_runner_closure():
    """The run= hook lets any integrator warm up; the fused kernel
    (interpret mode on CPU) converges to the same fixed point as the XLA
    parity march within the fast mode's coefficient-freeze drift."""
    tm = heatx.ThermalModel(
        _slab_model(), n=1,
        config=heatx.SimConfig(dtype=np.float64, nomass_fixed_iters=1),
    )
    day = tm.inputs_sequence(
        24, t_out=np.full(24, -5.0), wind_speed=3.0,
        ir_front=heatx.constants.SIGMA * (273.15 - 5.0) ** 4,
    )
    fr = tm.fast_runner(block_size=4, mode="trbdf2", substeps=4, hours=24)
    warm_k, reps_k = tm.warmup(
        tm.initial_state(), day, max_repeats=25,
        run=lambda s: fr.run(s, day, collect_zone_T=False)[0],
    )
    warm_x, _ = tm.warmup(tm.initial_state(), day, max_repeats=25)
    assert reps_k < 25
    np.testing.assert_allclose(
        float(warm_k.zone_T[0]), float(warm_x.zone_T[0]), atol=0.7
    )
