"""ThermalModel.run(mode=...): whole-sequence XLA scans for the fast
integrators (the host-loop-free analogue of march_imp/march_exp; the
parity default continues to use engine.step.march).
"""

import numpy as np
import pytest

import heatx
from heatx.model.building import IdealHeaterCooler
from heatx.testing import SingleZoneOptions, TestMat, single_zone_building

F64 = heatx.SimConfig(dtype=np.float64)


def _tm():
    m = single_zone_building(SingleZoneOptions(
        zone_volume=300.0, surface_width=10.0, surface_height=3.0,
        construction=[TestMat.concrete(0.2)],
    ))
    m.add_hvac(IdealHeaterCooler(
        "t", ["Space"], heat_setpoint=20.0, cool_setpoint=26.0
    ))
    return heatx.ThermalModel(m, n=1, config=F64)


def _seq(tm, T):
    rng = np.random.default_rng(0)
    return tm.inputs_sequence(
        T,
        t_out=5.0 + 10.0 * np.sin(np.arange(T) / 24.0 * 2 * np.pi),
        wind_speed=np.full(T, 3.0),
        sol_front=np.abs(rng.normal(100.0, 50.0, T)),
    )


def _slice(seq, t, T):
    return seq._replace(**{
        k: getattr(seq, k)[t] for k in seq._fields
        if getattr(seq, k) is not None
        and np.ndim(getattr(seq, k)) > 0
        and np.shape(getattr(seq, k))[0] == T
    })


@pytest.mark.parametrize(
    "mode,substeps",
    [("trbdf2", None), ("trbdf2_refresh", None), ("exp", None),
     ("trbdf2", 4)],
)
def test_fast_mode_scan_matches_host_loop(mode, substeps):
    tm = _tm()
    T = 48
    seq = _seq(tm, T)
    st = tm.initial_state()
    fin, (zt, loads) = tm.run(
        st, seq, collect_loads=True, mode=mode, substeps=substeps
    )
    s = st
    sub = substeps or 8
    zs, ls = [], []
    for t in range(T):
        one = _slice(seq, t, T)
        if mode == "exp":
            s = tm.march_exp(s, one, substeps=sub)
        else:
            s = tm.march_imp(
                s, one, substeps=sub,
                refresh_h=(mode == "trbdf2_refresh"),
            )
        zs.append(np.asarray(s.zone_T))
        ls.append(np.asarray(s.ideal_load))
    np.testing.assert_array_equal(np.asarray(zt), np.stack(zs))
    np.testing.assert_array_equal(np.asarray(loads), np.stack(ls))
    np.testing.assert_array_equal(np.asarray(fin.zone_T), zs[-1])


def test_run_mode_validation():
    tm = _tm()
    seq = _seq(tm, 4)
    st = tm.initial_state()
    with pytest.raises(ValueError, match="stability-dictated"):
        tm.run(st, seq, mode="parity", substeps=4)
    with pytest.raises(ValueError, match="unknown mode"):
        tm.run(st, seq, mode="bogus")


def test_fast_scan_operative_history():
    """collect_operative composes with the fast-mode scan."""
    tm = _tm()
    T = 6
    seq = _seq(tm, T)
    _, (zt, t_op) = tm.run(
        tm.initial_state(), seq, collect_operative=True, mode="trbdf2"
    )
    assert np.asarray(t_op).shape == np.asarray(zt).shape
    assert np.isfinite(np.asarray(t_op)).all()
