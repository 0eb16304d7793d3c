"""Checkpoint/resume and observability utilities."""

import numpy as np

import heatx
from heatx.io.checkpoint import load_state, save_state
from heatx.utils import assert_state_finite, check_state_finite, time_steps
from heatx.testing import SingleZoneOptions, TestMat, single_zone_building


def _small_model():
    opts = SingleZoneOptions(construction=[TestMat.polyurethane(0.02)], emissivity=0.0)
    tm = heatx.ThermalModel(
        single_zone_building(opts), n=20, config=heatx.SimConfig(dtype=np.float64)
    )
    tm.building.set_fixed_h(10.0, 10.0)
    return tm


def test_checkpoint_roundtrip_resume(tmp_path):
    tm = _small_model()
    inp = tm.inputs(t_out=30.0)
    st = tm.initial_state()
    for _ in range(5):
        st = tm.march(st, inp)

    path = str(tmp_path / "ckpt.npz")
    save_state(path, st, step=5)
    restored, step = load_state(path)
    assert step == 5
    for a, b in zip(st, restored):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resuming from the checkpoint continues identically
    cont_direct = tm.march(st, inp)
    cont_restored = tm.march(restored, inp)
    np.testing.assert_array_equal(
        np.asarray(cont_direct.zone_T), np.asarray(cont_restored.zone_T)
    )


def test_finite_guards():
    tm = _small_model()
    st = tm.initial_state()
    assert check_state_finite(st) == {}
    bad = st._replace(zone_T=st.zone_T.at[0].set(np.nan))
    assert check_state_finite(bad) == {"zone_T": 1}
    try:
        assert_state_finite(bad, context="unit test")
        assert False, "should have raised"
    except FloatingPointError as e:
        assert "zone_T" in str(e)


def test_time_steps_helper():
    tm = _small_model()
    inp = tm.inputs(t_out=30.0)
    st = tm.initial_state()
    st, per = time_steps(lambda s: tm.march(s, inp), st, 3)
    assert per > 0
    assert np.isfinite(float(st.zone_T[0]))


def test_load_rejects_truncated_checkpoint(tmp_path):
    """A checkpoint missing a REQUIRED channel must fail loudly, not load
    as SimState(field=None) and blow up later as a scan-carry structure
    mismatch.  Only genuinely optional channels (ideal_load) may be absent."""
    import numpy as np

    from heatx.io.checkpoint import load_state, save_state

    tm = _small_model()
    st = tm.initial_state()
    p = str(tmp_path / "ck.npz")
    save_state(p, st, step=3)

    with np.load(p) as d:
        trimmed = {k: d[k] for k in d.files if k != "q_back"}
    p2 = str(tmp_path / "bad.npz")
    np.savez(p2, **trimmed)
    try:
        load_state(p2)
        assert False, "should have raised"
    except KeyError as e:
        assert "q_back" in str(e)

    # ideal_load stays optional: a checkpoint without it loads fine.
    st2, step = load_state(p)
    assert step == 3
    np.testing.assert_array_equal(np.asarray(st2.zone_T), np.asarray(st.zone_T))
