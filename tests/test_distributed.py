"""Two-process DCN scale-out test (heatx.parallel.distributed).

Spawns two CPU processes (2 local devices each), initializes
``jax.distributed`` over a local coordinator (Gloo — the CPU stand-in for
DCN), builds a 4-device global mesh spanning both processes, and runs the
sharded reference-parity march.  Zone temperatures must match the
single-process run bit-for-bit (sharding only moves work; the zone
reduction all-reduces over the process boundary).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_CHILD = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
jax.config.update("jax_enable_x64", True)

from heatx.parallel import distributed
distributed.initialize()  # HEATX_COORDINATOR / _NUM_PROCESSES / _PROCESS_ID

import numpy as np
import heatx
from heatx.build.layout import compile_building
from heatx.engine import state as state_mod
from heatx.parallel import sharding as sh

sys.path.insert(0, os.getcwd())  # cwd = the tests directory
from test_sharding import multi_surface_model

assert jax.process_count() == 2
assert distributed.is_multi_process()
mesh = distributed.global_mesh()
assert len(jax.devices()) == 4

model = multi_surface_model(8)
building = compile_building(model, n=4, config=heatx.SimConfig(dtype=np.float64))

# All XLA production integrators over the 2-process mesh: the reference-
# parity march and the TR-BDF2 fast modes, frozen-h and per-sub-step
# refresh (SURVEY.md section 2.2 ICI+DCN).
for mode in ("parity", "trbdf2", "trbdf2_refresh"):
    march = sh.make_sharded_march(building, mesh, mode=mode, substeps=6)
    st = sh.shard_state(state_mod.initial_state(building), mesh)
    inp = sh.shard_inputs(state_mod.default_inputs(building, t_out=-2.0, wind_speed=3.0), mesh)
    for _ in range(3):
        st = march(st, inp)
    zone = np.asarray(jax.device_get(st.zone_T))
    print("ZONE_T", mode, repr(zone.tolist()), flush=True)

# The sharded Pallas day kernel (interpret mode on CPU), one block per
# device across both processes.  The zone history output is block-sharded;
# each process prints its addressable shards with their global indices.
run = sh.make_sharded_fast_run(4, mesh, hours=2)
hist = run()
for s in hist.addressable_shards:
    blk = s.index[1]
    print("KERNEL_SHARD", blk.start, blk.stop,
          repr(np.asarray(s.data).tolist()), flush=True)

# The HIGH-LEVEL mesh runner (FastRunner(mesh=...)) end to end across both
# processes: whole-sequence run with a mid-sequence seasonal-ground swap
# and the in-graph finiteness check on.  The zone history gathers to a
# replicated array — identical on every process.  The model is the SHARED
# builder also used by the in-test single-device reference.
from heatx.api import FastRunner, ThermalModel
from test_sharding import fast_runner_comparison_model

tm = ThermalModel(fast_runner_comparison_model(), n=1,
                  config=heatx.SimConfig(dtype=np.float64))
fr = FastRunner(tm, block_size=4, mode="trbdf2", substeps=4, hours=2,
                mesh=mesh, interpret=True)
T = 4
fr_seq = tm.inputs_sequence(T, t_out=np.linspace(0., 6., T),
                            wind_speed=np.full(T, 3.0))
ground = np.array([10., 10., 13., 13.])
final, zt = fr.run(tm.initial_state(), fr_seq, ground_hourly=ground)
print("FR_ZT", repr(np.asarray(jax.device_get(zt)).tolist()), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dcn_march(tmp_path):
    script = tmp_path / "child.py"
    script.write_text(_CHILD)
    port = _free_port()
    env_base = dict(
        os.environ,
        HEATX_COORDINATOR=f"localhost:{port}",
        HEATX_NUM_PROCESSES="2",
        PYTHONPATH=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    procs = []
    for pid in range(2):
        env = dict(env_base, HEATX_PROCESS_ID=str(pid))
        procs.append(
            subprocess.Popen(
                [sys.executable, str(script)],
                env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)),
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=480)
        outs.append(out)
        assert p.returncode == 0, out[-3000:]

    zones = {}  # mode -> [per-process zone arrays]
    fr_zts = []  # per-process high-level runner histories
    shards = {}  # global block start -> shard data (merged across processes)
    for out in outs:
        for ln in out.splitlines():
            if ln.startswith("ZONE_T"):
                _, mode, rest = ln.split(" ", 2)
                zones.setdefault(mode, []).append(np.asarray(eval(rest)))
            elif ln.startswith("FR_ZT"):
                fr_zts.append(np.asarray(eval(ln.split(" ", 1)[1])))
            elif ln.startswith("KERNEL_SHARD"):
                _, start, stop, rest = ln.split(" ", 3)
                data = np.asarray(eval(rest))
                prev = shards.get(int(start))
                if prev is not None:
                    assert np.array_equal(prev, data)
                shards[int(start)] = data

    # Both processes observe the same global result per mode...
    for mode, zs in zones.items():
        assert len(zs) == 2 and np.array_equal(zs[0], zs[1]), mode

    # ...and each matches the corresponding single-process run bit-for-bit.
    import jax

    import heatx
    from heatx.build.layout import compile_building
    from heatx.engine import state as state_mod, step as step_mod
    from heatx.engine.implicit import imp_march
    from heatx.parallel import sharding as sh
    from test_sharding import multi_surface_model

    model = multi_surface_model(8)
    building = compile_building(
        model, n=4, config=heatx.SimConfig(dtype=np.float64)
    ).astype(np.float64)
    for mode, march_fn in (
        ("parity", step_mod.march),
        ("trbdf2", lambda b, s, i: imp_march(b, s, i, substeps=6)),
        ("trbdf2_refresh",
         lambda b, s, i: imp_march(b, s, i, substeps=6, refresh_h=True)),
    ):
        st = state_mod.initial_state(building)
        inp = state_mod.default_inputs(building, t_out=-2.0, wind_speed=3.0)
        march = jax.jit(march_fn)
        for _ in range(3):
            st = march(building, st, inp)
        assert np.array_equal(np.asarray(st.zone_T), zones[mode][0]), mode

    # The sharded Pallas kernel: merged 2-process shards == the same kernel
    # over a single-process 4-device mesh.
    mesh1 = sh.make_mesh(jax.devices()[:4])
    hist1 = np.asarray(sh.make_sharded_fast_run(4, mesh1, hours=2)())
    assert sorted(shards) == [0, 1, 2, 3], sorted(shards)
    merged = np.concatenate([shards[k] for k in sorted(shards)], axis=1)
    assert np.array_equal(merged, hist1), (merged, hist1)

    # The high-level mesh runner across processes: both processes observe
    # the same history, equal to the single-device FastRunner on the same
    # model (ground swap + finiteness check included in both; one shared
    # model builder, test_sharding.fast_runner_comparison_model).
    from heatx.api import FastRunner, ThermalModel
    from test_sharding import fast_runner_comparison_model

    tm = ThermalModel(fast_runner_comparison_model(), n=1,
                      config=heatx.SimConfig(dtype=np.float64))
    fr = FastRunner(tm, block_size=4, mode="trbdf2", substeps=4, hours=2,
                    interpret=True)
    T = 4
    fr_seq = tm.inputs_sequence(T, t_out=np.linspace(0., 6., T),
                                wind_speed=np.full(T, 3.0))
    _, zt1 = fr.run(tm.initial_state(), fr_seq,
                    ground_hourly=np.array([10., 10., 13., 13.]))
    assert len(fr_zts) == 2
    assert np.array_equal(fr_zts[0], fr_zts[1])
    assert np.array_equal(fr_zts[0], np.asarray(zt1))
