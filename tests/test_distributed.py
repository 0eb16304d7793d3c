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
march = sh.make_sharded_march(building, mesh, mode="parity")
st = sh.shard_state(state_mod.initial_state(building), mesh)
inp = sh.shard_inputs(state_mod.default_inputs(building, t_out=-2.0, wind_speed=3.0), mesh)
for _ in range(3):
    st = march(st, inp)
zone = np.asarray(jax.device_get(st.zone_T))
print("ZONE_T", repr(zone.tolist()), flush=True)
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

    zones = []
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("ZONE_T")][0]
        zones.append(np.asarray(eval(line.split(" ", 1)[1])))

    # Both processes observe the same global result...
    assert np.array_equal(zones[0], zones[1])

    # ...and it matches the single-process march bit-for-bit.
    import jax

    import heatx
    from heatx.build.layout import compile_building
    from heatx.engine import state as state_mod, step as step_mod
    from test_sharding import multi_surface_model

    model = multi_surface_model(8)
    building = compile_building(
        model, n=4, config=heatx.SimConfig(dtype=np.float64)
    ).astype(np.float64)
    st = state_mod.initial_state(building)
    inp = state_mod.default_inputs(building, t_out=-2.0, wind_speed=3.0)
    march = jax.jit(step_mod.march)
    for _ in range(3):
        st = march(building, st, inp)
    assert np.array_equal(np.asarray(st.zone_T), zones[0])
