"""The driver-facing entry points must be hermetic.

Round-1 regression: ``dryrun_multichip`` built the flagship model with eager
jnp ops *before* pinning the platform, so they dispatched to the ambient
default backend (this machine's sitecustomize force-registers a remote TPU
plugin) and any TPU-side breakage failed a test that needs only virtual CPU
devices (MULTICHIP_r01.json: ok=false).  The contract checked here: running
``dryrun_multichip`` in a fresh process with NO env hints must initialize the
CPU backend and nothing else.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = """
import sys

sys.path.insert(0, {repo!r})
import __graft_entry__ as g

g.dryrun_multichip(8)

# The real assertion: the set of *initialized* backends (not just visible
# devices) contains only cpu.  If the ambient TPU plugin had been touched,
# it would appear here.
from jax._src import xla_bridge

inited = set(xla_bridge._backends)
assert inited <= {{"cpu"}}, f"non-CPU backends initialized: {{inited}}"
print("HERMETIC_OK")
"""


def test_dryrun_multichip_is_hermetic():
    env = dict(os.environ)
    # Simulate the driver environment faithfully: no JAX_PLATFORMS hint (the
    # sitecustomize overrides it anyway), virtual CPU devices via XLA_FLAGS.
    env.pop("JAX_PLATFORMS", None)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/heatx-jax-cache")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO)],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
    )
    assert proc.returncode == 0, f"stdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    assert "HERMETIC_OK" in proc.stdout
