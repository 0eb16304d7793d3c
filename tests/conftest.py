"""Test configuration: run on a virtual 8-device CPU mesh with float64.

The reference is f64 Rust on CPU; numerical parity tests therefore run with
x64 enabled on the CPU backend.  Multi-chip sharding tests use the 8 virtual
host devices forced below.  TPU benchmarking happens separately (bench.py).
"""

import os

# Force CPU: the ambient environment points JAX at a remote TPU (an `axon`
# PJRT plugin registered by sitecustomize, which sets jax_platforms itself,
# overriding the JAX_PLATFORMS env var) — that chip is reserved for bench.py.
# Parity tests run locally on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

# XLA compiles slowly on this class of host; a persistent cache makes test
# re-runs near-instant.
_cache_dir = os.environ.get("HEATX_JAX_CACHE", "/tmp/heatx-jax-cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REF_ROOT = os.environ.get("HEAT_REF_FIXTURES", "/root/reference/tests")


@pytest.fixture
def ref_fixtures():
    """Path to the reference's EnergyPlus fixture directory, if present."""
    if not os.path.isdir(REF_ROOT):
        pytest.skip(f"reference fixtures not available at {REF_ROOT}")
    return REF_ROOT


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running validation test")
