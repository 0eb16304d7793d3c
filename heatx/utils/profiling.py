"""Profiling helpers.

The reference has no tracing/profiling subsystem (SURVEY.md section 5); the
TPU-native equivalent is the XLA profiler plus honest step timing.  NOTE: on
remote-TPU runtimes ``block_until_ready`` may not be a true barrier — the
timing helper forces a value fetch instead.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture an XLA profiler trace (view with TensorBoard / xprof)."""
    import jax

    with jax.profiler.trace(log_dir):
        yield


def time_steps(step_fn, state, n_steps: int, fetch=lambda s: float(np.asarray(s.zone_T)[0])):
    """Run ``state = step_fn(state)`` n times and time it honestly.

    Returns (final_state, seconds_per_step).  ``fetch`` materializes one value
    of the final state, forcing the whole dependency chain to execute (a
    plain block_until_ready can be a no-op on tunneled backends).
    """
    t0 = time.time()
    for _ in range(n_steps):
        state = step_fn(state)
    fetch(state)
    return state, (time.time() - t0) / max(n_steps, 1)
