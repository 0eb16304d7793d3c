"""NaN/Inf guards for simulation state.

The reference guards with runtime ``assert!`` on NaN temperatures
(model.rs:416-419, surface.rs:704-707) and an iteration bomb.  In a compiled
JAX program asserts do not exist; heatx instead offers explicit host-side
checks to call between (batches of) marches — cheap, explicit, and they name
the offending channel.
"""

from __future__ import annotations

import numpy as np

from heatx.engine.state import SimState


def check_state_finite(state: SimState) -> dict:
    """Count of non-finite entries per state channel (host-side)."""
    out = {}
    for name, arr in state._asdict().items():
        if arr is None:  # optional channel (e.g. ideal_load) absent
            continue
        try:
            a = np.asarray(arr)
            bad = int(np.size(a) - np.isfinite(a).sum())
        except RuntimeError:
            # Multi-process sharded state spans non-addressable devices and
            # cannot be fetched whole; reduce on device instead (the sum of
            # a sharded array is replicated, hence fetchable everywhere).
            import jax.numpy as jnp

            bad = int(jnp.sum(jnp.where(jnp.isfinite(arr), 0, 1)))
        if bad:
            out[name] = bad
    return out


def assert_state_finite(state: SimState, context: str = ""):
    """Raise with channel names if any state entry is NaN/Inf
    (the JAX-side equivalent of the reference's NaN asserts)."""
    bad = check_state_finite(state)
    if bad:
        raise FloatingPointError(
            f"non-finite simulation state{' at ' + context if context else ''}: {bad}"
        )
