"""Checkpoint / resume for simulation state.

The reference externalizes persistence: all mutable state is the flat
``SimulationState`` vector owned by the caller (SURVEY.md section 5), so
"checkpointing" is serializing that vector.  heatx keeps the same design —
the :class:`~heatx.engine.state.SimState` pytree is the whole simulation
state — and provides direct save/load here (plain ``.npz``; for
multi-host/async checkpointing the same pytree drops into orbax unchanged).
"""

from __future__ import annotations

import numpy as np

from heatx.engine.state import SimState


def save_state(path: str, state: SimState, step: int = 0) -> str:
    """Serialize a SimState (and the step counter) to ``path``; returns the
    actual file path.  ``np.savez`` appends ``.npz`` when missing — the
    suffix is normalized here so a later ``load_state`` with the SAME path
    string round-trips."""
    if not str(path).endswith(".npz"):
        path = f"{path}.npz"
    np.savez(
        path,
        step=np.int64(step),
        **{k: np.asarray(v) for k, v in state._asdict().items() if v is not None},
    )
    return path


def load_state(path: str, dtype=None, building=None):
    """Load a SimState; returns (state, step).

    Pass ``building`` to reconcile optional channels with the model the
    state will march: a checkpoint without ``ideal_load`` loaded into a
    thermostatic building gets a zero-initialized channel, and one WITH the
    channel loaded into an uncontrolled building drops it — otherwise the
    scan carry structure would mismatch on the first march."""
    import os

    import jax.numpy as jnp

    if not os.path.exists(path) and not str(path).endswith(".npz"):
        if os.path.exists(f"{path}.npz"):
            path = f"{path}.npz"  # save_state's normalized suffix

    with np.load(path) as d:
        step = int(d["step"])
        optional = {"ideal_load"}  # channels save_state may legitimately omit
        kw = {}
        for k in SimState._fields:
            if k not in d:
                if k not in optional:
                    raise KeyError(
                        f"checkpoint {path!r} is missing required state "
                        f"channel {k!r} (truncated or foreign file?)"
                    )
                kw[k] = None  # optional channel absent
                continue
            a = d[k]
            kw[k] = jnp.asarray(a if dtype is None else a.astype(dtype))
        if building is not None:
            if building.has_ideal_hvac and kw.get("ideal_load") is None:
                dt = dtype or building.config.dtype
                kw["ideal_load"] = jnp.zeros((building.n_zones,), dt)
            elif not building.has_ideal_hvac:
                kw["ideal_load"] = None
        return SimState(**kw), step
