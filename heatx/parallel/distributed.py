"""Multi-host (DCN) scale-out helpers.

The reference is a single-process serial library (SURVEY.md section 2.2);
heatx scales the surface axis first over the chips of one host (ICI) and
then over hosts (DCN) with ``jax.distributed`` + GSPMD.  The sharding story
is identical at both levels — the mesh just spans more devices — because the
only cross-surface communication is the per-zone reduction, which GSPMD
lowers to an all-reduce over whatever fabric connects the devices.

Typical multi-host entrypoint::

    from heatx.parallel import distributed, sharding
    distributed.initialize()           # env: HEATX_COORDINATOR, HEATX_NUM_PROCESSES, HEATX_PROCESS_ID
    mesh = distributed.global_mesh()   # all devices of all processes
    march = sharding.make_sharded_march(building, mesh)

Every process must run the same program; arrays materialize sharded across
processes via the shardings that :mod:`heatx.parallel.sharding` attaches.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence

import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize ``jax.distributed`` from arguments or environment.

    Falls back to ``HEATX_COORDINATOR`` / ``HEATX_NUM_PROCESSES`` /
    ``HEATX_PROCESS_ID`` (and from there to JAX's own autodetection, which
    covers Cloud TPU pods where the runtime provides the topology).
    No-op if the distributed runtime is already initialized.
    """
    import jax

    if getattr(jax.distributed, "is_initialized", lambda: False)():
        return  # already initialized
    coordinator_address = coordinator_address or os.environ.get("HEATX_COORDINATOR")
    if num_processes is None and "HEATX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["HEATX_NUM_PROCESSES"])
    if process_id is None and "HEATX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["HEATX_PROCESS_ID"])
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(axis_name: str = "surf", devices: Optional[Sequence] = None):
    """1-D mesh over every device of every process (ICI + DCN).  Delegates
    to :func:`heatx.parallel.sharding.make_mesh` (one mesh constructor)."""
    from heatx.parallel.sharding import make_mesh

    return make_mesh(devices, axis_name=axis_name)


def is_multi_process() -> bool:
    import jax

    return jax.process_count() > 1
