"""Simulation configuration.

The reference hard-codes its numerical knobs (max_dx=0.04 / min_dt=60 at
model.rs:236-237, MAX_RS at discretization.rs:21, SAFETY=2 at model.rs:329,
convergence tolerances at surface.rs:885) and exposes no options
(``OptionType = ()``, model.rs:190).  A JAX framework needs an explicit dtype
policy and sharding knobs, so heatx promotes all of these into a real config
dataclass.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SimConfig:
    """Numerical and execution configuration for a compiled simulation."""

    # Device dtype for the marching state. float32 is the TPU-native choice;
    # tests compare against the f64 reference on CPU with x64 enabled.
    dtype: jnp.dtype = jnp.float32

    # Discretization knobs (model.rs:236-237, model.rs:329).
    max_dx: float = 0.04
    min_dt: float = 60.0
    safety: int = 2

    # No-mass fixed-point solve (surface.rs:808-896): mean-error tolerance,
    # escalated tolerance after `escalate_after` iterations, and a hard
    # iteration cap (the reference loops unbounded with an assert bomb at
    # surface.rs:869-877; a compiled while_loop wants a finite cap).
    nomass_tol: float = 0.01
    nomass_tol_escalated: float = 0.5
    nomass_escalate_after: int = 100
    nomass_max_iter: int = 500

    # Performance mode: run exactly this many fixed-point iterations per
    # sub-step (statically unrolled, no data-dependent while_loop) instead of
    # iterating to tolerance.  Successive sub-steps warm-start from the
    # previous solution, so 2-3 iterations track the reference closely (the
    # EnergyPlus replay suite is re-checked under this mode).  None =
    # reference-exact convergence loop.
    nomass_fixed_iters: Optional[int] = None

    # Set (internally) while tracing inside the Pallas hour kernel: selects
    # Mosaic-lowerable op forms (pow-based cbrt, loop/scan solvers) over the
    # XLA-preferred ones.  Not a user knob.
    kernel_mode: bool = False

    # Set (internally) by the adjoint kernel factory: statically unroll the
    # fixed-iteration loops kernel_mode would otherwise run as fori_loop
    # (fori has no reverse-mode rule; the unrolled arithmetic is
    # identical).  Not a user knob.
    unroll_fixed_loops: bool = False

    # Flush RK4 stage values below ~1e-25 to zero: near equilibrium the stage
    # values decay into the subnormal range, where the XLA substep path's
    # fused vector loops drop onto a ~20x slow path.  The Pallas kernel path
    # disables this (TPU hardware flushes subnormals in-kernel; the selects
    # are pure overhead there).
    flush_tiny: bool = True

    # Reproduce the reference's back-side AmbientTemperature boundary reusing
    # *front* surface values (surface.rs:672-686) — an apparent upstream bug,
    # kept by default for fixture parity. Set False for the physically
    # sensible behavior.
    replicate_ambient_back_bug: bool = True

    # Name of the mesh axis the surface batch is sharded over (None = no
    # sharding annotations).
    surface_axis: Optional[str] = None

    # Contact coefficient for Boundary.ground faces (W/m2K): the face
    # couples conductively to soil at the boundary's temperature instead of
    # through a convective film.  The default 20 = 1/MAX_RS is the largest
    # film conductance the discretization's explicit-RK4 stability search
    # covers (discretization.rs:21); raising it toward Dirichlet demands the
    # L-stable TR-BDF2 fast mode (march_imp / kernel mode="trbdf2").
    # (Ground boundaries are a heatx extension — unimplemented in the
    # reference, model.rs:92.)
    ground_contact_h: float = 20.0

    # Interior longwave radiant exchange between the surfaces of a zone
    # via Carroll's (1980) mean-radiant-temperature network (heatx
    # extension).  The reference radiates every interior face against the
    # zone AIR temperature (surface.rs:611-640) — an infinite bath that
    # books no energy anywhere; with this flag each space-facing face
    # instead exchanges with its zone's MRT node (area-emissivity-Carroll
    # weighted balance point of the other faces), which conserves the
    # linearized exchange exactly at each coefficient evaluation.  Zones
    # with fewer than two participating faces keep the air-bath behavior.
    # Supported everywhere: the XLA integrators (parity march, TR-BDF2,
    # exponential) and the fused Pallas kernel (all three modes; the static
    # network data precomputes at blocking time, pallas_step._mrt_context).
    interior_mrt: bool = False

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)


DEFAULT_CONFIG = SimConfig()
