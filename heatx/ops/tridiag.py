"""Batched tridiagonal kernels.

The reference does its linear algebra through a small dense-matrix crate: a
tridiagonal mat-vec for the RK4 stages (surface.rs:268-292,
``prod_tri_diag_into``) and a banded Gaussian solve for the steady-state
no-mass system (surface.rs:834, ``mut_n_diag_gaussian`` with bandwidth 3).

On TPU both become batched vector ops over a ``[..., N]`` node axis:

* ``matvec`` is three shifted multiplies (pure VPU work, fuses with its
  neighbors);
* ``solve`` is the Thomas algorithm expressed as a ``lax.scan`` over the tiny
  node axis (N ~ 4-32), batched over every surface in the building at once.

Row ``i`` of the system is

    lower[i] * x[i-1] + diag[i] * x[i] + upper[i] * x[i+1] = rhs[i]

with ``lower[0]`` and ``upper[N-1]`` ignored.  Callers encode masked/identity
rows as ``diag=1, lower=upper=0, rhs=x_current`` — that is how heatx solves
independent no-mass chunks of many surfaces as one padded system.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def matvec(lower, diag, upper, x):
    """y[i] = lower[i]*x[i-1] + diag[i]*x[i] + upper[i]*x[i+1] over axis -1."""
    y = diag * x
    y = y.at[..., 1:].add(lower[..., 1:] * x[..., :-1])
    y = y.at[..., :-1].add(upper[..., :-1] * x[..., 1:])
    return y


def solve(lower, diag, upper, rhs):
    """Thomas algorithm over the last axis, batched over leading axes.

    No pivoting — systems here are (weakly) diagonally dominant by
    construction (K diagonals are -(sum of couplings) - h).  Identity rows
    (diag=1, offs=0) decouple the system into independent chunks, which is
    exactly how per-chunk solves of the reference are batched.

    The node axis is tiny and static (~4-32), so both sweeps are unrolled
    into pure dataflow — a ``lax.scan`` here costs more in per-step overhead
    than the whole solve.
    """
    n = rhs.shape[-1]
    l = [lower[..., i] for i in range(n)]
    d = [diag[..., i] for i in range(n)]
    u = [upper[..., i] for i in range(n)]
    b = [rhs[..., i] for i in range(n)]

    # Forward elimination
    cs = [None] * n
    ds = [None] * n
    inv0 = 1.0 / d[0]
    cs[0] = u[0] * inv0
    ds[0] = b[0] * inv0
    for i in range(1, n):
        inv = 1.0 / (d[i] - l[i] * cs[i - 1])
        cs[i] = u[i] * inv
        ds[i] = (b[i] - l[i] * ds[i - 1]) * inv

    # Back substitution
    xs = [None] * n
    xs[n - 1] = ds[n - 1]
    for i in range(n - 2, -1, -1):
        xs[i] = ds[i] - cs[i] * xs[i + 1]
    return jnp.stack(xs, axis=-1)
