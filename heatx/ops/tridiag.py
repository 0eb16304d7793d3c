"""Batched tridiagonal kernels over the leading (node) axis.

The reference does its linear algebra through a small dense-matrix crate: a
tridiagonal mat-vec for the RK4 stages (surface.rs:268-292,
``prod_tri_diag_into``) and a banded Gaussian solve for the steady-state
no-mass system (surface.rs:834, ``mut_n_diag_gaussian`` with bandwidth 3).

On TPU both become batched vector ops over ``[N, S]`` arrays — node axis
first, surface axis last, so the large surface batch rides the 128-wide
vector lanes and the tiny node axis (~4-32) sits on sublanes.  Row ``i`` of
each system is

    lower[i] * x[i-1] + diag[i] * x[i] + upper[i] * x[i+1] = rhs[i]

with ``lower[0]`` and ``upper[N-1]`` ignored.  Callers encode masked/identity
rows as ``diag=1, lower=upper=0, rhs=x_current`` — that is how heatx solves
independent no-mass chunks of many surfaces as one padded system.

Both sweeps are unrolled into pure dataflow: the node axis is static and
tiny, and a ``lax.scan`` here costs more in per-step overhead than the whole
solve.
"""

from __future__ import annotations

import jax.numpy as jnp


def matvec(lower, diag, upper, x):
    """y[i] = lower[i]*x[i-1] + diag[i]*x[i] + upper[i]*x[i+1] over axis 0."""
    y = diag * x
    y = y.at[1:].add(lower[1:] * x[:-1])
    y = y.at[:-1].add(upper[:-1] * x[1:])
    return y


def solve(lower, diag, upper, rhs):
    """Thomas algorithm over axis 0, batched over the trailing axes."""
    n = rhs.shape[0]
    l = [lower[i] for i in range(n)]
    d = [diag[i] for i in range(n)]
    u = [upper[i] for i in range(n)]
    b = [rhs[i] for i in range(n)]

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
    return jnp.stack(xs, axis=0)
