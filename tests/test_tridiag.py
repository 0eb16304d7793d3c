"""Batched tridiagonal solver kernels."""

import jax.numpy as jnp
import numpy as np

from heatx.ops import tridiag

def test_factored_solve_matches_direct():
    """factor + solve_factored == solve (the fast-mode hour kernel's hot
    path pre-factors its frozen stage matrices)."""
    rng = np.random.default_rng(3)
    N, S = 9, 16
    lower = jnp.asarray(rng.uniform(-1, 0, (N, S)))
    upper = jnp.asarray(rng.uniform(-1, 0, (N, S)))
    diag = jnp.asarray(rng.uniform(3, 5, (N, S)))
    rhs = jnp.asarray(rng.normal(size=(N, S)))
    cs, invs = tridiag.factor(lower, diag, upper)
    x1 = tridiag.solve(lower, diag, upper, rhs)
    x2 = tridiag.solve_factored(lower, cs, invs, rhs)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-13)
    # and both actually solve the system
    np.testing.assert_allclose(
        np.asarray(tridiag.matvec(lower, diag, upper, x2)), np.asarray(rhs), atol=1e-12
    )


def test_solve_runs2_matches_thomas():
    """The closed-form pair solver == the full Thomas solve on systems whose
    couplings form disjoint 2-node runs (the no-mass chunk shape of ordinary
    constructions, discretization.rs:467-501)."""
    rng = np.random.default_rng(11)
    N, S = 10, 32
    diag = jnp.asarray(rng.uniform(3, 5, (N, S)))
    rhs = jnp.asarray(rng.normal(size=(N, S)))
    # pairs (1,2) and (5,6); identity rows elsewhere get diag as drawn
    head = np.zeros((N, S), bool); head[[1, 5]] = True
    tail = np.zeros((N, S), bool); tail[[2, 6]] = True
    lower = np.zeros((N, S)); upper = np.zeros((N, S))
    upper[head] = rng.uniform(-1, 0, head.sum())
    lower[tail] = rng.uniform(-1, 0, tail.sum())
    lower, upper = jnp.asarray(lower), jnp.asarray(upper)
    x1 = tridiag.solve(lower, diag, upper, rhs)
    x2 = tridiag.solve_runs2(
        lower, diag, upper, rhs, jnp.asarray(head), jnp.asarray(tail)
    )
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-13)
