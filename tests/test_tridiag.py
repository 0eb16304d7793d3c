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
