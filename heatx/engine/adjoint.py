"""Chunked reverse-mode differentiation over long horizons.

Differentiating a whole simulated year in one ``jax.grad`` call has two
practical failure modes on real hardware:

* the reverse tape for an 8760-step scan stores every carry (~35 GB at
  bench scale) — segmented ``jax.checkpoint`` fixes memory but still
  produces ONE device dispatch spanning the entire forward+backward sweep,
  and
* a single dispatch running minutes trips remote-runtime watchdogs and
  kills the worker (the same constraint that makes bench.py chunk its
  forward dispatches).

:func:`chunked_value_and_grad` splits the horizon into C chunks: the
forward pass runs one bounded dispatch per chunk, storing only the C
chunk-boundary states; the backward pass then re-runs each chunk under
``jax.vjp`` in reverse order — also one bounded dispatch per chunk —
threading the state cotangent between them.  Total cost is ~2x forward
compute and peak memory is one chunk's tape plus C boundary states.  This
is classic checkpointed adjoint integration (Griewank's revolve, at one
level), expressed with ``jax.vjp``; exactness vs the monolithic gradient
is tested in tests/test_gradients.py.

The reference has no analogue (no AD at all); cite: the loss/observable
channels it exposes are per-step zone temperatures (zone.rs:45-49), which
is what ``chunk_fn`` typically reduces.
"""

from __future__ import annotations

from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def chunked_value_and_grad(
    chunk_fn: Callable[[Any, Any, Any], Tuple[Any, jnp.ndarray]],
    params: Any,
    state0: Any,
    xs_chunks: Any,
    forward_fn: Callable[[Any, Any, Any], Tuple[Any, jnp.ndarray]] = None,
    backward_fn: Callable = None,
) -> Tuple[jnp.ndarray, Any]:
    """Value and parameter-gradient of a chunk-summed objective.

    ``chunk_fn(params, state, xs) -> (new_state, loss_contrib)`` advances
    the simulation over one chunk of inputs and returns its additive
    contribution to the scalar objective.  ``xs_chunks`` is an input pytree
    whose leaves carry a leading chunk axis ``[C, ...]`` (e.g. reshape an
    annual hourly sequence to ``[12, 730, ...]`` for monthly dispatches).

    Returns ``(total_loss, grad_params)`` where ``grad_params`` matches the
    structure of ``params``.  Each chunk runs as its own bounded device
    dispatch in both sweeps; gradients are exactly those of the monolithic
    ``jax.grad`` of the same composition (same arithmetic, same order).

    ``forward_fn`` (optional) computes the FORWARD sweep instead of
    ``chunk_fn`` — same signature and contract, typically the fused Pallas
    day kernel via :meth:`heatx.api.FastRunner.chunk_forward` (the kernel has no
    VJP of its own; ~45x the XLA path's forward speed).  It is called as a
    plain host-level function (not jitted here), so it may stage its own
    dispatches and host-side prep.  The backward sweep still differentiates
    ``chunk_fn`` at the forward trajectory's chunk-boundary states — this
    is exact when the two implementations compute the same arithmetic
    (gated by tests/test_pallas_imp.py for the TR-BDF2 kernel vs
    :func:`heatx.engine.implicit.imp_march`; gradients then agree with the
    pure-XLA adjoint to fp tolerance, tests/test_gradients.py).

    ``backward_fn`` (optional) computes the BACKWARD sweep instead of
    ``jax.vjp`` over ``chunk_fn`` — signature
    ``backward_fn(params, state, xs, state_cot, loss_cot) ->
    (params_cot, state_cot)`` with ``state``/``xs`` the chunk's START
    state and inputs.  Typically :meth:`heatx.api.FastRunner.chunk_grad`
    (the adjoint day kernel, heatx.ops.pallas_adjoint) — the whole
    value-and-gradient then runs at kernel speed on both sweeps."""
    leaves = jax.tree.leaves(xs_chunks)
    if not leaves:
        raise ValueError("xs_chunks has no leaves")
    n_chunks = leaves[0].shape[0]
    if n_chunks == 0:
        raise ValueError("xs_chunks has an empty leading chunk axis")
    bad = [l.shape for l in leaves if l.shape[0] != n_chunks]
    if bad:
        raise ValueError(
            f"xs_chunks leaves disagree on the leading chunk axis: "
            f"{n_chunks} vs {bad[0][0]}"
        )

    fwd = jax.jit(chunk_fn) if forward_fn is None else forward_fn

    if backward_fn is None:

        @jax.jit
        def bwd(params, state, xs, state_cot, loss_cot):
            _, vjp_fn = jax.vjp(lambda p, s: chunk_fn(p, s, xs), params, state)
            return vjp_fn((state_cot, loss_cot))

    else:
        bwd = backward_fn

    def chunk(i):
        return jax.tree.map(lambda x: x[i], xs_chunks)

    # Forward sweep: C bounded dispatches, store chunk-boundary states.
    states = [state0]
    total = None
    for i in range(n_chunks):
        state, loss_i = fwd(params, states[-1], chunk(i))
        states.append(state)
        total = loss_i if total is None else total + loss_i

    # Backward sweep in reverse chunk order, threading the state cotangent.
    # (The objective must flow only through the loss contributions; a loss
    # on the final state itself would need its cotangent seeded here.)
    one = jnp.ones_like(total)

    def zero_cotangent(x):
        # jax.vjp expects float0 cotangents for non-inexact (int/bool)
        # leaves — a zeros_like int32 would raise on the first backward
        # chunk if the state pytree ever grows such a leaf.
        x = jnp.asarray(x)
        if jnp.issubdtype(x.dtype, jnp.inexact):
            return jnp.zeros_like(x)
        return np.zeros(x.shape, dtype=jax.dtypes.float0)

    grad = jax.tree.map(zero_cotangent, params)
    state_cot = jax.tree.map(zero_cotangent, state0)
    def accumulate(a, b):
        if getattr(a, "dtype", None) == jax.dtypes.float0:
            return a  # non-differentiable leaf: stays a float0 zero
        return jnp.add(a, b)

    for i in reversed(range(n_chunks)):
        gp, state_cot = bwd(params, states[i], chunk(i), state_cot, one)
        grad = jax.tree.map(accumulate, grad, gp)
    return total, grad
