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
    """y[i] = lower[i]*x[i-1] + diag[i]*x[i] + upper[i]*x[i+1] over axis 0.

    Expressed with pad-style concatenates (not ``.at`` updates) so it lowers
    both through XLA and through Mosaic inside the Pallas hour kernel; the
    neighbor values are shifted BEFORE multiplying so every multiply runs on
    full (tile-aligned) rows.  Rows 0 / N-1 read a zero neighbor, so
    ``lower[0]``/``upper[N-1]`` never contribute.
    """
    zero_row = jnp.zeros_like(x[:1])
    x_dn = jnp.concatenate([zero_row, x[:-1]], axis=0)  # x[i-1]
    x_up = jnp.concatenate([x[1:], zero_row], axis=0)  # x[i+1]
    return diag * x + lower * x_dn + upper * x_up


def solve_runs2(lower, diag, upper, rhs, pair_head, pair_tail):
    """Closed-form solve when off-diagonal couplings occur ONLY inside
    disjoint 2-node runs (``pair_head[i]`` marks row i coupled to i+1,
    ``pair_tail`` its partner; all other rows are decoupled: x = rhs/diag).

    This is the shape of the reference's no-mass systems for ordinary
    building constructions: insulation skins and window panes discretize to
    1-2 no-mass nodes per chunk (discretization.rs:467-501), so the
    steady-state solve (surface.rs:834) degenerates to a scalar division or
    a 2x2 Cramer solve per chunk.  One full-width division instead of the
    padded system's log2(N) PCR sweeps — the solve was ~45% of the parity
    hour kernel (PERF.md).

    Callers must guarantee the run-length precondition statically
    (``SurfaceBatch.max_nomass_run <= 2``).
    """
    zero_row = jnp.zeros_like(rhs[:1])

    def up(x):  # x[i+1], 0 at the end
        return jnp.concatenate([x[1:], zero_row], axis=0)

    def down(x):  # x[i-1], 0 at the start
        return jnp.concatenate([zero_row, x[:-1]], axis=0)

    d_n, r_n, l_n = up(diag), up(rhs), up(lower)
    d_p, r_p, u_p = down(diag), down(rhs), down(upper)
    # 2x2 Cramer: [d_i u_i; l_{i+1} d_{i+1}] x = [r_i; r_{i+1}]
    det_head = diag * d_n - upper * l_n
    det_tail = d_p * diag - u_p * lower
    num = jnp.where(
        pair_head,
        rhs * d_n - upper * r_n,
        jnp.where(pair_tail, d_p * rhs - lower * r_p, rhs),
    )
    den = jnp.where(pair_head, det_head, jnp.where(pair_tail, det_tail, diag))
    return num / den


def solve_scan(lower, diag, upper, rhs):
    """Thomas algorithm as two ``lax.scan`` sweeps over axis 0.

    Same math as :func:`solve`, but the sweep body is compiled once instead
    of being unrolled N times — used inside the Pallas hour kernel, where an
    unrolled chain inflates Mosaic compile time enormously.  (On the XLA
    path the unrolled form runs faster; scan has per-step overhead.)
    """
    import jax

    n = rhs.shape[0]

    def fwd(carry, row):
        c_prev, d_prev = carry
        li, di, ui, bi = row
        inv = 1.0 / (di - li * c_prev)
        c_i = ui * inv
        d_i = (bi - li * d_prev) * inv
        return (c_i, d_i), (c_i, d_i)

    inv0 = 1.0 / diag[0]
    c0 = upper[0] * inv0
    d0 = rhs[0] * inv0
    (_, _), (cs, ds) = jax.lax.scan(
        fwd, (c0, d0), (lower[1:], diag[1:], upper[1:], rhs[1:])
    )
    cs = jnp.concatenate([c0[None], cs], axis=0)
    ds = jnp.concatenate([d0[None], ds], axis=0)

    def bwd(x_next, row):
        c_i, d_i = row
        x_i = d_i - c_i * x_next
        return x_i, x_i

    x_last = ds[n - 1]
    _, xs = jax.lax.scan(bwd, x_last, (cs[: n - 1], ds[: n - 1]), reverse=True)
    return jnp.concatenate([xs, x_last[None]], axis=0)


def _shift_up(x, d, fill):
    """``x[i-d]`` with ``fill`` above the top edge — the static-shift
    primitive shared by the PCR solver and its factor/apply twins (one
    definition so their padding semantics cannot drift; they must stay
    bit-equivalent)."""
    pad = jnp.full_like(x[:1], fill)
    return jnp.concatenate(
        [jnp.broadcast_to(pad, (d,) + x.shape[1:]), x[:-d]], axis=0
    )


def _shift_dn(x, d, fill):
    """``x[i+d]`` with ``fill`` below the bottom edge (see _shift_up)."""
    pad = jnp.full_like(x[:1], fill)
    return jnp.concatenate(
        [x[d:], jnp.broadcast_to(pad, (d,) + x.shape[1:])], axis=0
    )


def solve_pcr(lower, diag, upper, rhs):
    """Parallel cyclic reduction over axis 0.

    ceil(log2 N) elimination steps, each a handful of full-width vector ops
    with static shifts — no sequential chain at all.  This is the form the
    Pallas hour kernel uses (sequential row loops cost ~100 cycles/row there)
    and it is also TPU-friendlier than Thomas at large batch sizes.

    Requires (weak) diagonal dominance, which the assembled K systems and the
    identity padding rows satisfy.  Out-of-range neighbors are treated as
    identity rows (a=c=0, b=1, r=0), which keeps decoupled sub-systems exact.
    """
    n = rhs.shape[0]
    a, b, c, r = lower, diag, upper, rhs

    d = 1
    while d < n:
        b_up = _shift_up(b, d, 1.0)
        b_dn = _shift_dn(b, d, 1.0)
        alpha = -a / b_up
        gamma = -c / b_dn
        b = b + alpha * _shift_up(c, d, 0.0) + gamma * _shift_dn(a, d, 0.0)
        r = r + alpha * _shift_up(r, d, 0.0) + gamma * _shift_dn(r, d, 0.0)
        a = alpha * _shift_up(a, d, 0.0)
        c = gamma * _shift_dn(c, d, 0.0)
        d *= 2
    return r / b


def pcr_factor(lower, diag, upper):
    """Pre-factor a tridiagonal system for repeated PCR solves.

    The elimination coefficients of :func:`solve_pcr` depend only on the
    matrix; when the same system is solved every sub-step for a whole hour
    (the TR-BDF2 stage matrices) they can be computed once, leaving each
    solve as ceil(log2 N) fused multiply-add sweeps over the rhs plus one
    multiply by the reciprocal diagonal — about half the full PCR and with
    no divisions in the hot loop.

    Returns ``(levels, inv_b)`` with levels = [(alpha_d, gamma_d), ...];
    use with :func:`pcr_apply`.
    """
    n = diag.shape[0]
    a, b, c = lower, diag, upper

    levels = []
    d = 1
    while d < n:
        b_up = _shift_up(b, d, 1.0)
        b_dn = _shift_dn(b, d, 1.0)
        alpha = -a / b_up
        gamma = -c / b_dn
        b = b + alpha * _shift_up(c, d, 0.0) + gamma * _shift_dn(a, d, 0.0)
        a = alpha * _shift_up(a, d, 0.0)
        c = gamma * _shift_dn(c, d, 0.0)
        levels.append((alpha, gamma))
        d *= 2
    return tuple(levels), 1.0 / b


def pcr_apply(levels, inv_b, rhs):
    """Solve with a PCR pre-factorization (see :func:`pcr_factor`)."""
    r = rhs
    d = 1
    for alpha, gamma in levels:
        r = r + alpha * _shift_up(r, d, 0.0) + gamma * _shift_dn(r, d, 0.0)
        d *= 2
    return r * inv_b


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


def factor(lower, diag, upper):
    """Pre-factor a tridiagonal system for repeated solves.

    The Thomas forward sweep splits into a matrix-only part (the modified
    upper coefficients and pivot reciprocals) and an rhs part.  When the same
    system is solved many times — the TR-BDF2 fast mode solves its two frozen
    stage matrices every sub-step for a whole hour — factoring once removes
    all N divisions from the hot loop (divides are the expensive op on the
    TPU VPU, and Mosaic does not hoist loop-invariant chains out of
    ``fori_loop`` the way XLA hoists out of ``scan``).

    Returns (cs, invs) with cs[i] = u'_i and invs[i] = 1/pivot_i; use with
    :func:`solve_factored`.
    """
    n = diag.shape[0]
    l = [lower[i] for i in range(n)]
    d = [diag[i] for i in range(n)]
    u = [upper[i] for i in range(n)]
    cs = [None] * n
    invs = [None] * n
    invs[0] = 1.0 / d[0]
    cs[0] = u[0] * invs[0]
    for i in range(1, n):
        invs[i] = 1.0 / (d[i] - l[i] * cs[i - 1])
        cs[i] = u[i] * invs[i]
    return jnp.stack(cs, axis=0), jnp.stack(invs, axis=0)


def solve_factored(lower, cs, invs, rhs):
    """Solve with a pre-factored system (see :func:`factor`): one fused
    multiply-add per row in each sweep, no divisions."""
    n = rhs.shape[0]
    l = [lower[i] for i in range(n)]
    c = [cs[i] for i in range(n)]
    v = [invs[i] for i in range(n)]
    b = [rhs[i] for i in range(n)]

    ds = [None] * n
    ds[0] = b[0] * v[0]
    for i in range(1, n):
        ds[i] = (b[i] - l[i] * ds[i - 1]) * v[i]

    xs = [None] * n
    xs[n - 1] = ds[n - 1]
    for i in range(n - 2, -1, -1):
        xs[i] = ds[i] - c[i] * xs[i + 1]
    return jnp.stack(xs, axis=0)
