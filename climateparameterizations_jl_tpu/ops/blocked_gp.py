"""Blocked exact-GP fit: no device program larger than one (block x block) op.

Why this exists (measured, round 4): the axon tunnel's REMOTE-COMPILE service
returns HTTP 500 on the largest single-program f64 GP fits — n = 16,384
`gp_fit` (one fused gram + Cholesky + solve program over emulated-f64 16k^2
operands) fails in `compile_and_load` while n = 12,288 compiles
(`docs/gp_at_scale_r4.json::seq_f64_errors`). The wall is PROGRAM SIZE, not
HBM (16k f64 one-flux working set is ~8 GB of the 16 GB chip). The same
tunnel also kills any single dispatch running longer than ~60-90 s.

This module decomposes the fit into host-orchestrated tile ops — Gram tiles,
a right-looking blocked Cholesky, and blocked triangular substitution — so
every compiled program is O(block^2) with a handful of distinct shapes
(compile cache does the rest), and every dispatch is seconds long. The math
is the textbook blocked factorization, bit-for-bit the same flop graph as
LAPACK's potrf blocking:

    for j:  L[j][j]       = chol( K[j][j] - sum_{k<j} L[j][k] L[j][k]^T )
            L[i][j] (i>j) = ( K[i][j] - sum_{k<j} L[i][k] L[j][k]^T ) L[j][j]^{-T}

K tiles are built on demand (each is consumed exactly once), so peak device
memory is the L tiles (~8 n^2 bytes f64) plus one transient tile — the full
Gram is never materialized alongside its factor.

Reference parity: the robust-Cholesky fit this replaces at scale is
`src/GaussianProcesses/gaussian_process.jl:48-98`; jitter matches
`closures/gp.py::gp_fit` (dtype-aware `max(K) * scale` on the diagonal).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl


@partial(jax.jit, static_argnames=("lower_only",))
def _gram_tile(kernel, xi, xj, z, lower_only=False):
    del lower_only  # shape-only cache key (diagonal vs off-diagonal tiles)
    return kernel.gram(xi, xj, z)


@jax.jit
def _tile_max(t):
    return jnp.max(t)


@jax.jit
def _syrk_sub(A, L):  # A - L L^T
    return A - L @ L.T


@jax.jit
def _gemm_sub(A, Li, Lj):  # A - Li Lj^T
    return A - Li @ Lj.T


@jax.jit
def _chol_tile(A, jitter):
    n = A.shape[0]
    return jnp.linalg.cholesky(A + jitter * jnp.eye(n, dtype=A.dtype))


@jax.jit
def _trsm_right(Aij, Ljj):  # Aij @ Ljj^{-T}  via  Ljj X^T = Aij^T
    return jsl.solve_triangular(Ljj, Aij.T, lower=True).T


@jax.jit
def _fwd_tile(Ljj, B):  # Ljj^{-1} B
    return jsl.solve_triangular(Ljj, B, lower=True)


@jax.jit
def _bwd_tile(Ljj, B):  # Ljj^{-T} B
    return jsl.solve_triangular(Ljj, B, lower=True, trans=1)


@jax.jit
def _matsub(B, L, X):  # B - L @ X
    return B - L @ X


@jax.jit
def _matsub_t(B, L, X):  # B - L^T @ X
    return B - L.T @ X


def _blocks(n: int, block: int):
    """Tile start offsets (the final tile may be smaller)."""
    return list(range(0, n, block))


def blocked_gram_cholesky(kernel, x, z, block: int = 4096, jitter_scale=None):
    """Lower-Cholesky tiles of the jittered Gram of ``x``.

    Returns ``(tiles, jitter)`` where ``tiles[(i, j)]`` (``j <= i``) are the
    lower-triangular blocks of ``L`` with ``L L^T = K + jitter I``. The
    jitter is ``max(K) * jitter_scale`` exactly as in ``gp_fit`` (computed
    from tile maxima before any factorization work).
    """
    import numpy as np

    x = jnp.asarray(x)
    n = x.shape[0]
    starts = _blocks(n, block)
    nb = len(starts)
    xs = [x[s : s + block] for s in starts]

    if jitter_scale is None:
        jitter_scale = float(np.sqrt(np.finfo(np.dtype(x.dtype)).eps))

    # Pass 1: global max for the jitter level (tile maxima; K tiles are
    # cheap relative to the factorization and are rebuilt on demand in pass
    # 2 — holding all of K alongside L would double peak memory).
    kmax = None
    for i in range(nb):
        for j in range(i + 1):
            m = _tile_max(_gram_tile(kernel, xs[i], xs[j], z, lower_only=i == j))
            kmax = m if kmax is None else jnp.maximum(kmax, m)
    jitter = kmax * jitter_scale

    tiles: dict = {}
    for j in range(nb):
        Ajj = _gram_tile(kernel, xs[j], xs[j], z, lower_only=True)
        for k in range(j):
            Ajj = _syrk_sub(Ajj, tiles[(j, k)])
        tiles[(j, j)] = _chol_tile(Ajj, jitter)
        for i in range(j + 1, nb):
            Aij = _gram_tile(kernel, xs[i], xs[j], z)
            for k in range(j):
                Aij = _gemm_sub(Aij, tiles[(i, k)], tiles[(j, k)])
            tiles[(i, j)] = _trsm_right(Aij, tiles[(j, j)])
    return tiles, jitter


def _cho_solve_blocks(tiles: dict, bs: list) -> list:
    """``(L L^T)^{-1} B`` on row blocks (blocked forward + backward
    substitution; every program is one (block, block) triangular solve or
    matmul). ``bs``/result are lists of ``(b_j, D)`` row blocks."""
    nb = len(bs)
    # Forward: L y = B.
    ys = []
    for j in range(nb):
        rhs = bs[j]
        for k in range(j):
            rhs = _matsub(rhs, tiles[(j, k)], ys[k])
        ys.append(_fwd_tile(tiles[(j, j)], rhs))

    # Backward: L^T x = y.
    xs: list = [None] * nb
    for j in reversed(range(nb)):
        rhs = ys[j]
        for i in range(j + 1, nb):
            rhs = _matsub_t(rhs, tiles[(i, j)], xs[i])
        xs[j] = _bwd_tile(tiles[(j, j)], rhs)
    return xs


def blocked_cho_solve(tiles: dict, B, block: int = 4096):
    """``(L L^T)^{-1} B`` from Cholesky tiles (see :func:`_cho_solve_blocks`)."""
    B = jnp.asarray(B)
    squeeze = B.ndim == 1
    if squeeze:
        B = B[:, None]
    bs = [B[s : s + block] for s in _blocks(B.shape[0], block)]
    out = jnp.concatenate(_cho_solve_blocks(tiles, bs), axis=0)
    return out[:, 0] if squeeze else out


def gp_fit_blocked(x_train, y_train, kernel, z, block: int = 4096, jitter_scale=None):
    """Exact-GP fit with no device program larger than one tile op.

    Same math as ``closures.gp.gp_fit`` (jittered Gram -> Cholesky ->
    ``alpha = K^{-1} y``), different lowering. Returns ``(model, tiles)``:
    ``model`` is a :class:`~climateparameterizations_jl_tpu.closures.gp.
    GPModel` with ``chol=None`` (the factor lives in ``tiles``; pass them to
    :func:`gp_uncertainty_blocked` / :func:`blocked_cho_solve` — assembling
    the full (n, n) factor into one array would re-enter the single-program
    regime this module exists to avoid).
    """
    from climateparameterizations_jl_tpu.closures.gp import GPModel

    x_train = jnp.asarray(x_train)
    y_train = jnp.asarray(y_train)
    tiles, _ = blocked_gram_cholesky(kernel, x_train, z, block, jitter_scale)
    alpha = blocked_cho_solve(tiles, y_train, block)
    model = GPModel(kernel=kernel, x_train=x_train,
                    z=None if z is None else jnp.asarray(z), alpha=alpha, chol=None)
    return model, tiles


@jax.jit
def _col_dots(r, v):  # sum over the train axis of r * v -> (m,)
    return jnp.sum(r * v, axis=0)


def gp_uncertainty_blocked(model, tiles: dict, x, block: int = 4096, query_chunk: int = 4096):
    """Posterior variance via the tiled factor (``gp_uncertainty`` parity,
    ``gaussian_process.jl:130-139``): ``k(x,x) - sum(kx^T * (K^{-1} kx))``.
    Both the cross-Gram and the solve stay tile-sized: the train axis rides
    the factor's blocking, query points are chunked."""
    x = jnp.atleast_2d(jnp.asarray(x))
    xt = model.x_train
    t_starts = _blocks(xt.shape[0], block)
    outs = []
    for s in range(0, x.shape[0], query_chunk):
        xq = x[s : s + query_chunk]
        # kx^T as train-row blocks: (b_j, m) each.
        rows = [_gram_tile(model.kernel, xt[ts : ts + block], xq, model.z) for ts in t_starts]
        vs = _cho_solve_blocks(tiles, rows)
        acc = model.kernel.self_variance(xq)
        for r, v in zip(rows, vs):
            acc = acc - _col_dots(r, v)
        outs.append(acc)
    return jnp.concatenate(outs, axis=0)
