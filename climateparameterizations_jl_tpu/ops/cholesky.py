"""Single-kernel Pallas Cholesky: the whole factorization in VMEM.

XLA's ``cholesky`` on this TPU runs the n=1024 factorization in ~1.7-2.9 ms
(tunnel-condition dependent) — well under 1 TFLOP/s, pure sequential-panel
latency. Exact-GP builds are bottlenecked on it (``closures/gp.py``: one
factorization per kernel-grid point / flux model); this kernel was the
attempt to beat it.

This kernel keeps the ENTIRE matrix in VMEM (~16 MB/core => n <= ~1536 in
f32) and runs the classic right-looking blocked algorithm in one
``pallas_call``:

- per block column: an unblocked ``B x B`` diagonal factorization and a
  triangular inverse, both as ``fori_loop``s of masked rank-1/row updates
  (broadcasted-iota masks — no dynamic slicing, VPU-friendly);
- the panel solve collapses to ONE MXU matmul against the inverted
  diagonal block, and the trailing update is a second MXU matmul;
- no HBM traffic between steps: one read of K, one write of L.

Forward-only and f32, like the Gram kernel (``ops/gram.py``); the
differentiable / f64 path stays on ``jax.scipy.linalg.cholesky``. Validated
against it in ``tests/test_tridiagonal.py::TestPallasCholesky`` (interpret
mode off-TPU).

**Performance note (measured, TPU via axon): XLA wins.** n=1024: XLA
1.68 ms, this kernel 1.98 ms (B=128) / 2.28 ms (B=256), and the masked
outer-product accumulation costs ~3e-4 relative accuracy vs XLA's
factorization. The per-step masked-reduction extraction inside the
``fori_loop`` (3 reductions + rank-1 + select per column) prices each of
the n sequential steps above XLA's fused panel ops — the same verdict as
the fused-RK4 kernel (``ops/fused_rhs.py``): on this backend XLA's
scheduler beats hand-written Pallas for latency-bound sequential chains,
while Pallas pays off for MXU-bound single-pass work (``ops/gram.py``).
Kept as a correctness-validated template; production GP fits stay on
``jax.scipy.linalg.cholesky``.

Reference use: the robust-Cholesky GP fit (``gaussian_process.jl:48-82``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _chol_unblocked(M, B: int):
    """Outer-product Cholesky of a ``(B, B)`` SPD tile via masked updates."""
    cols = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    rowv = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)

    def body(j, carry):
        M, L = carry
        colj = jnp.sum(jnp.where(cols == j, M, 0.0), axis=1, keepdims=True)  # (B, 1)
        pivot = jnp.sqrt(jnp.sum(jnp.where(rowv == j, colj, 0.0)))
        l = jnp.where(rowv >= j, colj / pivot, 0.0)  # column j of L
        # Full outer-product update: entries in rows/cols <= j become junk,
        # but every future read is masked to the trailing submatrix.
        M = M - jnp.dot(l, l.T, preferred_element_type=jnp.float32)
        L = jnp.where(cols == j, l, L)
        return M, L

    _, L = jax.lax.fori_loop(0, B, body, (M, jnp.zeros_like(M)))
    return L


def _tri_inv_lower(L, B: int):
    """Inverse of a lower-triangular ``(B, B)`` tile by forward substitution."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    colh = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)

    def body(j, X):
        rowLj = jnp.sum(jnp.where(rows == j, L, 0.0), axis=0, keepdims=True)  # (1, B)
        ljj = jnp.sum(jnp.where(colh == j, rowLj, 0.0))
        prev = jnp.dot(jnp.where(colh < j, rowLj, 0.0), X, preferred_element_type=jnp.float32)  # (1, B)
        ej = jnp.where(colh == j, 1.0, 0.0).astype(L.dtype)
        xrow = (ej - prev) / ljj
        return jnp.where(rows == j, xrow, X)

    return jax.lax.fori_loop(0, B, body, jnp.zeros_like(L))


def _cholesky_kernel(K_ref, L_ref, *, n: int, B: int):
    L_ref[:, :] = K_ref[:, :]
    nb = n // B
    for k in range(nb):
        lo, hi = k * B, (k + 1) * B
        Lkk = _chol_unblocked(L_ref[lo:hi, lo:hi], B)
        L_ref[lo:hi, lo:hi] = Lkk
        if k < nb - 1:
            Winv = _tri_inv_lower(Lkk, B)
            P = L_ref[hi:n, lo:hi]  # (m, B)
            # Solve X Lkk^T = P  =>  X = P (Lkk^{-1})^T : one MXU matmul.
            Lp = jnp.dot(P, Winv.T, preferred_element_type=jnp.float32)
            L_ref[hi:n, lo:hi] = Lp
            T = L_ref[hi:n, hi:n]
            L_ref[hi:n, hi:n] = T - jnp.dot(Lp, Lp.T, preferred_element_type=jnp.float32)
    # Zero the (never-written) upper triangle in one masked pass.
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    L_ref[:, :] = jnp.where(rows >= cols, L_ref[:, :], 0.0)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def cholesky_pallas(K, block: int = 128, interpret: bool = False):
    """Lower-triangular Cholesky factor of an SPD matrix (f32, forward-only).

    ``K``: ``(n, n)`` with ``n`` a multiple of ``block`` and small enough
    for VMEM residency (n <= ~1536 in f32). Off TPU pass ``interpret=True``.
    """
    n = K.shape[-1]
    if K.shape != (n, n):
        raise ValueError(f"square matrix expected, got {K.shape}")
    if n % block:
        raise ValueError(f"n={n} must be a multiple of block={block}")
    if K.dtype != jnp.float32:
        raise ValueError("cholesky_pallas is f32-only; use jax.scipy.linalg.cholesky for f64")
    kernel = functools.partial(_cholesky_kernel, n=n, B=block)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(K)
