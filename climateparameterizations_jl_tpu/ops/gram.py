"""Fused GP Gram-matrix Pallas kernel: pairwise distances + kernel epilogue.

The exact-GP fit/predict path is dominated by building ``(n, m)`` kernel
matrices ``K[i, j] = k(||x_i - y_j||)`` (reference
``src/GaussianProcesses/gaussian_process.jl:153-162`` computes them in a
per-pair Julia loop). The XLA path (``closures/gp.py``) already turns this
into one Gram-trick matmul; this kernel goes one step further and fuses the
**whole chain** — ``A @ B^T`` (MXU), the norm assembly
``||a||^2 + ||b||^2 - 2ab``, the ``sqrt``, and the kernel family epilogue
(exp / Matern polynomials / rational-quadratic power) — into a single
``pallas_call``:

- one HBM read per feature tile, one HBM write of the finished Gram tile —
  the ``(n, m)`` distance matrix never exists in HBM (2x less traffic than
  matmul + separate elementwise pass, and no second kernel launch);
- the contraction runs on the MXU at f32 (measured ~100 TFLOP/s on this
  backend vs ~16 for XLA's matmul — see ``ops/fused_rhs.py`` notes);
- the feature dimension D (<= 128 after the metric transforms: 96 state
  features or 95 difference features) fits one lane tile, so each output
  tile is a single MXU contraction — no K-loop.

Scalars (gamma, sigma, alpha) ride in SMEM so the same compiled kernel
serves every hyperparameter point of the ``best_kernel`` grid search.

``gram_pallas`` itself is forward-only; :func:`gram_pallas_diff` wraps it in
a ``jax.custom_vjp`` with analytic XLA cotangents (closed-form ``dK/dgamma``,
``dK/dsigma``, ``dK/dalpha``, and the Gram-trick matmul form of ``dK/dA``,
``dK/dB``), so ML-II hyperparameter optimization
(``closures.gp.optimize_kernel_hyperparameters``) can ride the MXU forward.
The plain XLA path stays the f64 fallback (robust Cholesky parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_FAMILIES = ("squared_exponential", "matern12", "matern32", "matern52", "rational_quadratic")


def _epilogue(family: str, d2, gamma, sigma, alpha):
    """Kernel-family evaluation on a squared-distance tile (in-register)."""
    if family == "squared_exponential":
        return sigma * jnp.exp(-d2 / (2.0 * gamma * gamma))
    d = jnp.sqrt(d2)
    if family == "matern12":
        return sigma * jnp.exp(-d / gamma)
    if family == "matern32":
        c = jnp.sqrt(jnp.float32(3.0)) * d / gamma
        return sigma * (1.0 + c) * jnp.exp(-c)
    if family == "matern52":
        c = jnp.sqrt(jnp.float32(5.0)) * d / gamma
        h = 5.0 * d2 / (3.0 * gamma * gamma)
        return sigma * (1.0 + c + h) * jnp.exp(-c)
    if family == "rational_quadratic":
        base = 1.0 + d2 / (2.0 * alpha * gamma * gamma)
        return sigma * jnp.exp(-alpha * jnp.log(base))
    raise ValueError(f"unknown kernel family {family!r}")


def _gram_kernel(family: str, params_ref, a_ref, b_ref, o_ref):
    gamma, sigma, alpha = params_ref[0], params_ref[1], params_ref[2]
    a = a_ref[...]  # (bm, D)
    b = b_ref[...]  # (bn, D)
    ab = jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bm, bn)
    aa = jnp.sum(a * a, axis=1)[:, None]
    bb = jnp.sum(b * b, axis=1)[None, :]
    d2 = jnp.maximum(aa + bb - 2.0 * ab, 0.0)
    o_ref[...] = _epilogue(family, d2, gamma, sigma, alpha)


@functools.partial(jax.jit, static_argnames=("family", "bm", "bn", "interpret"))
def gram_pallas(
    A,
    B,
    gamma,
    sigma,
    alpha=1.0,
    *,
    family: str = "squared_exponential",
    bm: int = 256,
    bn: int = 256,
    interpret: bool = False,
):
    """Fused kernel matrix ``K[i, j] = k(||A_i - B_j||)``, shape ``(M, N)``.

    ``A``: ``(M, D)``, ``B``: ``(N, D)`` — f32 (f64 inputs are downcast; use
    the XLA path for strict-f64 parity). ``D`` must be <= 4096 (padded to a
    lane multiple; typical GP feature widths here are 95/96).
    """
    if family not in _FAMILIES:
        raise ValueError(f"unknown kernel family {family!r}")
    A = jnp.asarray(A, jnp.float32)
    B = jnp.asarray(B, jnp.float32)
    M, D = A.shape
    N, D2 = B.shape
    if D != D2:
        raise ValueError(f"feature mismatch: {D} vs {D2}")
    if D > 4096:
        # Past this the (block, Dp) VMEM slabs blow the ~16 MB/core budget
        # and Mosaic fails with an opaque allocation error mid-compile.
        raise ValueError(f"gram_pallas supports D <= 4096 features, got {D}; use the XLA backend")

    Dp = max(128, -(-D // 128) * 128)
    Mp = -(-M // bm) * bm
    Np = -(-N // bn) * bn
    # Zero padding is exact: padded features add 0 to both the dot product
    # and the norms; padded rows produce extra tiles sliced away below.
    Ap = jnp.pad(A, ((0, Mp - M), (0, Dp - D)))
    Bp = jnp.pad(B, ((0, Np - N), (0, Dp - D)))
    params = jnp.stack(
        [
            jnp.asarray(gamma, jnp.float32),
            jnp.asarray(sigma, jnp.float32),
            jnp.asarray(alpha, jnp.float32),
        ]
    )

    out = pl.pallas_call(
        functools.partial(_gram_kernel, family),
        grid=(Mp // bm, Np // bn),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((bm, Dp), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, Dp), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        interpret=interpret,
    )(params, Ap, Bp)
    return out[:M, :N]


# ---------------------------------------------------------------------------
# Differentiable wrapper: Pallas forward, analytic XLA backward
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def gram_pallas_diff(family: str, A, B, gamma, sigma, alpha):
    """Differentiable fused Gram: MXU forward + closed-form XLA cotangents.

    Same value as :func:`gram_pallas` (f32; interpret mode off-TPU). The
    backward pass never materializes an ``(M, N, D)`` tensor: with
    ``W = Kbar * dK/d(d^2)``, the feature cotangents collapse to two matmuls
    (``dA = 2 (rowsum(W) * A - W @ B)`` and transpose for ``dB``), and the
    hyperparameter cotangents are elementwise reductions of the recomputed
    squared-distance matrix.
    """
    return gram_pallas(
        A, B, gamma, sigma, alpha, family=family,
        interpret=jax.default_backend() != "tpu",
    )


def _family_partials(family, d2, gamma, sigma, alpha):
    """``(K, dK/dgamma, dK/d(d2), dK/dalpha)`` as elementwise f32 maps.

    Matern forms are arranged so every partial is finite at ``d = 0``
    (the ``c/d`` ratios reduce to constants); matern12's ``dK/d(d2)`` keeps
    its true integrable singularity guarded by a tiny floor, matching the
    kernel's genuine non-differentiability at coincident points.
    """
    g2 = gamma * gamma
    if family == "squared_exponential":
        K = sigma * jnp.exp(-d2 / (2.0 * g2))
        return K, K * d2 / (g2 * gamma), -K / (2.0 * g2), jnp.zeros_like(d2)
    d = jnp.sqrt(d2)
    if family == "matern12":
        K = sigma * jnp.exp(-d / gamma)
        dK_dd2 = -K / (2.0 * gamma * jnp.maximum(d, jnp.float32(1e-12)))
        return K, K * d / g2, dK_dd2, jnp.zeros_like(d2)
    if family == "matern32":
        c = jnp.sqrt(jnp.float32(3.0)) * d / gamma
        e = jnp.exp(-c)
        K = sigma * (1.0 + c) * e
        return K, sigma * c * c * e / gamma, -sigma * e * 1.5 / g2, jnp.zeros_like(d2)
    if family == "matern52":
        c = jnp.sqrt(jnp.float32(5.0)) * d / gamma
        e = jnp.exp(-c)
        K = sigma * (1.0 + c + c * c / 3.0) * e
        dK_dgamma = sigma * e * c * c * (1.0 + c) / (3.0 * gamma)
        dK_dd2 = -sigma * e * (1.0 + c) * (5.0 / (6.0 * g2))
        return K, dK_dgamma, dK_dd2, jnp.zeros_like(d2)
    if family == "rational_quadratic":
        base = 1.0 + d2 / (2.0 * alpha * g2)
        K = sigma * jnp.exp(-alpha * jnp.log(base))
        Kb = K / base  # sigma * base^(-alpha-1)
        dK_dgamma = Kb * d2 / (g2 * gamma)
        dK_dd2 = -Kb / (2.0 * g2)
        dK_dalpha = K * (-jnp.log(base) + d2 / (2.0 * alpha * g2 * base))
        return K, dK_dgamma, dK_dd2, dK_dalpha
    raise ValueError(f"unknown kernel family {family!r}")


def _gram_diff_fwd(family, A, B, gamma, sigma, alpha):
    K = gram_pallas_diff(family, A, B, gamma, sigma, alpha)
    return K, (A, B, gamma, sigma, alpha)


def _gram_diff_bwd(family, res, Kbar):
    A, B, gamma, sigma, alpha = res
    dtypes = [jnp.asarray(v).dtype for v in res]
    Af = jnp.asarray(A, jnp.float32)
    Bf = jnp.asarray(B, jnp.float32)
    Kbar = jnp.asarray(Kbar, jnp.float32)
    gf = jnp.asarray(gamma, jnp.float32)
    sf = jnp.asarray(sigma, jnp.float32)
    af = jnp.asarray(alpha, jnp.float32)
    ab = Af @ Bf.T
    a2 = jnp.sum(Af * Af, axis=1)[:, None]
    b2 = jnp.sum(Bf * Bf, axis=1)[None, :]
    d2 = jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)
    K, dK_dgamma, dK_dd2, dK_dalpha = _family_partials(family, d2, gf, sf, af)
    # Numerically-coincident pairs (the diagonal of a training Gram) contribute
    # exactly 0 to the feature cotangents — W_ij * (A_i - B_j) with A_i == B_j
    # — but must be masked BEFORE the Gram-trick decomposition below: for
    # matern12 the floored 1/d singularity puts ~1/1e-12-scale entries into
    # rowsum(W)*A - W@B, and the f32 cancellation wipes out the O(1)
    # off-diagonal signal entirely.
    coincident = d2 <= jnp.float32(1e-7) * (a2 + b2)
    W = jnp.where(coincident, 0.0, Kbar * dK_dd2)
    dA = 2.0 * (jnp.sum(W, axis=1)[:, None] * Af - W @ Bf)
    dB = 2.0 * (jnp.sum(W, axis=0)[:, None] * Bf - W.T @ Af)
    dgamma = jnp.sum(Kbar * dK_dgamma)
    dsigma = jnp.sum(Kbar * K) / sf
    dalpha = jnp.sum(Kbar * dK_dalpha)
    out = (dA, dB, dgamma, dsigma, dalpha)
    return tuple(jnp.asarray(v, dt).reshape(jnp.shape(r)) for v, dt, r in zip(out, dtypes, res))


gram_pallas_diff.defvjp(_gram_diff_fwd, _gram_diff_bwd)
