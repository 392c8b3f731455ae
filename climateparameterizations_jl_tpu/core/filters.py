"""Smoothing filters for NN outputs and Richardson-number profiles.

Parity: reference ``wind_mixing/src/filtering_operators.jl:1-15`` —
an ``N x N`` tri-band running-mean matrix with edge renormalization, applied
to optionally smooth NN flux outputs or Ri profiles
(``wind_mixing/src/NDE_training.jl:98-102,121-123``).
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def smoothing_filter_matrix(N: int, filter_width: int) -> np.ndarray:
    """Running-mean matrix of odd width with renormalized edge rows."""
    if N < filter_width or filter_width % 2 != 1:
        raise ValueError("require N >= filter_width and odd filter_width")
    half = (filter_width - 1) // 2
    W = np.zeros((N, N), dtype=np.float32)
    for i in range(1, half + 1):  # 1-based edge rows
        W[i - 1, : half + i] = 1.0 / (half + i)
        W[N - i, N - (half + i) : N] = 1.0 / (half + i)
    for i in range(half + 1, N - half + 1):  # 1-based interior rows
        W[i - 1, i - 1 - half : i + half] = 1.0 / filter_width
    return W


def smoothing_filter(phi, filter_width: int = 3) -> jnp.ndarray:
    """Apply the running-mean filter along the last axis."""
    phi = jnp.asarray(phi)
    W = smoothing_filter_matrix(np.shape(phi)[-1], filter_width)
    return jnp.einsum("nk,...k->...n", jnp.asarray(W, phi.dtype), phi)
