"""Coarse-graining of high-resolution LES profiles onto the model grid.

Parity: reference ``src/DataWrangling/coarse_graining.jl:8-62``:

- ``coarse_grain(Φ, n, Center)``  — block mean (N divisible by n).
- ``coarse_grain(Φ, n, Face)``    — endpoints preserved; interior block mean
  when ``(N-2)/(n-2)`` is an integer, rounded-window means otherwise.
- ``coarse_grain_linear_interpolation(Φ, n, Face)`` — endpoints preserved,
  interior sampled by linear interpolation.

TPU design: every variant is a LINEAR operator, so we precompute its
``(n, N)`` weight matrix once (trace-time numpy, depends only on static
shapes) and apply it as a single batched matmul over the last axis — the
whole coarse-graining of a ``(T, N)`` time series is one MXU contraction
instead of the reference's per-column Julia loops
(``wind_mixing/src/data_containers.jl:343-360``).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def center_weights(N: int, n: int) -> np.ndarray:
    """Weight matrix for block-mean coarse-graining of a Center field."""
    if N % n != 0:
        raise ValueError(f"n={n} must evenly divide N={N} for Center coarse-graining")
    delta = N // n
    W = np.zeros((n, N))
    for i in range(n):
        W[i, delta * i : delta * (i + 1)] = 1.0 / delta
    return W


@lru_cache(maxsize=None)
def face_weights(N: int, n: int) -> np.ndarray:
    """Weight matrix for endpoint-preserving mean coarse-graining of a Face field."""
    W = np.zeros((n, N))
    W[0, 0] = 1.0
    W[-1, -1] = 1.0
    delta = (N - 2) / (n - 2)
    if delta == int(delta):
        W[1:-1, 1:-1] = center_weights(N - 2, n - 2)
    else:
        # Rounded-window means (reference coarse_graining.jl:32-36, 1-based):
        # i1 = round(2 + (i-2)Δ), i2 = round(2 + (i-1)Δ), Φ̅[i] = mean(Φ[i1:i2]).
        for i in range(2, n):  # 1-based interior index
            i1 = int(np.round(2 + (i - 2) * delta))
            i2 = int(np.round(2 + (i - 1) * delta))
            W[i - 1, i1 - 1 : i2] = 1.0 / (i2 - i1 + 1)
    return W


@lru_cache(maxsize=None)
def face_interp_weights(N: int, n: int) -> np.ndarray:
    """Weight matrix for linear-interpolation coarse-graining of a Face field."""
    W = np.zeros((n, N))
    W[0, 0] = 1.0
    W[-1, -1] = 1.0
    gap = (N - 1) / (n - 1)
    for i in range(2, n):  # 1-based interior index
        pos = 1 + (i - 1) * gap  # 1-based fractional position
        lo = int(np.floor(pos))
        frac = pos - lo
        # Reference coarse_graining.jl:59 uses (floor+1 - pos) and (pos - floor)
        W[i - 1, lo - 1] = (lo + 1) - pos
        W[i - 1, lo] = frac if lo < N else 0.0
    return W


def _apply(W: np.ndarray, phi) -> jnp.ndarray:
    # precision=HIGHEST: coarse-graining is DATA PREPARATION — on TPU the
    # default f32 matmul precision is reduced (bf16 passes), which shifted
    # coarse truth profiles by a bf16 half-ulp (~0.06 K at T~19, i.e. 0.3%,
    # several times the trained closures' own error) relative to CPU-prepared
    # data. Full precision here costs nothing (one small matmul per load)
    # and keeps fixtures/training targets platform-consistent.
    phi = jnp.asarray(phi)
    return jnp.einsum(
        "nk,...k->...n", jnp.asarray(W, phi.dtype), phi,
        precision=jax.lax.Precision.HIGHEST,
    )


def coarse_grain_center(phi, n: int) -> jnp.ndarray:
    """Block-mean a Center field ``(..., N)`` down to ``(..., n)``."""
    return _apply(center_weights(np.shape(phi)[-1], n), phi)


def coarse_grain_face(phi, n: int) -> jnp.ndarray:
    """Coarse-grain a Face field ``(..., N)`` to ``(..., n)``, preserving endpoints."""
    return _apply(face_weights(np.shape(phi)[-1], n), phi)


def coarse_grain_linear_interpolation(phi, n: int) -> jnp.ndarray:
    """Linear-interpolation coarse-graining of a Face field, preserving endpoints."""
    return _apply(face_interp_weights(np.shape(phi)[-1], n), phi)
