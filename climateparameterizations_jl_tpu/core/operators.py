"""Staggered-grid differentiation operators as stencils.

The reference implements these as dense ``N x (N+1)`` / ``(N+1) x N`` matrices
multiplied by profile vectors (reference ``src/differentiation_operators.jl:6-35``),
an artifact of Zygote-friendliness. On TPU a dense matvec per profile wastes
MXU cycles and HBM bandwidth; here they are O(N) slice-and-subtract stencils
that XLA fuses into neighbouring elementwise work. All operators act on the
LAST axis so they batch trivially over leading (ensemble/simulation/time)
axes.

The dense matrices are still provided (``D_center_matrix``/``D_face_matrix``)
for parity tests and for workloads that genuinely want a matmul form.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def d_face_to_center(w: jnp.ndarray, dz) -> jnp.ndarray:
    """Derivative of a face field -> center field: ``Dᶜ``.

    ``out[..., k] = (w[..., k+1] - w[..., k]) / dz``. Maps ``(..., N+1)`` to
    ``(..., N)``. Parity: reference ``Dᶜ(N, Δ)`` (``differentiation_operators.jl:6``).
    """
    return (w[..., 1:] - w[..., :-1]) / dz


def d_center_to_face(c: jnp.ndarray, dz) -> jnp.ndarray:
    """Derivative of a center field -> face field: ``Dᶠ``, zero boundary rows.

    ``out[..., k] = (c[..., k] - c[..., k-1]) / dz`` for interior faces
    ``k = 1..N-1``; the bottom and top faces are zero (one-sided information
    only — matches the zero rows in reference ``Dᶠ(N, Δ)``,
    ``differentiation_operators.jl:21-29``). Maps ``(..., N)`` to ``(..., N+1)``.
    """
    interior = (c[..., 1:] - c[..., :-1]) / dz
    pad = [(0, 0)] * (interior.ndim - 1) + [(1, 1)]
    return jnp.pad(interior, pad)


def cell_to_cell_derivative(c: jnp.ndarray, dz) -> jnp.ndarray:
    """Center -> center derivative via face interpolation.

    Parity: reference ``cell_to_cell_derivative(D, data)``
    (``differentiation_operators.jl:31-35``): apply ``Dᶠ`` then average
    adjacent faces back onto centers.
    """
    face = d_center_to_face(c, dz)
    return 0.5 * (face[..., :-1] + face[..., 1:])


def D_center_matrix(N: int, dz: float) -> np.ndarray:
    """Dense ``N x (N+1)`` face->center derivative matrix (parity/testing)."""
    D = np.zeros((N, N + 1))
    for k in range(N):
        D[k, k] = -1.0
        D[k, k + 1] = 1.0
    return D / dz


def D_face_matrix(N: int, dz: float) -> np.ndarray:
    """Dense ``(N+1) x N`` center->face derivative matrix (parity/testing)."""
    D = np.zeros((N + 1, N))
    for k in range(1, N):
        D[k, k - 1] = -1.0
        D[k, k] = 1.0
    return D / dz


def pad_faces(interior, bottom, top):
    """Assemble ``(..., Nz+1)`` faces from interior values + scalar-ish BCs.

    BC arrays broadcast LEFT-aligned against the batch axes: a ``(S,)`` BC
    with ``(S, E, Nz-1)`` interiors means "per simulation", so trailing
    (ensemble) axes are appended — right-aligned numpy broadcasting would
    silently attach it to the wrong axis whenever ``S == E``. Shared by the
    wind-mixing flux assembly and the free-convection ``_assemble_wT``.
    """
    batch = interior.shape[:-1]

    def expand(b):
        b = jnp.asarray(b, interior.dtype)
        b = b.reshape(b.shape + (1,) * (len(batch) - b.ndim))
        return jnp.broadcast_to(b, batch)[..., None]

    return jnp.concatenate([expand(bottom), interior, expand(top)], axis=-1)
