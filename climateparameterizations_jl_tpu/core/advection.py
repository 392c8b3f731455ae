"""WENO5 upwind advection (Jiang-Shu weighted essentially non-oscillatory).

The reference advects with Oceananigans' ``WENO5()`` in both the 3-D double
gyre (``free_convection/double_gyre.jl:60-196``) and the LES data generator
(``wind_mixing/wind_mixing.jl:1-143``). Centered 2nd-order advection is
dispersive at fronts; WENO5 reconstructs face values from smoothness-
weighted 3-candidate stencils, giving 5th-order accuracy in smooth regions
and monotone capture of fronts.

TPU shape: the reconstruction is pure elementwise arithmetic on five
shifted copies of the field — no data-dependent control flow, fuses into
one XLA kernel per axis. Shifts are slices of a single padded array
(wrap for periodic axes, edge-clamp for bounded ones; edge-clamping
degrades the formal order in the last two cells by a wall, where the
physical flux is pinned by the boundary condition anyway).

Face convention: ``boundary="edge"`` returns the ``n - 1`` interior faces
(face ``j + 1/2`` between cells ``j`` and ``j + 1``); ``"periodic"``
returns ``n`` faces where face ``k`` sits between cells ``k - 1`` and ``k``
(the MAC u-velocity convention of ``data/les.py``).
"""

from __future__ import annotations

import jax.numpy as jnp

# Optimal linear weights for the 3 candidate stencils (Jiang & Shu 1996).
_G0, _G1, _G2 = 0.1, 0.6, 0.3


def _weno5(a, b, c, d, e):
    """Left-biased face value at ``j + 1/2`` from cells ``(j-2..j+2) = (a..e)``.

    WENO-Z weights (Borges et al. 2008): the global indicator
    ``tau5 = |beta0 - beta2|`` keeps the nonlinear weights at their optimal
    values near smooth critical points, where classic Jiang-Shu weights
    degrade to 3rd order.
    """
    eps = jnp.asarray(1e-15 if a.dtype == jnp.float64 else 1e-8, a.dtype)
    p0 = (2.0 * a - 7.0 * b + 11.0 * c) / 6.0
    p1 = (-b + 5.0 * c + 2.0 * d) / 6.0
    p2 = (2.0 * c + 5.0 * d - e) / 6.0
    beta0 = (13.0 / 12.0) * (a - 2.0 * b + c) ** 2 + 0.25 * (a - 4.0 * b + 3.0 * c) ** 2
    beta1 = (13.0 / 12.0) * (b - 2.0 * c + d) ** 2 + 0.25 * (b - d) ** 2
    beta2 = (13.0 / 12.0) * (c - 2.0 * d + e) ** 2 + 0.25 * (3.0 * c - 4.0 * d + e) ** 2
    tau5 = jnp.abs(beta0 - beta2)
    w0 = _G0 * (1.0 + tau5 / (beta0 + eps))
    w1 = _G1 * (1.0 + tau5 / (beta1 + eps))
    w2 = _G2 * (1.0 + tau5 / (beta2 + eps))
    s = w0 + w1 + w2
    return (w0 * p0 + w1 * p1 + w2 * p2) / s


def weno5_face_values(q, axis: int = -1, boundary: str = "edge"):
    """``(qL, qR)`` WENO5 reconstructions on the faces along ``axis``.

    ``qL`` is the left-biased (use when the face velocity is positive),
    ``qR`` the right-biased value.
    """
    axis = axis % q.ndim
    n = q.shape[axis]
    if boundary == "periodic":
        pad_mode, count, base = "wrap", n, 0
    elif boundary == "edge":
        pad_mode, count, base = "edge", n - 1, 1
    else:
        raise ValueError(f"unknown boundary {boundary!r}")
    pads = [(0, 0)] * q.ndim
    pads[axis] = (3, 3)
    qp = jnp.pad(q, pads, mode=pad_mode)

    def win(m):
        idx = [slice(None)] * q.ndim
        idx[axis] = slice(base + m, base + m + count)
        return qp[tuple(idx)]

    W = [win(m) for m in range(6)]
    qL = _weno5(W[0], W[1], W[2], W[3], W[4])
    qR = _weno5(W[5], W[4], W[3], W[2], W[1])
    return qL, qR


def weno5_advective_flux(u_face, q, axis: int = -1, boundary: str = "edge"):
    """Upwind advective flux ``u * q_face`` with WENO5 face reconstruction.

    ``u_face`` must live on the faces the chosen ``boundary`` convention
    yields (``n - 1`` interior faces for ``"edge"``, ``n`` wrap faces for
    ``"periodic"``).
    """
    qL, qR = weno5_face_values(q, axis, boundary)
    return u_face * jnp.where(u_face >= 0, qL, qR)
