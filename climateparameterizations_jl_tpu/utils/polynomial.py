"""Orthogonal-basis decomposition of profiles (Fourier / Legendre / Chebyshev).

Parity: ``src/polynomial_decomposition.jl:6-65`` — project a function sampled
on a grid onto the first ``n`` elements of an orthogonal basis by weighted
quadrature, and reconstruct. The reference uses QuadGK per coefficient; here
the projection is a single ``(n_basis, n_points) @ (n_points,)`` matmul with
trapezoidal weights — one MXU op for all coefficients.
"""

from __future__ import annotations

import jax.numpy as jnp


def _trapezoid_weights(x):
    dx = jnp.diff(x)
    w = jnp.zeros_like(x)
    w = w.at[:-1].add(0.5 * dx)
    w = w.at[1:].add(0.5 * dx)
    return w


def basis_functions(kind: str, n: int, x, domain=(-1.0, 1.0)):
    """Values of the first ``n`` basis functions at points ``x``: ``(n, len(x))``.

    ``kind``: ``"fourier"`` (1, cos kt, sin kt on the mapped angle t in
    [0, 2 pi] — the full period, so the family is orthogonal),
    ``"legendre"`` (three-term recurrence), or ``"chebyshev"``
    (cos(k arccos)). ``x`` is mapped affinely from ``domain`` to [-1, 1].
    """
    a, b = domain
    xh = 2.0 * (jnp.asarray(x) - a) / (b - a) - 1.0
    xh = jnp.clip(xh, -1.0, 1.0)
    if kind == "chebyshev":
        k = jnp.arange(n)[:, None]
        return jnp.cos(k * jnp.arccos(xh)[None, :])
    if kind == "fourier":
        rows = [jnp.ones_like(xh)]
        t = jnp.pi * (xh + 1.0)  # full period [0, 2 pi] — orthogonal family
        k = 1
        while len(rows) < n:
            rows.append(jnp.cos(k * t))
            if len(rows) < n:
                rows.append(jnp.sin(k * t))
            k += 1
        return jnp.stack(rows[:n])
    if kind == "legendre":
        rows = [jnp.ones_like(xh), xh]
        for k in range(1, n - 1):
            rows.append(((2 * k + 1) * xh * rows[k] - k * rows[k - 1]) / (k + 1))
        return jnp.stack(rows[:n])
    raise ValueError(f"unknown basis kind {kind!r}")


def _quadrature_weights(kind: str, x, domain):
    """Quadrature weights incorporating the basis' orthogonality weight.

    For Chebyshev the weight ``1/sqrt(1-x^2)`` is endpoint-singular, so the
    integral is taken in ``theta = arccos(x)`` (where the weight is flat):
    ``int f phi w dx = int f(cos t) phi(cos t) dt`` — trapezoid in theta.
    """
    a, b = domain
    xh = jnp.clip(2.0 * (jnp.asarray(x) - a) / (b - a) - 1.0, -1.0, 1.0)
    if kind == "chebyshev":
        theta = jnp.arccos(xh)
        return jnp.abs(_trapezoid_weights(theta))
    return _trapezoid_weights(xh)


def polynomial_decomposition(f_values, x, kind: str = "legendre", n: int = 8, domain=None):
    """Project samples ``f(x)`` onto the first ``n`` basis functions.

    Returns coefficients ``(n,)`` such that ``coeffs @ basis`` approximates
    ``f``. Projection = weighted trapezoidal quadrature of ``f * phi_k * w``
    normalized by ``int phi_k^2 w`` — all as matmuls.
    """
    x = jnp.asarray(x)
    domain = domain if domain is not None else (float(x[0]), float(x[-1]))
    phi = basis_functions(kind, n, x, domain)  # (n, P)
    wq = _quadrature_weights(kind, x, domain)  # (P,)
    num = phi @ (wq * jnp.asarray(f_values))
    den = (phi * phi) @ wq
    return num / den


def reconstruct(coeffs, x, kind: str = "legendre", domain=None):
    """Evaluate the truncated expansion at points ``x``."""
    x = jnp.asarray(x)
    domain = domain if domain is not None else (float(x[0]), float(x[-1]))
    phi = basis_functions(kind, coeffs.shape[0], x, domain)
    return coeffs @ phi
