"""Local (gradient) Richardson number diagnostics.

Parity: reference ``wind_mixing/src/NDE_training.jl:46-52`` (scaled-space
``local_richardson``) and ``wind_mixing/src/richardson_number.jl:1-42``
(batched diagnostic with NaN/Inf sanitization).

The reference works on *scaled* profiles differentiated with respect to the
*non-dimensional* vertical coordinate; the scale factors ``H g alpha sigma``
convert the scaled gradients back to a dimensional buoyancy-gradient /
shear-squared ratio:

    Ri = H g alpha sigma_T dT/dz_hat / ((sigma_u du/dz_hat)^2 + (sigma_v dv/dz_hat)^2)

All functions operate on the last axis and batch over any leading axes.
"""

from __future__ import annotations

import jax.numpy as jnp

from climateparameterizations_jl_tpu.core.operators import d_center_to_face


def local_richardson_scaled(dudz, dvdz, dTdz, H, g, alpha, sigma_u, sigma_v, sigma_T):
    """Richardson number from scaled-profile gradients (elementwise).

    Parity: ``NDE_training.jl:46-52``. Callers add the reference's
    ``eps = 1e-7`` regularizer to the gradients *before* calling (matching
    ``NDE_training.jl:115-119``).
    """
    Bz = H * g * alpha * sigma_T * dTdz
    S2 = (sigma_u * dudz) ** 2 + (sigma_v * dvdz) ** 2
    return Bz / S2


def local_richardson(dudz, dvdz, dTdz, g, alpha):
    """Richardson number from dimensional gradients (elementwise)."""
    S2 = dudz**2 + dvdz**2
    return g * alpha * dTdz / S2


def sanitize_richardson(Ri):
    """Replace NaN -> 0 and +/-Inf -> +/-1e10 (reference ``richardson_number.jl:32-40``)."""
    Ri = jnp.where(jnp.isnan(Ri), 0.0, Ri)
    Ri = jnp.where(jnp.isposinf(Ri), 1e10, Ri)
    Ri = jnp.where(jnp.isneginf(Ri), -1e10, Ri)
    return Ri


def richardson_profile(u_scaled, v_scaled, T_scaled, H, g, alpha, sigma_u, sigma_v, sigma_T, eps=0.0):
    """Face Ri profile ``(..., Nz+1)`` from scaled center profiles ``(..., Nz)``.

    Gradients are taken with respect to the non-dimensional coordinate
    (``dz_hat = 1/Nz``), matching the reference's ``Dᶠ(Nz, 1/Nz)`` usage
    (``richardson_number.jl:14``). The result is sanitized.
    """
    Nz = u_scaled.shape[-1]
    dz_hat = 1.0 / Nz
    dudz = d_center_to_face(u_scaled, dz_hat) + eps
    dvdz = d_center_to_face(v_scaled, dz_hat) + eps
    dTdz = d_center_to_face(T_scaled, dz_hat) + eps
    Ri = local_richardson_scaled(dudz, dvdz, dTdz, H, g, alpha, sigma_u, sigma_v, sigma_T)
    return sanitize_richardson(Ri)
