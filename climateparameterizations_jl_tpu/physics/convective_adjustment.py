"""Convective adjustment closures: differentiable flux form + implicit solve.

Two forms, mirroring the reference:

- **Differentiable flux form** (inside NDEs): a diffusive heat flux
  ``-K * dT/dz`` active only where the column is statically unstable
  (``dT/dz < 0``), written as ``min(0, K * dT/dz)`` so it is smooth enough
  for gradient training. Parity:
  ``free_convection/src/convective_adjustment_nde.jl:43-47`` and
  ``wind_mixing/src/NDE_training.jl:140-143``.

- **Implicit backward-Euler form** (inside embedded host models): diagnose
  ``K(z) = kappa`` where unstable else 0, then solve the tridiagonal system
  ``(I - dt d/dz K d/dz) T' = T``. Parity:
  ``free_convection/src/oceananigans_nn.jl:13-40``. On TPU the solve is the
  batched Thomas kernel from ``ops.tridiagonal``, so thousands of columns
  adjust in one call.
"""

from __future__ import annotations

import jax.numpy as jnp

from climateparameterizations_jl_tpu.core.operators import d_center_to_face
from climateparameterizations_jl_tpu.ops.tridiagonal import implicit_diffusion_step


def convective_adjustment_flux(T, dz, kappa):
    """Differentiable conv-adj face flux ``min(0, kappa * dT/dz)``, shape ``(..., Nz+1)``.

    The returned quantity is the *negative* of a downgradient diffusive flux
    restricted to unstable regions; subtract its divergence from ``dT/dt``
    exactly as the reference adds ``+d/dz min(0, K dT/dz)``.
    """
    dTdz = d_center_to_face(T, dz)
    return jnp.minimum(0.0, kappa * dTdz)


def convective_adjustment_implicit_step(T, dt, dz, kappa, backend: str = "scan"):
    """One backward-Euler convective-adjustment step on ``T`` ``(..., Nz)``.

    Diffusivity on each interior face is ``kappa`` where ``dT/dz < 0`` else 0;
    boundary faces carry no flux.
    """
    dTdz = d_center_to_face(T, dz)
    K_face = jnp.where(dTdz < 0.0, kappa, 0.0)
    # Zero-flux boundaries: d_center_to_face already zeroes the boundary rows,
    # but make the intent explicit in case kappa is an array.
    K_face = K_face.at[..., 0].set(0.0).at[..., -1].set(0.0)
    return implicit_diffusion_step(T, K_face, dt, dz, backend=backend)
