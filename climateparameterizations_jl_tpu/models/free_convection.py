"""Free-convection NDE: single-NN heat-flux closure for a convecting column.

TPU-native re-design of the reference's free-convection NDEs
(``free_convection/src/free_convection_nde.jl:1-62`` and
``free_convection/src/convective_adjustment_nde.jl:1-57``): the state is the
scaled temperature profile ``T`` (``Nz`` centers), one MLP predicts the
``Nz - 1`` interior scaled heat fluxes, the non-dimensional PDE

    dT/dt_hat = -sigma_wT/sigma_T * tau/H * d/dz_hat(wT)            [plain]
    dT/dt_hat = sigma_wT/sigma_T * tau/H *
                (-d/dz_hat(wT) + d/dz_hat(min(0, kappa dT/dz_hat))) [conv-adj]

is integrated with a ``lax.scan``. The convective-adjustment term is the
differentiable ``min``-form base closure (kappa = 10 in the reference,
``convective_adjustment_nde.jl:45``) acting directly on the scaled profile.

Batches over leading axes of ``T0`` (simulations, ensemble members).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from climateparameterizations_jl_tpu.closures.mlp import MLP, apply_closure
from climateparameterizations_jl_tpu.core.operators import d_center_to_face, d_face_to_center, pad_faces
from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling
from climateparameterizations_jl_tpu.models.timestepper import solve_fixed_step
from climateparameterizations_jl_tpu.ops.tridiagonal import implicit_diffusion_step
from climateparameterizations_jl_tpu.physics.convective_adjustment import convective_adjustment_flux


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class FreeConvectionModel:
    """Constants + scalings + BC fluxes for a free-convection column.

    ``bottom_flux`` / ``top_flux`` are the *scaled* boundary heat fluxes
    appended to the NN's interior fluxes (parity:
    ``free_convection_nde.jl:49-62`` packs them into the ODE parameter tail).
    """

    H: jnp.ndarray  # column depth [m]
    tau: jnp.ndarray  # simulation span [s]
    T_scaling: ZeroMeanUnitVarianceScaling
    wT_scaling: ZeroMeanUnitVarianceScaling
    bottom_flux: jnp.ndarray  # scaled wT at the bottom face
    top_flux: jnp.ndarray  # scaled wT at the top face (surface forcing)
    kappa: jnp.ndarray = dataclasses.field(default_factory=lambda: jnp.float32(10.0))
    Nz: int = dataclasses.field(metadata=dict(static=True), default=32)
    base_closure: str = dataclasses.field(metadata=dict(static=True), default="convective_adjustment")

    @property
    def dz_hat(self) -> float:
        return 1.0 / self.Nz


def _assemble_wT(model: FreeConvectionModel, nn: MLP | None, T):
    if nn is None:  # physics-only baseline (zeroed NN, convective_adjustment_nde.jl with 0 weights)
        interior = jnp.zeros(T.shape[:-1] + (model.Nz - 1,), T.dtype)
    else:
        interior = apply_closure(nn, T)

    # LEFT-aligned BC broadcasting: shared face assembly (core.operators.pad_faces).
    return pad_faces(interior, model.bottom_flux, model.top_flux)


def free_convection_rhs(model: FreeConvectionModel, nn: MLP, T, t):
    """``dT/dt_hat`` for scaled temperature ``T`` ``(..., Nz)``."""
    wT = _assemble_wT(model, nn, T)
    prefactor = model.wT_scaling.sigma / model.T_scaling.sigma * model.tau / model.H
    div_wT = d_face_to_center(wT, model.dz_hat)
    if model.base_closure == "convective_adjustment":
        ca_flux = convective_adjustment_flux(T, model.dz_hat, model.kappa)
        div_ca = d_face_to_center(ca_flux, model.dz_hat)
        return prefactor * (-div_wT + div_ca)
    return -prefactor * div_wT


def solve_free_convection_nde(model: FreeConvectionModel, nn: MLP, T0, t0, dt_save, n_save: int, n_substeps: int = 2, method: str = "rk4", checkpoint: bool = True):
    """Integrate; returns ``(n_save + 1, ..., Nz)`` scaled trajectories.

    Replaces the reference's ROCK4/Tsit5 + InterpolatingAdjoint solve
    (``free_convection/src/solve.jl:1-6``) with RK4-in-scan + discrete adjoint.
    """
    if method == "split":
        return solve_free_convection_split(model, nn, T0, t0, dt_save, n_save, n_substeps, checkpoint=checkpoint)
    rhs = lambda T, t: free_convection_rhs(model, nn, T, t)  # noqa: E731
    return solve_fixed_step(rhs, T0, t0, dt_save, n_save, n_substeps, method, checkpoint)


def solve_free_convection_split(
    model: FreeConvectionModel,
    nn: MLP,
    T0,
    t0,
    dt_save,
    n_save: int,
    n_substeps: int = 1,
    tridiag_backend: str = "scan",
    checkpoint: bool = True,
):
    """Operator-split integration: explicit NN flux, IMPLICIT conv-adj.

    The explicit ``min(0, kappa dT/dz)`` closure is stiff (stability needs
    ``dt_hat < dz_hat^2 / (2 prefactor kappa)``, a few hundred substeps per
    save at kappa=10); here the unstable-only diffusion is a backward-Euler
    batched Thomas solve with the switch lagged at the start of the substep
    — the scheme of the reference's Oceananigans embedding
    (``oceananigans_nn.jl:13-40``), unconditionally stable.
    """
    dt = dt_save / n_substeps
    dz_hat = model.dz_hat
    prefactor = model.wT_scaling.sigma / model.T_scaling.sigma * model.tau / model.H

    def substep(T, t):
        wT = _assemble_wT(model, nn, T)
        T_adv = T - dt * prefactor * d_face_to_center(wT, dz_hat)
        if model.base_closure == "convective_adjustment":
            dTdz = d_center_to_face(T, dz_hat)
            # Scaled face diffusivity: the explicit term is
            # prefactor * d/dz(kappa * 1_[dTdz<0] * dTdz).
            K = prefactor * model.kappa * (dTdz < 0)
            T_adv = implicit_diffusion_step(T_adv, K, dt, dz_hat, backend=tridiag_backend, zero_boundary_faces=True)
        return T_adv

    def interval(T, t_start):
        def body(T, i):
            return substep(T, t_start + i * dt), None

        T, _ = jax.lax.scan(body, T, jnp.arange(n_substeps, dtype=T.dtype))
        return T

    step = jax.checkpoint(interval) if checkpoint else interval

    def scan_body(T, k):
        T = step(T, t0 + k * dt_save)
        return T, T

    _, frames = jax.lax.scan(scan_body, T0, jnp.arange(n_save, dtype=T0.dtype))
    return jnp.concatenate([T0[None], frames], axis=0)


def diagnose_wT(model: FreeConvectionModel, nn: MLP, T_traj):
    """Scaled wT faces, incl. the conv-adj contribution, for a trajectory.

    Parity: the wT reconstruction in ``free_convection/src/solve.jl:8-51``.
    """
    wT = _assemble_wT(model, nn, T_traj)
    if model.base_closure == "convective_adjustment":
        wT = wT - convective_adjustment_flux(T_traj, model.dz_hat, model.kappa)
    return wT
