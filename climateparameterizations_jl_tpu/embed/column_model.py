"""Dimensional host column model with an embedded NN closure.

This is the TPU-native equivalent of the reference's Oceananigans column
embeddings:

- ``free_convection/src/oceananigans_nn.jl:42-211``
  (``oceananigans_convective_adjustment_nn``): a 1x1xNz column stepped with
  the NN heat-flux divergence as a ``Forcing`` plus an implicit
  backward-Euler convective adjustment, run twice — conv-adj only and
  conv-adj + NN.
- ``wind_mixing/src/NDE_oceananigans.jl:331-475``
  (``oceananigans_modified_pacanowski_philander_nn``): a (u, v, T) column
  with Coriolis, three NN flux forcings recomputed every step, and implicit
  mPP diffusion (``modified_pacanowski_philander!`` ``:61-101``).

Where the reference drives Oceananigans through per-step Julia callbacks
(one column at a time), this model is a single ``lax.scan`` whose step
fuses: one batched MLP call for all columns (MXU), the flux-divergence
forcing, Coriolis, surface-flux injection, and the batched Thomas solve for
the implicit physics diffusion. It batches over arbitrary leading axes, so
the same compiled program steps 1 column or an ensemble of thousands —
that is also exactly the per-(i, j) closure loop the double gyre needs
(``double_gyre_nn.jl:149-168``), done as one call.

The model works in *dimensional* units; the closure's feature scalings are
applied around the NN exactly like the reference's
``scale -> NN -> unscale -> enforce-BC -> d/dz`` chain
(``oceananigans_nn.jl:120-126``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from climateparameterizations_jl_tpu.closures.mlp import MLP, apply_closure
from climateparameterizations_jl_tpu.core.operators import d_center_to_face, d_face_to_center
from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs, WindMixingScalings
from climateparameterizations_jl_tpu.ops.tridiagonal import implicit_diffusion_step
from climateparameterizations_jl_tpu.physics.mpp import MPPParameters, mpp_diffusivity
from climateparameterizations_jl_tpu.physics.richardson import sanitize_richardson


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HostColumnModel:
    """Configuration of the dimensional host column.

    ``closure``: ``"mpp"`` (wind-mixing embedding) or ``"conv_adj"``
    (free-convection embedding). Surface fluxes are kinematic
    (``Fu`` [m^2/s^2] into u, ``Ftheta`` [K m/s] into T); ``dTdz_bottom``
    is the fixed bottom temperature gradient.
    """

    H: jnp.ndarray
    f: jnp.ndarray
    g: jnp.ndarray
    alpha: jnp.ndarray
    Fu: jnp.ndarray
    Ftheta: jnp.ndarray
    dTdz_bottom: jnp.ndarray
    scalings: WindMixingScalings
    mpp: MPPParameters
    kappa_conv: jnp.ndarray = dataclasses.field(default_factory=lambda: jnp.float32(1.0))
    # Per-column diurnal heat-flux amplitude for MIXED suites (constant-flux
    # members carry 0 and keep their frozen ``Ftheta``, mirroring the NDE
    # path's ``_effective_bcs``). ``None`` falls back to ``Ftheta`` as the
    # amplitude for every column (the single-diurnal-sim behavior).
    diurnal_amplitude: jnp.ndarray | None = None
    Nz: int = dataclasses.field(metadata=dict(static=True), default=32)
    closure: str = dataclasses.field(metadata=dict(static=True), default="mpp")
    # NN feature vector: "uvT" (wind-mixing triple-NN embedding) or "T"
    # (free-convection NN, reference ``oceananigans_nn.jl:120-126`` feeds the
    # scaled temperature profile alone).
    nn_input: str = dataclasses.field(metadata=dict(static=True), default="uvT")
    # Diurnal surface heat flux: Ftheta * sin(2 pi t / day) (parity:
    # ``data_containers.jl:131-156``). ``t`` is the dimensional time passed
    # to host_column_step.
    diurnal: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # How NN outputs dimensionalize: "affine" (sigma*y + mu — FC NNs and
    # wind-mixing NNs trained with zero_weights=False), "linear" (sigma*y —
    # the zero-weights flux/sigma convention), or "auto" (affine iff
    # nn_input == "T", the historical behavior). Eval callers must pass the
    # TRAINING-mode convention or embedded faces are biased by mu.
    nn_dimensionalize: str = dataclasses.field(metadata=dict(static=True), default="auto")
    # mPP + convective adjustment on the TRACER diffusivity: where the
    # column is convectively unstable (Ri <= 0), kappa_T jumps to
    # ``kappa_conv`` instead of nu/Pr — the reference's
    # ``convective_adjustment=true`` embedding branch
    # (``NDE_oceananigans.jl:49-54``, nu_T[i] = Ri > 0 ? nu/Pr : 1).
    mpp_conv_adjust: bool = dataclasses.field(metadata=dict(static=True), default=False)

    @property
    def dz(self):
        return self.H / self.Nz


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class HostColumnState:
    u: jnp.ndarray
    v: jnp.ndarray
    T: jnp.ndarray


def _nn_flux_faces(model: HostColumnModel, nns: FluxNNs | None, state: HostColumnState):
    """Dimensional NN flux faces ``(uw, vw, wT)`` each ``(..., Nz+1)``.

    The scale -> NN -> unscale chain of ``oceananigans_nn.jl:120-126`` /
    ``NDE_oceananigans.jl:380-405``, with zero interior->boundary padding
    (the host model owns the boundary fluxes). One batched MLP call per flux.
    """
    zeros_faces = jnp.zeros(state.T.shape[:-1] + (state.T.shape[-1] + 1,), state.T.dtype)
    if nns is None:
        return zeros_faces, zeros_faces, zeros_faces
    s = model.scalings
    if model.nn_input == "T":
        x = s.T.scale(state.T)
    else:
        x = jnp.concatenate([s.u.scale(state.u), s.v.scale(state.v), s.T.scale(state.T)], axis=-1)

    def faces(nn: MLP | None, scaling):
        if nn is None:
            return zeros_faces
        # Dimensionalize per training convention (see nn_dimensionalize):
        # FC NNs train against AFFINE-scaled targets (sigma * y + mu);
        # wind-mixing triple NNs in zero-weights mode output flux/sigma
        # (linear, no offset) — but zero_weights=False training is affine too.
        y = apply_closure(nn, x)
        affine = model.nn_dimensionalize == "affine" or (model.nn_dimensionalize == "auto" and model.nn_input == "T")
        interior = scaling.unscale(y) if affine else scaling.sigma * y
        zeros = jnp.zeros(interior.shape[:-1] + (1,), interior.dtype)
        return jnp.concatenate([zeros, interior, zeros], axis=-1)

    return faces(nns.uw, s.uw), faces(nns.vw, s.vw), faces(nns.wT, s.wT)


def _nn_forcing(model: HostColumnModel, nns: FluxNNs | None, state: HostColumnState):
    """Per-cell forcing ``-d/dz(w'phi'_NN)`` for (u, v, T), dimensional."""
    uw, vw, wT = _nn_flux_faces(model, nns, state)
    div = lambda f: -d_face_to_center(f, model.dz)  # noqa: E731
    return div(uw), div(vw), div(wT)


def diagnose_host_fluxes(model: HostColumnModel, nns: FluxNNs | None, state: HostColumnState, t=0.0):
    """Total dimensional face fluxes ``(uw, vw, wT)`` of the host column.

    NN faces + downgradient diffusive flux ``-K dphi/dz`` (zero boundary
    faces, matching the implicit solve) + the prescribed boundary fluxes —
    the flux diagnostics the reference's embedded eval stores
    (``NDE_oceananigans.jl:157-286``). Batches over leading axes, including
    a saved trajectory's time axis.
    """
    uw, vw, wT = _nn_flux_faces(model, nns, state)
    nu, kappa = _diffusivities(model, state)
    mask = jnp.ones(nu.shape[-1], nu.dtype).at[0].set(0.0).at[-1].set(0.0)
    dudz = d_center_to_face(state.u, model.dz)
    dvdz = d_center_to_face(state.v, model.dz)
    dTdz = d_center_to_face(state.T, model.dz)
    uw = uw - mask * nu * dudz
    vw = vw - mask * nu * dvdz
    wT = wT - mask * kappa * dTdz
    uw = uw.at[..., -1].set(jnp.broadcast_to(model.Fu, uw[..., -1].shape))
    Ft = surface_heat_flux(model, jnp.asarray(t, state.T.dtype))
    wT = wT.at[..., -1].set(jnp.broadcast_to(Ft, wT[..., -1].shape))
    # Fixed-gradient bottom BC: heat exits through the bottom face
    # (same diffusivity rule as the stepper — see _bottom_bc_kappa).
    kappa_bc = _bottom_bc_kappa(model, nu, kappa)
    wT = wT.at[..., 0].set(jnp.broadcast_to(-kappa_bc * model.dTdz_bottom, wT[..., 0].shape))
    return uw, vw, wT


def diagnose_nn_heat_flux(model: HostColumnModel, nns: FluxNNs | None, T):
    """Dimensional NN heat flux on faces ``(..., Nz+1)`` for a T profile.

    The embedded NN's ``w'T'`` as actually applied by :func:`_nn_forcing`
    (interior faces from the closure, zero boundary faces — the host model
    owns the boundary fluxes). Parity: the ``wT`` diagnostic the reference
    writes next to the embedded solution (``oceananigans_nn.jl:184-192``,
    ``diagnose_wT_NN``). Batches over leading axes, including a saved
    trajectory's time axis.
    """
    if nns is None or nns.wT is None:
        return jnp.zeros(T.shape[:-1] + (T.shape[-1] + 1,), T.dtype)
    if model.nn_input != "T":
        raise ValueError("diagnose_nn_heat_flux needs nn_input='T' (heat-flux-only embedding)")
    # Delegate to the stepper's own flux assembly so the dimensionalization
    # convention (nn_dimensionalize: affine vs flux/sigma) can never diverge
    # from the flux that actually forced the column.
    zeros_uv = jnp.zeros_like(T)
    state = HostColumnState(u=zeros_uv, v=zeros_uv, T=T)
    _, _, wT = _nn_flux_faces(model, nns, state)
    return wT


def _diffusivities(model: HostColumnModel, state: HostColumnState):
    """Face (nu, kappa_T) profiles for the implicit solve, boundary faces zeroed."""
    if model.closure == "conv_adj":
        dTdz = d_center_to_face(state.T, model.dz)
        kappa = jnp.where(dTdz < 0.0, model.kappa_conv, 0.0)
        nu = jnp.zeros_like(kappa)
    else:
        # The reference's eps regularizer on every gradient before forming Ri
        # (``NDE_training.jl:115-119``; the NDE path does the same in scaled
        # space). The max() floor on the shear keeps the DIVISION's backward
        # pass finite: at zero shear the raw quotient's VJP is inf*0 = NaN
        # even though the forward value is masked, which poisoned every
        # a-posteriori gradient through the host column.
        eps = jnp.asarray(1e-7, state.T.dtype)
        dudz = d_center_to_face(state.u, model.dz) + eps
        dvdz = d_center_to_face(state.v, model.dz) + eps
        dTdz = d_center_to_face(state.T, model.dz) + eps
        S2 = jnp.maximum(dudz**2 + dvdz**2, jnp.asarray(1e-20, state.T.dtype))
        Ri = sanitize_richardson(model.g * model.alpha * dTdz / S2)
        nu = mpp_diffusivity(Ri, model.mpp)
        kappa = nu / model.mpp.Pr
        if model.mpp_conv_adjust:
            kappa = jnp.where(Ri > 0.0, kappa, model.kappa_conv)
    # Boundary faces are zeroed by the implicit solve itself
    # (zero_boundary_faces=True in host_column_step).
    return nu, kappa


def _bottom_bc_kappa(model: HostColumnModel, nu, kappa):
    """Diffusivity for the fixed-gradient bottom BC flux.

    Any DISCONTINUOUS convective-adjustment switch must key on the
    PRESCRIBED bottom gradient, never the face-1 state: a transient
    NN-induced instability at face 1 would otherwise pair ``kappa_conv``
    with the (stable, positive) prescribed gradient and dump
    ``-kappa_conv * dTdz_bottom`` of spurious cooling into the bottom cell
    (~0.15 K instantly on LES-generated data). This applies to
    ``closure="conv_adj"`` AND to ``closure="mpp"`` with
    ``mpp_conv_adjust=True``; the smooth mPP part keeps the face-1 proxy.
    """
    if model.closure == "conv_adj":
        return jnp.where(model.dTdz_bottom < 0.0, model.kappa_conv, 0.0)
    if model.mpp_conv_adjust:
        smooth = nu[..., 1] / model.mpp.Pr  # face-1 mPP kappa WITHOUT the jump
        return jnp.where(model.dTdz_bottom < 0.0, model.kappa_conv, smooth)
    return kappa[..., 1]


def surface_heat_flux(model: HostColumnModel, t):
    """Instantaneous surface heat flux (diurnal cycle when configured).

    With ``diurnal_amplitude`` set, the cycle is per-column: members with
    amplitude 0 keep their constant ``Ftheta`` (mixed diurnal/constant
    suites, the NDE path's ``_effective_bcs`` semantics)."""
    if model.diurnal:
        from climateparameterizations_jl_tpu.core.constants import diurnal_cycle

        if model.diurnal_amplitude is None:
            return model.Ftheta * diurnal_cycle(t)
        amp = model.diurnal_amplitude
        return jnp.where(amp != 0.0, amp * diurnal_cycle(t), model.Ftheta)
    return model.Ftheta


def host_for_wind_mixing(model, Fu, Ftheta, dTdz_bottom, diurnal_amplitude=None) -> HostColumnModel:
    """Host column configured from a trained :class:`WindMixingModel`.

    The ONE construction behind the eval harness's embedded run
    (``eval/profile.nde_profile``) and the a-posteriori trainer
    (``train/embedded.py``) — the train-time and eval-time hosts can never
    diverge in base physics, kappa, or NN dimensionalization convention.

    The host's base physics must match the NDE's training-time base (a
    conv-adj-base checkpoint embedded over an mPP host would hand the NNs a
    diffusivity they never saw). A base-free model (``use_mpp=use_conv_adj=
    False``) embeds over a ZERO-physics host: conv-adj with kappa 0. NN
    faces dimensionalize by the TRAINING convention (``flux/sigma`` in
    zero-weights mode, affine otherwise) or every interior face is biased
    by mu. ``Fu``/``Ftheta``/``dTdz_bottom`` may carry leading batch axes
    (per-simulation BCs).
    """
    host_closure = "mpp" if model.use_mpp else "conv_adj"
    kappa_host = model.kappa if (model.use_mpp or model.use_conv_adj) else jnp.zeros_like(model.kappa)
    return HostColumnModel(
        H=model.H, f=model.f, g=model.g, alpha=model.alpha,
        Fu=Fu, Ftheta=Ftheta, dTdz_bottom=dTdz_bottom,
        scalings=model.scalings, mpp=model.mpp, Nz=model.Nz, closure=host_closure,
        kappa_conv=kappa_host,
        diurnal=model.diurnal,
        diurnal_amplitude=diurnal_amplitude,
        nn_dimensionalize="linear" if model.zero_weights else "affine",
    )


def host_for_free_convection(model, f, g, alpha, Ftheta, dTdz_bottom) -> HostColumnModel:
    """Host column configured from a trained free-convection model.

    The ONE construction behind the eval harness's FC embedded run
    (``eval/profile.free_convection_profile``) and the FC a-posteriori
    trainer (``train/embedded.py``) — train-time and deploy-time dynamics
    cannot diverge. Parity: ``oceananigans_convective_adjustment_nn``
    (``free_convection/src/oceananigans_nn.jl:42-211``): implicit convective
    adjustment, heat-flux-only NN fed the scaled T profile
    (``nn_input="T"``, affine dimensionalization), no momentum forcing.

    ``model`` is duck-typed (``H``, ``kappa``, ``Nz``, ``base_closure``,
    ``T_scaling``, ``wT_scaling`` — a :class:`FreeConvectionModel`).
    Base-free checkpoints (``base_closure="none"``) embed over a
    zero-physics host (kappa 0), matching the base the NN trained against.
    ``Ftheta``/``dTdz_bottom`` may carry leading batch axes (per-simulation
    BCs); ``f``/``g``/``alpha`` must be scalars (they enter scalar algebra
    in the stepper).
    """
    from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling

    dtype = jnp.asarray(model.H).dtype
    unit = ZeroMeanUnitVarianceScaling(jnp.zeros((), dtype), jnp.ones((), dtype))
    kappa_host = (
        model.kappa if model.base_closure == "convective_adjustment" else jnp.zeros_like(model.kappa)
    )
    Ftheta = jnp.asarray(Ftheta)
    return HostColumnModel(
        H=model.H, f=jnp.asarray(f), g=jnp.asarray(g), alpha=jnp.asarray(alpha),
        Fu=jnp.zeros_like(Ftheta), Ftheta=Ftheta, dTdz_bottom=jnp.asarray(dTdz_bottom),
        scalings=WindMixingScalings(
            u=unit, v=unit, T=model.T_scaling, uw=unit, vw=unit, wT=model.wT_scaling
        ),
        mpp=MPPParameters.default(dtype), kappa_conv=kappa_host,
        Nz=model.Nz, closure="conv_adj", nn_input="T",
    )


def host_column_step(model: HostColumnModel, nns: FluxNNs | None, state: HostColumnState, dt, tridiag_backend: str = "scan", t=0.0) -> HostColumnState:
    """One host-model step at dimensional time ``t``: NN forcing + Coriolis +
    surface fluxes (explicit), then implicit physics diffusion (backward
    Euler, batched Thomas solve)."""
    fu, fv, fT = _nn_forcing(model, nns, state)

    # Forward-backward Coriolis: v uses the already-rotated u (plain forward
    # Euler amplifies inertial oscillations by sqrt(1 + (f dt)^2) per step —
    # see the Ekman-transport golden test and CLAUDE.md).
    u = state.u + dt * (model.f * state.v + fu)
    v = state.v + dt * (-model.f * u + fv)
    T = state.T + dt * fT

    # Surface fluxes into the top cell, bottom gradient on T
    # (flux BCs of NDE_oceananigans.jl:331-362 / oceananigans_nn.jl:167-210).
    dz = model.dz
    u = u.at[..., -1].add(-dt * model.Fu / dz)
    T = T.at[..., -1].add(-dt * surface_heat_flux(model, jnp.asarray(t, state.T.dtype)) / dz)
    nu, kappa = _diffusivities(model, state)
    # Fixed-gradient bottom BC: upward flux through the bottom face is
    # -kappa_bc * dTdz (heat exits downward in stable stratification),
    # cancelling the zero-flux Laplacian's erosion of cell 0 so the deep
    # linear profile stays steady (Oceananigans GradientBoundaryCondition
    # semantics, NDE_oceananigans.jl:331-362). The BC diffusivity rule lives
    # in _bottom_bc_kappa (discontinuous switches key on the PRESCRIBED
    # gradient, never the face-1 state).
    kappa_bc = _bottom_bc_kappa(model, nu, kappa)
    T = T.at[..., 0].add(-dt * kappa_bc * model.dTdz_bottom / dz)

    # One batched Thomas solve for (u, v, T): the solve's scan over levels
    # is the latency-bound chain (same trick as kpp_step / the split solver).
    # jnp.stack promotes mixed dtypes; cast each result back to preserve the
    # caller's per-variable dtype through scan carries.
    phi = jnp.stack(jnp.broadcast_arrays(u, v, T), axis=0)
    K3 = jnp.stack(jnp.broadcast_arrays(nu, nu, kappa), axis=0)
    phi = implicit_diffusion_step(phi, K3, dt, dz, backend=tridiag_backend, zero_boundary_faces=True)
    return HostColumnState(u=phi[0].astype(u.dtype), v=phi[1].astype(v.dtype), T=phi[2].astype(T.dtype))


def run_embedded_column(
    model: HostColumnModel,
    nns: FluxNNs | None,
    state0: HostColumnState,
    dt,
    n_save: int,
    save_every: int = 1,
    tridiag_backend: str = "scan",
    t0=0.0,
    remat: bool = False,
) -> HostColumnState:
    """Run the host column from time ``t0``, saving every ``save_every`` steps.

    Returns trajectories with time on the leading axis
    ``(n_save + 1, ..., Nz)``; batches over leading axes of ``state0`` /
    batched model fields (ensembles, gyre columns). ``remat=True``
    rematerializes each save interval in the backward pass (a-posteriori
    training over long windows — same granularity as
    ``models/timestepper.solve_fixed_step``).
    """

    def substep(carry, _):
        state, t = carry
        return (host_column_step(model, nns, state, dt, tridiag_backend, t), t + dt), None

    def interval(carry, _):
        carry, _ = jax.lax.scan(substep, carry, None, length=save_every)
        return carry, carry[0]

    if remat:
        interval = jax.checkpoint(interval)

    t_init = jnp.asarray(t0, state0.T.dtype)
    (_, _), frames = jax.lax.scan(interval, (state0, t_init), None, length=n_save)
    cat = lambda a, b: jnp.concatenate([a[None], b], axis=0)  # noqa: E731
    return HostColumnState(u=cat(state0.u, frames.u), v=cat(state0.v, frames.v), T=cat(state0.T, frames.T))


def run_paired_columns(model: HostColumnModel, nns: FluxNNs, state0: HostColumnState, dt, n_save: int, save_every: int = 1, tridiag_backend: str = "scan", t0=0.0):
    """Run the physics-only baseline and the baseline+NN simulation.

    Parity: the paired runs of ``oceananigans_nn.jl:167-210`` ("convective
    adjustment" vs "oceananigans" solutions) and
    ``NDE_oceananigans.jl:457-464``. Returns ``(baseline, with_nn)``.
    """
    baseline = run_embedded_column(model, None, state0, dt, n_save, save_every, tridiag_backend, t0)
    with_nn = run_embedded_column(model, nns, state0, dt, n_save, save_every, tridiag_backend, t0)
    return baseline, with_nn
