"""TKE-based mass-flux column closure, batched and jitted.

Reimplementation of OceanTurb.jl's ``TKEMassFlux.Model`` in the exact
configuration the reference instantiates
(``src/PhysicalParameterizations/turbulent_kinetic_energy_closure.jl:1-60``;
``free_convection/src/tke_mass_flux.jl:21-27``: ``stepper=:BackwardEuler``,
``eddy_diffusivities=RiDependentDiffusivities()``). One prognostic
turbulent-kinetic-energy equation closes the eddy diffusivities:

    de/dt = d/dz(K_e de/dz) + K_U S^2 - K_C N^2 - Cd e^(3/2) / ell
    ell   = min(kappa_vk * d, Cb * sqrt(e) / N)    (wall- and stratification-limited)
    K_phi = CK_phi(Ri) * ell * sqrt(e) + K0_phi

**RiDependentDiffusivities**: each field's stability coefficient blends
between a low-Ri (convective/neutral) and a high-Ri (stably stratified)
branch through a smooth step in the local gradient Richardson number,

    CK_phi(Ri) = CK_phi_minus + (CK_phi_plus - CK_phi_minus) * step(Ri)
    step(x)    = (1 + tanh((x - CK_Ric) / CK_Riw)) / 2

for phi in {U (momentum), C (tracers), e (TKE)} — the TKE diffusivity is
Ri-dependent too, like OceanTurb's.

**TKE wall model**: the surface injects TKE as a flux through the top face,
``Cw_ustar * ustar^3`` from wind work plus a convective seed
``Cw_b * max(Fb, 0) * dz`` from a destabilizing surface buoyancy flux (the
finite-volume form of OceanTurb's prescribed surface TKE flux).

Stepping: explicit sources, implicit vertical diffusion (batched Thomas),
same operator split as the KPP model. Everything batches over leading axes.

Fidelity note: OceanTurb.jl itself is an external dependency of the
reference (not vendored), so the coefficient DEFAULTS here are pinned by
golden physics tests instead of line-by-line transcription — free-convection
mixed-layer deepening must track the encroachment law the rest of the suite
trusts (``tests/test_kpp_tke.py::TestTKE``), heat/momentum budgets must
close, and wind mixing must generate near-surface TKE.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from climateparameterizations_jl_tpu.core.operators import d_center_to_face
from climateparameterizations_jl_tpu.ops.tridiagonal import implicit_diffusion_step


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TKEParameters:
    """TKEMassFlux parameter set: dissipation (``TKEParameters.Cᴰ``),
    mixing length, ``RiDependentDiffusivities`` coefficients, and the
    surface TKE wall model."""

    kappa_vk: jnp.ndarray  # von Karman constant (wall mixing length)
    Cb: jnp.ndarray  # stratified mixing-length coefficient
    Cd: jnp.ndarray  # dissipation coefficient (OceanTurb TKEParameters.Cᴰ)
    # RiDependentDiffusivities: minus = low-Ri branch, plus = high-Ri branch
    CKu_minus: jnp.ndarray  # momentum diffusivity, convective/neutral
    CKu_plus: jnp.ndarray  # momentum diffusivity, stratified
    CKc_minus: jnp.ndarray  # tracer diffusivity, convective/neutral
    CKc_plus: jnp.ndarray  # tracer diffusivity, stratified
    CKe_minus: jnp.ndarray  # TKE diffusivity, convective/neutral
    CKe_plus: jnp.ndarray  # TKE diffusivity, stratified
    CK_Ric: jnp.ndarray  # step center (critical Ri)
    CK_Riw: jnp.ndarray  # step width
    # Surface TKE wall model (flux through the top face)
    Cw_ustar: jnp.ndarray  # wind-work TKE flux coefficient (* ustar^3)
    Cw_b: jnp.ndarray  # convective TKE seed coefficient (* max(Fb,0) * dz)
    e_min: jnp.ndarray
    ell_min: jnp.ndarray
    KU0: jnp.ndarray  # background momentum/TKE diffusivity
    KT0: jnp.ndarray  # background tracer diffusivity

    @classmethod
    def default(cls, dtype=jnp.float32, **overrides) -> "TKEParameters":
        vals = dict(
            kappa_vk=0.4, Cb=0.7, Cd=2.91,
            CKu_minus=0.4, CKu_plus=0.1,
            CKc_minus=1.3, CKc_plus=0.16,
            CKe_minus=0.4, CKe_plus=0.1,
            CK_Ric=0.3, CK_Riw=0.1,
            Cw_ustar=3.75, Cw_b=1.0,
            e_min=1e-9, ell_min=0.01, KU0=1e-6, KT0=1e-7,
        )
        vals.update(overrides)
        return cls(**{k: jnp.asarray(v, dtype) for k, v in vals.items()})

    def sigma(self, Ri, minus, plus):
        """``RiDependentDiffusivities`` blend: smooth step from the low-Ri
        to the high-Ri coefficient across ``CK_Ric`` with width ``CK_Riw``."""
        step = 0.5 * (1.0 + jnp.tanh((Ri - self.CK_Ric) / self.CK_Riw))
        return minus + (plus - minus) * step


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TKEState:
    U: jnp.ndarray
    V: jnp.ndarray
    T: jnp.ndarray
    e: jnp.ndarray  # turbulent kinetic energy (centers)


def tke_diffusivities(state: TKEState, dz, params: TKEParameters, g, alpha):
    """Face diffusivities ``(K_U, K_T, K_e)`` from the current TKE field."""
    e_pad = jnp.pad(state.e, [(0, 0)] * (state.e.ndim - 1) + [(1, 1)], mode="edge")
    e_face = jnp.maximum(params.e_min, 0.5 * (e_pad[..., :-1] + e_pad[..., 1:]))
    sqrt_e = jnp.sqrt(e_face)

    dUdz = d_center_to_face(state.U, dz)
    dVdz = d_center_to_face(state.V, dz)
    dTdz = d_center_to_face(state.T, dz)
    N2 = g * alpha * dTdz
    S2 = dUdz**2 + dVdz**2
    Ri = N2 / (S2 + 1e-30)

    # Mixing length: wall distance below the surface, stratification-capped.
    # Faces bottom->top: z_f[k] = k dz - H, depth below surface = H - k dz.
    Nz = state.U.shape[-1]
    depth_f = (Nz - jnp.arange(Nz + 1, dtype=state.U.dtype)) * dz
    d_wall = jnp.maximum(params.ell_min, params.kappa_vk * depth_f)
    ell_strat = params.Cb * sqrt_e / jnp.sqrt(jnp.maximum(N2, 1e-12))
    ell = jnp.minimum(d_wall, ell_strat)
    ell = jnp.maximum(ell, params.ell_min)

    # RiDependentDiffusivities: per-field smooth step between the
    # convective/neutral and stratified branches — including the TKE
    # diffusivity (tke_mass_flux.jl:26).
    CK_U = params.sigma(Ri, params.CKu_minus, params.CKu_plus)
    CK_T = params.sigma(Ri, params.CKc_minus, params.CKc_plus)
    CK_e = params.sigma(Ri, params.CKe_minus, params.CKe_plus)

    K_U = CK_U * ell * sqrt_e + params.KU0
    K_T = CK_T * ell * sqrt_e + params.KT0
    K_e = CK_e * ell * sqrt_e + params.KU0

    # 1-D shard-safe mask (see kpp_diffusivities / CLAUDE.md scatter note).
    mask = jnp.ones(K_U.shape[-1], K_U.dtype).at[0].set(0.0).at[-1].set(0.0)
    return K_U * mask, K_T * mask, K_e * mask, (S2, N2, ell, sqrt_e)


def tke_diagnostic_heat_flux(state: TKEState, dz, params: TKEParameters, Fb, g, alpha):
    """Diagnostic face heat flux ``wT = -K_T dT/dz`` with the surface flux on
    the top face — the ``wT`` output of the reference's TKE baseline
    (``free_convection/src/tke_mass_flux.jl:3-52``). Batches over leading
    axes (e.g. a saved trajectory)."""
    K_U, K_T, K_e, _ = tke_diffusivities(state, dz, params, g, alpha)
    dTdz = d_center_to_face(state.T, dz)
    wT = -K_T * dTdz
    F_theta = Fb / (g * alpha)
    return wT.at[..., -1].set(jnp.broadcast_to(F_theta, wT[..., -1].shape))


def tke_step(state: TKEState, dt, dz, params: TKEParameters, Fu, Fb, f_cor, g, alpha, tridiag_backend: str = "scan", dTdz_bottom=0.0) -> TKEState:
    """One operator-split TKE step.

    ``dTdz_bottom``: fixed-gradient bottom BC on T, applied exactly like
    ``kpp_step`` (upward flux ``-KT0 * dTdz`` exits the bottom face) so the
    two physics baselines share bottom-boundary semantics.
    """
    K_U, K_T, K_e, (S2, N2, ell, sqrt_e) = tke_diffusivities(state, dz, params, g, alpha)

    # TKE sources at centers (average face quantities back to centers).
    to_c = lambda x: 0.5 * (x[..., 1:] + x[..., :-1])  # noqa: E731
    production = to_c(K_U * S2) - to_c(K_T * N2)
    e_center = jnp.maximum(state.e, params.e_min)
    ell_c = to_c(ell)
    dissipation = params.Cd * e_center**1.5 / ell_c

    e_half = jnp.maximum(state.e + dt * (production - dissipation), params.e_min)
    # Surface TKE wall model: one flux through the top face — wind work
    # (Cw_ustar * ustar^3) plus the convective seed from a destabilizing
    # surface buoyancy flux (Cw_b * max(Fb, 0) * dz).
    ustar3 = jnp.abs(Fu) ** 1.5
    e_flux_surf = params.Cw_ustar * ustar3 + params.Cw_b * jnp.maximum(0.0, Fb) * dz
    e_half = e_half.at[..., -1].add(dt * e_flux_surf / dz)

    # Forward-backward Coriolis (neutrally stable; forward Euler amplifies
    # inertial oscillations by sqrt(1 + (f dt)^2) per step).
    U_half = state.U + dt * f_cor * state.V
    V_half = state.V - dt * f_cor * U_half
    U_half = U_half.at[..., -1].add(-dt * Fu / dz)
    F_theta = Fb / (g * alpha)
    T_half = state.T.at[..., -1].add(-dt * F_theta / dz)
    # Fixed-gradient bottom BC on T (mirrors kpp_step; keeps the deep linear
    # profile steady against the zero-flux Laplacian's erosion).
    T_half = T_half.at[..., 0].add(-dt * params.KT0 * dTdz_bottom / dz)

    # One batched Thomas solve for all four variables: the solve is a
    # sequential scan over levels, so four separate solves cost 4x the
    # latency-bound chain (same trick as kpp_step / the split NDE solver).
    phi = jnp.stack(jnp.broadcast_arrays(U_half, V_half, T_half, e_half), axis=0)
    K4 = jnp.stack(jnp.broadcast_arrays(K_U, K_U, K_T, K_e), axis=0)
    phi = implicit_diffusion_step(phi, K4, dt, dz, backend=tridiag_backend)
    # Cast back: jnp.stack promotes mixed per-variable dtypes, which would
    # otherwise change the lax.scan carry structure in solve_tke.
    return TKEState(
        U=phi[0].astype(state.U.dtype), V=phi[1].astype(state.V.dtype),
        T=phi[2].astype(state.T.dtype), e=jnp.maximum(phi[3], params.e_min).astype(state.e.dtype),
    )


def solve_tke(state0: TKEState, t_save, params: TKEParameters, Fu, Fb, H, Nz: int, f_cor, g, alpha, n_substeps: int = 1, tridiag_backend: str = "scan", dTdz_bottom=0.0) -> TKEState:
    """Evolve a (batch of) TKE column(s); returns trajectories ``(Nt, ..., Nz)``.

    Parity: ``closure_tke_full_evolution``
    (``turbulent_kinetic_energy_closure.jl:1-60``).
    """
    dtype = state0.T.dtype
    t_save = jnp.asarray(t_save, dtype)
    n_save = t_save.shape[0] - 1
    dt = (t_save[-1] - t_save[0]) / (n_save * n_substeps)
    dz = jnp.asarray(H / Nz, dtype)

    def substep(state, _):
        return tke_step(state, dt, dz, params, Fu, Fb, f_cor, g, alpha, tridiag_backend, dTdz_bottom=dTdz_bottom), None

    def interval(state, _):
        state, _ = jax.lax.scan(substep, state, None, length=n_substeps)
        return state, state

    _, frames = jax.lax.scan(interval, state0, None, length=n_save)
    stack = lambda s0, fr: jnp.concatenate([s0[None], fr], axis=0)  # noqa: E731
    return TKEState(U=stack(state0.U, frames.U), V=stack(state0.V, frames.V), T=stack(state0.T, frames.T), e=stack(state0.e, frames.e))
