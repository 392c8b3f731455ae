"""K-Profile Parameterization (KPP) column model, batched and jitted.

The reference leans on OceanTurb.jl's ``KPP.Model`` as its classical
baseline everywhere (``src/PhysicalParameterizations/k_profile_parameterization.jl:61-119``,
``free_convection/src/k_profile_parameterization.jl:3-47``,
``wind_mixing/src/k_profile_parameterization.jl:1-78``) but OceanTurb itself
lives outside the repo, so this is a ground-up reimplementation of the same
formulation (Large, McWilliams & Doney 1994 as organized by OceanTurb /
OceanConvectionUQ), with the parameter set documented in the reference's
comment table (``k_profile_parameterization.jl:1-30``):

- **Boundary-layer depth** ``h``: shallowest depth where the bulk Richardson
  number ``Ri_b(z) = |z| * (B_sl - B(z)) / (|U_sl - U(z)|^2 + u_KE(z))``
  reaches ``CRi``, with surface-layer averages over the top ``CSL`` fraction
  and unresolved kinetic energy
  ``u_KE(z) = CKE * |z|^(4/3) * sqrt(max(0, Bz)) * max(0, Fb)^(1/3) + CKE0``.
- **Turbulent velocity scales** ``W_Phi(z)``: piecewise wind/convection
  regimes controlled by ``(Cstab, Cunst, Cn, Cm*, Cd_*, Cb_*, Ctau_b*)``.
- **Diffusivity** ``K_Phi(z) = W_Phi(z) * h * sigma (1 - sigma)^2 + K0``.
- **Nonlocal flux** ``NL = CNL * Fphi * sigma (1 - sigma)^2`` for tracers
  under destabilizing surface buoyancy flux.

Time stepping matches the reference's choice of ``stepper=:BackwardEuler``
(``k_profile_parameterization.jl:74``): diagnose ``h``/``K`` from the current
state, then take one implicit diffusion step per variable via the batched
Thomas solve, with the surface fluxes and nonlocal-flux divergence applied
explicitly. Everything is static-shape and batched over leading axes: one
jit solves thousands of KPP columns at once (the reference does one column
per 25.8 ms on CPU, ``wind_mixing/Benchmarking.jl:25``).

State convention: centers ordered bottom -> top, ``z_c[k] = (k + 1/2) dz - H``.
Sign conventions follow the LESbrary data: ``Fb > 0`` = surface cooling
(destabilizing); ``Fu`` = kinematic momentum flux at the surface.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from climateparameterizations_jl_tpu.ops.tridiagonal import implicit_diffusion_step


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KPPParameters:
    """KPP constants; defaults from the reference's table (k_profile_parameterization.jl:1-30)."""

    CSL: jnp.ndarray  # surface layer fraction
    Ctau: jnp.ndarray  # von Karman constant
    CNL: jnp.ndarray  # nonlocal flux amplitude
    Cstab: jnp.ndarray
    Cunst: jnp.ndarray
    Cn: jnp.ndarray
    Cmtau_U: jnp.ndarray
    Cmtau_T: jnp.ndarray
    Cmb_U: jnp.ndarray
    Cmb_T: jnp.ndarray
    Cd_U: jnp.ndarray
    Cd_T: jnp.ndarray
    Cb_U: jnp.ndarray
    Cb_T: jnp.ndarray
    CRi: jnp.ndarray
    CKE: jnp.ndarray
    CKE0: jnp.ndarray
    KU0: jnp.ndarray
    KT0: jnp.ndarray

    @classmethod
    def default(cls, dtype=jnp.float32, **overrides) -> "KPPParameters":
        vals = dict(
            CSL=0.1, Ctau=0.4, CNL=6.33, Cstab=2.0, Cunst=6.4,
            Cn=1.0, Cmtau_U=0.25, Cmtau_T=0.5, Cmb_U=1 / 3, Cmb_T=1 / 3,
            Cd_U=0.5, Cd_T=2.5, Cb_U=0.599, Cb_T=1.36,
            CRi=0.3, CKE=4.32, CKE0=1e-11, KU0=1e-6, KT0=1e-7,
        )
        vals.update(overrides)
        return cls(**{k: jnp.asarray(v, dtype) for k, v in vals.items()})

    def Ctau_b(self, Cb, Cd, Cm_b, Cm_tau):
        """Derived wind-stress parameter for the convective regime (table lines 20-21).

        Built so the convective branch ``Cb wb (sig + Ctau_b/d3)^Cm_b`` meets
        the wind branch EXACTLY at the regime switch ``d3 sig = Cd`` — which
        requires the matching variable's own wind exponent ``Cm_tau``
        (momentum and tracers differ).
        """
        return (self.Ctau / Cb) ** (1.0 / Cm_b) * (1.0 + self.Cunst * Cd) ** (Cm_tau / Cm_b) - Cd


class KPPForcing(NamedTuple):
    """Surface forcing + bottom gradients (may carry leading batch axes)."""

    Fu: jnp.ndarray  # surface kinematic momentum flux (u'w' at top) [m^2/s^2]
    Fb: jnp.ndarray  # surface buoyancy flux, > 0 = cooling [m^2/s^3]
    dTdz_bottom: jnp.ndarray  # bottom temperature gradient [K/m]


def _pow_nonneg(x, p, tiny=1e-30):
    """``max(0, x)**p`` (fractional ``p``) with finite gradients at/below zero.

    Fractional powers have an infinite derivative at 0 and are NaN below it;
    ``jnp.maximum``'s select-based VJP passes that through at the tie, and
    the unselected branch of an outer ``jnp.where`` turns it into
    ``0 * inf = NaN`` (the same class as the d3-floor note in
    ``turbulent_velocity_scales``). Clamp INSIDE the power, select OUTSIDE —
    the primal is unchanged (exactly 0 at and below 0; ``p = 0.5`` keeps the
    dedicated sqrt op so values match the pre-guard code bit-for-bit — the
    generic ``x**0.5`` differs by ULPs, enough to flip the discrete
    boundary-layer-depth crossing cell in f32).
    """
    xs = jnp.maximum(x, tiny)
    safe = jnp.sqrt(xs) if isinstance(p, float) and p == 0.5 else xs**p
    return jnp.where(x > tiny, safe, 0.0)


def _shape_fn(sigma):
    """K-profile shape ``sigma (1 - sigma)^2`` clipped to [0, 1]."""
    s = jnp.clip(sigma, 0.0, 1.0)
    return s * (1.0 - s) ** 2


def _surface_layer_weights(zc, CSL):
    """Per-candidate surface-layer averaging weights ``(Nz_cand, Nz_cell)``.

    Candidate boundary-layer bottom ``k`` (at center depth ``d_k = -zc_k``)
    averages over the top ``CSL * d_k`` of the column; weight of cell ``j``
    is its overlap with ``[-CSL d_k, 0]`` (OceanTurb integrates the same
    fraction on its grid). Static shapes: one precomputed matrix, the
    average is a single matmul for all candidates.
    """
    dz = zc[1] - zc[0]
    z_top = zc + 0.5 * dz
    z_bot = zc - 0.5 * dz
    thick = CSL * (-zc)  # (Nz_cand,)
    overlap = jnp.maximum(
        0.0,
        jnp.minimum(z_top[None, :], 0.0) - jnp.maximum(z_bot[None, :], -thick[:, None]),
    )
    W = overlap / jnp.maximum(overlap.sum(axis=-1, keepdims=True), 1e-30)
    return W


def _surface_layer_anomaly(phi, W):
    """``mean_sl(phi) - phi`` in difference form: ``sum_j W_kj (phi_j - phi_k)``.

    Algebraically equal to ``phi @ W.T - phi`` (rows of ``W`` sum to 1) but
    without the catastrophic cancellation: the direct form subtracts two
    O(phi) numbers whose difference, in a well-mixed layer, is pure rounding
    noise — which the tiny uKE floor (``CKE0 = 1e-11``) then amplifies
    ~1e10x in the bulk-Ri ratio, enough to flip the discrete h-crossing
    cell between COMPILATIONS of the same program (measured: jitted vs
    eager ``kpp_step`` differed by ~1e-2 K per step in f32). Differencing
    first keeps the anomaly exactly 0 where the profile is uniform.
    """
    diff = phi[..., None, :] - phi[..., :, None]  # (..., cand k, cell j)
    # Elementwise multiply + reduce (not einsum/dot_general): a contraction
    # lowers differently under vmap than unbatched, and the solve's discrete
    # h-crossing amplifies even that ULP-level difference to ~1e-4 relative
    # loss between a scalar and a vmapped calibration evaluation.
    return (W * diff).sum(axis=-1)


def bulk_richardson_number(U, V, B, zc, params: KPPParameters, Fb):
    """``Ri_b`` at each cell center (candidate boundary-layer bottoms)."""
    dz = zc[1] - zc[0]
    W_sl = _surface_layer_weights(zc, params.CSL)

    depth = -zc  # positive depth of each center
    dB = _surface_layer_anomaly(B, W_sl)
    dU2 = _surface_layer_anomaly(U, W_sl) ** 2 + _surface_layer_anomaly(V, W_sl) ** 2

    # Unresolved kinetic energy (OceanTurb form). Both fractional powers
    # need the safe form: Bz = 0 in mixed layers and Fb = 0 under pure wind
    # are COMMON states, and the bare sqrt/cbrt have infinite gradients there.
    Bz = jnp.gradient(B, dz, axis=-1)
    uKE = (
        params.CKE
        * depth ** (4.0 / 3.0)
        * _pow_nonneg(Bz, 0.5)
        * _pow_nonneg(Fb, 1.0 / 3.0)[..., None]
        + params.CKE0
    )
    return depth * dB / (dU2 + uKE + 1e-30)


def boundary_layer_depth(U, V, B, zc, params: KPPParameters, Fb, H):
    """Shallowest depth where ``Ri_b`` crosses ``CRi`` (linear interpolation).

    Static-shape: scan the profile top-down with masked selects, no
    data-dependent control flow.
    """
    Rib = bulk_richardson_number(U, V, B, zc, params, Fb)
    depth = -zc  # increasing toward the bottom index 0... zc ordered bottom->top
    # Work top-down: reverse so index 0 is the surface.
    Rib_td = Rib[..., ::-1]
    depth_td = depth[::-1]
    crossed = Rib_td > params.CRi
    # First crossing index (argmax of the boolean); if none, h = H.
    any_crossing = jnp.any(crossed, axis=-1)
    idx = jnp.argmax(crossed, axis=-1)
    idx_prev = jnp.maximum(idx - 1, 0)

    take = lambda a, i: jnp.take_along_axis(a, i[..., None], axis=-1)[..., 0]  # noqa: E731
    Ri1 = take(Rib_td, idx_prev)
    Ri2 = take(Rib_td, idx)
    d1 = depth_td[idx_prev]
    d2 = depth_td[idx]
    frac = jnp.clip((params.CRi - Ri1) / (Ri2 - Ri1 + 1e-30), 0.0, 1.0)
    h_cross = d1 + frac * (d2 - d1)
    h = jnp.where(any_crossing, h_cross, H)
    return jnp.clip(h, depth_td[0], H)


def turbulent_velocity_scales(h, params: KPPParameters, Fu, Fb, sigma):
    """``(W_U, W_T)`` at each face given boundary-layer depth ``h``.

    Piecewise stable / wind-dominated / convection-dominated regimes
    (OceanTurb KPP formulation; constants from the reference table).
    """
    ustar = _pow_nonneg(jnp.abs(Fu), 0.5)  # sqrt has an infinite gradient at Fu = 0
    wb = _pow_nonneg(Fb * h, 1.0 / 3.0)  # convective velocity
    eps = 1e-30
    # Regime ratio d = (wb / ustar)^3. The denominator floor must keep d3
    # FINITE in f32 for physical wb (a 1e-30 floor overflowed to inf at
    # ustar = 0, and the wind branch's 0 * inf = NaN then poisons any
    # gradient through the jnp.where even though the primal selects conv).
    d3 = (wb / jnp.maximum(ustar, 1e-10)) ** 3

    # Depth fraction: under DESTABILIZING forcing LMD94 caps the evaluation
    # depth at the surface-layer fraction; under stable forcing the full
    # sigma is used (no cap).
    sig = jnp.minimum(sigma, params.CSL)
    sig_stable = jnp.clip(sigma, 0.0, 1.0)

    def scale(Cm_tau, Cm_b, Cd, Cb):
        Ctau_b = params.Ctau_b(Cb, Cd, Cm_b, Cm_tau)
        wind = params.Ctau * ustar * (1.0 + params.Cunst * d3 * sig) ** Cm_tau
        # Additive form: exactly continuous with the wind branch at
        # d3 * sig = Cd (see Ctau_b). The base is strictly positive wherever
        # this branch is SELECTED (d3 sig >= Cd implies base >= (Cd + Ctau_b)/d3
        # with Cd + Ctau_b > 0 for the reference constants) but goes NEGATIVE
        # in the unselected region (Ctau_b < 0 for tracers), where the bare
        # fractional power is NaN and poisons gradients through the where.
        conv = Cb * wb * _pow_nonneg(sig + Ctau_b / (d3 + eps), Cm_b)
        unstable = jnp.where(d3 * sig < Cd, wind, conv)
        # Stable branch: buoyancy flux < 0 (heating) damps turbulence.
        rb = jnp.abs(Fb) * h / (ustar**3 + eps)
        stable = params.Ctau * ustar / (1.0 + params.Cstab * rb * sig_stable) ** params.Cn
        return jnp.where(Fb > 0.0, unstable, stable)

    W_U = scale(params.Cmtau_U, params.Cmb_U, params.Cd_U, params.Cb_U)
    W_T = scale(params.Cmtau_T, params.Cmb_T, params.Cd_T, params.Cb_T)
    return W_U, W_T


def kpp_diffusivities(U, V, T, zf, zc, params: KPPParameters, forcing: KPPForcing, g, alpha, H):
    """Face diffusivities ``(K_U, K_T)`` + nonlocal tracer flux + ``h``."""
    B = g * alpha * T
    Fb = forcing.Fb
    h = boundary_layer_depth(U, V, B, zc, params, Fb, H)  # (...,)

    depth_f = -zf  # (Nz+1,), 0 at the top face
    sigma = depth_f / (h[..., None] + 1e-30)  # (..., Nz+1)
    W_U, W_T = turbulent_velocity_scales(h[..., None], params, forcing.Fu[..., None], Fb[..., None], sigma)

    shape = _shape_fn(sigma)
    in_layer = (sigma > 0.0) & (sigma < 1.0)
    K_U = jnp.where(in_layer, W_U * h[..., None] * shape, 0.0) + params.KU0
    K_T = jnp.where(in_layer, W_T * h[..., None] * shape, 0.0) + params.KT0

    # Nonlocal heat flux (unstable forcing only): NL = CNL * F_theta * shape.
    F_theta = Fb / (g * alpha)
    NL = jnp.where(Fb[..., None] > 0.0, params.CNL * F_theta[..., None] * shape, 0.0)

    # No flux through the boundaries in the implicit solve. 1-D mask, not a
    # scatter on the batched array: single-index scatters mis-partition on
    # GSPMD-sharded batches (CLAUDE.md; same idiom as implicit_diffusion_step).
    mask = jnp.ones(sigma.shape[-1], sigma.dtype).at[0].set(0.0).at[-1].set(0.0)
    return K_U * mask, K_T * mask, NL * mask, h


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class KPPState:
    U: jnp.ndarray
    V: jnp.ndarray
    T: jnp.ndarray


def kpp_diagnostic_fluxes(U, V, T, zf, zc, params: KPPParameters, forcing: KPPForcing, g, alpha, H, Nz: int):
    """Diagnostic face fluxes ``(uw, vw, wT)`` for saved KPP profiles.

    Downgradient ``-K dphi/dz`` plus the nonlocal heat flux, with the
    prescribed surface fluxes on the top faces — the ``UW, VW, WT`` outputs
    of the reference's KPP column (``wind_mixing/src/k_profile_parameterization.jl:1-78``,
    OceanTurb flux diagnostics). Batches over leading axes (e.g. a whole
    saved trajectory at once).
    """
    from climateparameterizations_jl_tpu.core.operators import d_center_to_face

    dz = H / Nz
    K_U, K_T, NL, _h = kpp_diffusivities(U, V, T, zf, zc, params, forcing, g, alpha, H)
    ddz = lambda phi: d_center_to_face(phi, dz)  # noqa: E731 — shared operator, zero boundary faces

    uw = -K_U * ddz(U)
    vw = -K_U * ddz(V)
    wT = -K_T * ddz(T) + NL
    F_theta = forcing.Fb / (g * alpha)
    uw = uw.at[..., -1].set(jnp.broadcast_to(forcing.Fu, uw[..., -1].shape))
    wT = wT.at[..., -1].set(jnp.broadcast_to(F_theta, wT[..., -1].shape))
    # Fixed-gradient bottom BC: the upward flux -KT0 * dTdz that kpp_step
    # applies to cell 0 (heat exits through the bottom face).
    wT_bot = -params.KT0 * forcing.dTdz_bottom
    wT = wT.at[..., 0].set(jnp.broadcast_to(wT_bot, wT[..., 0].shape))
    return uw, vw, wT


def kpp_step(state: KPPState, dt, dz, zf, zc, params: KPPParameters, forcing: KPPForcing, f_cor, g, alpha, H, tridiag_backend: str = "scan") -> KPPState:
    """One backward-Euler KPP step (diagnose -> explicit forcings -> implicit diffusion)."""
    U, V, T = state.U, state.V, state.T
    K_U, K_T, NL, _h = kpp_diffusivities(U, V, T, zf, zc, params, forcing, g, alpha, H)

    # Explicit: Coriolis rotation + surface fluxes + bottom gradient + nonlocal flux div.
    # Forward-backward Coriolis (V uses the already-updated U): neutrally
    # stable for inertial oscillations, where plain forward Euler amplifies
    # by sqrt(1 + (f dt)^2) per step (see embed/double_gyre.py).
    U_half = U + dt * f_cor * V
    V_half = V - dt * f_cor * U_half
    T_half = T

    # Surface fluxes enter the top cell: dphi/dt = -dF/dz => -F_top/dz.
    U_half = U_half.at[..., -1].add(-dt * forcing.Fu / dz)
    F_theta = forcing.Fb / (g * alpha)
    T_half = T_half.at[..., -1].add(-dt * F_theta / dz)
    # Fixed-gradient bottom BC on T: upward flux -K*dTdz exits the bottom
    # face (keeps the deep linear profile steady against the zero-flux
    # Laplacian's erosion; Oceananigans GradientBoundaryCondition semantics).
    T_half = T_half.at[..., 0].add(-dt * params.KT0 * forcing.dTdz_bottom / dz)

    # Nonlocal flux divergence (faces -> centers).
    dNL = (NL[..., 1:] - NL[..., :-1]) / dz
    T_half = T_half - dt * dNL

    # Implicit vertical diffusion with the diagnosed K profiles — ONE
    # batched Thomas solve for all three variables (the solve is a
    # sequential scan over levels, so 3 separate solves cost 3x the
    # latency-bound chain; stacking them is ~1.6x faster per KPP step).
    phi = jnp.stack(jnp.broadcast_arrays(U_half, V_half, T_half), axis=0)
    K3 = jnp.stack(jnp.broadcast_arrays(K_U, K_U, K_T), axis=0)
    phi = implicit_diffusion_step(phi, K3, dt, dz, backend=tridiag_backend)
    # Cast back: jnp.stack promotes mixed per-variable dtypes, which would
    # otherwise change the lax.scan carry structure in solve_kpp.
    return KPPState(U=phi[0].astype(U.dtype), V=phi[1].astype(V.dtype), T=phi[2].astype(T.dtype))


def solve_kpp(
    state0: KPPState,
    t_save,
    params: KPPParameters,
    forcing: KPPForcing,
    H,
    Nz: int,
    f_cor,
    g,
    alpha,
    n_substeps: int = 1,
    tridiag_backend: str = "scan",
    diurnal: bool = False,
):
    """Evolve a (batch of) KPP column(s), saving at ``t_save`` (uniform).

    Parity: ``closure_kpp_full_evolution`` (``k_profile_parameterization.jl:61-119``)
    and ``free_convection_kpp`` (``free_convection/src/k_profile_parameterization.jl:3-47``),
    returning (U, V, T) trajectories of shape ``(Nt, ..., Nz)``.

    ``diurnal=True``: ``forcing.Fb`` is the AMPLITUDE of a sinusoidal daily
    surface buoyancy-flux cycle ``Fb(t) = Fb sin(2 pi t / day)`` — the
    reference's time-varying top wT BC for diurnal simulations
    (``wind_mixing/src/k_profile_parameterization.jl:55-57``).
    """
    dtype = state0.T.dtype
    t_save = jnp.asarray(t_save, dtype)
    n_save = t_save.shape[0] - 1
    dt = (t_save[-1] - t_save[0]) / (n_save * n_substeps)
    dz = jnp.asarray(H / Nz, dtype)
    zc = (jnp.arange(Nz, dtype=dtype) + 0.5) * dz - H
    zf = jnp.arange(Nz + 1, dtype=dtype) * dz - H
    t0 = t_save[0]

    def substep(state, i):
        if diurnal:
            t = t0 + i.astype(dtype) * dt
            from climateparameterizations_jl_tpu.core.constants import diurnal_cycle

            forcing_t = KPPForcing(
                Fu=forcing.Fu, Fb=forcing.Fb * diurnal_cycle(t),
                dTdz_bottom=forcing.dTdz_bottom,
            )
        else:
            forcing_t = forcing
        return kpp_step(state, dt, dz, zf, zc, params, forcing_t, f_cor, g, alpha, H, tridiag_backend), None

    def interval(state, k):
        state, _ = jax.lax.scan(substep, state, k * n_substeps + jnp.arange(n_substeps))
        return state, state

    _, frames = jax.lax.scan(interval, state0, jnp.arange(n_save))
    stack = lambda s0, fr: jnp.concatenate([s0[None], fr], axis=0)  # noqa: E731
    return KPPState(U=stack(state0.U, frames.U), V=stack(state0.V, frames.V), T=stack(state0.T, frames.T))
