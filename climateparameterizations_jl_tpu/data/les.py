"""TPU-native 3-D large-eddy simulation for training-data generation.

Parity target: the reference generates its training profiles with a 256^3
Oceananigans LES on GPU ("a few hours ... on a good GPU",
``free_convection/README.md:7``; driver ``wind_mixing/wind_mixing.jl:1-143``:
wind stress + surface buoyancy flux, AMD SGS closure, horizontally-averaged
``AveragedField`` output). This module is that data generator rebuilt for
TPU:

- **Staggered MAC grid**, periodic in x/y, rigid lid / flat bottom in z.
  Arrays are ``(Ny, Nx, Nz)`` with z last (the framework's column axis), so
  every per-column op broadcasts unchanged.
- **Pressure projection** via rfft2 over the periodic horizontals + ONE
  batched Thomas tridiagonal solve in z over all (ky, kx) modes — the exact
  discrete inverse of the MAC divergence∘gradient, reusing
  ``ops.tridiagonal`` (the eigenvalues ``(2 cos(2 pi m / N) - 2)/dx^2`` make
  FFT + tridiag compatible with the centered stencils to machine precision).
  FFTs and the batched recurrence are both native TPU citizens; there is no
  per-mode loop.
- **Smagorinsky SGS closure** (nu_e = (Cs * Delta)^2 |S|) + constant
  molecular floor; diffusion is applied as nu * Laplacian with nu
  interpolated to each field's location (non-conservative form — adequate
  for a data generator; the resolved dynamics dominate).
- **Forcing** exactly like the LESbrary setups: kinematic surface momentum
  flux ``Qu`` (negative = eastward stress), surface buoyancy flux ``Qb``
  (positive = cooling, theta flux ``Qb / (alpha g)``), fixed bottom
  temperature gradient.
- **Output**: horizontally-averaged ``(U, V, T)`` profiles and resolved
  covariance fluxes ``u'w', v'w', w'T'`` on z-faces, packaged as a
  :class:`~climateparameterizations_jl_tpu.data.containers.ColumnTimeSeries`
  — a drop-in replacement for the LESbrary reader / synthetic stand-ins
  anywhere in the framework.

The whole run is one ``lax.scan`` of fused steps; a 64^3 box runs in
seconds on a chip. Signs follow the host column model
(``embed/column_model.py``): flux Q into the top cell as ``-Q/dz``.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from climateparameterizations_jl_tpu.data.containers import ColumnTimeSeries
from climateparameterizations_jl_tpu.ops.tridiagonal import tridiagonal_solve


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LESConfig:
    """Box geometry, physics constants, forcing, and SGS settings."""

    Lx: jnp.ndarray
    Ly: jnp.ndarray
    H: jnp.ndarray
    Qu: jnp.ndarray  # kinematic surface momentum flux [m^2/s^2]
    Qb: jnp.ndarray  # surface buoyancy flux [m^3/s^3 / m = m^2/s^3]
    f: jnp.ndarray
    g: jnp.ndarray
    alpha: jnp.ndarray
    dTdz: jnp.ndarray  # initial + bottom-BC temperature gradient [K/m]
    T_surface: jnp.ndarray
    nu: jnp.ndarray  # constant viscosity floor [m^2/s]
    Cs: jnp.ndarray  # Smagorinsky constant
    Pr_t: jnp.ndarray  # turbulent Prandtl number
    Nx: int = dataclasses.field(metadata=dict(static=True), default=32)
    Ny: int = dataclasses.field(metadata=dict(static=True), default=32)
    Nz: int = dataclasses.field(metadata=dict(static=True), default=32)
    # Diurnal surface heat flux: theta_top * sin(2 pi t / day) (parity:
    # ``diurnal_fluxes``, ``wind_mixing/src/data_containers.jl:131-156``).
    diurnal: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # Tracer advection: "weno5" (the reference LES uses WENO5,
    # wind_mixing/wind_mixing.jl:1-143) or "centered" (2nd-order A/B).
    advection: str = dataclasses.field(metadata=dict(static=True), default="weno5")
    # Momentum advection: "centered" (2nd-order flux form, energy-
    # conserving — the measured default: see the A/B note in RESULTS.md;
    # the Smagorinsky SGS supplies the dissipation WENO's upwinding would
    # add on top) or "weno5" (the reference's model-wide scheme).
    momentum_advection: str = dataclasses.field(metadata=dict(static=True), default="centered")

    @classmethod
    def default(cls, Nx=32, Ny=32, Nz=32, Qu=-5e-4, Qb=3e-8, dtype=jnp.float32, **overrides):
        d = lambda x: jnp.asarray(x, dtype)  # noqa: E731
        kw = dict(
            Lx=d(512.0), Ly=d(512.0), H=d(256.0), Qu=d(Qu), Qb=d(Qb),
            f=d(1e-4), g=d(9.80665), alpha=d(2e-4), dTdz=d(0.01),
            T_surface=d(19.0), nu=d(1e-5), Cs=d(0.17), Pr_t=d(1.0),
            Nx=Nx, Ny=Ny, Nz=Nz,
        )
        kw.update(overrides)
        return cls(**kw)

    @property
    def dx(self):
        return self.Lx / self.Nx

    @property
    def dy(self):
        return self.Ly / self.Ny

    @property
    def dz(self):
        return self.H / self.Nz

    @property
    def theta_top(self):
        return self.Qb / (self.alpha * self.g)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LESState:
    """MAC-staggered prognostic fields.

    ``u`` (Ny, Nx, Nz) at x-faces; ``v`` at y-faces; ``w`` (Ny, Nx, Nz+1) at
    z-faces (``w[..., 0] = w[..., -1] = 0``); ``T`` at centers.
    """

    u: jnp.ndarray
    v: jnp.ndarray
    w: jnp.ndarray
    T: jnp.ndarray


def initial_state(config: LESConfig, key=None, noise: float = 1e-3) -> LESState:
    """Linearly stratified rest state + small near-surface T noise."""
    key = key if key is not None else jax.random.PRNGKey(0)
    dtype = config.H.dtype
    Ny, Nx, Nz = config.Ny, config.Nx, config.Nz
    zc = (jnp.arange(Nz, dtype=dtype) + 0.5) * config.dz - config.H
    T = config.T_surface + config.dTdz * zc  # T(z=0-) = T_surface
    T = jnp.broadcast_to(T, (Ny, Nx, Nz))
    # Seed turbulence in the top quarter of the domain.
    mask = (zc > -0.25 * config.H).astype(dtype)
    T = T + noise * mask * jax.random.normal(key, (Ny, Nx, Nz), dtype)
    zeros = jnp.zeros((Ny, Nx, Nz), dtype)
    return LESState(u=zeros, v=zeros, w=jnp.zeros((Ny, Nx, Nz + 1), dtype), T=T)


# ---------------------------------------------------------------------------
# stencils (periodic x: axis 1, periodic y: axis 0, bounded z: axis 2)
# ---------------------------------------------------------------------------


def _xm(a):
    return jnp.roll(a, 1, axis=1)


def _xp(a):
    return jnp.roll(a, -1, axis=1)


def _ym(a):
    return jnp.roll(a, 1, axis=0)


def _yp(a):
    return jnp.roll(a, -1, axis=0)


def _divergence(config: LESConfig, u, v, w):
    """MAC divergence at centers."""
    return (
        (_xp(u) - u) / config.dx
        + (_yp(v) - v) / config.dy
        + (w[..., 1:] - w[..., :-1]) / config.dz
    )


def _lap_xy(q, dx, dy):
    return (_xp(q) - 2 * q + _xm(q)) / dx**2 + (_yp(q) - 2 * q + _ym(q)) / dy**2


def _lap_z_neumann(q, dz):
    """d2/dz2 with zero-gradient (zero-flux) top/bottom."""
    qp = jnp.concatenate([q[..., :1], q, q[..., -1:]], axis=-1)
    return (qp[..., 2:] - 2 * q + qp[..., :-2]) / dz**2


def _smagorinsky_nu(config: LESConfig, u, v, w):
    """Eddy viscosity at cell centers from the resolved strain rate."""
    dx, dy, dz = config.dx, config.dy, config.dz
    uc = 0.5 * (u + _xp(u))
    vc = 0.5 * (v + _yp(v))
    wc = 0.5 * (w[..., :-1] + w[..., 1:])

    def ddz_c(q):  # centered d/dz of a center field, one-sided at ends
        qp = jnp.concatenate([q[..., :1], q, q[..., -1:]], axis=-1)
        return (qp[..., 2:] - qp[..., :-2]) / (2 * dz)

    S11 = (_xp(uc) - _xm(uc)) / (2 * dx)
    S22 = (_yp(vc) - _ym(vc)) / (2 * dy)
    S33 = ddz_c(wc)
    S12 = 0.5 * ((_yp(uc) - _ym(uc)) / (2 * dy) + (_xp(vc) - _xm(vc)) / (2 * dx))
    S13 = 0.5 * (ddz_c(uc) + (_xp(wc) - _xm(wc)) / (2 * dx))
    S23 = 0.5 * (ddz_c(vc) + (_yp(wc) - _ym(wc)) / (2 * dy))
    S2 = S11**2 + S22**2 + S33**2 + 2 * (S12**2 + S13**2 + S23**2)
    delta = (dx * dy * dz) ** (1.0 / 3.0)
    return (config.Cs * delta) ** 2 * jnp.sqrt(2 * S2)


def _poisson_solve(config: LESConfig, rhs):
    """Invert the discrete MAC Laplacian (periodic x/y, Neumann z).

    rfft2 over (y, x) -> one batched complex Thomas solve over all modes ->
    irfft2. Exact inverse of ``div(grad(.))`` on this grid.
    """
    Ny, Nx, Nz = config.Ny, config.Nx, config.Nz
    dx, dy, dz = config.dx, config.dy, config.dz
    dtype = rhs.dtype

    rhat = jnp.fft.rfft2(rhs, axes=(0, 1))  # (Ny, Nx//2+1, Nz) complex

    ky = jnp.arange(Ny)
    kx = jnp.arange(Nx // 2 + 1)
    lam_y = (2.0 * jnp.cos(2.0 * jnp.pi * ky / Ny) - 2.0) / dy**2
    lam_x = (2.0 * jnp.cos(2.0 * jnp.pi * kx / Nx) - 2.0) / dx**2
    lam = lam_y[:, None] + lam_x[None, :]  # (Ny, Nxr)

    inv_dz2 = 1.0 / dz**2
    ones = jnp.ones((Ny, Nx // 2 + 1, Nz), dtype)
    dl = inv_dz2 * ones.at[..., 0].set(0.0)
    du = inv_dz2 * ones.at[..., -1].set(0.0)
    d = (-2.0 * inv_dz2 + lam[..., None]) * ones
    # Neumann ends: ghost reflection removes one off-diagonal coupling.
    d = d.at[..., 0].add(inv_dz2)
    d = d.at[..., -1].add(inv_dz2)

    # The (0, 0) mode is Neumann-singular (solvable up to a constant because
    # boundary w* = 0): pin phat(0,0,0) = 0. Expressed as elementwise
    # `where` masks, NOT `.at[0,0,0].set`: a single-index scatter on an
    # array sharded over y is mis-partitioned by GSPMD (applied per shard),
    # while broadcasted-iota selects shard exactly (parallel/les_sharding).
    iy = jnp.arange(Ny)[:, None, None]
    ix = jnp.arange(Nx // 2 + 1)[None, :, None]
    iz = jnp.arange(Nz)[None, None, :]
    m000 = (iy == 0) & (ix == 0) & (iz == 0)
    m001 = (iy == 0) & (ix == 0) & (iz == 1)
    d = jnp.where(m000, 1.0, d)
    du = jnp.where(m000, 0.0, du)
    dl = jnp.where(m001, 0.0, dl)
    rhat = jnp.where(m000, 0.0, rhat)

    phat = tridiagonal_solve(dl + 0j, d + 0j, du + 0j, rhat)
    return jnp.fft.irfft2(phat, s=(Ny, Nx), axes=(0, 1)).astype(dtype)


def surface_theta_flux(config: LESConfig, t):
    """Instantaneous surface heat flux (diurnal cycle when configured)."""
    if config.diurnal:
        from climateparameterizations_jl_tpu.core.constants import diurnal_cycle

        return config.theta_top * diurnal_cycle(t)
    return config.theta_top


def _tendencies(config: LESConfig, state: LESState, t, coriolis: bool = True):
    """(du/dt, dv/dt, dw_int/dt, dT/dt) before the pressure projection.

    ``coriolis=False`` omits the rotation terms — the forward-Euler path
    applies them forward-backward in :func:`_advance` instead (simultaneous
    explicit rotation amplifies inertial energy ~(1 + (f dt)^2)^(1/2) per
    step, the repo-wide Coriolis rule; RK3 keeps them in-tendency, its
    stability region covers the imaginary axis portion needed).
    """
    c = config
    dx, dy, dz = c.dx, c.dy, c.dz
    u, v, w, T = state.u, state.v, state.w, state.T

    nu_e = _smagorinsky_nu(c, u, v, w)
    nu_c = c.nu + nu_e  # at centers
    kap_c = c.nu + nu_e / c.Pr_t

    # --- interpolations ---------------------------------------------------
    w_zc = 0.5 * (w[..., :-1] + w[..., 1:])  # w at centers
    uc = 0.5 * (u + _xp(u))  # u at centers
    vc = 0.5 * (v + _yp(v))  # v at centers

    def zface_of_center(q):  # interior z-faces 1..Nz-1
        return 0.5 * (q[..., :-1] + q[..., 1:])

    # --- temperature ------------------------------------------------------
    if c.advection == "weno5":
        from climateparameterizations_jl_tpu.core.advection import weno5_advective_flux

        FTx = weno5_advective_flux(u, T, axis=1, boundary="periodic")
        FTy = weno5_advective_flux(v, T, axis=0, boundary="periodic")
        FTz_int = weno5_advective_flux(w[..., 1:-1], T, axis=2, boundary="edge")
    elif c.advection == "centered":
        FTx = u * 0.5 * (T + _xm(T))
        FTy = v * 0.5 * (T + _ym(T))
        FTz_int = w[..., 1:-1] * zface_of_center(T)
    else:
        # A typo'd scheme name silently running centered advection would
        # corrupt WENO A/Bs and generated training data; fail at trace time.
        raise ValueError(f"unknown advection scheme {c.advection!r} (expected 'weno5' or 'centered')")
    zeros_f = jnp.zeros_like(w[..., :1])
    FTz = jnp.concatenate([zeros_f, FTz_int, zeros_f], axis=-1)
    adv_T = (_xp(FTx) - FTx) / dx + (_yp(FTy) - FTy) / dy + (FTz[..., 1:] - FTz[..., :-1]) / dz
    dTdt = -adv_T + kap_c * (_lap_xy(T, dx, dy) + _lap_z_neumann(T, dz))
    # Surface heat flux into the top cell; fixed-gradient bottom BC: upward
    # flux -kappa*dTdz exits the bottom face, cancelling the zero-flux
    # Laplacian's erosion of cell 0 so the deep stratification holds.
    dTdt = dTdt.at[..., -1].add(-surface_theta_flux(c, t) / dz)
    dTdt = dTdt.at[..., 0].add(-kap_c[..., 0] * c.dTdz / dz)

    # --- u momentum (x-faces) ----------------------------------------------
    u_corner = 0.5 * (u + _ym(u))  # (x-face, y-face)
    v_corner = 0.5 * (v + _xm(v))
    u_zf = zface_of_center(u)  # interior z-faces
    w_xf = 0.5 * (w + _xm(w))  # (x-face, z-faces)
    if c.momentum_advection == "weno5":
        from climateparameterizations_jl_tpu.core.advection import weno5_advective_flux

        # Periodic face k sits between cells k-1 and k; for u advected
        # along x those "cells" are u-points, so face k is T-center k-1
        # and its advecting velocity is uc[k-1] — hence the _xm/_xp pair.
        Fuu = _xp(weno5_advective_flux(_xm(uc), u, axis=1, boundary="periodic"))  # centers
        Fuv = weno5_advective_flux(v_corner, u, axis=0, boundary="periodic")  # corners
        Fuw_int = weno5_advective_flux(w_xf[..., 1:-1], u, axis=2, boundary="edge")
    elif c.momentum_advection == "centered":
        Fuu = uc * uc  # centers
        Fuv = u_corner * v_corner
        Fuw_int = u_zf * w_xf[..., 1:-1]
    else:
        raise ValueError(
            f"unknown momentum advection scheme {c.momentum_advection!r} (expected 'weno5' or 'centered')"
        )
    Fuw = jnp.concatenate([zeros_f, Fuw_int, zeros_f], axis=-1)
    adv_u = (Fuu - _xm(Fuu)) / dx + (_yp(Fuv) - Fuv) / dy + (Fuw[..., 1:] - Fuw[..., :-1]) / dz
    v_at_u = 0.5 * (v_corner + _yp(v_corner))
    nu_u = 0.5 * (nu_c + _xm(nu_c))
    f_u = c.f if coriolis else jnp.zeros_like(c.f)
    dudt = -adv_u + f_u * v_at_u + nu_u * (_lap_xy(u, dx, dy) + _lap_z_neumann(u, dz))
    dudt = dudt.at[..., -1].add(-c.Qu / dz)

    # --- v momentum (y-faces) ----------------------------------------------
    v_zf = zface_of_center(v)
    w_yf = 0.5 * (w + _ym(w))
    if c.momentum_advection == "weno5":
        Fvv = _yp(weno5_advective_flux(_ym(vc), v, axis=0, boundary="periodic"))
        # Unlike the centered scheme, the corner flux is direction-specific
        # (upwinds v along x), so Fuv is not reused.
        Fvu = weno5_advective_flux(u_corner, v, axis=1, boundary="periodic")
        Fvw_int = weno5_advective_flux(w_yf[..., 1:-1], v, axis=2, boundary="edge")
    else:
        Fvv = vc * vc
        Fvu = Fuv  # same corner product
        Fvw_int = v_zf * w_yf[..., 1:-1]
    Fvw = jnp.concatenate([zeros_f, Fvw_int, zeros_f], axis=-1)
    adv_v = (_xp(Fvu) - Fvu) / dx + (Fvv - _ym(Fvv)) / dy + (Fvw[..., 1:] - Fvw[..., :-1]) / dz
    u_at_v = 0.5 * (u_corner + _xp(u_corner))
    nu_v = 0.5 * (nu_c + _ym(nu_c))
    dvdt = -adv_v - f_u * u_at_v + nu_v * (_lap_xy(v, dx, dy) + _lap_z_neumann(v, dz))

    # --- w momentum (interior z-faces) --------------------------------------
    if c.momentum_advection == "weno5":
        Fww = weno5_advective_flux(w_zc, w, axis=2, boundary="edge")  # centers
        Fwu = weno5_advective_flux(u_zf, w[..., 1:-1], axis=1, boundary="periodic")
        Fwv = weno5_advective_flux(v_zf, w[..., 1:-1], axis=0, boundary="periodic")
    else:
        Fww = w_zc * w_zc  # centers
        Fwu = u_zf * w_xf[..., 1:-1]  # (x-face, interior z-face)
        Fwv = v_zf * w_yf[..., 1:-1]
    adv_w = (
        (_xp(Fwu) - Fwu) / dx
        + (_yp(Fwv) - Fwv) / dy
        + (Fww[..., 1:] - Fww[..., :-1]) / dz
    )
    T_zf = zface_of_center(T)
    b = c.g * c.alpha * (T_zf - c.T_surface)
    nu_w = zface_of_center(nu_c)
    w_int = w[..., 1:-1]
    lap_w = (
        _lap_xy(w_int, dx, dy)
        + (w[..., 2:] - 2 * w_int + w[..., :-2]) / dz**2
    )
    dwdt = -adv_w + b + nu_w * lap_w
    return dudt, dvdt, dwdt, dTdt


def _project(config: LESConfig, u_star, v_star, w_star, dt):
    """Pressure projection: make (u, v, w) discretely divergence-free."""
    c = config
    div = _divergence(c, u_star, v_star, w_star)
    phi = _poisson_solve(c, div / dt)
    u = u_star - dt * (phi - _xm(phi)) / c.dx
    v = v_star - dt * (phi - _ym(phi)) / c.dy
    w = w_star.at[..., 1:-1].add(-dt * (phi[..., 1:] - phi[..., :-1]) / c.dz)
    return u, v, w


def _advance(config: LESConfig, state: LESState, dt, t, fb_coriolis: bool = False) -> LESState:
    """Tendencies -> predictor -> projection, over a (sub)step of size dt."""
    dudt, dvdt, dwdt, dTdt = _tendencies(config, state, t, coriolis=not fb_coriolis)
    u_star = state.u + dt * dudt
    v_star = state.v + dt * dvdt
    if fb_coriolis:
        # Forward-backward rotation: v sees the already-rotated u (neutral
        # for inertial oscillations; see models/wind_mixing + double_gyre).
        c = config
        v_corner = 0.5 * (v_star + _xm(v_star))
        u_star = u_star + dt * c.f * 0.5 * (v_corner + _yp(v_corner))
        u_corner = 0.5 * (u_star + _ym(u_star))
        v_star = v_star - dt * c.f * 0.5 * (u_corner + _xp(u_corner))
    w_star = state.w.at[..., 1:-1].add(dt * dwdt)
    u, v, w = _project(config, u_star, v_star, w_star, dt)
    return LESState(u=u, v=v, w=w, T=state.T + dt * dTdt)


def les_step(config: LESConfig, state: LESState, dt, method: str = "euler", t=0.0) -> LESState:
    """One LES step at simulation time ``t`` (used by the diurnal forcing).

    ``method``:
      - ``"euler"``: forward Euler + projection — cheapest per step; relies
        on SGS dissipation for advective stability (fine at CFL ~< 0.2).
      - ``"rk3"``: 3-stage SSP Runge-Kutta (Shu-Osher), projection after
        every stage — stable for centered advection, allowing CFL ~< 0.8
        at 3 Poisson solves per step (the standard LES choice).
    """
    t = jnp.asarray(t, state.T.dtype)
    if method == "euler":
        return _advance(config, state, dt, t, fb_coriolis=True)
    if method == "rk3":
        s1 = _advance(config, state, dt, t)
        s2_raw = _advance(config, s1, dt, t + dt)
        mix = lambda a, b, wa, wb: wa * a + wb * b  # noqa: E731
        s2 = jax.tree.map(lambda a, b: mix(a, b, 0.75, 0.25), state, s2_raw)
        s3_raw = _advance(config, s2, dt, t + 0.5 * dt)
        out = jax.tree.map(lambda a, b: mix(a, b, 1.0 / 3.0, 2.0 / 3.0), state, s3_raw)
        # Convex combinations of divergence-free fields stay divergence-free.
        return out
    raise ValueError(f"unknown LES method {method!r}")


def _horizontal_profiles(config: LESConfig, state: LESState, t=0.0):
    """Horizontally-averaged (U, V, T) + resolved covariance fluxes on faces."""
    mean_h = lambda q: jnp.mean(q, axis=(0, 1))  # noqa: E731
    U, V, Tm = mean_h(state.u), mean_h(state.v), mean_h(state.T)

    def covariance(a, b):  # a, b (Ny, Nx, Nz-1) at interior faces
        return mean_h(a * b) - mean_h(a) * mean_h(b)

    u_zf = 0.5 * (state.u[..., :-1] + state.u[..., 1:])
    v_zf = 0.5 * (state.v[..., :-1] + state.v[..., 1:])
    T_zf = 0.5 * (state.T[..., :-1] + state.T[..., 1:])
    w_xf = 0.5 * (state.w + _xm(state.w))[..., 1:-1]
    w_yf = 0.5 * (state.w + _ym(state.w))[..., 1:-1]
    w_in = state.w[..., 1:-1]

    pad = lambda interior, top: jnp.concatenate(  # noqa: E731
        [jnp.zeros_like(interior[:1]), interior, jnp.asarray(top, interior.dtype)[None]]
    )
    uw = pad(covariance(u_zf, w_xf), config.Qu)
    vw = pad(covariance(v_zf, w_yf), 0.0)
    wT = pad(covariance(T_zf, w_in), surface_theta_flux(config, jnp.asarray(t, state.T.dtype)))
    return U, V, Tm, uw, vw, wT


def run_les(
    config: LESConfig,
    state0: LESState | None = None,
    dt: float = 10.0,
    n_save: int = 48,
    save_every: int = 60,
    key=None,
    method: str = "euler",
    max_frames_per_dispatch: int = 256,
    max_steps_per_dispatch: int | None = None,
) -> ColumnTimeSeries:
    """Integrate the LES and return horizontally-averaged training data.

    Jitted scans; profiles are sampled every ``save_every`` steps.
    Drop-in for ``synthetic_wind_mixing_les`` / the LESbrary reader.

    The outer frame loop is dispatched from the host in chunks (state
    stays on device between chunks, so the split is free): a single device
    program that runs for minutes gets killed by execution watchdogs
    (measured on this container's remote-TPU tunnel: one 64x64x128 program
    of ~1,150 frames x 50 substeps reproducibly takes the worker down,
    while the same run in 256-frame chunks completes). Reference-scale
    8-day datasets (free_convection/README.md: 1,153 frames) need the
    chunking. The chunk is capped both in frames
    (``max_frames_per_dispatch``) and in substeps
    (``max_steps_per_dispatch``; the ``None`` default derives it from a
    ~2e10 cell-steps budget — ~40 s of device time at the measured
    ~2 ns/cell-step — so a 256^3 grid at ~33 ms/substep dispatches ~1,100
    substeps at a time instead of 256 multi-second frames in one program).
    """
    c = config
    state = state0 if state0 is not None else initial_state(c, key)
    dt = jnp.asarray(dt, state.T.dtype)
    from climateparameterizations_jl_tpu.utils.dispatch import dispatch_plan

    _plan_kind, _plan = dispatch_plan(
        n_save, save_every, c.Nx * c.Ny * c.Nz,
        max_frames_per_dispatch, max_steps_per_dispatch, cell_step_budget=2e10,
    )

    def substep(carry, _):
        s, t = carry
        return (les_step(c, s, dt, method, t), t + dt), None

    def interval(carry, _):
        carry, _ = jax.lax.scan(substep, carry, None, length=save_every)
        return carry, _horizontal_profiles(c, carry[0], carry[1])

    @functools.partial(jax.jit, static_argnames="n_frames")
    def run_chunk(carry, n_frames):
        return jax.lax.scan(interval, carry, None, length=n_frames)

    first = jax.jit(lambda s: _horizontal_profiles(c, s))(state)
    carry = (state, jnp.zeros((), state.T.dtype))
    if _plan_kind == "subframe":
        # One save interval exceeds the device-program cap (e.g. 256^3 with
        # sparse saves): sub-dispatch the interval, profile at frame ends.
        @functools.partial(jax.jit, static_argnames="length")
        def run_steps(carry, length):
            carry, _ = jax.lax.scan(substep, carry, None, length=length)
            return carry

        profile = jax.jit(lambda carry: _horizontal_profiles(c, carry[0], carry[1]))
        frames = []
        for _ in range(n_save):
            for n in _plan:
                carry = run_steps(carry, n)
            frames.append(profile(carry))
        U, V, Tm, uw, vw, wT = tuple(
            jnp.stack([f0, *[f[i] for f in frames]], axis=0)
            for i, f0 in enumerate(first)
        )
    else:
        chunk = _plan
        parts = []
        done = 0
        while done < n_save:
            n = min(chunk, n_save - done)
            # Pin the remainder chunk to the full length's compile when close
            # enough would recompile anyway (distinct static n); two programs
            # max: the full chunk and one remainder.
            carry, frames = run_chunk(carry, n)
            parts.append(frames)
            done += n
        U, V, Tm, uw, vw, wT = tuple(
            jnp.concatenate([f0[None], *[p[i] for p in parts]], axis=0)
            for i, f0 in enumerate(first)
        )
    dtype = state.T.dtype
    t = jnp.arange(n_save + 1, dtype=dtype) * (save_every * dt)
    return ColumnTimeSeries(
        u=U, v=V, T=Tm, uw=uw, vw=vw, wT=wT, t=t,
        H=c.H, f=c.f, g=c.g, alpha=c.alpha, beta=jnp.zeros_like(c.alpha),
        u_top=c.Qu, theta_top=c.theta_top, theta_bottom=c.dTdz,
        diurnal_amplitude=c.theta_top if c.diurnal else jnp.zeros_like(c.theta_top),
    )


def stable_dt(config: LESConfig, u_max: float = 0.1, cfl: float = 0.2) -> float:
    """Advective + diffusive time-step bound (constant-nu part only).

    Use ``cfl ~< 0.2`` with ``method="euler"``, up to ``~0.8`` with
    ``method="rk3"``.
    """
    h = float(min(config.dx, config.dy, config.dz))
    adv = cfl * h / max(u_max, 1e-6)
    # Smagorinsky nu ~ (Cs h)^2 |S| with |S| ~ u_max / h.
    nu_est = float(config.nu) + float(config.Cs * h) ** 2 * u_max / h
    # 3-D forward-Euler diffusion limit: dt <= h^2 / (6 nu) for equal spacing.
    diff = h**2 / (6.0 * max(nu_est, 1e-12))
    return min(adv, diff)
