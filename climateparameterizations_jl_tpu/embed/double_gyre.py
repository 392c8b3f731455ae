"""3-D wind-driven double gyre with an embedded learned column closure.

TPU-native re-design of the reference's double-gyre experiments
(``free_convection/double_gyre.jl:60-196``: 96x96x32 beta-plane basin,
double-gyre wind stress, surface temperature restoring, bottom drag,
convective adjustment; ``free_convection/double_gyre_nn.jl:122-168``: the
trained free-convection NN applied as a per-column heat-flux forcing).

Instead of translating Oceananigans' nonhydrostatic solver, this is a
hydrostatic Boussinesq basin model designed for XLA:

- **Arakawa C-grid**, flat bottom, closed basin; arrays are laid out
  ``(Ny, Nx, Nz)`` with the column axis *last*, so every column physics op
  (implicit diffusion, convective adjustment, the NN closure) is a batched
  op over ``Ny x Nx`` columns with unit-stride columns.
- **Semi-implicit free surface**: the barotropic correction solves
  ``(1 - g H dt^2 lap) d_eta = -dt div(H u*)`` **directly by 2-D DCT**
  (Neumann walls -> cosine basis) — an FFT pair instead of an iterative
  elliptic solve, so the whole step stays inside one jitted scan with no
  data-dependent control flow.
- **Hydrostatic pressure** from the linear EOS ``b = g alpha (T - T0)`` by a
  reversed cumulative sum along the (contiguous) z axis.
- **Vertical mixing** is backward-Euler implicit via the batched Thomas
  solve (``ops.tridiagonal``) over all ``Ny*Nx`` columns at once; convective
  adjustment raises the implicit diffusivity where ``dT/dz < 0`` — the same
  scheme as the reference's per-column tridiagonal
  (``oceananigans_nn.jl:13-40``) but one solve for the whole basin.
- **NN closure**: the free-convection MLP ``T -> w'T'`` is applied to every
  column as ONE ``(Ny*Nx, Nz) @ weights`` matmul per step (MXU), replacing
  the reference's per-(i, j) host loop (``double_gyre_nn.jl:153-163``).

Advection is WENO5 upwind by default for BOTH tracers and momentum (the
reference passes ``advection = WENO5()`` model-wide, ``double_gyre.jl:130``);
the ``advection`` / ``momentum_advection`` knobs keep the 2nd-order schemes
(flux-form tracer, advective-form momentum) for A/B, and
``linear_momentum`` gives the classic linear gyre.
"""

from __future__ import annotations

import dataclasses

import functools

import jax
import jax.numpy as jnp

from climateparameterizations_jl_tpu.closures.mlp import MLP, apply_closure
from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling
from climateparameterizations_jl_tpu.ops.tridiagonal import implicit_diffusion_step


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DoubleGyreModel:
    """Basin configuration (defaults follow ``double_gyre.jl:60-120``'s regime)."""

    Lx: jnp.ndarray  # basin width [m]
    Ly: jnp.ndarray  # basin length [m]
    H: jnp.ndarray  # depth [m]
    f0: jnp.ndarray  # Coriolis at the southern wall [1/s]
    beta: jnp.ndarray  # beta-plane gradient [1/(m s)]
    g: jnp.ndarray  # gravity [m/s^2]
    alpha: jnp.ndarray  # thermal expansion [1/K]
    T0: jnp.ndarray  # EOS reference temperature [C]
    tau0: jnp.ndarray  # wind-stress amplitude / rho0 [m^2/s^2]
    r_drag: jnp.ndarray  # linear bottom drag [1/s]
    Ah: jnp.ndarray  # horizontal viscosity [m^2/s]
    Av: jnp.ndarray  # vertical viscosity [m^2/s]
    kappa_h: jnp.ndarray  # horizontal tracer diffusivity [m^2/s]
    kappa_v: jnp.ndarray  # background vertical tracer diffusivity [m^2/s]
    kappa_conv: jnp.ndarray  # convective-adjustment diffusivity [m^2/s]
    T_north: jnp.ndarray  # restoring SST at the northern wall [C]
    T_south: jnp.ndarray  # restoring SST at the southern wall [C]
    t_restore: jnp.ndarray  # surface restoring timescale [s]
    Nx: int = dataclasses.field(metadata=dict(static=True), default=96)
    Ny: int = dataclasses.field(metadata=dict(static=True), default=96)
    Nz: int = dataclasses.field(metadata=dict(static=True), default=32)
    linear_momentum: bool = dataclasses.field(metadata=dict(static=True), default=False)
    # Tracer advection scheme: "weno5" (default; the reference uses WENO5,
    # double_gyre.jl:60-196) or "centered" (2nd-order, kept for A/B).
    advection: str = dataclasses.field(metadata=dict(static=True), default="weno5")
    # Momentum advection: "weno5" (flux-form upwind faces — the reference
    # passes WENO5 model-wide, double_gyre.jl:130) or "centered"
    # (2nd-order advective form). Ignored when ``linear_momentum``.
    momentum_advection: str = dataclasses.field(metadata=dict(static=True), default="weno5")

    @classmethod
    def default(cls, Nx: int = 96, Ny: int = 96, Nz: int = 32, dtype=jnp.float32, **overrides) -> "DoubleGyreModel":
        vals = dict(
            Lx=3.84e6, Ly=3.84e6, H=1.8e3,
            f0=1e-4, beta=1.5e-11, g=9.80665, alpha=2e-4, T0=10.0,
            tau0=1e-4, r_drag=1e-6, Ah=5e3, Av=1e-3,
            kappa_h=1e3, kappa_v=1e-5, kappa_conv=1.0,
            T_north=2.0, T_south=22.0, t_restore=30.0 * 86400.0,
        )
        static = {
            k: overrides.pop(k)
            for k in ("linear_momentum", "advection", "momentum_advection")
            if k in overrides
        }
        vals.update(overrides)
        leaves = {k: jnp.asarray(v, dtype) for k, v in vals.items()}
        return cls(Nx=Nx, Ny=Ny, Nz=Nz, **static, **leaves)

    @property
    def dx(self):
        return self.Lx / self.Nx

    @property
    def dy(self):
        return self.Ly / self.Ny

    @property
    def dz(self):
        return self.H / self.Nz

    def y_centers(self, dtype=jnp.float32):
        return (jnp.arange(self.Ny, dtype=dtype) + 0.5) * self.dy

    def wind_stress(self, dtype=jnp.float32):
        """Zonal double-gyre wind stress at cell-center latitudes ``(Ny,)``.

        ``tau_x(y) = -tau0 cos(2 pi y / Ly)`` (``double_gyre.jl``'s profile).
        """
        y = self.y_centers(dtype)
        return -self.tau0 * jnp.cos(2.0 * jnp.pi * y / self.Ly)

    def restoring_sst(self, dtype=jnp.float32):
        """Linear north-south restoring target ``(Ny,)``."""
        y = self.y_centers(dtype)
        return self.T_south + (self.T_north - self.T_south) * y / self.Ly


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DoubleGyreState:
    """C-grid prognostic fields, z last (bottom -> top).

    ``u``: ``(Ny, Nx + 1, Nz)`` at x-faces (walls pinned to 0);
    ``v``: ``(Ny + 1, Nx, Nz)`` at y-faces; ``T``: ``(Ny, Nx, Nz)``;
    ``eta``: ``(Ny, Nx)`` free surface.
    """

    u: jnp.ndarray
    v: jnp.ndarray
    T: jnp.ndarray
    eta: jnp.ndarray

    @classmethod
    def rest(cls, model: DoubleGyreModel, dtype=jnp.float32, stratification: float = 5e-3) -> "DoubleGyreState":
        """Initial condition: rest + linear stratification + restoring SST ramp."""
        Ny, Nx, Nz = model.Ny, model.Nx, model.Nz
        zc = (jnp.arange(Nz, dtype=dtype) + 0.5) * model.dz - model.H
        T_strat = model.T0 + stratification * (zc + model.H)
        sst = model.restoring_sst(dtype)
        # Blend surface restoring profile into the top ~quarter of the column.
        w = jnp.clip((zc + 0.25 * model.H) / (0.25 * model.H), 0.0, 1.0)
        T = T_strat[None, None, :] + w[None, None, :] * (sst[:, None, None] - model.T0)
        return cls(
            u=jnp.zeros((Ny, Nx + 1, Nz), dtype),
            v=jnp.zeros((Ny + 1, Nx, Nz), dtype),
            T=jnp.broadcast_to(T, (Ny, Nx, Nz)),
            eta=jnp.zeros((Ny, Nx), dtype),
        )


# ----------------------------------------------------------------------------
# spatial operators (all pure slicing, XLA-fusable)
# ----------------------------------------------------------------------------


def _pad_u(ui):
    """Interior u tendencies ``(Ny, Nx-1, Nz)`` -> full face array with 0 walls."""
    z = jnp.zeros(ui.shape[:1] + (1,) + ui.shape[2:], ui.dtype)
    return jnp.concatenate([z, ui, z], axis=1)


def _pad_v(vi):
    z = jnp.zeros((1,) + vi.shape[1:], vi.dtype)
    return jnp.concatenate([z, vi, z], axis=0)


def hydrostatic_pressure(model: DoubleGyreModel, T):
    """Kinematic hydrostatic pressure at centers from ``b = g alpha (T - T0)``.

    ``p(z) = -int_z^0 b dz'``; computed as a reversed cumsum along z (last
    axis, contiguous). Top half-cell uses b/2 (midpoint rule).
    """
    b = model.g * model.alpha * (T - model.T0)
    below_top = jnp.cumsum(b[..., ::-1], axis=-1)[..., ::-1]
    return -model.dz * (below_top - 0.5 * b)


def vertical_velocity(model: DoubleGyreModel, u, v):
    """Diagnostic w at z-faces ``(Ny, Nx, Nz+1)`` from continuity (w=0 at bottom)."""
    div_h = (u[:, 1:, :] - u[:, :-1, :]) / model.dx + (v[1:, :, :] - v[:-1, :, :]) / model.dy
    w_int = -model.dz * jnp.cumsum(div_h, axis=-1)
    zeros = jnp.zeros(div_h.shape[:-1] + (1,), u.dtype)
    return jnp.concatenate([zeros, w_int], axis=-1)


def _laplacian_h(phi, dx, dy, axis_x=1, axis_y=0):
    """Horizontal Laplacian with zero-flux (free-slip) walls via edge padding."""
    pad = [(0, 0)] * phi.ndim
    pad_x = list(pad)
    pad_x[axis_x] = (1, 1)
    px = jnp.pad(phi, pad_x, mode="edge")
    sl = lambda a, ax, s: jax.lax.slice_in_dim(a, s.start, s.stop, axis=ax)  # noqa: E731
    n = phi.shape[axis_x]
    d2x = (sl(px, axis_x, slice(2, n + 2)) - 2 * phi + sl(px, axis_x, slice(0, n))) / dx**2
    pad_y = list(pad)
    pad_y[axis_y] = (1, 1)
    py = jnp.pad(phi, pad_y, mode="edge")
    m = phi.shape[axis_y]
    d2y = (sl(py, axis_y, slice(2, m + 2)) - 2 * phi + sl(py, axis_y, slice(0, m))) / dy**2
    return d2x + d2y


# ----------------------------------------------------------------------------
# barotropic mode: direct DCT Helmholtz solve
# ----------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _dct_matrix_np(N: int, dtype_name: str = "float32"):
    """Orthonormal DCT-II basis matrix ``(N, N)``: rows = modes, cols = cells.

    At basin sizes (N ~ 96) the transform-as-matmul beats an FFT path on the
    MXU and — unlike jnp.fft — is supported on every TPU backend. Cached as
    NUMPY (never a jax array: caching device values created inside a trace
    leaks tracers across jit boundaries).
    """
    import numpy as np

    n = np.arange(N)
    k = n[:, None]
    M = np.cos(np.pi * (n[None, :] + 0.5) * k / N)
    M *= np.sqrt(2.0 / N)
    M[0] *= np.sqrt(0.5)
    return M.astype(dtype_name)


def _dct_matrix(N: int, dtype_name: str = "float32"):
    return jnp.asarray(_dct_matrix_np(N, dtype_name))


def _neumann_laplacian_eigenvalues(model: DoubleGyreModel, dtype):
    mx = jnp.arange(model.Nx, dtype=dtype)
    my = jnp.arange(model.Ny, dtype=dtype)
    lam_x = -4.0 / model.dx**2 * jnp.sin(jnp.pi * mx / (2 * model.Nx)) ** 2
    lam_y = -4.0 / model.dy**2 * jnp.sin(jnp.pi * my / (2 * model.Ny)) ** 2
    return lam_y[:, None] + lam_x[None, :]


def solve_free_surface(model: DoubleGyreModel, rhs, dt):
    """Solve ``(1 - g H dt^2 lap) d_eta = rhs`` on the (Ny, Nx) grid by 2-D DCT.

    Neumann (no-normal-flow) walls make the 5-point Laplacian diagonal in the
    cosine basis, so the solve is exact and direct: two DCT matmuls in, a
    pointwise divide, two inverse matmuls out — one fused XLA region, no
    iterative elliptic solver.
    """
    dtype_name = jnp.dtype(rhs.dtype).name
    Cy = _dct_matrix(model.Ny, dtype_name)
    Cx = _dct_matrix(model.Nx, dtype_name)
    lam = _neumann_laplacian_eigenvalues(model, rhs.dtype)
    rhat = Cy @ rhs @ Cx.T
    denom = 1.0 - model.g * model.H * dt * dt * lam
    return Cy.T @ (rhat / denom) @ Cx


# ----------------------------------------------------------------------------
# closure hooks (per-column physics over the whole basin)
# ----------------------------------------------------------------------------


def nn_closure_forcing(
    model: DoubleGyreModel,
    nn: MLP,
    T,
    T_scaling: ZeroMeanUnitVarianceScaling,
    wT_scaling: ZeroMeanUnitVarianceScaling,
    T_remap=None,
    stability_gate=None,
):
    """``-d/dz(w'T'_NN)`` for every column as one batched MLP call.

    Parity: ``compute_neural_network_forcing!`` (``double_gyre_nn.jl:149-168``)
    — the reference assembles ``dz_wT_NN[i, j, k]`` column by column in a
    Julia loop; here the ``(Ny*Nx, Nz)`` scaled temperature block hits the
    MLP weights as one matmul.

    ``T_remap=(a, b)`` applies ``T -> a + T/b`` before the training scaling —
    the reference's distribution guard (``T_profile = 19.65 + T_profile/20``,
    ``double_gyre_nn.jl:155``): the basin spans ~20 K while the closure was
    trained on ~1 K free-convection columns, and raw basin temperatures put
    the MLP far outside its training distribution (measured here: the raw-T
    run NaNs the 2-year gyre at day ~160; the remapped run completes it).

    ``stability_gate=s`` (K/m) tapers each interior flux face by
    ``sigmoid(-dT/dz / s)`` computed from the PHYSICAL (pre-remap) profile:
    a free-convection closure models convective transport, so its flux is
    suppressed where the column is stably stratified and untouched where it
    is unstable/neutral. This is the multi-decade drift guard the reference
    never needed (it stopped at 1 year): the closure's small flux bias acts
    as a persistent upward heat pump in the stable deep basin — column heat
    is conserved (the divergence telescopes, and still does under the gate:
    the boundary faces stay zero), but the pumped surface heat exits through
    the restoring BC and the abyss cools without bound (measured: deep T
    -> -16 C over 20 years ungated).
    """
    if stability_gate is not None:
        dTdz_phys = (T[..., 1:] - T[..., :-1]) / model.dz  # interior faces
        gate = jax.nn.sigmoid(-dTdz_phys / stability_gate)
    if T_remap is not None:
        a, b = T_remap
        T = a + T / b
    x = T_scaling.scale(T)  # (Ny, Nx, Nz) — z last, batched over leading axes
    # Affine unscale: the FC NN is trained against affine-scaled wT targets
    # (free_convection._assemble_wT), so physical flux = sigma * NN + mu;
    # dropping mu would bias every interior face by -mu vs the zero pads.
    interior = wT_scaling.unscale(apply_closure(nn, x))  # dimensional (Ny, Nx, Nz-1)
    if stability_gate is not None:
        interior = interior * gate
    zeros = jnp.zeros(interior.shape[:-1] + (1,), interior.dtype)
    wT = jnp.concatenate([zeros, interior, zeros], axis=-1)
    return -(wT[..., 1:] - wT[..., :-1]) / model.dz


def _implicit_vertical_mixing(model: DoubleGyreModel, u, v, T, dt, tridiag_backend="scan"):
    """Backward-Euler vertical viscosity + conv-adj diffusivity for the basin.

    Zero-flux boundaries via ``zero_boundary_faces=True`` (the raw matrix
    replicates the reference's asymmetric boundary leak; see
    ``implicit_diffusion_step``) — never hand-mask at call sites.
    """
    dTdz = (T[..., 1:] - T[..., :-1]) / model.dz
    kappa_int = jnp.where(dTdz < 0.0, model.kappa_conv, model.kappa_v)
    kappa = jnp.concatenate([kappa_int[..., :1], kappa_int, kappa_int[..., -1:]], axis=-1)
    step = lambda phi, nu_face: implicit_diffusion_step(  # noqa: E731
        phi, nu_face, dt, model.dz, backend=tridiag_backend, zero_boundary_faces=True
    )
    T = step(T, kappa)
    nu = jnp.full(u.shape[:-1] + (model.Nz + 1,), model.Av, u.dtype)
    u = step(u, nu)
    v = step(v, jnp.full(v.shape[:-1] + (model.Nz + 1,), model.Av, v.dtype))
    return u, v, T


def _u_advection_weno(model: DoubleGyreModel, u, v, w):
    """Flux-form WENO5 advection divergence for ``u`` at interior x-faces.

    Returns ``(Ny, Nx-1, Nz)``. x-fluxes live at T-cell centers (between
    u-points), y-fluxes at corners (zero at the walls: v = 0 there), and
    z-fluxes at z-faces (edge-value products at top/bottom, matching the
    tracer's convention). Flux form differs from the centered path's
    advective form by ``u div(U)``, which vanishes with continuity.
    """
    from climateparameterizations_jl_tpu.core.advection import weno5_advective_flux

    dx, dy, dz = model.dx, model.dy, model.dz
    ui = u[:, 1:-1, :]
    # x: advecting velocity at the Nx centers between the Nx+1 u-points.
    uc = 0.5 * (u[:, 1:, :] + u[:, :-1, :])
    Fx = weno5_advective_flux(uc, u, axis=1, boundary="edge")  # (Ny, Nx, Nz)
    div = (Fx[:, 1:, :] - Fx[:, :-1, :]) / dx
    # y: v interpolated to the corners above interior u-points.
    v_corner = 0.5 * (v[:, 1:, :] + v[:, :-1, :])  # (Ny+1, Nx-1, Nz)
    Fy_int = weno5_advective_flux(v_corner[1:-1], ui, axis=0, boundary="edge")
    Fy = jnp.pad(Fy_int, ((1, 1), (0, 0), (0, 0)))  # wall faces: v = 0
    div = div + (Fy[1:, :, :] - Fy[:-1, :, :]) / dy
    # z: w interpolated to interior u columns.
    w_u = 0.5 * (w[:, 1:, :] + w[:, :-1, :])  # (Ny, Nx-1, Nz+1)
    Fz_int = weno5_advective_flux(w_u[..., 1:-1], ui, axis=2, boundary="edge")
    Fz = jnp.concatenate(
        [w_u[..., :1] * ui[..., :1], Fz_int, w_u[..., -1:] * ui[..., -1:]], axis=-1
    )
    return div + (Fz[..., 1:] - Fz[..., :-1]) / dz


def _v_advection_weno(model: DoubleGyreModel, u, v, w):
    """Flux-form WENO5 advection divergence for ``v`` at interior y-faces;
    returns ``(Ny-1, Nx, Nz)`` (the mirror of :func:`_u_advection_weno`)."""
    from climateparameterizations_jl_tpu.core.advection import weno5_advective_flux

    dx, dy, dz = model.dx, model.dy, model.dz
    vi = v[1:-1, :, :]
    vc = 0.5 * (v[1:, :, :] + v[:-1, :, :])  # (Ny,) centers between v-points
    Fy = weno5_advective_flux(vc, v, axis=0, boundary="edge")  # (Ny, Nx, Nz)
    div = (Fy[1:, :, :] - Fy[:-1, :, :]) / dy
    u_corner = 0.5 * (u[1:, :, :] + u[:-1, :, :])  # (Ny-1, Nx+1, Nz)
    Fx_int = weno5_advective_flux(u_corner[:, 1:-1, :], vi, axis=1, boundary="edge")
    Fx = jnp.pad(Fx_int, ((0, 0), (1, 1), (0, 0)))  # wall faces: u = 0
    div = div + (Fx[:, 1:, :] - Fx[:, :-1, :]) / dx
    w_v = 0.5 * (w[1:, :, :] + w[:-1, :, :])  # (Ny-1, Nx, Nz+1)
    Fz_int = weno5_advective_flux(w_v[..., 1:-1], vi, axis=2, boundary="edge")
    Fz = jnp.concatenate(
        [w_v[..., :1] * vi[..., :1], Fz_int, w_v[..., -1:] * vi[..., -1:]], axis=-1
    )
    return div + (Fz[..., 1:] - Fz[..., :-1]) / dz


# ----------------------------------------------------------------------------
# one time step
# ----------------------------------------------------------------------------


def double_gyre_step(
    model: DoubleGyreModel,
    state: DoubleGyreState,
    dt,
    nn: MLP | None = None,
    T_scaling: ZeroMeanUnitVarianceScaling | None = None,
    wT_scaling: ZeroMeanUnitVarianceScaling | None = None,
    tridiag_backend: str = "scan",
    T_remap=None,
    nn_stability_gate=None,
) -> DoubleGyreState:
    """Advance one step: tracer step -> explicit momentum (pressure from the
    updated tracer: forward-backward internal-wave coupling) -> barotropic
    DCT correction -> implicit vertical mixing (+ optional NN closure)."""
    u, v, T, eta = state.u, state.v, state.T, state.eta
    dx, dy, dz = model.dx, model.dy, model.dz
    dtype = T.dtype

    w = vertical_velocity(model, u, v)

    # ---- temperature: flux-form advection + diffusion + forcings ---------
    # Stepped FIRST: the hydrostatic pressure the momentum update sees is
    # computed from the UPDATED temperature (forward-backward internal-wave
    # coupling, the same trick as the Coriolis pair below). With p from the
    # *old* T both halves of the baroclinic oscillation are forward Euler,
    # which amplifies internal gravity waves by ~sqrt(1 + (omega dt)^2) per
    # step — at 96x96 (omega dt ~ 0.4 at the grid scale) that e-folds in
    # ~1 day and NaNs a 30-day run; forward-backward is neutrally stable to
    # omega dt <= 2. WENO5 upwind faces by default (the reference's scheme);
    # "centered" keeps the 2nd-order faces for A/B. Wall faces carry zero
    # flux either way; z boundary faces keep the first-order edge value (no
    # 5-point stencil exists there).
    if model.advection == "weno5":
        from climateparameterizations_jl_tpu.core.advection import weno5_advective_flux

        Fx = weno5_advective_flux(u[:, 1:-1, :], T, axis=1, boundary="edge")
        Fx = jnp.pad(Fx, ((0, 0), (1, 1), (0, 0)))
        Fy = weno5_advective_flux(v[1:-1, :, :], T, axis=0, boundary="edge")
        Fy = jnp.pad(Fy, ((1, 1), (0, 0), (0, 0)))
        Fz_int = weno5_advective_flux(w[..., 1:-1], T, axis=2, boundary="edge")
        Fz = jnp.concatenate([w[..., :1] * T[..., :1], Fz_int, w[..., -1:] * T[..., -1:]], axis=-1)
    elif model.advection == "centered":
        T_at_u = 0.5 * (T[:, 1:, :] + T[:, :-1, :])
        Fx = u[:, 1:-1, :] * T_at_u
        Fx = jnp.pad(Fx, ((0, 0), (1, 1), (0, 0)))
        T_at_v = 0.5 * (T[1:, :, :] + T[:-1, :, :])
        Fy = v[1:-1, :, :] * T_at_v
        Fy = jnp.pad(Fy, ((1, 1), (0, 0), (0, 0)))
        Tz = jnp.concatenate([T[..., :1], 0.5 * (T[..., 1:] + T[..., :-1]), T[..., -1:]], axis=-1)
        Fz = w * Tz
    else:
        # Mirror data/les.py: a typo'd scheme must not silently run centered.
        raise ValueError(f"unknown advection scheme {model.advection!r} (expected 'weno5' or 'centered')")
    GT = (
        -(Fx[:, 1:, :] - Fx[:, :-1, :]) / dx
        - (Fy[1:, :, :] - Fy[:-1, :, :]) / dy
        - (Fz[..., 1:] - Fz[..., :-1]) / dz
        + model.kappa_h * _laplacian_h(T, dx, dy)
    )
    # Surface restoring toward T*(y) in the top cell (restoring T-flux BC of
    # double_gyre.jl's FluxBoundaryCondition).
    sst_target = model.restoring_sst(dtype)
    GT = GT.at[..., -1].add((sst_target[:, None] - T[..., -1]) / model.t_restore)
    if nn is not None:
        GT = GT + nn_closure_forcing(model, nn, T, T_scaling, wT_scaling, T_remap, nn_stability_gate)
    T_new = T + dt * GT

    p = hydrostatic_pressure(model, T_new)

    yc = model.y_centers(dtype)
    yf = jnp.arange(model.Ny + 1, dtype=dtype) * dy
    f_c = model.f0 + model.beta * yc  # at u rows
    f_f = model.f0 + model.beta * yf  # at v rows

    # ---- u tendency at interior x-faces (i = 1..Nx-1) --------------------
    v_at_u = 0.25 * (v[:-1, :-1, :] + v[:-1, 1:, :] + v[1:, :-1, :] + v[1:, 1:, :])  # (Ny, Nx-1, Nz)
    dpdx = (p[:, 1:, :] - p[:, :-1, :]) / dx
    detadx = (eta[:, 1:] - eta[:, :-1])[..., None] / dx
    Gu = f_c[:, None, None] * v_at_u - dpdx - model.g * detadx
    Gu = Gu + model.Ah * _laplacian_h(u, dx, dy)[:, 1:-1, :]
    if not model.linear_momentum:
        if model.momentum_advection == "weno5":
            Gu = Gu - _u_advection_weno(model, u, v, w)
        elif model.momentum_advection == "centered":
            ui = u[:, 1:-1, :]
            dudx = (u[:, 2:, :] - u[:, :-2, :]) / (2 * dx)
            up = jnp.pad(u, ((1, 1), (0, 0), (0, 0)), mode="edge")
            dudy = (up[2:, 1:-1, :] - up[:-2, 1:-1, :]) / (2 * dy)
            uz = jnp.pad(u, ((0, 0), (0, 0), (1, 1)), mode="edge")
            dudz = (uz[:, 1:-1, 2:] - uz[:, 1:-1, :-2]) / (2 * dz)
            w_at_u = 0.5 * (w[:, 1:, :] + w[:, :-1, :])
            w_at_u = 0.5 * (w_at_u[..., 1:] + w_at_u[..., :-1])
            Gu = Gu - (ui * dudx + v_at_u * dudy + w_at_u * dudz)
        else:
            raise ValueError(
                f"unknown momentum advection scheme {model.momentum_advection!r} "
                "(expected 'weno5' or 'centered')"
            )
    # Wind stress (top cell) + bottom drag (bottom cell).
    tau_x = model.wind_stress(dtype)
    Gu = Gu.at[..., -1].add(tau_x[:, None] / dz)
    Gu = Gu.at[..., 0].add(-model.r_drag * u[:, 1:-1, 0])
    u_star = u + dt * _pad_u(Gu)

    # ---- v tendency at interior y-faces (j = 1..Ny-1) --------------------
    # Forward-backward Coriolis: v sees the *updated* u (u_star) — neutrally
    # stable for inertial oscillations up to f dt ~ 2, where forward Euler
    # amplifies them by ~(f dt)^2/2 per step and blows up on long runs.
    u_fb = u_star
    u_at_v = 0.25 * (u_fb[:-1, :-1, :] + u_fb[:-1, 1:, :] + u_fb[1:, :-1, :] + u_fb[1:, 1:, :])  # (Ny-1, Nx, Nz)
    dpdy = (p[1:, :, :] - p[:-1, :, :]) / dy
    detady = (eta[1:, :] - eta[:-1, :])[..., None] / dy
    Gv = -f_f[1:-1, None, None] * u_at_v - dpdy - model.g * detady
    Gv = Gv + model.Ah * _laplacian_h(v, dx, dy)[1:-1, :, :]
    if not model.linear_momentum:
        if model.momentum_advection == "weno5":
            # NOTE: advects the pre-rotation v with the pre-step u (the
            # forward-backward trick applies to the Coriolis term only).
            Gv = Gv - _v_advection_weno(model, u, v, w)
        else:  # "centered" (the scheme check already ran in the u block)
            vi = v[1:-1, :, :]
            dvdy = (v[2:, :, :] - v[:-2, :, :]) / (2 * dy)
            vp = jnp.pad(v, ((0, 0), (1, 1), (0, 0)), mode="edge")
            dvdx = (vp[1:-1, 2:, :] - vp[1:-1, :-2, :]) / (2 * dx)
            vz = jnp.pad(v, ((0, 0), (0, 0), (1, 1)), mode="edge")
            dvdz = (vz[1:-1, :, 2:] - vz[1:-1, :, :-2]) / (2 * dz)
            w_at_v = 0.5 * (w[1:, :, :] + w[:-1, :, :])
            w_at_v = 0.5 * (w_at_v[..., 1:] + w_at_v[..., :-1])
            Gv = Gv - (u_at_v * dvdx + vi * dvdy + w_at_v * dvdz)
    Gv = Gv.at[..., 0].add(-model.r_drag * v[1:-1, :, 0])
    v_star = v + dt * _pad_v(Gv)

    # ---- barotropic correction (semi-implicit free surface) --------------
    ubar = jnp.mean(u_star, axis=-1)
    vbar = jnp.mean(v_star, axis=-1)
    div_bar = (ubar[:, 1:] - ubar[:, :-1]) / dx + (vbar[1:, :] - vbar[:-1, :]) / dy
    rhs = -dt * model.H * div_bar
    d_eta = solve_free_surface(model, rhs, dt)
    eta_new = eta + d_eta
    corr_x = -model.g * dt * (d_eta[:, 1:] - d_eta[:, :-1])[..., None] / dx
    corr_y = -model.g * dt * (d_eta[1:, :] - d_eta[:-1, :])[..., None] / dy
    u_new = u_star.at[:, 1:-1, :].add(corr_x)
    v_new = v_star.at[1:-1, :, :].add(corr_y)

    # ---- implicit vertical mixing + convective adjustment -----------------
    u_new, v_new, T_new = _implicit_vertical_mixing(model, u_new, v_new, T_new, dt, tridiag_backend)
    # Re-pin the walls (implicit solve preserves them, but be explicit).
    u_new = u_new.at[:, 0, :].set(0.0).at[:, -1, :].set(0.0)
    v_new = v_new.at[0, :, :].set(0.0).at[-1, :, :].set(0.0)
    return DoubleGyreState(u=u_new, v=v_new, T=T_new, eta=eta_new)


def run_double_gyre(
    model: DoubleGyreModel,
    state0: DoubleGyreState,
    dt,
    n_save: int,
    save_every: int,
    nn: MLP | None = None,
    T_scaling: ZeroMeanUnitVarianceScaling | None = None,
    wT_scaling: ZeroMeanUnitVarianceScaling | None = None,
    tridiag_backend: str = "scan",
    unroll: int = 2,
    max_frames_per_dispatch: int = 256,
    T_remap=None,
    max_steps_per_dispatch: int | None = None,
    nn_stability_gate=None,
) -> DoubleGyreState:
    """Integrate the basin, saving every ``save_every`` steps.

    Returns trajectories with a leading time axis ``(n_save + 1, ...)``.
    Parity: the ``run!(simulation)`` drivers of ``double_gyre.jl:150-196``
    (baseline) and ``double_gyre_nn.jl`` (with the NN forcing).
    ``unroll=2`` on the substep scan measures ~12% faster on TPU (the step
    is a chain of many small ops; unroll=4 regresses).

    As in :func:`data.les.run_les`, the frame loop is dispatched from the
    host in chunks (state stays on device): a single device program running
    for minutes trips execution watchdogs on remote-TPU tunnels, so
    multi-year basin runs must not be one program. The dispatch length is
    capped BOTH in frames (``max_frames_per_dispatch``) and in total steps
    (``max_steps_per_dispatch`` — sparsely-saved long runs like the
    reference's 20-year ``good_double_gyre.jl`` pack thousands of steps
    into one save interval, so a frames-only cap still built a several-
    minute program; measured: 20 years / 60 frames = 5,840 steps/frame
    crashed the tunnel, ~40 s of device time per dispatch does not). The
    ``None`` default derives the step cap from a grid-size-aware budget of
    ~1.5e10 cell-steps per dispatch (~40 s at the measured ~2.5 ns/cell-
    step), so bigger basins automatically dispatch shorter programs. When
    one save interval alone exceeds the step cap it is split into
    sub-dispatches. Frame-chunked dispatch is bitwise-identical to
    one-shot; sub-frame splitting compiles different scan lengths and is
    equivalent to f32 ulp (tested).
    """

    def substep(state, _):
        return double_gyre_step(model, state, dt, nn, T_scaling, wT_scaling, tridiag_backend, T_remap,
                                nn_stability_gate), None

    def interval(state, _):
        state, _ = jax.lax.scan(substep, state, None, length=save_every, unroll=unroll)
        return state, state

    @functools.partial(jax.jit, static_argnames="n_frames")
    def run_chunk(state, n_frames):
        return jax.lax.scan(interval, state, None, length=n_frames)

    @functools.partial(jax.jit, static_argnames="length")
    def run_steps(state, length):
        state, _ = jax.lax.scan(substep, state, None, length=length, unroll=unroll)
        return state

    from climateparameterizations_jl_tpu.utils.dispatch import dispatch_plan

    kind, plan = dispatch_plan(
        n_save, save_every, model.Nx * model.Ny * model.Nz,
        max_frames_per_dispatch, max_steps_per_dispatch,
    )
    if kind == "subframe":
        # One save interval exceeds the device-program cap: sub-dispatch it.
        state, frames = state0, []
        for _ in range(n_save):
            for n in plan:
                state = run_steps(state, n)
            frames.append(state)
        stk = lambda a, fs: jnp.stack([a, *fs], axis=0)  # noqa: E731
        return DoubleGyreState(
            u=stk(state0.u, [f.u for f in frames]),
            v=stk(state0.v, [f.v for f in frames]),
            T=stk(state0.T, [f.T for f in frames]),
            eta=stk(state0.eta, [f.eta for f in frames]),
        )

    state, parts, done = state0, [], 0
    chunk = plan
    while done < n_save:
        n = min(chunk, n_save - done)
        state, frames = run_chunk(state, n)
        parts.append(frames)
        done += n
    cat = lambda a, parts: jnp.concatenate([a[None], *parts], axis=0)  # noqa: E731
    return DoubleGyreState(
        u=cat(state0.u, [p.u for p in parts]),
        v=cat(state0.v, [p.v for p in parts]),
        T=cat(state0.T, [p.T for p in parts]),
        eta=cat(state0.eta, [p.eta for p in parts]),
    )


def barotropic_streamfunction(model: DoubleGyreModel, u):
    """Depth-integrated streamfunction ``psi(y, x)`` [Sv-ish, m^3/s] from u.

    ``psi(y) = -int_0^y U dx``-free diagnostic: integrate ``U = H mean_z(u)``
    in y from the southern wall. Useful for verifying the double-gyre
    circulation pattern (western intensification, two counter-rotating cells).
    """
    U = model.H * jnp.mean(u, axis=-1)  # (Ny, Nx+1)
    Uc = 0.5 * (U[:, 1:] + U[:, :-1])  # (Ny, Nx)
    return -jnp.cumsum(Uc, axis=0) * model.dy
