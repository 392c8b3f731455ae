"""Synthetic LES-like datasets for tests, CI, and offline benchmarking.

The reference pulls real LESbrary output from an MIT web server
(``free_convection/src/data.jl:3-12``) or local disk
(``wind_mixing/src/data_containers.jl:1-128``) and has **no** offline
fallback; its CI never exercises the workloads. Here we generate
LES-*shaped* datasets by running our own column physics (mPP + convective
adjustment) at high vertical resolution in dimensional space, recording
profiles and diagnosed fluxes exactly like an horizontally-averaged LES
would. The trick: with identity scalings and ``tau = 1`` the scaled
non-dimensional wind-mixing model *is* the dimensional model, so the same
fused RHS generates the data.

This is a capability extension, not a port; the shapes/fields match
``ColumnTimeSeries`` so the whole downstream pipeline is exercised.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling
from climateparameterizations_jl_tpu.data.containers import ColumnTimeSeries
from climateparameterizations_jl_tpu.models.wind_mixing import (
    BoundaryConditions,
    FluxNNs,
    WindMixingModel,
    WindMixingScalings,
    predict_flux,
    solve_wind_mixing_split,
    split_uvT,
)
from climateparameterizations_jl_tpu.physics.mpp import MPPParameters

NO_NNS = FluxNNs(uw=None, vw=None, wT=None)


def _host_cpu_device():
    """The CPU backend device (always registered alongside accelerator plugins).

    Synthetic stand-ins are data FIXTURES: the same catalog name must produce
    the same trajectories everywhere. Generated on the active accelerator
    they do not — the stiff 128-level mPP generator integrated in f32 on the
    TPU drifts ~0.3% in T (0.06 K) from the CPU trajectories over 8 days
    (platform transcendental/fusion rounding, amplified by the tanh
    diffusivity switch), which is several times the coarse models' own error
    and dominated every cross-platform loss comparison (measured: the
    held-out diurnal mPP-only loss read 1.2e-3 on CPU vs 4.0e-3 on the chip
    purely from the truth difference). Pinning generation to the CPU backend
    makes the fixture platform-deterministic; downstream jits move the data
    to the accelerator as usual.
    """
    return jax.local_devices(backend="cpu")[0]


def _identity_scalings(dtype=jnp.float32) -> WindMixingScalings:
    s = ZeroMeanUnitVarianceScaling(jnp.zeros((), dtype), jnp.ones((), dtype))
    return WindMixingScalings(u=s, v=s, T=s, uw=s, vw=s, wT=s)


def three_layer_profile(z, T_surface=19.0, mixed_layer_depth=50.0, thermocline_thickness=50.0, dTdz_thermocline=0.02, dTdz_deep=0.002):
    """Three-layer initial temperature: mixed layer / thermocline / deep.

    Mirrors the LESbrary "three_layer_constant_fluxes" initial condition
    family (encoded in the dataset names, ``data_containers.jl:2-127``).
    ``z`` is negative downward (0 at surface).
    """
    z = jnp.asarray(z)
    d = -z  # depth, positive
    t1 = mixed_layer_depth
    t2 = mixed_layer_depth + thermocline_thickness
    in_thermocline = jnp.clip(d - t1, 0.0, thermocline_thickness)
    below = jnp.maximum(d - t2, 0.0)
    return T_surface - dTdz_thermocline * in_thermocline - dTdz_deep * below


def synthetic_wind_mixing_les(
    Qu: float = -5e-4,
    Qb: float = 3e-8,
    f: float = 1e-4,
    alpha: float = 2e-4,
    g: float = 9.80665,
    H: float = 256.0,
    Nz: int = 128,
    n_save: int = 288,
    dt_save: float = 600.0,
    n_substeps: int = 2,
    diurnal: bool = False,
    mpp: MPPParameters | None = None,
    dtype=jnp.float32,
) -> ColumnTimeSeries:
    """Run a dimensional mPP column and package it as an LES-like dataset.

    ``Qu`` is the surface kinematic momentum flux [m^2/s^2] (negative =
    eastward wind stress), ``Qb`` the surface buoyancy flux [m^2/s^3]
    (positive = cooling); the surface heat flux is ``Qb / (alpha g)``
    matching the LESbrary convention (``lesbrary_data.jl:164-165``).

    Always generated on the CPU backend (see :func:`_host_cpu_device`).
    """
    with jax.default_device(_host_cpu_device()):
        return _synthetic_wind_mixing_les(Qu, Qb, f, alpha, g, H, Nz, n_save, dt_save, n_substeps, diurnal, mpp, dtype)


def _synthetic_wind_mixing_les(Qu, Qb, f, alpha, g, H, Nz, n_save, dt_save, n_substeps, diurnal, mpp, dtype):
    mpp = mpp if mpp is not None else MPPParameters.default()
    model = WindMixingModel(
        H=jnp.asarray(H, dtype),
        tau=jnp.asarray(1.0, dtype),  # identity time scale -> dimensional
        f=jnp.asarray(f, dtype),
        g=jnp.asarray(g, dtype),
        alpha=jnp.asarray(alpha, dtype),
        kappa=jnp.asarray(10.0, dtype),
        scalings=_identity_scalings(dtype),
        mpp=mpp,
        Nz=Nz,
        use_mpp=True,
        zero_weights=True,
        diurnal=diurnal,
    )
    theta_top = Qb / (alpha * g)
    bcs = BoundaryConditions(
        uw_bot=jnp.asarray(0.0, dtype),
        uw_top=jnp.asarray(Qu, dtype),
        vw_bot=jnp.asarray(0.0, dtype),
        vw_top=jnp.asarray(0.0, dtype),
        wT_bot=jnp.asarray(0.0, dtype),
        wT_top=jnp.asarray(0.0 if diurnal else theta_top, dtype),
        diurnal_amplitude=jnp.asarray(theta_top if diurnal else 0.0, dtype),
    )
    zc = (jnp.arange(Nz, dtype=dtype) + 0.5) * (H / Nz) - H
    T0 = three_layer_profile(zc).astype(dtype)
    x0 = jnp.concatenate([jnp.zeros(Nz, dtype), jnp.zeros(Nz, dtype), T0])

    traj = solve_wind_mixing_split(model, NO_NNS, bcs, x0, 0.0, dt_save, n_save, n_substeps=n_substeps)
    t = dt_save * jnp.arange(n_save + 1, dtype=dtype)
    u, v, T = split_uvT(traj, Nz)

    flux_fn = jax.vmap(lambda x, tt: predict_flux(model, NO_NNS, bcs, x, tt))
    uw, vw, wT = flux_fn(traj, t)

    return ColumnTimeSeries(
        u=u,
        v=v,
        T=T,
        uw=uw,
        vw=vw,
        wT=wT,
        t=t,
        H=jnp.asarray(H, dtype),
        f=jnp.asarray(f, dtype),
        g=jnp.asarray(g, dtype),
        alpha=jnp.asarray(alpha, dtype),
        beta=jnp.asarray(8e-4, dtype),
        u_top=jnp.asarray(Qu, dtype),
        theta_top=jnp.asarray(theta_top, dtype),
        # The generating model applies ZERO bottom heat flux (bcs.wT_bot=0),
        # so the advertised bottom-gradient BC must be 0 too — a nonzero
        # value here would make embedded/KPP baselines inject bottom cooling
        # the "truth" trajectory never felt (a systematic bottom-cell bias
        # masquerading as closure error). Real LESbrary files carry their
        # own nonzero gradient; this is a stand-in, internally consistent.
        theta_bottom=jnp.asarray(0.0, dtype),
        diurnal_amplitude=bcs.diurnal_amplitude,
    )


def synthetic_free_convection_les(
    Qb: float = 1e-7,
    alpha: float = 2e-4,
    g: float = 9.80665,
    H: float = 256.0,
    Nz: int = 128,
    n_save: int = 288,
    dt_save: float = 600.0,
    n_substeps: int = 4,
    kappa: float = 10.0,
    stratification: float = 0.002,
    dtype=jnp.float32,
) -> ColumnTimeSeries:
    """Surface-cooled convecting column: surface flux + implicit conv-adj.

    ``stratification`` sets the deep/thermocline temperature gradients and
    the fixed-gradient bottom BC — catalog ids sharing a surface flux
    differ ONLY in stratification, so the offline stand-ins must thread it
    or distinct ids silently produce byte-identical datasets (train/test
    leakage; the les3d source threads it via ``LESConfig.dTdz``).

    Stand-in for the 9 LESbrary free-convection simulations
    (``free_convection/src/data.jl:3-12``). Each substep applies the surface
    heat-flux divergence explicitly, then a backward-Euler convective
    adjustment (``kappa`` m^2/s where unstable) via the batched tridiagonal
    solve — the same operator-split scheme the reference's host-model
    embedding uses (``free_convection/src/oceananigans_nn.jl:13-40``).
    Velocities and momentum fluxes are zero (no mean shear).

    Always generated on the CPU backend (see :func:`_host_cpu_device`).
    """
    with jax.default_device(_host_cpu_device()):
        return _synthetic_free_convection_les(Qb, alpha, g, H, Nz, n_save, dt_save, n_substeps, kappa, stratification, dtype)


def _synthetic_free_convection_les(Qb, alpha, g, H, Nz, n_save, dt_save, n_substeps, kappa, stratification, dtype):
    from climateparameterizations_jl_tpu.core.operators import d_center_to_face
    from climateparameterizations_jl_tpu.physics.convective_adjustment import (
        convective_adjustment_implicit_step,
    )

    theta_top = Qb / (alpha * g)
    dz = H / Nz
    dt = dt_save / n_substeps
    zc = (jnp.arange(Nz, dtype=dtype) + 0.5) * dz - H
    T0 = three_layer_profile(zc, dTdz_thermocline=10.0 * stratification, dTdz_deep=stratification).astype(dtype)

    def substep(T, _):
        # Explicit surface-flux divergence: only the top cell feels theta_top.
        T = T.at[..., -1].add(-dt * theta_top / dz)
        T = convective_adjustment_implicit_step(T, dt, dz, kappa)
        return T, None

    def save_interval(T, _):
        T, _ = jax.lax.scan(substep, T, None, length=n_substeps)
        return T, T

    _, frames = jax.lax.scan(save_interval, T0, None, length=n_save)
    traj = jnp.concatenate([T0[None], frames], axis=0)
    t = dt_save * jnp.arange(n_save + 1, dtype=dtype)

    # Diagnose wT faces: imposed boundary fluxes + conv-adj downgradient flux.
    dTdz = d_center_to_face(traj, dz)
    K_face = jnp.where(dTdz < 0.0, kappa, 0.0)
    wT = -K_face * dTdz
    wT = wT.at[..., -1].set(theta_top).at[..., 0].set(0.0)

    zeros_c = jnp.zeros_like(traj)
    zeros_f = jnp.zeros_like(wT)
    return ColumnTimeSeries(
        u=zeros_c,
        v=zeros_c,
        T=traj,
        uw=zeros_f,
        vw=zeros_f,
        wT=wT,
        t=t,
        H=jnp.asarray(H, dtype),
        f=jnp.asarray(1e-4, dtype),
        g=jnp.asarray(g, dtype),
        alpha=jnp.asarray(alpha, dtype),
        beta=jnp.asarray(8e-4, dtype),
        u_top=jnp.asarray(0.0, dtype),
        theta_top=jnp.asarray(theta_top, dtype),
        theta_bottom=jnp.asarray(stratification, dtype),
        diurnal_amplitude=jnp.asarray(0.0, dtype),
    )
