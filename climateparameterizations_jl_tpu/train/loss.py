"""Six-channel NDE loss subsystem with auto-balanced scalings.

Parity: reference ``wind_mixing/src/loss.jl``:

- per-variable MSE channels ``(u, v, T)`` plus vertical-gradient channels
  ``(du/dz, dv/dz, dT/dz)`` (``loss.jl:1-9``);
- ``calculate_loss_scalings`` — closed-form weights so that the T : (u+v),
  dT : (du+dv) and profile : gradient contributions hit target *fractions*
  (``loss.jl:11-31``);
- ``apply_loss_scalings`` (``loss.jl:33-42``);
- ``loss_per_tstep`` (``loss.jl:44-46``).

Trajectories here are time-major ``(..., Nt, 3 Nz)`` state arrays; gradients
are taken with the center->face stencil w.r.t. the non-dimensional z.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from climateparameterizations_jl_tpu.core.operators import d_center_to_face
from climateparameterizations_jl_tpu.models.wind_mixing import split_uvT


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class LossChannels:
    """The six loss channels (or their scaling weights)."""

    u: jnp.ndarray
    v: jnp.ndarray
    T: jnp.ndarray
    dudz: jnp.ndarray
    dvdz: jnp.ndarray
    dTdz: jnp.ndarray

    def total(self):
        return self.u + self.v + self.T + self.dudz + self.dvdz + self.dTdz

    def profile(self):
        return self.u + self.v + self.T

    def gradient(self):
        return self.dudz + self.dvdz + self.dTdz

    @classmethod
    def ones(cls, gradient_scaling=0.0) -> "LossChannels":
        one = jnp.asarray(1.0, jnp.float32)
        gs = jnp.asarray(gradient_scaling, jnp.float32)
        return cls(u=one, v=one, T=one, dudz=gs, dvdz=gs, dTdz=gs)


def mse(a, b):
    return jnp.mean((a - b) ** 2)


def nde_loss_channels(pred, target, Nz: int, train_gradient: bool = True) -> LossChannels:
    """Raw (unscaled) channels from predicted/target trajectories ``(..., Nt, 3 Nz)``."""
    pu, pv, pT = split_uvT(pred, Nz)
    tu, tv, tT = split_uvT(target, Nz)
    zero = jnp.asarray(0.0, pred.dtype)
    if train_gradient:
        dz_hat = 1.0 / Nz
        dd = lambda x: d_center_to_face(x, dz_hat)  # noqa: E731
        grads = (mse(dd(pu), dd(tu)), mse(dd(pv), dd(tv)), mse(dd(pT), dd(tT)))
    else:
        grads = (zero, zero, zero)
    return LossChannels(u=mse(pu, tu), v=mse(pv, tv), T=mse(pT, tT), dudz=grads[0], dvdz=grads[1], dTdz=grads[2])


def calculate_loss_scalings(losses: LossChannels, fractions, train_gradient: bool = True) -> LossChannels:
    """Closed-form channel weights hitting the target fractions (``loss.jl:11-31``).

    ``fractions`` is a mapping/namespace with ``T``, ``dTdz`` (written ∂T∂z in
    the reference) and ``profile`` target fractions.
    """
    fT = fractions["T"] if isinstance(fractions, dict) else fractions.T
    fdT = fractions["dTdz"] if isinstance(fractions, dict) else fractions.dTdz
    fprof = fractions["profile"] if isinstance(fractions, dict) else fractions.profile

    # A zero denominator means that channel group carries no signal (e.g.
    # u = v = 0 exactly in a free-convection-style suite): its weight is
    # irrelevant, but inf * 0 = NaN would poison the total — weight 0.
    safe_div = lambda a, b: jnp.where(b > 0, a / jnp.where(b > 0, b, 1.0), 0.0)  # noqa: E731

    velocity_scaling = (1 - fT) / fT * safe_div(losses.T, losses.u + losses.v)
    profile_loss = velocity_scaling * (losses.u + losses.v) + losses.T

    if train_gradient:
        velocity_gradient_scaling = (1 - fdT) / fdT * safe_div(losses.dTdz, losses.dudz + losses.dvdz)
        gradient_loss = velocity_gradient_scaling * (losses.dudz + losses.dvdz) + losses.dTdz
        total_gradient_scaling = (1 - fprof) / fprof * safe_div(profile_loss, gradient_loss)
    else:
        velocity_gradient_scaling = jnp.asarray(0.0)
        total_gradient_scaling = jnp.asarray(0.0)

    one = jnp.ones_like(velocity_scaling)
    return LossChannels(
        u=velocity_scaling,
        v=velocity_scaling,
        T=one,
        dudz=total_gradient_scaling * velocity_gradient_scaling,
        dvdz=total_gradient_scaling * velocity_gradient_scaling,
        dTdz=total_gradient_scaling,
    )


def apply_loss_scalings(losses: LossChannels, scalings: LossChannels) -> LossChannels:
    return LossChannels(
        u=scalings.u * losses.u,
        v=scalings.v * losses.v,
        T=scalings.T * losses.T,
        dudz=scalings.dudz * losses.dudz,
        dvdz=scalings.dvdz * losses.dvdz,
        dTdz=scalings.dTdz * losses.dTdz,
    )


def loss_per_timestep(pred, target):
    """MSE per saved frame: reduces all axes except the time axis (axis 0 of frames).

    Input shape ``(Nt, ..., F)`` (time leading, as solvers return).
    """
    sq = (pred - target) ** 2
    return jnp.mean(sq.reshape(sq.shape[0], -1), axis=-1)
