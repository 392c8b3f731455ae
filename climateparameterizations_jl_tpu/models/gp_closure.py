"""GP-closure differential equation: GP flux models driving the column ODE.

Parity: reference ``wind_mixing/run_GP_DE.jl:103-213`` — three exact-GP flux
models (state -> full scaled flux profile, incl. boundary faces) replace the
NNs inside the column equation

    du/dt_hat = -tau/H * sigma_uw/sigma_u * d/dz_hat(uw_GP) + f tau/sigma_u (sigma_v v + mu_v)
    ...

Unlike the NN closure (which predicts Nz-1 interior faces with BCs
appended), the GP predicts all ``Nz + 1`` faces directly, exactly as the
reference feeds ``GP(scale(x))`` straight into the divergence.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from climateparameterizations_jl_tpu.closures.gp import GPModel, gp_predict
from climateparameterizations_jl_tpu.models.timestepper import solve_fixed_step
from climateparameterizations_jl_tpu.models.wind_mixing import WindMixingModel, _tendencies


class FluxGPs(NamedTuple):
    uw: GPModel
    vw: GPModel
    wT: GPModel


def _share_gram(gps: FluxGPs) -> bool:
    """True when the three GPs provably share one cross-kernel matrix.

    ``gp_fit_multi`` hands the three fluxes the SAME predictor/kernel/grid
    objects, so identity checks suffice (and stay valid under jit, where
    value comparisons on tracers would not).
    """
    import dataclasses as dc

    ms = (gps.uw, gps.vw, gps.wT)
    if any(m.alpha.ndim != 2 for m in ms):
        return False  # the stacked-alpha concat below assumes (n, D_out)
    if not (ms[0].x_train is ms[1].x_train is ms[2].x_train and ms[0].z is ms[1].z is ms[2].z):
        return False
    k0, k1, k2 = (m.kernel for m in ms)
    if not (type(k0) is type(k1) is type(k2)):
        return False
    for f in dc.fields(k0):
        v0, v1, v2 = (getattr(k, f.name) for k in (k0, k1, k2))
        same = (v0 == v1 == v2) if isinstance(v0, (str, bool)) else (v0 is v1 is v2)
        if not same:
            return False
    return True


def gp_closure_rhs(model: WindMixingModel, gps: FluxGPs, x, t):
    """``dx/dt_hat`` with GP-predicted scaled flux faces; batches over rows.

    ``x``: ``(..., 3 Nz)`` scaled state(s). When the three GPs come from
    ``gp_fit_multi`` (shared kernel/predictors), the cross-Gram — the
    dominant per-stage cost inside the integrator scan — is computed ONCE
    and the three predictions become one stacked-alpha matmul.
    """
    batch_shape = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    if _share_gram(gps):
        gram = gps.uw.kernel.gram(flat, gps.uw.x_train, gps.uw.z)
        out = gram @ jnp.concatenate([gps.uw.alpha, gps.vw.alpha, gps.wT.alpha], axis=-1)
        n1, n2 = gps.uw.alpha.shape[-1], gps.uw.alpha.shape[-1] + gps.vw.alpha.shape[-1]
        uw, vw, wT = out[..., :n1], out[..., n1:n2], out[..., n2:]
    else:
        uw, vw, wT = (gp_predict(m, flat) for m in (gps.uw, gps.vw, gps.wT))
    uw = uw.reshape(*batch_shape, -1)
    vw = vw.reshape(*batch_shape, -1)
    wT = wT.reshape(*batch_shape, -1)
    return _tendencies(model, x, uw, vw, wT)


def solve_gp_closure(model: WindMixingModel, gps: FluxGPs, x0, t0, dt_save, n_save: int, n_substeps: int = 4, method: str = "rk4"):
    """Integrate the GP-closure DE (``run_GP_DE.jl:181-192`` with ROCK4 -> RK4 scan)."""
    rhs = lambda x, t: gp_closure_rhs(model, gps, x, t)  # noqa: E731
    return solve_fixed_step(rhs, x0, t0, dt_save, n_save, n_substeps, method, checkpoint=False)
