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


def gp_closure_rhs(model: WindMixingModel, gps: FluxGPs, x, t):
    """``dx/dt_hat`` with GP-predicted scaled flux faces; batches over rows.

    ``x``: ``(..., 3 Nz)`` scaled state(s).
    """
    batch_shape = x.shape[:-1]
    flat = x.reshape(-1, x.shape[-1])
    uw = gp_predict(gps.uw, flat).reshape(*batch_shape, -1)
    vw = gp_predict(gps.vw, flat).reshape(*batch_shape, -1)
    wT = gp_predict(gps.wT, flat).reshape(*batch_shape, -1)
    return _tendencies(model, x, uw, vw, wT)


def solve_gp_closure(model: WindMixingModel, gps: FluxGPs, x0, t0, dt_save, n_save: int, n_substeps: int = 4, method: str = "rk4"):
    """Integrate the GP-closure DE (``run_GP_DE.jl:181-192`` with ROCK4 -> RK4 scan)."""
    rhs = lambda x, t: gp_closure_rhs(model, gps, x, t)  # noqa: E731
    return solve_fixed_step(rhs, x0, t0, dt_save, n_save, n_substeps, method, checkpoint=False)
