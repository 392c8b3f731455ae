"""Modified Pacanowski-Philander (mPP) Richardson-number-dependent diffusivity.

Parity: reference ``wind_mixing/src/NDE_training.jl:54,125`` and the
standalone OceanTurb-style model
``wind_mixing/modified_pacalowski_philander_model.jl:9-86``:

    nu(Ri)  = nu_0 + nu_minus * tanh_step((Ri - Ri_c) / delta_Ri)
    kappa_T = nu / Pr

``tanh_step(x) = (1 - tanh(x)) / 2`` switches smoothly from 1 (Ri << Ri_c,
shear-unstable: strong mixing) to 0 (Ri >> Ri_c, stratified: background
mixing only).

The five parameters are a pytree dataclass so they can be calibrated by
gradient descent (reference
``wind_mixing/src/diffusivity_parameter_optimisation.jl``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


def tanh_step(x):
    """Smooth step from 1 (x -> -inf) to 0 (x -> +inf); ``NDE_training.jl:54``."""
    return (1.0 - jnp.tanh(x)) / 2.0


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MPPParameters:
    """mPP diffusivity parameters (defaults: ``NDE_training.jl:168``)."""

    nu_0: jnp.ndarray  # background viscosity [m^2/s], default 1e-4
    nu_minus: jnp.ndarray  # shear-instability viscosity boost [m^2/s], default 1e-1
    Ri_c: jnp.ndarray  # critical Richardson number, default 0.25
    delta_Ri: jnp.ndarray  # transition width, default 1.0
    Pr: jnp.ndarray  # turbulent Prandtl number, default 1.0

    @classmethod
    def default(cls, dtype=jnp.float32) -> "MPPParameters":
        f = lambda x: jnp.asarray(x, dtype)  # noqa: E731
        return cls(nu_0=f(1e-4), nu_minus=f(1e-1), Ri_c=f(0.25), delta_Ri=f(1.0), Pr=f(1.0))

    def as_vector(self):
        return jnp.stack([self.nu_0, self.nu_minus, self.Ri_c, self.delta_Ri, self.Pr])

    @classmethod
    def from_vector(cls, v) -> "MPPParameters":
        return cls(nu_0=v[0], nu_minus=v[1], Ri_c=v[2], delta_Ri=v[3], Pr=v[4])


def mpp_diffusivity(Ri, params: MPPParameters):
    """Face viscosity ``nu(Ri)``; divide by ``params.Pr`` for tracers."""
    return params.nu_0 + params.nu_minus * tanh_step((Ri - params.Ri_c) / params.delta_Ri)
