"""Shared builders for the canonical wind-mixing test model and batch.

Used by ``test_parallel.py`` (numerical sharded-vs-unsharded equivalence)
and ``test_collective_audit.py`` (compiled-HLO partitioning audit) so both
suites provably exercise the SAME configuration.
"""

import jax
import jax.numpy as jnp
import numpy as np

from climateparameterizations_jl_tpu.closures.mlp import wind_mixing_mlp
from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling
from climateparameterizations_jl_tpu.data.containers import TrainingBatch
from climateparameterizations_jl_tpu.models.wind_mixing import (
    BoundaryConditions,
    FluxNNs,
    WindMixingModel,
    WindMixingScalings,
)
from climateparameterizations_jl_tpu.physics.mpp import MPPParameters

f32 = jnp.float32


def make_wind_model_nns():
    """The canonical (model, nns) pair for parallel-layer tests."""
    sc = lambda m, s: ZeroMeanUnitVarianceScaling(f32(m), f32(s))  # noqa: E731
    scalings = WindMixingScalings(
        u=sc(0.0, 0.1), v=sc(0.0, 0.1), T=sc(19.0, 0.5),
        uw=sc(0.0, 1e-4), vw=sc(0.0, 1e-4), wT=sc(0.0, 1e-5),
    )
    model = WindMixingModel(
        H=f32(256.0), tau=f32(691200.0), f=f32(1e-4), g=f32(9.80665), alpha=f32(2e-4),
        kappa=f32(10.0), scalings=scalings, mpp=MPPParameters.default(), Nz=32,
    )
    nns = FluxNNs(*[wind_mixing_mlp(k, 32, scale=1e-3) for k in jax.random.split(jax.random.PRNGKey(0), 3)])
    return model, nns


def make_wind_batch(S: int) -> TrainingBatch:
    """An S-simulation training batch (matching ``make_wind_model_nns``)."""
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(size=(S, 96)) * 0.1, f32)
    zeros = jnp.zeros((S,), f32)
    bcs = BoundaryConditions(
        uw_bot=zeros, uw_top=zeros - 0.5, vw_bot=zeros, vw_top=zeros,
        wT_bot=zeros, wT_top=zeros + 0.3, diurnal_amplitude=zeros,
    )
    return TrainingBatch(
        x0=x0, targets=jnp.repeat(x0[:, None, :], 5, axis=1), bcs=bcs,
        t=jnp.linspace(0.0, 4e-3, 5, dtype=f32), tau=f32(691200.0),
    )
