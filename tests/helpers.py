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


def make_embedded_wind_problem(S: int):
    """(host, batch) for a-posteriori sharding tests: per-sim surface fluxes
    on the host's leading ``(S,)`` axis (matching ``make_wind_model_nns``)."""
    from climateparameterizations_jl_tpu.embed.column_model import (
        HostColumnState,
        host_for_wind_mixing,
    )
    from climateparameterizations_jl_tpu.models.wind_mixing import join_uvT
    from climateparameterizations_jl_tpu.train.embedded import EmbeddedBatch

    model, nns = make_wind_model_nns()
    rng = np.random.default_rng(1)
    Fu = jnp.asarray(-1e-4 * (1.0 + rng.uniform(size=S)), f32)
    Ftheta = jnp.asarray(1e-5 * rng.uniform(size=S), f32)
    host = host_for_wind_mixing(model, Fu, Ftheta, jnp.full((S,), 0.01, f32))
    T0 = jnp.asarray(19.0 + 0.01 * np.arange(32) + 0.02 * rng.uniform(size=(S, 32)), f32)
    u0 = jnp.asarray(0.02 * rng.standard_normal((S, 32)), f32)
    v0 = jnp.asarray(0.02 * rng.standard_normal((S, 32)), f32)
    state0 = HostColumnState(u=u0, v=v0, T=T0)
    s = model.scalings
    x0 = join_uvT(s.u.scale(u0), s.v.scale(v0), s.T.scale(T0))
    batch = EmbeddedBatch(
        state0=state0, targets=jnp.repeat(x0[:, None, :], 5, axis=1),
        t=jnp.linspace(0.0, 4 * 600.0, 5, dtype=f32),
    )
    return model, nns, host, batch


def make_embedded_fc_problem(S: int):
    """(host, nn, batch) for the FC a-posteriori sharding tests."""
    import dataclasses

    from climateparameterizations_jl_tpu.closures.mlp import free_convection_mlp
    from climateparameterizations_jl_tpu.embed.column_model import (
        HostColumnState,
        host_for_free_convection,
    )
    from climateparameterizations_jl_tpu.train.embedded import EmbeddedBatch

    @dataclasses.dataclass(frozen=True)
    class _FCModel:
        H: jnp.ndarray
        kappa: jnp.ndarray
        Nz: int
        base_closure: str
        T_scaling: ZeroMeanUnitVarianceScaling
        wT_scaling: ZeroMeanUnitVarianceScaling

    T_scaling = ZeroMeanUnitVarianceScaling(f32(19.0), f32(0.5))
    model = _FCModel(
        H=f32(256.0), kappa=f32(10.0), Nz=32, base_closure="convective_adjustment",
        T_scaling=T_scaling, wT_scaling=ZeroMeanUnitVarianceScaling(f32(0.0), f32(1e-5)),
    )
    rng = np.random.default_rng(2)
    Ftheta = jnp.asarray(2e-5 * (1.0 + rng.uniform(size=S)), f32)
    host = host_for_free_convection(
        model, f32(1e-4), f32(9.80665), f32(2e-4),
        Ftheta=Ftheta, dTdz_bottom=jnp.full((S,), 0.01, f32),
    )
    T0 = jnp.asarray(19.0 + 0.01 * np.arange(32) + 0.02 * rng.uniform(size=(S, 32)), f32)
    zeros = jnp.zeros_like(T0)
    nn = free_convection_mlp(jax.random.PRNGKey(3), 32)
    batch = EmbeddedBatch(
        state0=HostColumnState(u=zeros, v=zeros, T=T0),
        targets=jnp.repeat(T_scaling.scale(T0)[:, None, :], 5, axis=1),
        t=jnp.linspace(0.0, 4 * 600.0, 5, dtype=f32),
    )
    return nn, host, batch
