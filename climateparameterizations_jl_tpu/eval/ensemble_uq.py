"""Predictive uncertainty of a deep-ensemble NDE closure on a held-out sim.

Companion to ``train/deep_ensemble.py``: the K trained members' trajectories
come out of ONE vmapped jitted solve (members ride the batch axis — the same
axis the perturbed-IC `ensemble` command shards over a mesh), and the
predictive mean/std bands are the NN-closure analogue of the GP posterior
bands the reference plots (``src/GaussianProcesses/gaussian_process.jl:130-139``).

Loss conventions match ``eval/profile.nde_profile``: per-timestep channels in
SCALED space, profiles dimensionalized with the training scalings. Because the
scalings are affine and MSE is convex, the ensemble-MEAN prediction's loss is
<= the member-mean loss (Jensen) — tested.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from climateparameterizations_jl_tpu.data.containers import ColumnTimeSeries, training_tensors
from climateparameterizations_jl_tpu.eval.profile import (
    _grid,
    _per_timestep_channels,
    _require_uniform,
    _solve_scaled,
)
from climateparameterizations_jl_tpu.models.wind_mixing import WindMixingModel, split_uvT
from climateparameterizations_jl_tpu.train.deep_ensemble import ensemble_size


# Module-level jitted member solves: one compile per (shapes, solver,
# n_substeps) across a whole multi-sim evaluation — a per-call inner jit
# would retrace for every simulation (the jit-cache hygiene rule from the
# round-2 review campaign). Models are registered-dataclass pytrees, so they
# ride as ordinary (traced) arguments.
@functools.partial(jax.jit, static_argnames=("solver", "n_substeps"))
def _wm_members(model, stacked, bcs, x0, targets, t, solver, n_substeps):
    trajs = jax.vmap(
        lambda nns: _solve_scaled(model, nns, bcs, x0, t, solver, n_substeps)
    )(stacked)  # (K, Nt, 3Nz) scaled
    mean_traj = jnp.mean(trajs, axis=0)
    member_T = jax.vmap(
        lambda traj: _per_timestep_channels(traj, targets, model.Nz, model.dz_hat)["T"]
    )(trajs)
    mean_T = _per_timestep_channels(mean_traj, targets, model.Nz, model.dz_hat)["T"]
    return trajs, member_T, mean_T


@functools.partial(jax.jit, static_argnames=("n_save", "n_substeps", "solver"))
def _fc_members(model, stacked, T0, truth_scaled, t0, dt_save, n_save, n_substeps, solver):
    from climateparameterizations_jl_tpu.models.free_convection import solve_free_convection_nde

    trajs = jax.vmap(
        lambda nn: solve_free_convection_nde(model, nn, T0, t0, dt_save, n_save, n_substeps, solver)
    )(stacked)  # (K, Nt, Nz)
    mean_traj = jnp.mean(trajs, axis=0)
    mse_t = lambda a: jnp.mean((a - truth_scaled) ** 2, axis=-1)  # noqa: E731
    return trajs, jax.vmap(mse_t)(trajs), mse_t(mean_traj)


def fc_ensemble_uq(
    model,
    stacked_nn,
    ds_test: ColumnTimeSeries,
    tsteps,
    *,
    solver: str = "split",
    n_substeps: int = 2,
) -> dict:
    """Free-convection deep-ensemble bands on one held-out simulation.

    Same output schema as :func:`nde_ensemble_uq` restricted to the T
    channel, so the uncertainty-band plot and summary wiring are shared.
    """
    if ds_test.T.ndim > 2:
        if ds_test.T.shape[0] != 1:
            raise ValueError(
                f"fc_ensemble_uq evaluates ONE held-out simulation; got a stacked "
                f"suite of {ds_test.T.shape[0]}"
            )
        ds_test = jax.tree.map(lambda a: a[0], ds_test)
    tsteps = np.asarray(tsteps)
    T_truth = jnp.take(ds_test.T, jnp.asarray(tsteps), axis=-2)
    t_row = ds_test.t[0] if ds_test.t.ndim > 1 else ds_test.t
    t_dim = np.asarray(jnp.take(t_row, jnp.asarray(tsteps)))
    _require_uniform(t_dim, "fc_ensemble_uq")
    t_hat = jnp.asarray(t_dim) / model.tau
    dt_save = t_hat[1] - t_hat[0]
    n_save = t_hat.shape[0] - 1
    T0 = model.T_scaling.scale(T_truth[..., 0, :])
    truth_scaled = model.T_scaling.scale(T_truth)
    n_members = ensemble_size(stacked_nn)

    trajs, member_T, mean_T = jax.device_get(
        _fc_members(model, stacked_nn, T0, truth_scaled, t_hat[0], dt_save, n_save, n_substeps, solver)
    )

    zc, zf = _grid(model)
    dim = np.asarray(model.T_scaling.unscale(jnp.asarray(trajs)))
    return {
        "t": t_dim,
        "zc": zc,
        "zf": zf,
        "n_members": np.asarray(n_members),
        "losses_member_T": np.asarray(member_T),
        "losses_ensemble_mean_T": np.asarray(mean_T),
        "ensemble_T_mean": dim.mean(axis=0),
        "ensemble_T_std": dim.std(axis=0),
    }


def nde_ensemble_uq(
    model: WindMixingModel,
    stacked_nns,
    ds_test: ColumnTimeSeries,
    tsteps,
    *,
    solver: str = "split",
    n_substeps: int = 4,
) -> dict:
    """Member trajectories + predictive mean/std for one held-out simulation.

    Returns a flat dict (numpy arrays):

    - ``t`` (s), ``zc``, ``zf`` — coordinates;
    - ``ensemble_{u,v,T}_mean`` / ``_std`` — dimensional ``(Nt, Nz)`` bands
      across members;
    - ``losses_member_T`` — scaled per-timestep T loss per member ``(K, Nt)``;
    - ``losses_ensemble_mean_T`` — per-timestep T loss of the MEAN prediction;
    - ``n_members``.
    """
    if ds_test.u.ndim > 2:
        if ds_test.u.shape[0] != 1:
            raise ValueError(
                f"nde_ensemble_uq evaluates ONE held-out simulation; got a stacked "
                f"suite of {ds_test.u.shape[0]}"
            )
        ds_test = jax.tree.map(lambda a: a[0], ds_test)
    s = model.scalings
    batch = training_tensors(ds_test, s, tsteps, tau=model.tau, diurnal=model.diurnal)
    t = batch.t
    _require_uniform(t, "nde_ensemble_uq")
    Nz = model.Nz
    n_members = ensemble_size(stacked_nns)

    trajs, member_T, mean_T = jax.device_get(
        _wm_members(model, stacked_nns, batch.bcs, batch.x0, batch.targets, t, solver, n_substeps)
    )

    zc, zf = _grid(model)
    out = {
        "t": np.asarray(t) * float(model.tau),
        "zc": zc,
        "zf": zf,
        "n_members": np.asarray(n_members),
        "losses_member_T": np.asarray(member_T),
        "losses_ensemble_mean_T": np.asarray(mean_T),
    }
    u, v, T = split_uvT(jnp.asarray(trajs), Nz)
    for name, scale, arr in (("u", s.u, u), ("v", s.v, v), ("T", s.T, T)):
        dim = np.asarray(scale.unscale(arr))  # affine: unscale commutes with the member mean
        out[f"ensemble_{name}_mean"] = dim.mean(axis=0)
        out[f"ensemble_{name}_std"] = dim.std(axis=0)
    return out
