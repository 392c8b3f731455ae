"""Loss matrices across simulations and training-epoch replay.

Parity targets:

- ``plot_loss_matrix`` (``free_convection/src/testing.jl:186-231``): a grid
  of losses, every simulation x every solution type.
- ``compute_nde_solution_history`` (``free_convection/src/testing.jl:1-32``):
  re-solve the NDE for every checkpointed epoch to replay the learning
  curve. The reference loops epochs on the host; here the epoch axis is a
  stacked pytree and **one vmapped scan solves all epochs at once** — the
  MXU sees a single batched program instead of E sequential solves.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from climateparameterizations_jl_tpu.models.free_convection import (
    FreeConvectionModel,
    solve_free_convection_nde,
)


def loss_matrix(truth, solutions: dict) -> dict:
    """Time-mean MSE of each named solution vs truth, batched over leading axes.

    ``truth``: ``(..., Nt, N)``; each entry of ``solutions`` the same shape
    (or broadcastable). Returns ``{name: (...,) ndarray}`` — one scalar per
    simulation per solution type, the cells of the reference's loss-matrix
    figure (``testing.jl:186-231``).
    """
    return {
        name: np.asarray(jnp.mean((jnp.asarray(sol) - truth) ** 2, axis=(-2, -1)))
        for name, sol in solutions.items()
    }


def loss_per_timestep_matrix(truth, solutions: dict) -> dict:
    """Per-timestep MSE curves ``{name: (..., Nt)}`` (``testing.jl:64-101``)."""
    return {
        name: np.asarray(jnp.mean((jnp.asarray(sol) - truth) ** 2, axis=-1))
        for name, sol in solutions.items()
    }


def stack_epochs(nn_history: list):
    """Stack a list of per-epoch NN pytrees onto a leading epoch axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *nn_history)


def solution_history(
    model: FreeConvectionModel,
    nn_history: list,
    T0_scaled,
    t0,
    dt_save,
    n_save: int,
    n_substeps: int = 2,
    method: str = "split",
):
    """Solve the free-convection NDE for every training epoch in one vmap.

    ``nn_history``: list of E MLP pytrees (one per checkpointed epoch).
    Returns scaled trajectories ``(E, n_save + 1, ..., Nz)``. The default
    ``method="split"`` keeps the conv-adj base closure implicit (the
    explicit min-form is stiff at kappa=10 — see
    ``solve_free_convection_split``); jitted so the whole replay is one
    compiled program.

    Parity: ``compute_nde_solution_history`` (``testing.jl:1-32``).
    """
    stacked = stack_epochs(nn_history)
    return _replay_epochs(stacked, model, T0_scaled, t0, dt_save, n_save, n_substeps, method)


@partial(jax.jit, static_argnames=("n_save", "n_substeps", "method"))
def _replay_epochs(stacked, model, T0_scaled, t0, dt_save, n_save, n_substeps, method):
    # Module-level jit so repeated solution_history calls (one per held-out
    # simulation) hit the compilation cache — a per-call inner closure would
    # re-trace the whole vmapped multi-epoch scan every time (first TPU
    # compile is 20-40 s).
    def solve_one(nn):
        return solve_free_convection_nde(
            model, nn, T0_scaled, t0, dt_save, n_save, n_substeps=n_substeps, method=method
        )

    return jax.vmap(solve_one)(stacked)


def epoch_losses(trajectories, truth_scaled):
    """Per-epoch scalar loss ``(E,)`` from :func:`solution_history` output."""
    return np.asarray(jnp.mean((trajectories - truth_scaled[None]) ** 2, axis=tuple(range(1, trajectories.ndim))))
