"""Device-mesh parallelism: sharded NDE training and column ensembles.

The reference is single-process CPU Julia with **no** distributed layer
(SURVEY.md §2/§5); its only scaling story is ARGS-parameterized cluster
scripts. This module is the TPU-native capability extension mandated by
BASELINE.json: a 1-D ``jax.sharding.Mesh`` over the batch axis (simulations
for NDE training, ensemble members / columns for UQ sweeps), with

- parameters replicated, batch sharded (pure data parallelism — the models
  are tiny MLPs; the batch axis is where the work is);
- gradient reduction left to XLA: the jitted ``value_and_grad`` over a
  sharded batch lowers to per-device partial sums + one ``psum`` over ICI
  (the compiler inserts the collective from the sharding annotations —
  no hand-written NCCL/MPI analogue);
- the same code running on 1 device (mesh of 1) or N chips unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from climateparameterizations_jl_tpu.data.containers import TrainingBatch
from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs, WindMixingModel
from climateparameterizations_jl_tpu.train.loss import LossChannels
from climateparameterizations_jl_tpu.train.nde import NDETrainConfig, make_wind_mixing_loss_fn, solve_with_config


def make_mesh(n_devices: int | None = None, axis_name: str = "batch") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (parameters) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def shard_training_batch(batch: TrainingBatch, mesh: Mesh, axis_name: str = "batch") -> TrainingBatch:
    """Shard the simulation axis across the mesh; replicate shared scalars.

    Arrays whose leading dim equals the number of simulations are split over
    the mesh axis; everything else (save times, tau) is replicated.
    """
    S = batch.x0.shape[0]
    split = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == S:
            return jax.device_put(x, split)
        return jax.device_put(x, repl)

    return jax.tree.map(place, batch)


def make_sharded_nde_train_step(model: WindMixingModel, batch: TrainingBatch, config: NDETrainConfig, optimizer, loss_scalings: LossChannels | None = None):
    """One jitted data-parallel NDE training step.

    ``batch`` must already be placed with :func:`shard_training_batch`;
    parameters/opt state should be replicated (:func:`replicate`). XLA
    inserts the gradient ``psum`` from the shardings.

    The batch enters the jitted step as an ARGUMENT, not a closure capture:
    jit drops the shardings of closure-captured arrays, which silently
    compiles the "data-parallel" step into fully replicated redundant
    compute with no collectives (caught by the compiled-HLO audit in
    ``tests/test_collective_audit.py``). Argument shardings are honored.

    Returns ``step(nns, opt_state) -> (nns, opt_state, total, channels)``.
    """
    scalings = loss_scalings if loss_scalings is not None else LossChannels.ones(config.gradient_scaling)

    @jax.jit
    def _step(nns, opt_state, batch):
        loss_fn = make_wind_mixing_loss_fn(model, batch, scalings, config)
        (total, channels), grads = jax.value_and_grad(loss_fn, has_aux=True)(nns)
        updates, opt_state = optimizer.update(grads, opt_state, nns)
        nns = optax.apply_updates(nns, updates)
        return nns, opt_state, total, channels

    def step(nns, opt_state):
        return _step(nns, opt_state, batch)

    step.lower = lambda nns, opt_state: _step.lower(nns, opt_state, batch)
    return step


def shard_embedded_problem(host, batch, mesh: Mesh, axis_name: str = "batch"):
    """Shard the simulation axis of an a-posteriori (embedded) problem.

    Unlike the NDE path, per-sim data lives in TWO trees: the
    ``EmbeddedBatch`` (initial states, scaled targets) and the
    ``HostColumnModel`` itself (per-sim surface/bottom fluxes on the leading
    ``(S,)`` axis). Leaves whose leading dim equals the simulation count are
    split over the mesh; physical scalars and save times replicate. Both
    trees must then enter the jitted step as ARGUMENTS (the closure-capture
    sharding-drop class, see :func:`make_sharded_nde_train_step`).

    Returns ``(host, batch)`` placed on the mesh.
    """
    S = batch.targets.shape[0]
    split = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())

    def place(x):
        x = jnp.asarray(x)
        if x.ndim >= 1 and x.shape[0] == S:
            return jax.device_put(x, split)
        return jax.device_put(x, repl)

    return jax.tree.map(place, host), jax.tree.map(place, batch)


def make_sharded_embedded_train_step(host, batch, config: NDETrainConfig, optimizer, loss_scalings: LossChannels | None = None, free_convection: bool = False):
    """One jitted data-parallel a-posteriori training step.

    The wind-mixing flavor steps :func:`train.embedded.make_embedded_loss_fn`
    (``nns`` is a :class:`FluxNNs` triple); ``free_convection=True`` steps
    the FC heat-flux loss (``nns`` is the single MLP). ``host``/``batch``
    must already be placed with :func:`shard_embedded_problem`; parameters
    and opt state replicated (:func:`replicate`). XLA partitions the host
    column scan per device shard and inserts one gradient ``psum``.

    Returns ``step(nns, opt_state) -> (nns, opt_state, total, channels)``.
    """
    from climateparameterizations_jl_tpu.train.embedded import (
        make_embedded_fc_loss_fn,
        make_embedded_loss_fn,
    )

    scalings = loss_scalings if loss_scalings is not None else LossChannels.ones(config.gradient_scaling)

    @jax.jit
    def _step(nns, opt_state, host, batch):
        if free_convection:
            loss_fn = make_embedded_fc_loss_fn(host, batch, config)
        else:
            loss_fn = make_embedded_loss_fn(host, batch, scalings, config)
        (total, channels), grads = jax.value_and_grad(loss_fn, has_aux=True)(nns)
        updates, opt_state = optimizer.update(grads, opt_state, nns)
        nns = optax.apply_updates(nns, updates)
        return nns, opt_state, total, channels

    def step(nns, opt_state):
        return _step(nns, opt_state, host, batch)

    step.lower = lambda nns, opt_state: _step.lower(nns, opt_state, host, batch)
    return step


def sharded_kernel_search(
    mesh: Mesh,
    x_train,
    y_train,
    x_val,
    y_val,
    z,
    kernel_ids=(1, 2, 3, 4),
    log_gammas=None,
    metric: str = "euclidean",
    log_sigma: float = 0.0,
    axis_name: str = "batch",
):
    """GP kernel grid search with the gamma grid sharded across the mesh.

    Each device fits its slice of the hyperparameter grid independently (one
    batched Cholesky per device — the vmapped ``error_per_gamma`` program,
    partitioned by XLA from the sharding annotation on ``log_gammas``).
    Embarrassingly parallel: no collectives until the final argmin on host.

    Parity: ``best_kernel`` / ``optimize_GP_kernels.jl``'s sweep, scaled to
    a chip ensemble. Returns ``(kernel, mse)`` like ``best_kernel``.
    """
    from climateparameterizations_jl_tpu.closures.gp import (
        _error_per_gamma_vmapped,
        select_best_kernel,
    )

    if log_gammas is None:
        log_gammas = np.linspace(-1.5, 1.5, 2 * mesh.devices.size)
    log_gammas = np.asarray(log_gammas, dtype=np.asarray(x_train).dtype)
    G = log_gammas.shape[0]
    n_dev = mesh.devices.size
    Gp = -(-G // n_dev) * n_dev
    padded = np.concatenate([log_gammas, np.full(Gp - G, log_gammas[-1], log_gammas.dtype)])

    split = NamedSharding(mesh, P(axis_name))
    repl = NamedSharding(mesh, P())
    lg = jax.device_put(jnp.asarray(padded), split)
    args = [jax.device_put(jnp.asarray(a), repl) for a in (x_train, y_train, x_val, y_val)]
    zz = None if z is None else jax.device_put(jnp.asarray(z), repl)

    errors = {
        kid: np.asarray(_error_per_gamma_vmapped(*args, zz, lg, kid, metric, log_sigma))[:G]
        for kid in kernel_ids
    }
    return select_best_kernel(errors, log_gammas, metric, log_sigma, jnp.asarray(x_train).dtype)


def make_mesh_2d(n_sim: int, n_ens: int, axis_names: tuple = ("sim", "ens")) -> Mesh:
    """2-D mesh: simulations on one axis, ensemble members on the other.

    The two embarrassing batch axes of this workload (which simulation,
    which perturbed member) map to the two mesh axes — e.g. on a 4x2 slice,
    4-way over sims x 2-way over members, all collectives staying on ICI.
    """
    devices = np.array(jax.devices()[: n_sim * n_ens]).reshape(n_sim, n_ens)
    return Mesh(devices, axis_names)


def make_sharded_suite_ensemble_solver(model: WindMixingModel, config: NDETrainConfig, mesh: Mesh):
    """Forward solver for a ``(S, E, 3 Nz)`` suite-of-ensembles block on a 2-D mesh.

    ``x0`` shards sims over the first mesh axis and members over the second;
    per-simulation BCs ``(S,)`` shard over the sim axis only (replicated
    across members). The solvers batch over both leading axes natively, so
    this is pure sharding annotation — XLA partitions one program over the
    whole 2-D mesh.
    """
    ax_sim, ax_ens = mesh.axis_names
    x_shard = NamedSharding(mesh, P(ax_sim, ax_ens, None))
    bc_shard = NamedSharding(mesh, P(ax_sim))
    out_shard = NamedSharding(mesh, P(None, ax_sim, ax_ens, None))

    def solve(nns, bcs, x0, t0, dt_save, n_save):
        x0 = jax.lax.with_sharding_constraint(x0, x_shard)
        bcs = jax.tree.map(lambda b: jax.lax.with_sharding_constraint(b, bc_shard) if getattr(b, "ndim", 0) == 1 else b, bcs)
        traj = solve_with_config(model, nns, bcs, x0, t0, dt_save, n_save, config)
        return jax.lax.with_sharding_constraint(traj, out_shard)

    return jax.jit(solve, static_argnums=(5,))


def shard_ensemble_members(stacked, mesh: Mesh, axis_name: str = "batch"):
    """Shard the leading MEMBER axis of a stacked deep-ensemble pytree."""
    split = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), split), stacked)


def make_sharded_deep_ensemble_train_step(
    model: WindMixingModel,
    batch: TrainingBatch,
    config: NDETrainConfig,
    optimizer,
    stacked_scalings,
    mesh: Mesh,
    axis_name: str = "batch",
):
    """One jitted MEMBER-parallel deep-ensemble train step.

    The dual of :func:`make_sharded_nde_train_step`: there the batch is split
    and the params replicated (gradients meet in a ``psum``); here the stacked
    params/opt-state/scalings are split over the member axis and the batch
    replicated — each device trains its own K/N members with NO gradient
    collective (members never interact; the only cross-device op is the
    scalar member-sum of the loss, for logging). Place params/opt state with
    :func:`shard_ensemble_members` and the batch with :func:`replicate`.

    As everywhere, the sharded operands enter the jitted step as ARGUMENTS
    (jit drops closure-captured shardings — the silent-replication trap the
    compiled-HLO audit pins).

    Returns ``step(stacked_nns, opt_state) -> (stacked_nns, opt_state, total,
    mean_channels)``.
    """
    from climateparameterizations_jl_tpu.train.deep_ensemble import make_ensemble_loss_fn

    @jax.jit
    def _step(stacked_nns, opt_state, batch, scalings):
        loss_fn = make_ensemble_loss_fn(model, batch, scalings, config)
        (total, channels), grads = jax.value_and_grad(loss_fn, has_aux=True)(stacked_nns)
        updates, opt_state = optimizer.update(grads, opt_state, stacked_nns)
        stacked_nns = optax.apply_updates(stacked_nns, updates)
        return stacked_nns, opt_state, total, channels

    def step(stacked_nns, opt_state):
        return _step(stacked_nns, opt_state, batch, stacked_scalings)

    step.lower = lambda nns, opt_state: _step.lower(nns, opt_state, batch, stacked_scalings)
    return step


def make_sharded_ensemble_solver(model: WindMixingModel, config: NDETrainConfig, mesh: Mesh, axis_name: str = "batch", out_sharding: NamedSharding | None = None):
    """Forward ensemble solver with columns sharded across the mesh.

    For the 1k-column UQ / double-gyre ensembles: ``x0`` ``(E, 3 Nz)`` and
    per-member BCs shard over the mesh; the returned trajectories stay
    device-sharded (``(Nt, E, 3 Nz)`` with E split), so downstream
    reductions (ensemble means/variances) also run sharded.
    ``out_sharding`` overrides the output layout — a FACTORY parameter
    (shardings are trace-time properties; a runtime argument on the jitted
    function would be unusably traced).
    """
    out_sharding = out_sharding if out_sharding is not None else NamedSharding(mesh, P(None, axis_name))

    def solve(nns: FluxNNs, bcs, x0, t0, dt_save, n_save):
        traj = solve_with_config(model, nns, bcs, x0, t0, dt_save, n_save, config)
        return jax.lax.with_sharding_constraint(traj, out_sharding)

    return jax.jit(solve, static_argnums=(5,))
