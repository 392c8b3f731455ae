"""A-posteriori (embedded) closure training: gradients through the host column.

The reference trains its NDEs against a simplified non-dimensional column
(``wind_mixing/src/NDE_training.jl:167-374``) and then EMBEDS the result in
Oceananigans (``wind_mixing/src/NDE_oceananigans.jl:331-475``), whose
discretization differs from the training-time NDE: implicit backward-Euler
mPP diffusion instead of the explicit mPP flux term, dimensional
surface-flux injection instead of scaled BC faces, and its own time step.
The closures therefore deploy into dynamics they were never trained
against, and the reference cannot close that gap — Zygote does not
differentiate through Oceananigans, so "a-posteriori" (solver-in-the-loop)
training against the host model is impossible there.

Here the host column (``embed/column_model.py``) is a jitted ``lax.scan``
whose every op — including the batched backward-Euler tridiagonal solve —
is differentiable, so the flux NNs can be trained THROUGH the deployment
model itself. The host is built by the same :func:`host_for_wind_mixing`
the eval harness uses, so the dynamics being optimized are bit-identical to
the dynamics ``evaluate --embedded`` scores.

Loss semantics match NDE training exactly: trajectories are scaled by the
training scalings and fed to the same 6-channel machinery
(``train/loss.py``), so curriculum stages, auto-balanced fractions, and the
history format carry over unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from climateparameterizations_jl_tpu.data.containers import ColumnTimeSeries
from climateparameterizations_jl_tpu.embed.column_model import (
    HostColumnModel,
    HostColumnState,
    host_for_free_convection,
    host_for_wind_mixing,
    run_embedded_column,
)
from climateparameterizations_jl_tpu.models.wind_mixing import (
    FluxNNs,
    WindMixingModel,
    join_uvT,
)
from climateparameterizations_jl_tpu.train.loss import (
    LossChannels,
    apply_loss_scalings,
    calculate_loss_scalings,
    nde_loss_channels,
)
from climateparameterizations_jl_tpu.train.nde import (
    CurriculumStage,
    NDETrainConfig,
    _make_optimizer,
    _require_uniform,
    _train_loop,
    resolve_tridiag_backend,
    resume_train_state,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EmbeddedBatch:
    """Everything one a-posteriori training step consumes, for ``S`` sims.

    ``state0``: dimensional host states at the window start, ``(S, Nz)``
    per field. ``targets``: SCALED truth trajectories ``(S, Nt, 3 Nz)`` (the
    same tensors NDE training fits — the loss is computed in scaled space).
    ``t``: dimensional save times ``(Nt,)``, shared across sims.
    """

    state0: HostColumnState
    targets: jnp.ndarray
    t: jnp.ndarray


def embedded_training_tensors(ds: ColumnTimeSeries, scalings, tsteps) -> EmbeddedBatch:
    """Build a-posteriori training tensors from a stacked suite ``(S, Nt, ...)``.

    Unlike :func:`data.containers.training_tensors` there are no scaled BC
    faces to freeze — the host model owns its (dimensional) boundary fluxes
    — so the batch is just dimensional initial states plus scaled targets.
    """
    from climateparameterizations_jl_tpu.data.containers import scaled_state_array

    t_arr = np.asarray(tsteps)
    n_frames = ds.t.shape[-1]
    if int(t_arr.max()) >= n_frames or int(t_arr.min()) < 0:
        raise ValueError(
            f"tsteps range [{int(t_arr.min())}, {int(t_arr.max())}] out of range for {n_frames} saved frames"
        )
    idx = jnp.asarray(t_arr)
    x = scaled_state_array(ds, scalings)  # (S, Nt, 3Nz)
    targets = jnp.take(x, idx, axis=-2)
    i0 = int(t_arr[0])
    state0 = HostColumnState(u=ds.u[..., i0, :], v=ds.v[..., i0, :], T=ds.T[..., i0, :])
    t_row = ds.t.reshape(-1, n_frames)[0] if ds.t.ndim > 1 else ds.t
    return EmbeddedBatch(state0=state0, targets=targets, t=jnp.take(t_row, idx))


def host_from_suite(model: WindMixingModel, ds: ColumnTimeSeries) -> HostColumnModel:
    """The training host: :func:`host_for_wind_mixing` over the suite's
    per-sim boundary conditions (leading ``(S,)`` axes)."""
    return host_for_wind_mixing(
        model, ds.u_top, ds.theta_top, ds.theta_bottom,
        diurnal_amplitude=ds.diurnal_amplitude,
    )


def _solve_embedded(host: HostColumnModel, nns: FluxNNs, batch: EmbeddedBatch, config: NDETrainConfig):
    """Scaled ``(S, Nt, 3 Nz)`` trajectory of the host column over the window.

    ``config.n_substeps`` is the number of host steps per save interval
    (the eval harness's ``embedded_substeps``); ``config.tridiag_backend``
    reaches the implicit solve. The per-save-interval scan is rematerialized
    so reference-scale windows (1,153 frames) backprop in O(carry) memory.
    """
    n_save = batch.t.shape[0] - 1
    dtype = batch.state0.T.dtype
    dt = jnp.asarray((batch.t[-1] - batch.t[0]) / (n_save * config.n_substeps), dtype)
    traj = run_embedded_column(
        host, nns, batch.state0, dt, n_save, config.n_substeps,
        tridiag_backend=resolve_tridiag_backend(
            config.tridiag_backend, n_save * config.n_substeps),
        t0=batch.t[0], remat=True,
    )
    s = host.scalings
    scaled = join_uvT(s.u.scale(traj.u), s.v.scale(traj.v), s.T.scale(traj.T))
    return jnp.moveaxis(scaled, 0, -2)  # (S, Nt, 3Nz)


def make_embedded_loss_fn(host: HostColumnModel, batch: EmbeddedBatch, loss_scalings: LossChannels, config: NDETrainConfig) -> Callable:
    """6-channel loss over all simulations at once; returns ``(total, channels)``."""

    def loss_fn(nns: FluxNNs):
        pred = _solve_embedded(host, nns, batch, config)
        channels = nde_loss_channels(pred, batch.targets, host.Nz, config.train_gradient)
        scaled = apply_loss_scalings(channels, loss_scalings)
        return scaled.total(), scaled

    return loss_fn


def determine_embedded_loss_scalings(host: HostColumnModel, nns: FluxNNs, batch: EmbeddedBatch, config: NDETrainConfig) -> LossChannels:
    """Fixed ``gradient_scaling`` weights, or auto-balanced from a pre-solve
    (the NDE trainer's ``determine_loss_scalings``, against the host)."""
    if config.training_fractions is None:
        return LossChannels.ones(config.gradient_scaling if config.train_gradient else 0.0)
    pred = _solve_embedded(host, nns, batch, config)
    channels = nde_loss_channels(pred, batch.targets, host.Nz, config.train_gradient)
    return calculate_loss_scalings(channels, config.training_fractions, config.train_gradient)


def _scalar_constant(x, name: str):
    """Reduce a suite-batched physical constant to a scalar, refusing
    disagreement (it enters scalar algebra in the host stepper)."""
    arr = np.asarray(x).reshape(-1)
    if not np.allclose(arr, arr[0]):
        raise ValueError(f"free-convection suite members disagree on {name}: {arr}")
    return jnp.asarray(arr[0])


def host_from_fc_suite(model, ds: ColumnTimeSeries) -> HostColumnModel:
    """The FC training host: :func:`host_for_free_convection` over the
    suite's per-sim surface/bottom BCs (leading ``(S,)`` axes)."""
    return host_for_free_convection(
        model,
        _scalar_constant(ds.f, "f"), _scalar_constant(ds.g, "g"),
        _scalar_constant(ds.alpha, "alpha"),
        Ftheta=ds.theta_top, dTdz_bottom=ds.theta_bottom,
    )


def embedded_fc_training_tensors(ds: ColumnTimeSeries, T_scaling, tsteps) -> EmbeddedBatch:
    """FC a-posteriori training tensors: dimensional initial states (u = v =
    0, the host column has no momentum forcing) plus SCALED ``(S, Nt, Nz)``
    temperature targets — the same truth :func:`train.nde.
    train_free_convection_nde` fits, so losses are comparable."""
    t_arr = np.asarray(tsteps)
    n_frames = ds.t.shape[-1]
    if int(t_arr.max()) >= n_frames or int(t_arr.min()) < 0:
        raise ValueError(
            f"tsteps range [{int(t_arr.min())}, {int(t_arr.max())}] out of range for {n_frames} saved frames"
        )
    idx = jnp.asarray(t_arr)
    targets = T_scaling.scale(jnp.take(ds.T, idx, axis=-2))
    i0 = int(t_arr[0])
    zeros = jnp.zeros_like(ds.T[..., i0, :])
    state0 = HostColumnState(u=zeros, v=zeros, T=ds.T[..., i0, :])
    t_row = ds.t.reshape(-1, n_frames)[0] if ds.t.ndim > 1 else ds.t
    return EmbeddedBatch(state0=state0, targets=targets, t=jnp.take(t_row, idx))


def _solve_embedded_fc(host: HostColumnModel, nn, batch: EmbeddedBatch, config: NDETrainConfig):
    """Scaled ``(S, Nt, Nz)`` temperature trajectory of the FC host column."""
    n_save = batch.t.shape[0] - 1
    dtype = batch.state0.T.dtype
    dt = jnp.asarray((batch.t[-1] - batch.t[0]) / (n_save * config.n_substeps), dtype)
    traj = run_embedded_column(
        host, FluxNNs(uw=None, vw=None, wT=nn), batch.state0, dt, n_save, config.n_substeps,
        tridiag_backend=resolve_tridiag_backend(
            config.tridiag_backend, n_save * config.n_substeps),
        t0=batch.t[0], remat=True,
    )
    return jnp.moveaxis(host.scalings.T.scale(traj.T), 0, -2)


def make_embedded_fc_loss_fn(host: HostColumnModel, batch: EmbeddedBatch, config: NDETrainConfig) -> Callable:
    """Plain temperature MSE in scaled space (the FC NDE trainer's loss,
    ``free_convection/src/training.jl:55-62``); returns ``(total, channels)``."""

    def loss_fn(nn):
        pred = _solve_embedded_fc(host, nn, batch, config)
        total = jnp.mean((pred - batch.targets) ** 2)
        zero = jnp.zeros_like(total)
        return total, LossChannels(u=zero, v=zero, T=total, dudz=zero, dvdz=zero, dTdz=zero)

    return loss_fn


def train_embedded_free_convection(
    model,
    nn,
    ds: ColumnTimeSeries,
    config: NDETrainConfig,
    tsteps=None,
    stages: Sequence[CurriculumStage] | None = None,
    callback=None,
    checkpoint_dir: str | None = None,
    resume_from: str | None = None,
    project=None,
):
    """Train the FC heat-flux NN through the embedded host column.

    The free-convection counterpart of :func:`train_embedded_wind_mixing`:
    the host is the SAME conv-adj column ``evaluate-fc --embedded`` scores
    (implicit convective adjustment + NN heat-flux forcing,
    ``oceananigans_nn.jl:42-211``), built by :func:`host_from_fc_suite` so
    train/eval dynamics are bit-identical. ``model`` is a
    :class:`~climateparameterizations_jl_tpu.models.free_convection.
    FreeConvectionModel` (per-sim BC fluxes unused here — the host owns its
    dimensional fluxes from the suite). Returns ``(nn, history)``.
    """
    from climateparameterizations_jl_tpu.train.checkpoint import save_checkpoint

    host = host_from_fc_suite(model, ds)

    opt_state = None
    if resume_from is not None:
        nn, opt_state = resume_train_state(resume_from, nn, _make_optimizer(config))

    if stages is None:
        if tsteps is None:
            raise ValueError("train_embedded_free_convection: pass tsteps or stages")
        stages = [CurriculumStage(tsteps=tsteps, maxiters=config.maxiters, learning_rate=config.learning_rate)]

    history_all = []
    for i, stage in enumerate(stages):
        batch = embedded_fc_training_tensors(ds, model.T_scaling, stage.tsteps)
        _require_uniform(batch.t, f"train_embedded_free_convection stage {i}")
        stage_config = dataclasses.replace(config, n_substeps=stage.n_substeps) if stage.n_substeps else config
        loss_fn = make_embedded_fc_loss_fn(host, batch, stage_config)
        nn, h, opt_state = _train_loop(
            loss_fn, nn, _make_optimizer(stage_config, stage.learning_rate), stage.maxiters,
            callback, opt_state, project=project,
        )
        history_all.extend(h)
        if checkpoint_dir is not None:
            save_checkpoint(
                checkpoint_dir,
                {"params": nn, "opt_state": opt_state},
                {"stage": i, "optimizer": config.optimizer, "learning_rate": config.learning_rate},
            )
    return nn, history_all


def train_embedded_wind_mixing(
    model: WindMixingModel,
    nns: FluxNNs,
    ds: ColumnTimeSeries,
    config: NDETrainConfig,
    tsteps=None,
    stages: Sequence[CurriculumStage] | None = None,
    callback=None,
    checkpoint_dir: str | None = None,
    resume_from: str | None = None,
):
    """Train the flux NNs through the embedded host column (a-posteriori).

    ``ds`` is the stacked training suite ``(S, Nt, ...)``; ``tsteps`` the
    training window (ignored when ``stages`` drive a curriculum). Solver
    knobs honored from ``config``: ``n_substeps`` (host steps per save
    interval), ``tridiag_backend``, optimizer/lr/maxiters, the 6-channel
    loss settings. ``config.method``/``fast_assembly``/``pack_nns`` do not
    apply — the host stepper is its own (implicit, dimensional) scheme, and
    its flux assembly is not the NDE's. Returns ``(nns, history)``.
    """
    from climateparameterizations_jl_tpu.train.checkpoint import save_checkpoint

    host = host_from_suite(model, ds)

    opt_state = None
    if resume_from is not None:
        nns, opt_state = resume_train_state(resume_from, nns, _make_optimizer(config))

    def _save(nns, opt_state, stage_idx):
        if checkpoint_dir is not None:
            save_checkpoint(
                checkpoint_dir,
                {"params": nns, "opt_state": opt_state},
                {"stage": stage_idx, "optimizer": config.optimizer, "learning_rate": config.learning_rate},
            )

    if stages is None:
        if tsteps is None:
            raise ValueError("train_embedded_wind_mixing: pass tsteps or stages")
        stages = [CurriculumStage(tsteps=tsteps, maxiters=config.maxiters, learning_rate=config.learning_rate)]

    history_all = []
    for i, stage in enumerate(stages):
        batch = embedded_training_tensors(ds, model.scalings, stage.tsteps)
        _require_uniform(batch.t, f"train_embedded_wind_mixing stage {i}")
        stage_config = dataclasses.replace(config, n_substeps=stage.n_substeps) if stage.n_substeps else config
        loss_scalings = determine_embedded_loss_scalings(host, nns, batch, stage_config)
        loss_fn = make_embedded_loss_fn(host, batch, loss_scalings, stage_config)
        nns, h, opt_state = _train_loop(
            loss_fn, nns, _make_optimizer(stage_config, stage.learning_rate), stage.maxiters, callback, opt_state
        )
        history_all.extend(h)
        _save(nns, opt_state, i)
    return nns, history_all
