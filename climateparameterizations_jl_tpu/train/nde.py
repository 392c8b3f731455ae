"""NDE training: optax gradients through the scanned timestepper.

Replaces the reference's GalacticOptim + Zygote + continuous-adjoint stack
(``wind_mixing/src/NDE_training.jl:167-374``,
``free_convection/src/training.jl:44-74``) with discretize-then-optimize:
the whole multi-simulation solve + 6-channel loss + backward pass is ONE
jitted XLA program per curriculum stage; simulations ride a leading batch
axis (no per-sim Python loop), and longer time windows are handled by the
same compiled program via static ``n_save``.

Curriculum staging (growing time windows, ``train_free_convection_nde.jl:246-266``,
``train_NDE.jl:153-191``) is expressed as a list of
:class:`CurriculumStage`; each stage re-jits once.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import optax

from climateparameterizations_jl_tpu.data.containers import TrainingBatch
from climateparameterizations_jl_tpu.models.free_convection import FreeConvectionModel, solve_free_convection_nde
from climateparameterizations_jl_tpu.models.wind_mixing import (
    FluxNNs,
    WindMixingModel,
    pack_flux_nns,
    solve_wind_mixing_nde,
    solve_wind_mixing_split,
)
from climateparameterizations_jl_tpu.train.loss import (
    LossChannels,
    apply_loss_scalings,
    calculate_loss_scalings,
    nde_loss_channels,
)


@dataclasses.dataclass(frozen=True)
class NDETrainConfig:
    """Hyperparameters for one NDE training run/stage."""

    learning_rate: float = 1e-3
    maxiters: int = 200
    n_substeps: int = 4
    method: str = "rk4"  # "rk4" | "heun" | "euler" | "split"
    train_gradient: bool = True
    gradient_scaling: float = 5e-3
    training_fractions: dict | None = None  # {"T":, "dTdz":, "profile":}
    optimizer: str = "adam"
    pack_nns: bool = True  # fuse the 3 flux MLPs into one matmul chain (3x faster rk4 steps)
    # "scan" | "pcr" | "auto" for the split stepper's implicit solve. "auto"
    # resolves PER WINDOW LENGTH (resolve_tridiag_backend): PCR's log-depth
    # solve wins the long sequential windows (1,152 inner steps: 25.3 vs
    # 32.2 ms/iter) but its extra log-steps LOSE on the short windows the
    # shooting decomposition produces (K=16 -> 72 inner steps: 10.9 vs
    # 6.2 ms/iter, BENCH_r04 vs step_bench_r3_k16) — the r4 lesson that one
    # global backend is the wrong config for one of the two modes.
    tridiag_backend: str = "auto"
    split_unroll: int = 1  # substep-scan unroll in the split stepper
    # "auto" (default) resolves to "fold" — matmul-assembled tendencies with
    # the divergence matrix precomposed into the packed last NN layer, the
    # fastest measured train step (21.8 vs 24.3 ms/iter on the 18-sim
    # flagship, PERFORMANCE.md) — whenever the configuration supports it,
    # else the default stencil path. False/True/"fold" force a variant.
    fast_assembly: bool | str = "auto"
    implicit_solve_grad: bool = True  # IFT gradients through the implicit solves (ops.tridiagonal)


@dataclasses.dataclass(frozen=True)
class CurriculumStage:
    """One curriculum window: which tsteps to fit and for how many iterations.

    ``n_substeps`` (optional) overrides the config's per-save-interval substep
    count for this stage — strided stages (the reference's ``1:9:1153``
    tranges) must scale it by the stride or the inner physical step silently
    grows stride-fold.
    """

    tsteps: Sequence[int]
    maxiters: int
    learning_rate: float = 1e-3
    n_substeps: int | None = None


def _make_optimizer(config: NDETrainConfig, lr=None):
    # All optimizers are wrapped for extra-args support so the train loops
    # can uniformly pass (value, grad, value_fn): adam/sgd ignore them,
    # lbfgs's zoom linesearch REQUIRES them (optax >= 0.2).
    lr = config.learning_rate if lr is None else lr
    if config.optimizer == "adam":
        opt = optax.adam(lr)
    elif config.optimizer == "sgd":
        opt = optax.sgd(lr)
    elif config.optimizer == "lbfgs":
        # learning_rate=None -> step size from the zoom linesearch, the
        # reference's (L-)BFGS behavior (optimise_modified_pacanowski_
        # philander_args.jl:66-72 via Optim.jl's HagerZhang).
        opt = optax.lbfgs()
    else:
        raise ValueError(f"unknown optimizer {config.optimizer!r}")
    return optax.with_extra_args_support(opt)


def _require_uniform(t, where: str):
    """Fixed-step solvers integrate on a uniform save grid; a non-uniform
    tstep selection (e.g. a hand-rolled growing window [0,1,2,4,8,...])
    would silently integrate to WRONG times while the loss compares against
    targets at the true saved times. Call on concrete (non-traced) t only —
    the eval path has the same guard (eval/profile._require_uniform)."""
    import numpy as _np

    dt = _np.diff(_np.asarray(t, _np.float64), axis=-1)
    if dt.size and not _np.allclose(dt, dt[..., :1], rtol=1e-4):
        raise ValueError(f"{where}: tsteps must be uniformly spaced (got save intervals {dt.ravel()[:4]}...)")


# Scan/PCR crossover in INNER STEPS per solve window, set by the round-5
# chip K-sweep (docs/step_bench_r5_k{0,4,16,64}_{scan,pcr}.json, 3 timing
# blocks each, flagship 18-sim config): K=0/1,152 steps PCR 21.2 vs scan
# 28.6 ms; K=4/288 steps PCR 8.89 vs 9.71; K=16/72 steps SCAN 5.92 vs 7.33;
# K=64/18 steps PCR 3.71 vs scan 4.01. The crossover is NON-monotonic (PCR
# edges scan again at the tiny-window/large-batch K=64 corner by 8%); a
# single threshold at 128 picks the measured winner everywhere except that
# corner, where the miss costs 8% on a mode rarely used for quality reasons
# (RESULTS.md shooting ablation) — force `tridiag_backend="pcr"` there.
PCR_MIN_INNER_STEPS = 128


def resolve_tridiag_backend(backend: str, n_inner_steps: int) -> str:
    """Resolve ``"auto"`` to the measured-best solve backend for a window.

    CPU always resolves to scan (PCR's extra flops lose there: 532 vs
    443 ms single-core, PERFORMANCE.md); on TPU, PCR for long sequential
    windows, scan for the short windows multiple shooting produces.
    """
    if backend != "auto":
        return backend
    import jax

    if jax.default_backend() == "cpu":
        return "scan"
    return "pcr" if n_inner_steps >= PCR_MIN_INNER_STEPS else "scan"


def solve_with_config(model: WindMixingModel, nns: FluxNNs, bcs, x0, t0, dt_save, n_save: int, config: NDETrainConfig):
    """Dispatch to the configured solver, honoring EVERY solver knob.

    The one implementation behind the train loop and the sharded solvers in
    ``parallel/sharding.py`` — a new config knob added here reaches all of
    them (a knob silently dropped by one caller is the bug class this
    closes). Returns the raw ``(n_save + 1, ..., 3 Nz)`` trajectory.
    """
    from climateparameterizations_jl_tpu.models.wind_mixing import resolve_fast_assembly

    fast_assembly = resolve_fast_assembly(model, nns, config.method, config.fast_assembly)
    if config.method == "split":
        return solve_wind_mixing_split(
            model, nns, bcs, x0, t0, dt_save, n_save, config.n_substeps,
            tridiag_backend=resolve_tridiag_backend(
                config.tridiag_backend, n_save * config.n_substeps),
            unroll=config.split_unroll,
            fast_assembly=fast_assembly,
            implicit_solve_grad=config.implicit_solve_grad,
        )
    return solve_wind_mixing_nde(
        model, nns, bcs, x0, t0, dt_save, n_save, config.n_substeps,
        config.method, fast_assembly=fast_assembly,
    )


def _solve(model: WindMixingModel, nns: FluxNNs, batch: TrainingBatch, config: NDETrainConfig):
    if config.pack_nns:
        # One block matmul chain instead of 9 small matmuls per RHS; the
        # pack is differentiable, so gradients reach the per-flux pytree
        # unchanged (tests/test_models.py::test_packed_flux_nns_match_unpacked).
        # Measured on TPU: 3x faster rk4 train steps, neutral for "split".
        packed = pack_flux_nns(nns)
        if packed is not None:
            nns = packed
    t = batch.t
    n_save = t.shape[0] - 1
    dt_save = (t[-1] - t[0]) / n_save
    # Multiple-shooting batches carry per-row absolute start times (t0 is
    # (S*K,)); it broadcasts through the steppers' t0 + i*dt_save threading
    # so e.g. the diurnal top BC keeps its per-window phase.
    t0 = batch.t0 if batch.t0 is not None else t[0]
    traj = solve_with_config(model, nns, batch.bcs, batch.x0, t0, dt_save, n_save, config)
    return jnp.moveaxis(traj, 0, -2)  # (S, Nt, 3Nz)


def make_wind_mixing_loss_fn(model: WindMixingModel, batch: TrainingBatch, loss_scalings: LossChannels, config: NDETrainConfig) -> Callable:
    """Loss over all simulations at once; returns ``(total, channels)``."""

    def loss_fn(nns: FluxNNs):
        pred = _solve(model, nns, batch, config)
        channels = nde_loss_channels(pred, batch.targets, model.Nz, config.train_gradient)
        scaled = apply_loss_scalings(channels, loss_scalings)
        return scaled.total(), scaled

    return loss_fn


def determine_loss_scalings(model: WindMixingModel, nns: FluxNNs, batch: TrainingBatch, config: NDETrainConfig) -> LossChannels:
    """Fixed ``gradient_scaling`` weights, or auto-balanced from a pre-solve.

    Parity: ``determine_loss_scalings`` (``NDE_training.jl:256-288``).
    """
    if config.training_fractions is None:
        return LossChannels.ones(config.gradient_scaling if config.train_gradient else 0.0)
    pred = _solve(model, nns, batch, config)
    channels = nde_loss_channels(pred, batch.targets, model.Nz, config.train_gradient)
    return calculate_loss_scalings(channels, config.training_fractions, config.train_gradient)


def _train_loop(loss_fn, params, optimizer, maxiters: int, callback=None, opt_state=None, project=None):
    """``project`` (optional) re-applies a parameter constraint after every
    optimizer update inside the jitted step (e.g. the hard spatial-causality
    mask — optimizer updates repopulate masked entries otherwise)."""
    if opt_state is None:
        opt_state = optimizer.init(params)

    # Linesearch objective: the zoom linesearch probes `params + c*updates`
    # with an f64 scalar c under x64, so candidates must be cast back to the
    # declared param dtypes before hitting the (dtype-strict) scanned solve.
    ref = params
    total_fn = lambda p: loss_fn(jax.tree.map(lambda x, r: jnp.asarray(x).astype(r.dtype), p, ref))[0]  # noqa: E731

    @jax.jit
    def step(params, opt_state):
        (total, channels), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = optimizer.update(
            grads, opt_state, params, value=total, grad=grads, value_fn=total_fn
        )
        # lbfgs's linesearch scalar can promote updates to f64 under x64;
        # keep the params at their declared precision.
        new = optax.apply_updates(params, updates)
        params = jax.tree.map(lambda n, o: n.astype(o.dtype), new, params)
        if project is not None:
            params = project(params)
        return params, opt_state, total, channels

    history = []
    if callback is None:
        # PIPELINED loop: issue every step back-to-back and fetch the loss
        # history ONCE at the end. A per-iteration device_get blocks the
        # dispatch queue on a ~10-30 ms tunnel round-trip, which DOMINATES
        # the train step (measured on the r3 flagship: the 16x-shorter
        # multiple-shooting step timed the same ~93 ms/iter as the full
        # sequential one under the old blocking loop — the device was idle
        # most of every iteration). The per-iter scalars are tiny; holding
        # them on device costs nothing.
        pending = []
        for _ in range(maxiters):
            params, opt_state, total, channels = step(params, opt_state)
            pending.append(channels)
        history = [jax.tree.map(float, ch) for ch in jax.device_get(pending)]
        return params, history, opt_state
    for i in range(maxiters):
        params, opt_state, total, channels = step(params, opt_state)
        # ONE device->host transfer for all channels + the total (device_get
        # on the tuple), not a blocking float() per leaf — each block costs
        # a ~10-30 ms tunnel round-trip (CLAUDE.md).
        total_h, channels_h = jax.device_get((total, channels))
        history.append(jax.tree.map(float, channels_h))
        callback(i, float(total_h), channels_h, params)
    return params, history, opt_state


def resume_train_state(checkpoint_dir: str, nns, optimizer):
    """Restore ``(params, opt_state)`` saved by a previous run's checkpoint.

    Parity: the reference restores ADAM ``beta``/``state`` from a previous
    run's extracted file (``wind_mixing/train_NDE_args.jl:140-146``). The
    skeleton for the optimizer state is built from a fresh ``init`` so any
    optax optimizer round-trips.
    """
    from climateparameterizations_jl_tpu.train.checkpoint import load_checkpoint

    skeleton = {"params": nns, "opt_state": optimizer.init(nns)}
    state, _ = load_checkpoint(checkpoint_dir, skeleton)
    return state["params"], state["opt_state"]


def train_wind_mixing_nde(
    model: WindMixingModel,
    nns: FluxNNs,
    batch: TrainingBatch,
    config: NDETrainConfig,
    stages: Sequence[CurriculumStage] | None = None,
    full_batch_fn: Callable | None = None,
    callback=None,
    checkpoint_dir: str | None = None,
    resume_from: str | None = None,
):
    """Train the three flux NNs through the scanned NDE solve.

    If ``stages`` is given, ``full_batch_fn(tsteps)`` must rebuild the
    training batch for each stage's time window (curriculum training).
    ``checkpoint_dir`` saves params + optimizer state after every stage (and
    at the end); ``resume_from`` restores both from such a checkpoint before
    training (parity: ``train_NDE_args.jl:140-146``). Returns
    ``(nns, history)`` where history is a list of per-iteration
    :class:`LossChannels` floats.
    """
    from climateparameterizations_jl_tpu.train.checkpoint import save_checkpoint

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

    history_all = []
    _require_uniform(batch.t, "train_wind_mixing_nde")
    if stages is None:
        loss_scalings = determine_loss_scalings(model, nns, batch, config)
        loss_fn = make_wind_mixing_loss_fn(model, batch, loss_scalings, config)
        nns, history_all, opt_state = _train_loop(loss_fn, nns, _make_optimizer(config), config.maxiters, callback, opt_state)
        _save(nns, opt_state, 0)
        return nns, history_all

    for i, stage in enumerate(stages):
        stage_batch = full_batch_fn(stage.tsteps)
        _require_uniform(stage_batch.t, f"curriculum stage {i}")
        stage_config = dataclasses.replace(config, n_substeps=stage.n_substeps) if stage.n_substeps else config
        loss_scalings = determine_loss_scalings(model, nns, stage_batch, stage_config)
        loss_fn = make_wind_mixing_loss_fn(model, stage_batch, loss_scalings, stage_config)
        nns, h, opt_state = _train_loop(loss_fn, nns, _make_optimizer(stage_config, stage.learning_rate), stage.maxiters, callback, opt_state)
        history_all.extend(h)
        _save(nns, opt_state, i)
    return nns, history_all


def train_free_convection_nde(
    model: FreeConvectionModel,
    nn,
    T0,
    targets,
    t,
    config: NDETrainConfig,
    callback=None,
    project=None,
):
    """Train the heat-flux NN through the free-convection NDE solve.

    ``T0``: ``(S, Nz)`` scaled initial profiles; ``targets``: ``(S, Nt, Nz)``
    scaled truth; ``t``: ``(Nt,)`` non-dimensional save times. The loss is the
    plain MSE over all sims/frames (parity:
    ``free_convection/src/training.jl:55-62``).
    """
    t = jnp.asarray(t)
    _require_uniform(t, "train_free_convection_nde")
    n_save = t.shape[0] - 1
    dt_save = (t[-1] - t[0]) / n_save

    def loss_fn(nn):
        traj = solve_free_convection_nde(model, nn, T0, t[0], dt_save, n_save, config.n_substeps, config.method)
        pred = jnp.moveaxis(traj, 0, -2)  # (S, Nt, Nz)
        total = jnp.mean((pred - targets) ** 2)
        zero = jnp.zeros_like(total)
        return total, LossChannels(u=zero, v=zero, T=total, dudz=zero, dvdz=zero, dTdz=zero)

    nn, history, _ = _train_loop(loss_fn, nn, _make_optimizer(config), config.maxiters, callback, project=project)
    return nn, history
