"""Calibration of the 5 mPP diffusivity parameters against LES trajectories.

Parity: reference
``wind_mixing/src/diffusivity_parameter_optimisation.jl:35-231``
(``optimise_modified_pacanowski_philander``): parameters are rescaled to
O(1) by their initial values, the physics-only NDE (zeroed NNs) is solved
over the training window, the 6-channel loss is applied, and a
box-constrained optimizer (``lb=0, ub=10`` in scaled units) walks the
parameters. Here: projected optax adam (or L-BFGS) with gradients through
the scanned solve — one jitted program instead of per-iteration re-tracing.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax

from climateparameterizations_jl_tpu.data.containers import TrainingBatch
from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs, WindMixingModel
from climateparameterizations_jl_tpu.physics.mpp import MPPParameters
from climateparameterizations_jl_tpu.train.loss import (
    LossChannels,
    apply_loss_scalings,
    nde_loss_channels,
)
from climateparameterizations_jl_tpu.train.nde import (
    NDETrainConfig,
    _make_optimizer,
    _solve,
    determine_loss_scalings,
)

NO_NNS = FluxNNs(uw=None, vw=None, wT=None)


def optimise_mpp_parameters(
    model: WindMixingModel,
    batch: TrainingBatch,
    config: NDETrainConfig,
    initial: MPPParameters | None = None,
    lb: float = 0.0,
    ub: float = 10.0,
    callback=None,
):
    """Fit ``(nu_0, nu_minus, delta_Ri, Ri_c, Pr)``; returns ``(params, history)``.

    The search space is the scaled vector ``theta = p / p_init`` clipped to
    ``[lb, ub]`` after each update (projected gradient), matching the
    reference's box constraints (``diffusivity_parameter_optimisation.jl:197``).
    """
    p0 = initial if initial is not None else model.mpp
    init_vec = p0.as_vector()

    def unscale(theta):
        return MPPParameters.from_vector(theta * init_vec)

    loss_scalings = determine_loss_scalings(dataclasses.replace(model, mpp=p0), NO_NNS, batch, config)

    def loss_fn(theta):
        m = dataclasses.replace(model, mpp=unscale(theta))
        pred = _solve(m, NO_NNS, batch, config)
        channels = nde_loss_channels(pred, batch.targets, model.Nz, config.train_gradient)
        scaled = apply_loss_scalings(channels, loss_scalings)
        return scaled.total(), scaled

    # config.optimizer selects adam (default) or lbfgs — the reference
    # calibrates mPP with BFGS/LBFGS (optimise_modified_pacanowski_
    # philander_args.jl:66-72); the projection below supplies the box.
    optimizer = _make_optimizer(config)
    theta = jnp.ones_like(init_vec)
    opt_state = optimizer.init(theta)
    # astype: the zoom linesearch probes f64-promoted candidates under x64.
    total_fn = lambda th: loss_fn(th.astype(init_vec.dtype))[0]  # noqa: E731

    @jax.jit
    def step(theta, opt_state):
        (total, channels), grads = jax.value_and_grad(loss_fn, has_aux=True)(theta)
        updates, opt_state = optimizer.update(
            grads, opt_state, theta, value=total, grad=grads, value_fn=total_fn
        )
        # astype: lbfgs's linesearch scalar can promote to f64 under x64.
        theta = jnp.clip(optax.apply_updates(theta, updates), lb, ub).astype(init_vec.dtype)
        return theta, opt_state, total, channels

    # Return the BEST EVALUATED iterate, not the last: step() evaluates the
    # loss at the pre-update theta, so the post-final-update parameters were
    # never evaluated and (with lbfgs especially) a last linesearch
    # overshoot can leave them worse than min(history).
    if callback is None:
        # Pipelined: keep (loss, theta) pairs on device and pick the best
        # iterate in ONE transfer at the end — the per-iteration float()
        # blocked the dispatch queue on a tunnel round-trip per step (the
        # same latency wall as train.nde._train_loop's pipelined branch).
        pending = []
        for _ in range(config.maxiters):
            new_theta, opt_state, total, channels = step(theta, opt_state)
            pending.append((total, theta))
            theta = new_theta
        pairs = jax.device_get(pending)
        history = [(float(t), jax.tree.map(float, unscale(jnp.asarray(th)))) for t, th in pairs]
        best_i = int(np.argmin([t for t, _ in pairs]))
        return unscale(pending[best_i][1]), history
    history = []
    best_loss, best_theta = float("inf"), theta
    for i in range(config.maxiters):
        new_theta, opt_state, total, channels = step(theta, opt_state)
        history.append((float(total), jax.tree.map(float, unscale(theta))))
        if float(total) < best_loss:
            best_loss, best_theta = float(total), theta
        callback(i, float(total), unscale(theta))
        theta = new_theta
    return unscale(best_theta), history


def calibrate_mpp_eki(
    model: WindMixingModel,
    batch: TrainingBatch,
    config: NDETrainConfig,
    key=None,
    priors: dict | None = None,
    n_ensemble: int = 64,
    n_iterations: int = 8,
    mesh=None,
    inflation: float = 1.0,
):
    """mPP calibration via Ensemble Kalman Inversion (gradient-free + UQ).

    Forward map: the physics-only (zeroed-NN) trajectory over the training
    window; observations: the LES targets. Complements the gradient
    optimizer above with posterior spread per parameter (the package's UQ
    promise, ``README.md:7``). Returns ``(MPPParameters, EKIResult)``.
    """
    from climateparameterizations_jl_tpu.train.eki import eki_calibrate

    if priors is None:
        # Uniform boxes: [p/10, 10p] around the defaults — the same x10
        # scaled-unit box the gradient path clips to.
        priors = {
            name: (0.1 * float(getattr(model.mpp, name)), 10.0 * float(getattr(model.mpp, name)))
            for name in ("nu_0", "nu_minus", "delta_Ri", "Ri_c", "Pr")
        }
        degenerate = [n for n, (lo, hi) in priors.items() if hi <= lo]
        if degenerate:
            raise ValueError(
                f"calibrate_mpp_eki: default multiplicative priors are degenerate for "
                f"zero-valued parameter(s) {degenerate} — pass explicit `priors` boxes for them"
            )
    names = tuple(priors.keys())

    # Name-keyed everywhere: parameter order is whatever the priors dict
    # says, never a positional vector convention.
    def with_values(values):
        overrides = {n: values[i] for i, n in enumerate(names)}
        return dataclasses.replace(model.mpp, **overrides)

    def forward(values):
        m = dataclasses.replace(model, mpp=with_values(values))
        return _solve(m, NO_NNS, batch, config).reshape(-1)

    result = eki_calibrate(
        forward, batch.targets.reshape(-1), priors, key=key,
        n_ensemble=n_ensemble, n_iterations=n_iterations, mesh=mesh, inflation=inflation,
    )
    return with_values(result.theta_mean), result
