"""Direct supervised flux regression (NN pre-training).

Parity: reference ``wind_mixing/src/NN_training.jl`` (``train_NN``: loss =
``MSE(flux) + gradient_scaling * MSE(d flux/dz)``, ``NN_training.jl:219-231``)
and the core trainer ``src/NeuralNetworks/NeuralNetworks.jl:15-24``.

TPU design: full-batch (or minibatched) regression where the whole
``(n_samples, features)`` block hits the MXU in one matmul chain per layer —
no per-sample loop, no Flux-style per-batch Python iteration.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from climateparameterizations_jl_tpu.closures.mlp import (
    MLP,
    apply_closure,
    apply_spatial_causality_mask,
    spatial_causality_penalty,
)
from climateparameterizations_jl_tpu.core.operators import d_face_to_center


def flux_nn_loss(nn: MLP, x, y, gradient_scaling: float = 0.0, dz_hat: float | None = None, causality_weight: float = 0.0):
    """MSE on predicted interior fluxes (+ optional flux-gradient penalty).

    ``x``: ``(B, 3 Nz)`` scaled states; ``y``: ``(B, Nz + 1)`` scaled target
    flux faces. The NN predicts the ``Nz - 1`` interior faces; boundary faces
    are taken from the targets (they are BCs, not learnable).
    ``causality_weight > 0`` adds the soft spatial-causality penalty on the
    first dense layer (``train_free_convection_nde.jl:184-200``).
    """
    pred_interior = apply_closure(nn, x)
    pred = jnp.concatenate([y[..., :1], pred_interior, y[..., -1:]], axis=-1)
    loss = jnp.mean((pred - y) ** 2)
    if gradient_scaling and dz_hat is not None:
        dpred = d_face_to_center(pred, dz_hat)
        dy = d_face_to_center(y, dz_hat)
        loss = loss + gradient_scaling * jnp.mean((dpred - dy) ** 2)
    if causality_weight:
        loss = loss + causality_weight * spatial_causality_penalty(nn)
    return loss


# Host-level chunking bound for the scanned fast path: the TPU tunnel kills
# any single device program running >60-90 s (CLAUDE.md), and one scanned
# chunk is epochs x one tiny full-batch step — 10k steps stay well under a
# second of device time at these sizes while keeping the dispatch count ~1
# for every realistic epoch count.
MAX_EPOCHS_PER_DISPATCH = 10_000


@functools.partial(jax.jit, static_argnames=("learning_rate", "epochs", "gradient_scaling", "dz_hat", "soft_w", "hard"))
def _train_flux_nn_scanned(nn, x, y, learning_rate, epochs, gradient_scaling, dz_hat, soft_w, hard):
    """All full-batch epochs as one ``lax.scan`` — one dispatch, one transfer.

    Step-for-step identical to the per-epoch jitted loop in
    :func:`train_flux_nn` (same value_and_grad -> adam update -> optional
    hard-causality re-mask sequence); returns the per-epoch loss history as
    a device array.
    """
    optimizer = optax.adam(learning_rate)

    def body(carry, _):
        nn, opt_state = carry
        loss, grads = jax.value_and_grad(flux_nn_loss)(nn, x, y, gradient_scaling, dz_hat, soft_w)
        updates, opt_state = optimizer.update(grads, opt_state, nn)
        nn = optax.apply_updates(nn, updates)
        if hard:
            nn = apply_spatial_causality_mask(nn)
        return (nn, opt_state), loss

    (nn, _), history = jax.lax.scan(body, (nn, optimizer.init(nn)), None, length=epochs)
    return nn, history


def train_flux_nn_ensemble(
    stacked_nn,
    x,
    ys,
    learning_rate: float = 1e-3,
    epochs: int = 200,
    gradient_scaling: float = 0.0,
    dz_hat: float | None = None,
    causality: str = "none",
    causality_weight: float = 1.0,
):
    """Train a STACK of same-shape flux MLPs in one jitted program.

    ``stacked_nn``: pytree with a leading stack axis (deep-ensemble members,
    or members x fluxes flattened — any same-architecture collection);
    ``ys``: targets with a matching leading axis (``x`` is shared). Each
    member trains exactly as its solo :func:`train_flux_nn` full-batch run
    (vmapped epoch scan; adam is elementwise so stacked == solo). Returns
    ``(stacked_nn, history)`` with history ``(K, epochs)`` floats.
    """
    if causality not in ("none", "soft", "hard"):
        raise ValueError(f"unknown causality mode {causality!r} (expected 'none', 'soft' or 'hard')")
    soft_w = causality_weight if causality == "soft" else 0.0
    if causality == "hard":
        stacked_nn = jax.vmap(apply_spatial_causality_mask)(stacked_nn)
    run = jax.vmap(
        lambda nn, y: _train_flux_nn_scanned(
            nn, x, y, learning_rate, epochs, gradient_scaling, dz_hat, soft_w, causality == "hard"
        )
    )
    stacked_nn, history = run(stacked_nn, jnp.asarray(ys))
    return stacked_nn, jax.device_get(history)


def train_flux_nn(
    nn: MLP,
    x,
    y,
    learning_rate: float = 1e-3,
    epochs: int = 200,
    batch_size: int | None = None,
    gradient_scaling: float = 0.0,
    dz_hat: float | None = None,
    key=None,
    callback=None,
    causality: str = "none",
    causality_weight: float = 1.0,
):
    """Train one flux MLP; returns ``(nn, per-epoch loss history)``.

    With ``batch_size=None`` every epoch is one full-batch step (the datasets
    here are tiny: ~1k-20k rows x 96 features — a single MXU tile).
    ``causality``: ``"none"`` | ``"soft"`` (L2 penalty on acausal first-layer
    weights) | ``"hard"`` (re-zero them after every update; parity:
    ``free_convection/src/training.jl:24-42``).
    """
    if causality not in ("none", "soft", "hard"):
        raise ValueError(f"unknown causality mode {causality!r} (expected 'none', 'soft' or 'hard')")
    optimizer = optax.adam(learning_rate)
    opt_state = optimizer.init(nn)
    n = x.shape[0]
    soft_w = causality_weight if causality == "soft" else 0.0
    if causality == "hard":
        nn = apply_spatial_causality_mask(nn)

    @jax.jit
    def step(nn, opt_state, xb, yb):
        loss, grads = jax.value_and_grad(flux_nn_loss)(nn, xb, yb, gradient_scaling, dz_hat, soft_w)
        updates, opt_state = optimizer.update(grads, opt_state, nn)
        nn = optax.apply_updates(nn, updates)
        if causality == "hard":
            nn = apply_spatial_causality_mask(nn)
        return nn, opt_state, loss

    if batch_size is not None:
        # Oversized batch must not silently skip every step.
        batch_size = min(batch_size, n)

    if batch_size is None and callback is None:
        # Full-batch + no per-epoch callback: scan the epochs in ONE jitted
        # dispatch (chunked at the host level — see _train_flux_nn_scanned's
        # caller note). The Python-loop path below dispatches (and, worse,
        # blocks on float(loss)) once per epoch — each block pays the
        # ~10-30 ms TPU-tunnel round-trip, which made flux pre-training
        # latency-bound (measured 778 s for the 12 member-flux runs of the
        # K=4 flagship ensemble; same step sequence, so identical numerics).
        # The tunnel kills single device programs >60-90 s, so very long
        # epoch counts dispatch in MAX_EPOCHS_PER_DISPATCH chunks (at most
        # two compiled shapes: full chunk + tail).
        history = []
        hard = causality == "hard"
        for start in range(0, epochs, MAX_EPOCHS_PER_DISPATCH):
            n_ep = min(MAX_EPOCHS_PER_DISPATCH, epochs - start)
            nn, h = _train_flux_nn_scanned(
                nn, x, y, learning_rate, n_ep, gradient_scaling, dz_hat, soft_w, hard
            )
            history.append(jax.device_get(h))
        return nn, [float(v) for v in jnp.concatenate([jnp.asarray(h) for h in history])]

    history = []
    key = key if key is not None else jax.random.PRNGKey(0)
    for epoch in range(epochs):
        if batch_size is None:
            nn, opt_state, loss = step(nn, opt_state, x, y)
            epoch_loss = float(loss)
        else:
            key, sub = jax.random.split(key)
            perm = jax.random.permutation(sub, n)
            losses = []
            for start in range(0, n - batch_size + 1, batch_size):
                idx = perm[start : start + batch_size]
                nn, opt_state, loss = step(nn, opt_state, x[idx], y[idx])
                losses.append(float(loss))
            epoch_loss = sum(losses) / len(losses)  # epoch mean, not last batch
        history.append(epoch_loss)
        if callback is not None:
            callback(epoch, epoch_loss, nn)
    return nn, history
