"""Prediction helper: run a closure over a dataset, scaled or unscaled.

Parity: ``src/predict.jl:12-34`` — apply a fitted model to every snapshot of
a flux dataset and return ``(prediction, truth)`` matrices, optionally
unscaled back to dimensional units. The reference loops snapshots and
hcat's; here the model is applied to the whole ``(N, features)`` block at
once (one batched MLP/GP call).
"""

from __future__ import annotations

import jax.numpy as jnp


def predict(model_fn, x, y, unscale_fn=None):
    """Apply ``model_fn`` to all rows of ``x``; return ``(pred, truth)``.

    ``x``: ``(N, n_features)`` scaled inputs; ``y``: ``(N, n_out)`` scaled
    targets. If ``unscale_fn`` is given both outputs are mapped back to
    dimensional units (the ``scaled=false`` path of ``predict.jl:22-33``).
    """
    pred = model_fn(x)
    truth = jnp.asarray(y)
    if unscale_fn is not None:
        pred = unscale_fn(pred)
        truth = unscale_fn(truth)
    return pred, truth
