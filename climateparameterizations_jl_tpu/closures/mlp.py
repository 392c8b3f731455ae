"""MLP flux closures as plain JAX pytrees.

The reference's closures are tiny Flux chains:

- free convection: ``Dense(Nz, 4Nz, relu) -> Dense(4Nz, 4Nz, relu) ->
  Dense(4Nz, Nz-1)`` mapping a scaled T profile to the Nz-1 interior heat
  fluxes (``free_convection/train_free_convection_nde.jl:110-122``).
- wind mixing: ``Dense(3Nz, 50, mish) -> Dense(50, 20, mish) ->
  Dense(20, Nz-1)`` per flux (``wind_mixing/train_NDE.jl:97-109``), or the
  wide ``Dense(3Nz, 400, relu) -> Dense(400, Nz-1)`` for direct flux
  regression (``wind_mixing/train_NN.jl``).

TPU design: a dataclass pytree of ``(W, b)`` layers applied with
``x @ W.T + b`` on the LAST axis, so one call serves a single column or a
``(batch, features)`` block; the matmuls land on the MXU when batched. The
activation is a static (hashable) field, so jit caches per architecture.

``destructure`` flattens all parameters into one vector and returns a
rebuild function — the same contract as ``Flux.destructure`` that the
reference leans on for its ODE parameter vectors
(``wind_mixing/src/NDE_training.jl:11-13``) and checkpoint formats.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
    "gelu": jax.nn.gelu,
    "swish": jax.nn.swish,
    "linear": lambda x: x,
}


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MLP:
    """Feed-forward network: ``weights[i]`` has shape ``(out_i, in_i)`` (Flux layout)."""

    weights: tuple
    biases: tuple
    activation: str = dataclasses.field(metadata=dict(static=True), default="relu")

    @property
    def sizes(self) -> tuple:
        return tuple(w.shape[1] for w in self.weights) + (self.weights[-1].shape[0],)

    def __call__(self, x):
        return mlp_apply(self, x)


def mlp_init(key, sizes: Sequence[int], activation: str = "relu", dtype=jnp.float32, scale: float = 1.0) -> MLP:
    """Glorot-uniform init (Flux's default for ``Dense``), optional weight scale.

    ``scale`` supports the reference's ``weights ./ 1f5`` near-zero init for
    NDE training (``wind_mixing/train_NDE.jl:102-109``).
    """
    if activation not in _ACTIVATIONS:
        raise ValueError(f"unknown activation {activation!r}; choose from {sorted(_ACTIVATIONS)}")
    keys = jax.random.split(key, len(sizes) - 1)
    weights, biases = [], []
    for k, fan_in, fan_out in zip(keys, sizes[:-1], sizes[1:]):
        bound = np.sqrt(6.0 / (fan_in + fan_out))
        W = jax.random.uniform(k, (fan_out, fan_in), dtype, -bound, bound) * scale
        weights.append(W)
        biases.append(jnp.zeros((fan_out,), dtype))
    return MLP(weights=tuple(weights), biases=tuple(biases), activation=activation)


def mlp_apply(nn: MLP, x):
    """Apply over the last axis; batches over leading axes (MXU-friendly)."""
    act = _ACTIVATIONS[nn.activation]
    n = len(nn.weights)
    for i, (W, b) in enumerate(zip(nn.weights, nn.biases)):
        x = jnp.einsum("oi,...i->...o", W, x, preferred_element_type=x.dtype) + b
        if i < n - 1:
            x = act(x)
    return x


def free_convection_mlp(key, Nz: int = 32, activation: str = "relu", dtype=jnp.float32) -> MLP:
    """``Nz -> 4Nz -> 4Nz -> Nz-1`` heat-flux closure (``train_free_convection_nde.jl:110-116``)."""
    return mlp_init(key, (Nz, 4 * Nz, 4 * Nz, Nz - 1), activation, dtype)


def wind_mixing_mlp(key, Nz: int = 32, hidden=(50, 20), activation: str = "mish", dtype=jnp.float32, scale: float = 1.0) -> MLP:
    """``3Nz -> hidden... -> Nz-1`` momentum/heat-flux closure (``train_NDE.jl:97-109``)."""
    return mlp_init(key, (3 * Nz, *hidden, Nz - 1), activation, dtype, scale=scale)


def destructure(nn: MLP):
    """Flatten parameters to one vector + a rebuild fn.

    Functional parity with ``Flux.destructure`` (round-trips through this
    module's own rebuild), but NOT byte-layout parity: the flat order here
    is pytree order (all weights row-major, then biases), while Flux
    interleaves per-layer column-major W/b — do not feed vectors exported
    from the Julia reference through ``rebuild``.
    """
    leaves, treedef = jax.tree_util.tree_flatten(nn)
    shapes = [leaf.shape for leaf in leaves]
    sizes = [int(np.prod(s)) for s in shapes]
    flat = jnp.concatenate([jnp.ravel(leaf) for leaf in leaves]) if leaves else jnp.zeros((0,))

    def rebuild(vector):
        out, offset = [], 0
        for shape, size in zip(shapes, sizes):
            out.append(jnp.reshape(vector[offset : offset + size], shape))
            offset += size
        return jax.tree_util.tree_unflatten(treedef, out)

    return flat, rebuild


# ----------------------------------------------------------------------------
# Convolutional closure variant + spatial-causality constraints
# ----------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ConvMLP:
    """1-D conv front-end + dense MLP: the reference's ``--conv`` variant.

    Parity: ``Chain(Conv((w, 1), 1 => 1, relu), Dense(Nz - w + 1, 4Nz, relu),
    Dense(4Nz, 4Nz, relu), Dense(4Nz, Nz - 1))``
    (``free_convection/train_free_convection_nde.jl:110-118``). The valid
    (no-padding) single-channel convolution is applied as ``w`` shifted adds
    — an XLA-fusable stencil, no im2col needed at these sizes.
    """

    kernel: jnp.ndarray  # (width,)
    conv_bias: jnp.ndarray  # ()
    mlp: MLP

    @property
    def width(self) -> int:
        return self.kernel.shape[0]

    def __call__(self, x):
        return conv_mlp_apply(self, x)


def conv_mlp_apply(nn: ConvMLP, x):
    """Apply over the last axis ``(..., Nz) -> (..., n_out)``."""
    w = nn.width
    n = x.shape[-1]
    out = nn.kernel[0] * x[..., : n - w + 1]
    for k in range(1, w):
        out = out + nn.kernel[k] * x[..., k : n - w + 1 + k]
    out = jax.nn.relu(out + nn.conv_bias)
    return mlp_apply(nn.mlp, out)


def free_convection_conv_mlp(key, Nz: int = 32, conv_width: int = 2, activation: str = "relu", dtype=jnp.float32) -> ConvMLP:
    """Conv variant of the free-convection closure (``--conv w`` with w > 1)."""
    k1, k2 = jax.random.split(key)
    bound = np.sqrt(6.0 / (conv_width + 1))
    kernel = jax.random.uniform(k1, (conv_width,), dtype, -bound, bound)
    mlp = mlp_init(k2, [Nz - conv_width + 1, 4 * Nz, 4 * Nz, Nz - 1], activation, dtype)
    return ConvMLP(kernel=kernel, conv_bias=jnp.zeros((), dtype), mlp=mlp)


def _first_dense(nn):
    return nn.mlp if isinstance(nn, ConvMLP) else nn


def spatial_causality_mask(shape: tuple) -> jnp.ndarray:
    """Boolean mask of "acausal" first-layer entries: ``mask[i, j] = i < j``.

    Matches the reference's ``[x < y for x in 1:nrows, y in 1:ncols]`` on the
    first dense layer's ``(n_out, n_in)`` weight
    (``train_free_convection_nde.jl:188-193``).
    """
    i = jnp.arange(shape[0])[:, None]
    j = jnp.arange(shape[1])[None, :]
    return i < j


def spatial_causality_penalty(nn) -> jnp.ndarray:
    """Soft penalty ``sum(W1[mask]^2)`` (``train_free_convection_nde.jl:195-197``)."""
    W1 = _first_dense(nn).weights[0]
    return jnp.sum(jnp.where(spatial_causality_mask(W1.shape), W1, 0.0) ** 2)


def apply_spatial_causality_mask(nn):
    """Hard variant: zero the acausal entries of EVERY weight matrix.

    Parity: the masked-weight trainer ``dense_spatial_causality_train!``
    (``free_convection/src/training.jl:24-42``) masks every weight matrix
    (its loop strides over all W's) — lower-triangularity only survives
    composition if all layers are masked; a first-layer-only mask leaves
    output face ``i`` depending on every input level through the dense
    hidden layers. Call after each optimizer update.
    """
    dense = _first_dense(nn)
    masked = tuple(
        jnp.where(spatial_causality_mask(W.shape), 0.0, W) for W in dense.weights
    )
    new_dense = dataclasses.replace(dense, weights=masked)
    if isinstance(nn, ConvMLP):
        return dataclasses.replace(nn, mlp=new_dense)
    return new_dense


def apply_closure(nn, x):
    """Apply either closure flavor (MLP or ConvMLP) over the last axis."""
    return conv_mlp_apply(nn, x) if isinstance(nn, ConvMLP) else mlp_apply(nn, x)
