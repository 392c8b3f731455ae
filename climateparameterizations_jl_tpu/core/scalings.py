"""Feature scalings as JAX pytree dataclasses.

Parity: reference ``src/DataWrangling/feature_scaling.jl:7-54`` —
``ZeroMeanUnitVarianceScaling(μ, σ)`` and ``MinMaxScaling(a, b, min, max)``,
callable objects with ``scale``/``unscale`` and ``Base.inv`` returning the
unscale closure. Here each scaling is a frozen dataclass registered as a
pytree, so scalings ride inside jitted functions, checkpoints, and vmapped
ensembles as ordinary leaves.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ZeroMeanUnitVarianceScaling:
    """``y = (x - mu) / sigma``."""

    mu: jnp.ndarray
    sigma: jnp.ndarray

    def scale(self, x):
        return (x - self.mu) / self.sigma

    def unscale(self, y):
        return self.sigma * y + self.mu

    def __call__(self, x):
        return self.scale(x)

    @classmethod
    def fit(cls, data) -> "ZeroMeanUnitVarianceScaling":
        data = jnp.asarray(data)
        # ddof=1 matches Julia's Statistics.std (reference feature_scaling.jl:18).
        sigma = jnp.std(data, ddof=1)
        # Constant fields (u = v = 0 in a free-convection-only suite) must
        # scale to 0, not NaN-poison every consumer (the reference divides
        # by zero here; deliberate robustness deviation).
        return cls(mu=jnp.mean(data), sigma=jnp.where(sigma > 0, sigma, jnp.ones_like(sigma)))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MinMaxScaling:
    """``y = a + (x - data_min) * (b - a) / (data_max - data_min)``."""

    a: jnp.ndarray
    b: jnp.ndarray
    data_min: jnp.ndarray
    data_max: jnp.ndarray

    def scale(self, x):
        return self.a + (x - self.data_min) * (self.b - self.a) / (self.data_max - self.data_min)

    def unscale(self, y):
        return self.data_min + (y - self.a) * (self.data_max - self.data_min) / (self.b - self.a)

    def __call__(self, x):
        return self.scale(x)

    @classmethod
    def fit(cls, data, a=0.0, b=1.0) -> "MinMaxScaling":
        data = jnp.asarray(data)
        lo, hi = jnp.min(data), jnp.max(data)
        # Same constant-field guard as ZeroMeanUnitVarianceScaling.fit:
        # widen a degenerate range to 1 instead of dividing by zero.
        hi = jnp.where(hi > lo, hi, lo + jnp.ones_like(hi))
        return cls(
            a=jnp.asarray(a, data.dtype),
            b=jnp.asarray(b, data.dtype),
            data_min=lo,
            data_max=hi,
        )


def fit_scaling(data, kind: str = "zero_mean_unit_variance"):
    """Fit a scaling of the given kind to ``data``."""
    if kind in ("zero_mean_unit_variance", "ZeroMeanUnitVarianceScaling"):
        return ZeroMeanUnitVarianceScaling.fit(data)
    if kind in ("min_max", "MinMaxScaling"):
        return MinMaxScaling.fit(data)
    raise ValueError(f"unknown scaling kind: {kind!r}")
