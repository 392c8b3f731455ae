"""Profile fixer: remove negative temperature gradients by sweeping downward.

Parity: reference ``src/DataWrangling/convective_adjust.jl:6-16`` — an
in-place top-down sweep over 1-based indices ``length(x)-3 : -1 : 2``. The
sweep is inherently sequential (each fix can expose the next), so it runs as
a ``lax.fori_loop`` over a functional carry; batches go through ``vmap``.

This is the *data-wrangling* fixer. The differentiable convective-adjustment
closures used inside NDEs live in ``physics.convective_adjustment``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def convective_adjust_profile(x: jnp.ndarray) -> jnp.ndarray:
    """Return a copy of profile(s) ``x`` (bottom->top on the LAST axis) with
    unstable kinks removed; leading axes batch."""
    x = jnp.asarray(x)
    n = x.shape[-1]

    def body(j, arr):
        # Julia i runs length(x)-3 down to 2 (1-based) => 0-based i = n-4 down to 1.
        # Index the LAST axis (level), never axis 0 — a batched (B, n) input
        # indexed on axis 0 would compare whole rows and silently clamp
        # out-of-bounds row indices under jit.
        i = n - 4 - j
        xi, xip, xim = arr[..., i], arr[..., i + 1], arr[..., i - 1]
        new = jnp.where(xim > xi, xip, 0.5 * (xim + xip))
        return arr.at[..., i].set(jnp.where(xi > xip, new, xi))

    return jax.lax.fori_loop(0, n - 4, body, x) if n >= 5 else x
