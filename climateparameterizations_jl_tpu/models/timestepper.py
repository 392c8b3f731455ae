"""Fixed-step explicit timesteppers as fused ``lax.scan`` loops.

The reference integrates its NDEs with adaptive explicit solvers (ROCK4 /
Tsit5, ``wind_mixing/src/NDE_training.jl:291``) and differentiates through
them with a continuous interpolating adjoint. The TPU-native replacement is
**discretize-then-optimize**: a fixed-step integrator written as one
``lax.scan`` whose whole trajectory is compiled into a single XLA loop, with
exact reverse-mode gradients through the scan (optionally rematerialized with
``jax.checkpoint`` at the save-point granularity).

All steppers advance ``dx/dt = rhs(x, t)`` where ``x`` may carry arbitrary
leading batch axes (columns, simulations, ensemble members).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def euler_step(rhs, x, t, dt):
    return x + dt * rhs(x, t)


def heun_step(rhs, x, t, dt):
    k1 = rhs(x, t)
    k2 = rhs(x + dt * k1, t + dt)
    return x + 0.5 * dt * (k1 + k2)


def rk4_step(rhs, x, t, dt):
    k1 = rhs(x, t)
    k2 = rhs(x + 0.5 * dt * k1, t + 0.5 * dt)
    k3 = rhs(x + 0.5 * dt * k2, t + 0.5 * dt)
    k4 = rhs(x + dt * k3, t + dt)
    return x + (dt / 6.0) * (k1 + 2.0 * k2 + 2.0 * k3 + k4)


_STEPPERS = {"euler": euler_step, "heun": heun_step, "rk4": rk4_step}


def solve_fixed_step(rhs, x0, t0, dt_save, n_save: int, n_substeps: int = 1, method: str = "rk4", checkpoint: bool = True, unroll: int = 1):
    """Integrate and save ``n_save + 1`` states (including ``x0``) at uniform intervals.

    Args:
      rhs: ``(x, t) -> dx/dt``.
      x0: initial state, any pytree-free array with leading batch axes.
      t0: initial time (same units as the rhs expects).
      dt_save: interval between saved states.
      n_save: number of save intervals (output has ``n_save + 1`` frames).
      n_substeps: integrator steps per save interval.
      method: one of ``euler | heun | rk4``, or a callable
        ``step(rhs, x, t, dt) -> x`` for custom schemes (e.g. operator
        splits that need their own sub-structure per step).
      checkpoint: rematerialize each save interval in the backward pass —
        memory O(n_save) instead of O(n_save * n_substeps).
      unroll: scan unroll factor for the substep loop. The RK4 chain is
        op-issue latency-bound on TPU for small columns; ``unroll=4`` lets
        XLA schedule across steps (~+3% measured, forward-only runs).

    Returns:
      Array of shape ``(n_save + 1, *x0.shape)``.
    """
    step = method if callable(method) else _STEPPERS[method]
    dt = dt_save / n_substeps

    def interval(x, t_start):
        def substep(x, i):
            return step(rhs, x, t_start + i * dt, dt), None

        x, _ = jax.lax.scan(substep, x, jnp.arange(n_substeps), unroll=unroll)
        return x

    if checkpoint:
        interval = jax.checkpoint(interval)

    def save_body(x, i):
        x = interval(x, t0 + i * dt_save)
        return x, x

    _, xs = jax.lax.scan(save_body, x0, jnp.arange(n_save))
    return jnp.concatenate([x0[None], xs], axis=0)


def trajectory_times(t0, dt_save, n_save: int):
    """Save times matching :func:`solve_fixed_step` output."""
    return t0 + dt_save * jnp.arange(n_save + 1)


def stable_substeps(nu_max: float, dt_save: float, dz: float, method: str = "rk4", safety: float = 0.5) -> int:
    """Substep count keeping explicit diffusion stable: ``dt < safety * dz^2 / (2 nu)``.

    RK4's real-axis stability interval (~2.79) buys a bit more than Euler's 2;
    we conservatively use the Euler bound scaled by ``safety``.
    """
    if nu_max <= 0:
        return 1
    dt_stable = safety * dz * dz / (2.0 * nu_max)
    return max(1, int(jnp.ceil(dt_save / dt_stable)))
