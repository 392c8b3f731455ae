"""KPP parameter calibration: random plugin search + random line search.

Parity: ``free_convection/train_kpp.jl:101-249`` — the reference draws
``n`` random parameter sets from uniform priors (``RandomPlugin``), keeps the
best, then refines with a numerical-gradient random line search
(``RandomLineSearch``), each loss evaluation being one full KPP column solve
against the LES truth.

TPU-native twist: every search stage evaluates its whole candidate
population **in one vmapped KPP solve** — 100 plugin candidates or 12
line-search step sizes run as a single batched program (the reference's
serial loop does one 25.8 ms column per candidate,
``wind_mixing/Benchmarking.jl:25``). The calibrated subset is a dict of
field names (defaults ``CSL, CNL, Cb_T, CKE`` — ``train_kpp.jl:205-210``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from climateparameterizations_jl_tpu.data.containers import ColumnTimeSeries
from climateparameterizations_jl_tpu.physics.kpp import (
    KPPForcing,
    KPPParameters,
    KPPState,
    solve_kpp,
)

DEFAULT_PRIORS = {
    # train_kpp.jl:205-210 (uniform priors over the four free parameters)
    "CSL": (0.01, 0.99),
    "CNL": (0.0, 8.0),
    "Cb_T": (0.0, 6.0),
    "CKE": (0.0, 5.0),
}


def _with_overrides(base: KPPParameters, names, values) -> KPPParameters:
    return dataclasses.replace(base, **{n: v for n, v in zip(names, values)})


def make_kpp_loss_fn(
    ds: ColumnTimeSeries,
    tsteps,
    Nz: int,
    base_params: KPPParameters | None = None,
    names: tuple = ("CSL", "CNL", "Cb_T", "CKE"),
    n_substeps: int = 1,
) -> Callable:
    """Loss(values) = MSE of the KPP temperature trajectory vs the dataset.

    ``values`` is a vector ordered like ``names``. The returned function is
    jit/vmap-able, so populations of parameter sets evaluate in one solve.
    """
    forward, y = make_kpp_forward_fn(ds, tsteps, Nz, base_params, names, n_substeps)

    def loss(values):
        return jnp.mean((forward(values) - y) ** 2)

    return loss


def make_kpp_forward_fn(
    ds: ColumnTimeSeries,
    tsteps,
    Nz: int,
    base_params: KPPParameters | None = None,
    names: tuple = ("CSL", "CNL", "Cb_T", "CKE"),
    n_substeps: int = 1,
):
    """Forward map for ensemble methods: ``values -> flattened T trajectory``.

    Returns ``(forward_fn, y_obs)`` where ``y_obs`` is the matching flattened
    LES truth — the ``(G, y)`` pair Ensemble Kalman Inversion needs
    (the reference's commented-out EKI scaffold, ``train_kpp.jl:78-99``).
    """
    import numpy as np

    tsteps = np.asarray(tsteps)
    T_truth = jnp.take(ds.T, jnp.asarray(tsteps), axis=-2)
    t_row = ds.t[0] if ds.t.ndim > 1 else ds.t
    t_save = jnp.take(t_row, jnp.asarray(tsteps))
    # solve_kpp integrates a fixed step derived from (t[-1]-t[0])/n_save: a
    # non-uniform tstep selection would silently fit KPP states at wrong
    # times against truth at the real times.
    from climateparameterizations_jl_tpu.train.nde import _require_uniform

    _require_uniform(t_save, "make_kpp_forward_fn")
    base = base_params if base_params is not None else KPPParameters.default()
    i0 = tsteps[0]
    state0 = KPPState(U=ds.u[..., i0, :], V=ds.v[..., i0, :], T=ds.T[..., i0, :])
    # Diurnal datasets carry a sinusoidal surface flux; fitting KPP against
    # their trajectories under a CONSTANT flux equal to the amplitude would
    # calibrate to wrong physics with no error. solve_kpp's diurnal path
    # treats Fb as the daily amplitude — thread it from the dataset.
    diurnal = ds.diurnal_amplitude is not None and bool(
        np.any(np.asarray(ds.diurnal_amplitude) != 0.0)
    )
    if diurnal and bool(np.any(np.asarray(ds.diurnal_amplitude) == 0.0)):
        raise ValueError(
            "make_kpp_forward_fn: mixed diurnal/constant suite — calibrate these "
            "separately (solve_kpp's diurnal flag is whole-batch)"
        )
    theta_surface = ds.diurnal_amplitude if diurnal else ds.theta_top
    forcing = KPPForcing(
        Fu=ds.u_top, Fb=theta_surface * ds.g * ds.alpha, dTdz_bottom=ds.theta_bottom
    )

    def forward(values):
        values = jnp.asarray(values, ds.T.dtype)
        params = _with_overrides(base, names, [values[i] for i in range(len(names))])
        # solve_kpp returns time-major (Nt, ..., Nz); truth is (..., Nt, Nz).
        sol = solve_kpp(
            state0, t_save, params, forcing, ds.H, Nz, ds.f, ds.g, ds.alpha,
            n_substeps=n_substeps, diurnal=diurnal,
        )
        return jnp.moveaxis(sol.T, 0, -2).reshape(-1)

    return forward, T_truth.reshape(-1)


def random_plugin(
    loss_fn: Callable,
    priors: dict,
    n_samples: int,
    key,
    batch_size: int | None = None,
):
    """Uniform random search; the population evaluates in one vmapped solve.

    Returns ``(best_values, best_loss, all_losses)``.
    Parity: ``RandomPlugin`` / ``optimize`` (``train_kpp.jl:101-152``).
    """
    names = list(priors.keys())
    lo = jnp.asarray([priors[n][0] for n in names])
    hi = jnp.asarray([priors[n][1] for n in names])
    candidates = lo + (hi - lo) * jax.random.uniform(key, (n_samples, len(names)))

    batched_loss = jax.jit(jax.vmap(loss_fn))
    if batch_size is None:
        losses = batched_loss(candidates)
    else:
        chunks = [batched_loss(candidates[i : i + batch_size]) for i in range(0, n_samples, batch_size)]
        losses = jnp.concatenate(chunks)
    losses = jnp.where(jnp.isfinite(losses), losses, jnp.inf)
    best = jnp.argmin(losses)
    return candidates[best], losses[best], losses


def random_line_search(
    loss_fn: Callable,
    values0,
    key,
    n_iters: int = 20,
    n_steps: int = 12,
    max_step: float = 0.5,
    fd_eps: float = 1e-4,
    bounds: tuple | None = None,
):
    """Numerical-gradient line search along one random coordinate per iteration.

    Each iteration: pick a random coordinate, finite-difference the loss,
    then evaluate a geometric ladder of ``n_steps`` step sizes along the
    descent direction **in one vmapped batch** and keep the best.
    Parity: ``RandomLineSearch`` (``train_kpp.jl:154-249``).
    """
    values = jnp.asarray(values0, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    n_dim = values.shape[0]
    batched_loss = jax.jit(jax.vmap(loss_fn))
    scalar_loss = jax.jit(loss_fn)
    steps = max_step * jnp.geomspace(1e-3, 1.0, n_steps)

    history = [float(scalar_loss(values))]
    for it in range(n_iters):
        key, k1 = jax.random.split(key)
        coord = int(jax.random.randint(k1, (), 0, n_dim))
        e = jnp.zeros_like(values).at[coord].set(1.0)
        g = (scalar_loss(values + fd_eps * e) - scalar_loss(values - fd_eps * e)) / (2 * fd_eps)
        direction = -jnp.sign(g)
        scale = jnp.maximum(jnp.abs(values[coord]), 1e-2)
        candidates = values[None, :] + (direction * scale * steps)[:, None] * e[None, :]
        if bounds is not None:
            lo, hi = bounds
            candidates = jnp.clip(candidates, jnp.asarray(lo), jnp.asarray(hi))
        losses = batched_loss(candidates)
        losses = jnp.where(jnp.isfinite(losses), losses, jnp.inf)
        best = jnp.argmin(losses)
        if float(losses[best]) < history[-1]:
            values = candidates[best]
            history.append(float(losses[best]))
        else:
            history.append(history[-1])
    return values, history


def gradient_refine_kpp(
    loss_fn: Callable,
    values0,
    bounds: tuple,
    n_iters: int = 100,
    learning_rate: float = 0.02,
):
    """Projected-Adam refinement with EXACT gradients through the KPP solve.

    The reference never had this (its ``RandomLineSearch`` uses one-coordinate
    finite differences because Zygote could not differentiate OceanTurb);
    here the whole column solve is differentiable — ``kpp_step``'s velocity
    scales/bulk-Ri guards keep the gradients finite in every forcing regime
    (``tests/test_kpp_tke.py::test_full_step_grads_finite_across_regimes``).
    Same best-evaluated-iterate + box-projection conventions as
    ``mpp_calibration.optimise_mpp_parameters``. Returns ``(values, history)``.
    """
    import optax

    lo, hi = (jnp.asarray(b, jnp.result_type(float)) for b in bounds)
    values = jnp.asarray(values0, jnp.result_type(float))
    # Optimize in box-normalized units so one learning rate fits parameters
    # whose scales span [0.01, 8]. Degenerate bounds (lo == hi) pin that
    # coordinate: theta is normalized by a safe span but mapped back through
    # the true (zero) span, so the value stays at lo with a zero gradient
    # instead of NaN-poisoning the whole refinement.
    span = hi - lo
    safe_span = jnp.where(span > 0, span, 1.0)
    theta = jnp.clip((values - lo) / safe_span, 0.0, 1.0)
    opt = optax.adam(learning_rate)
    opt_state = opt.init(theta)

    @jax.jit
    def step(theta, opt_state):
        loss, g = jax.value_and_grad(lambda th: loss_fn(lo + span * th))(theta)
        updates, opt_state = opt.update(g, opt_state, theta)
        theta = jnp.clip(optax.apply_updates(theta, updates), 0.0, 1.0)
        return theta, opt_state, loss

    if n_iters == 0:
        # Still report the loss of the (returned) initial point so callers can
        # rely on min(history) == loss of the returned values.
        return lo + span * theta, [float(jax.jit(loss_fn)(lo + span * theta))]
    history = []
    best_loss, best_theta = float("inf"), theta
    for _ in range(n_iters):
        new_theta, opt_state, loss = step(theta, opt_state)
        history.append(float(loss))
        if history[-1] < best_loss:
            best_loss, best_theta = history[-1], theta
        theta = new_theta
    return lo + span * best_theta, history


def calibrate_kpp(
    ds: ColumnTimeSeries,
    tsteps,
    Nz: int,
    key=None,
    priors: dict | None = None,
    n_plugin: int = 128,
    n_line_search: int = 30,
    base_params: KPPParameters | None = None,
    n_substeps: int = 1,
    refine: str = "line-search",
) -> tuple[KPPParameters, dict]:
    """Full calibration pipeline: plugin search then refinement.

    ``refine="line-search"`` is the reference's recipe (finite-difference
    random line search, ``train_kpp.jl:212-249``); ``refine="gradient"``
    swaps in projected Adam with exact gradients through the solve
    (:func:`gradient_refine_kpp`). Returns the calibrated
    :class:`KPPParameters` and an info dict with the loss history.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    priors = priors if priors is not None else dict(DEFAULT_PRIORS)
    names = tuple(priors.keys())
    base = base_params if base_params is not None else KPPParameters.default()
    loss_fn = make_kpp_loss_fn(ds, tsteps, Nz, base, names, n_substeps)

    k1, k2 = jax.random.split(key)
    best_values, best_loss, plugin_losses = random_plugin(loss_fn, priors, n_plugin, k1)
    lo = [priors[n][0] for n in names]
    hi = [priors[n][1] for n in names]
    if refine == "gradient":
        values, history = gradient_refine_kpp(loss_fn, best_values, (lo, hi), n_iters=n_line_search)
    elif refine == "line-search":
        values, history = random_line_search(loss_fn, best_values, k2, n_iters=n_line_search, bounds=(lo, hi))
    else:
        raise ValueError(f"unknown refine method {refine!r} (line-search | gradient)")

    calibrated = _with_overrides(base, names, [values[i] for i in range(len(names))])
    info = {
        "names": names,
        "values": values,
        "plugin_best_loss": float(best_loss),
        # Loss of the ADOPTED parameters. Both refiners return their best
        # evaluated iterate, so that loss is min(history) — the line search's
        # history is monotone best-so-far (min == last), while the gradient
        # refiner's is the raw non-monotone Adam trace (last iterate can be
        # worse than the returned best).
        "final_loss": min(history),
        "history": history,
    }
    return calibrated, info
