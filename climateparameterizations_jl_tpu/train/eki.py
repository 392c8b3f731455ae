"""Ensemble Kalman Inversion for parameter calibration + UQ.

The reference sketches (but never finishes) EKI for KPP calibration — a
commented-out ``EnsembleKalmanInversion`` scaffold in
``free_convection/train_kpp.jl:78-99``; the package tagline promises
"uncertainty quantification of parameterizations" (``README.md:7``). This
module delivers it, TPU-shaped:

- the whole ensemble's forward solves run as ONE vmapped program per
  iteration (J parameter sets -> J column trajectories in a single batched
  scan — the natural TPU batch axis);
- the Kalman update uses the **ensemble-subspace (Woodbury) form**, so only
  a ``(J, J)`` system is ever factorized no matter how long the observation
  vector is:

      (C_gg + s^2 I_d)^{-1} = s^{-2} (I_d - G'^T B^{-1} G'),
      B = (J - 1) s^2 I_J + G' G'^T,

  with ``G'`` the centered ensemble predictions ``(J, d)``;
- box priors are enforced exactly by running EKI in an unconstrained
  logit space and mapping through a sigmoid (the Kalman update never leaves
  the prior box).

Perturbed-observation EKI (Iglesias, Law & Stuart 2013): each iteration

    u_j <- u_j + C_ug (C_gg + s^2 I)^{-1} (y + eta_j - G(theta_j)),
    eta_j ~ N(0, s^2 I).

The final ensemble spread IS the uncertainty estimate.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class EKIResult:
    """Calibration output: constrained ensemble + summary statistics."""

    names: tuple
    ensemble: jnp.ndarray  # (J, p) final constrained parameters
    theta_mean: jnp.ndarray  # (p,)
    theta_std: jnp.ndarray  # (p,) ensemble spread = UQ
    misfit_history: list  # mean data misfit per iteration


def _to_constrained(u, lo, hi):
    return lo + (hi - lo) * jax.nn.sigmoid(u)


def _to_unconstrained(theta, lo, hi):
    p = jnp.clip((theta - lo) / (hi - lo), 1e-6, 1.0 - 1e-6)
    return jnp.log(p) - jnp.log1p(-p)


def eki_update(u, g, y, noise_std, key):
    """One perturbed-observation EKI step in unconstrained space.

    ``u``: ``(J, p)`` ensemble, ``g``: ``(J, d)`` forward evaluations,
    ``y``: ``(d,)`` observations. Jit-safe; only a ``(J, J)`` solve.
    """
    J = u.shape[0]
    s2 = noise_std**2
    u_c = u - jnp.mean(u, axis=0, keepdims=True)  # (J, p)
    g_c = g - jnp.mean(g, axis=0, keepdims=True)  # (J, d)

    eta = noise_std * jax.random.normal(key, g.shape, g.dtype)
    R = y[None, :] + eta - g  # (J, d) innovation with perturbed obs

    # Z = (C_gg + s2 I)^{-1} R^T via Woodbury, realized as (J, J) algebra:
    B = (J - 1) * s2 * jnp.eye(J, dtype=u.dtype) + g_c @ g_c.T  # (J, J)
    GR = g_c @ R.T  # (J, J)
    W = jax.scipy.linalg.solve(B, GR, assume_a="pos")  # (J, J)
    # delta_j = C_ug z_j with C_ug = U'^T G'/(J-1). Using B W = GR:
    # G' Z = (GR - G'G'^T W)/s2 = ((J-1) s2 W)/s2 = (J-1) W EXACTLY —
    # substituting avoids the catastrophic f32 cancellation of differencing
    # two O(|g|^2) matrices and dividing by the tiny s2.
    delta = (u_c.T @ W).T  # (J, p)
    return u + delta


def eki_calibrate(
    forward_fn: Callable,
    y_obs,
    priors: dict,
    key=None,
    n_ensemble: int = 64,
    n_iterations: int = 10,
    noise_std: float | None = None,
    batch_size: int | None = None,
    mesh=None,
    inflation: float = 1.0,
    tempered: bool = True,
) -> EKIResult:
    """Calibrate ``forward_fn``'s parameters to ``y_obs`` with EKI.

    ``forward_fn(values) -> (d,)`` must be jit/vmap-able (e.g. from
    ``make_kpp_forward_fn``); ``priors`` maps parameter names to uniform
    ``(lo, hi)`` bounds. ``noise_std`` defaults to 1% of the observation
    standard deviation.

    With a ``mesh`` (``jax.sharding.Mesh``), the ensemble axis of every
    forward evaluation is sharded over the mesh's first axis — EKI forward
    solves are embarrassingly parallel, so the whole population rides the
    device mesh with no collectives until the (tiny) Kalman update.
    Requires ``n_ensemble`` divisible by the mesh size; ``batch_size`` is
    then ignored (the mesh IS the batching).

    ``tempered=True`` (default) anneals the updates: each of the
    ``n_iterations`` Kalman steps uses noise variance ``n_iterations * s^2``
    (the SMC/tempering view — N partial-likelihood updates compose to one
    full update). Without it, when the model error dwarfs ``noise_std``
    (always true for a physics closure against LES data) the first update is
    wildly overconfident: the ensemble collapses EXACTLY onto a point in the
    sigmoid's saturated tails at a prior-box corner and freezes there with a
    WORSE misfit (observed on LES-generated data; no amount of
    post-collapse inflation recovers a zero-spread ensemble).

    ``inflation`` > 1 additionally applies multiplicative covariance
    inflation after each update (``u <- mean + inflation (u - mean)``) —
    useful to slow late-stage spread decay when the posterior std is the
    quantity of interest.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    names = tuple(priors.keys())
    y = jnp.asarray(y_obs)
    lo = jnp.asarray([priors[n][0] for n in names], y.dtype)
    hi = jnp.asarray([priors[n][1] for n in names], y.dtype)
    if noise_std is None:
        noise_std = 0.01 * float(jnp.std(y))

    key, k0 = jax.random.split(key)
    theta0 = lo + (hi - lo) * jax.random.uniform(k0, (n_ensemble, len(names)), y.dtype)
    u = _to_unconstrained(theta0, lo, hi)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_dev = mesh.devices.size
        if n_ensemble % n_dev:
            raise ValueError(f"n_ensemble={n_ensemble} must divide over the {n_dev}-device mesh")
        shard = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
        _vf = jax.jit(jax.vmap(forward_fn), out_shardings=shard)
        vforward = lambda theta: _vf(jax.device_put(theta, shard))  # noqa: E731
        batch_size = None
    else:
        vforward = jax.jit(jax.vmap(forward_fn))
    # Tempering: each of the N steps assimilates likelihood^(1/N), i.e.
    # noise variance N * s^2 <=> noise std sqrt(N) * s per step.
    step_noise = noise_std * (float(n_iterations) ** 0.5 if tempered else 1.0)
    update = jax.jit(lambda u, g, k: eki_update(u, g, y, jnp.asarray(step_noise, y.dtype), k))

    def evaluate(theta):
        if batch_size is None:
            return vforward(theta)
        chunks = [vforward(theta[i : i + batch_size]) for i in range(0, theta.shape[0], batch_size)]
        return jnp.concatenate(chunks)

    # Diverged ensemble members (stiff parameter draws blowing up the
    # forward solve) must not poison the Kalman update: bound every
    # prediction to a wide band around the data (standard EKI failure
    # handling) so innovations stay large-but-finite in f32.
    span = float(jnp.max(y) - jnp.min(y)) + 1e-12
    g_lo, g_hi = float(jnp.min(y)) - 100.0 * span, float(jnp.max(y)) + 100.0 * span

    def sanitized_eval(theta):
        g = evaluate(theta)
        return jnp.clip(jnp.where(jnp.isfinite(g), g, g_hi), g_lo, g_hi)

    misfits = []
    for _ in range(n_iterations):
        theta = _to_constrained(u, lo, hi)
        g = sanitized_eval(theta)
        misfits.append(float(jnp.mean((g - y[None, :]) ** 2)))
        key, k = jax.random.split(key)
        u = update(u, g, k)
        if inflation != 1.0:
            u_mean = jnp.mean(u, axis=0, keepdims=True)
            u = u_mean + inflation * (u - u_mean)

    theta = _to_constrained(u, lo, hi)
    # Final entry = the misfit of the ensemble actually returned (the loop
    # records pre-update misfits, which lag the returned parameters by one
    # Kalman step).
    misfits.append(float(jnp.mean((sanitized_eval(theta) - y[None, :]) ** 2)))
    return EKIResult(
        names=names,
        ensemble=theta,
        theta_mean=jnp.mean(theta, axis=0),
        theta_std=jnp.std(theta, axis=0),
        misfit_history=misfits,
    )


def calibrate_kpp_eki(
    ds,
    tsteps,
    Nz: int,
    key=None,
    priors: dict | None = None,
    n_ensemble: int = 64,
    n_iterations: int = 10,
    base_params=None,
    n_substeps: int = 1,
    mesh=None,
    inflation: float = 1.0,
):
    """KPP calibration via EKI (the reference's unfinished ``train_kpp.jl:78-99``).

    Returns ``(KPPParameters at the ensemble mean, EKIResult)`` — the result
    carries per-parameter posterior spread (UQ).
    """
    from climateparameterizations_jl_tpu.train.kpp_calibration import (
        DEFAULT_PRIORS,
        _with_overrides,
        make_kpp_forward_fn,
    )
    from climateparameterizations_jl_tpu.physics.kpp import KPPParameters

    priors = priors if priors is not None else dict(DEFAULT_PRIORS)
    names = tuple(priors.keys())
    base = base_params if base_params is not None else KPPParameters.default()
    forward, y = make_kpp_forward_fn(ds, tsteps, Nz, base, names, n_substeps)
    result = eki_calibrate(
        forward, y, priors, key=key, n_ensemble=n_ensemble, n_iterations=n_iterations,
        mesh=mesh, inflation=inflation,
    )
    calibrated = _with_overrides(base, names, [result.theta_mean[i] for i in range(len(names))])
    return calibrated, result
