"""Exact Gaussian-process regression for flux closures, TPU-batched.

Parity: the reference's ``src/GaussianProcesses/`` family —
``kernels.jl:19-204`` (SquaredExponential / Matern 1/2, 3/2, 5/2 /
RationalQuadratic kernels with signal variance ``sigma`` and length scale
``gamma``), ``distances.jl:25-45`` (l^2, H^1 "derivative" and H^-1
"antiderivative" distances w.r.t. the grid ``z``), and
``gaussian_process.jl:14-202`` (robust-Cholesky exact GP with jittered
diagonal, mean prediction, posterior variance, mean log marginal
likelihood). Model selection (``best_kernel`` grid search over kernel
families x log gamma, ``get_kernel`` id factory) mirrors
``GaussianProcesses.jl:30-143``.

TPU re-design: the reference evaluates ``k(x, x_i)`` in per-pair Julia
loops (``gaussian_process.jl:113-117,153-162``); here every distance is a
**pairwise matrix** computed from one batched feature transform plus a
Gram-trick matmul (MXU), the fit is one Cholesky, and prediction for any
batch of states is a single ``(m, n) @ (n, D)`` matmul. GPs are pure linear
algebra — ideal TPU citizens.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

# ---------------------------------------------------------------------------
# Distances (feature transforms + pairwise l2)
# ---------------------------------------------------------------------------


def _derivative_features(X, z):
    """H^1 transform: first differences over dz (``distances.jl:3,36``)."""
    dz = jnp.diff(jnp.asarray(z, X.dtype))
    return jnp.diff(X, axis=-1) / dz


def _antiderivative_features(X, z):
    """H^-1 transform: first differences times dz (``distances.jl:45``)."""
    dz = jnp.diff(jnp.asarray(z, X.dtype))
    return jnp.diff(X, axis=-1) * dz


_DISTANCE_TRANSFORMS = {
    "euclidean": lambda X, z: X,
    "derivative": _derivative_features,
    "antiderivative": _antiderivative_features,
}


def pairwise_sq_distances(A, B):
    """``(m, n)`` squared l2 distances via the Gram trick (one matmul)."""
    aa = jnp.sum(A * A, axis=-1)[:, None]
    bb = jnp.sum(B * B, axis=-1)[None, :]
    ab = A @ B.T
    return jnp.maximum(aa + bb - 2.0 * ab, 0.0)


def distance_matrix(A, B, z, metric: str = "euclidean"):
    """Pairwise distances after the metric's feature transform."""
    tf = _DISTANCE_TRANSFORMS[metric]
    return jnp.sqrt(pairwise_sq_distances(tf(A, z), tf(B, z)))


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GPKernel:
    """Stationary kernel: family + (sigma, gamma, alpha) + distance metric.

    Families (ids follow the reference's ``get_kernel`` factory,
    ``GaussianProcesses.jl:125-143``):
      1 squared_exponential: ``sigma * exp(-d^2 / 2 gamma^2)``
      2 matern12:            ``sigma * exp(-d / gamma)``
      3 matern32:            ``sigma * (1 + c) exp(-c)``, ``c = sqrt(3) d / gamma``
      4 matern52:            ``sigma * (1 + g + h) exp(-g)``, ``g = sqrt(5) d / gamma``,
                             ``h = 5 d^2 / (3 gamma^2)``
      5 rational_quadratic:  ``sigma * (1 + d^2 / (2 alpha gamma^2))^-alpha``
    """

    gamma: jnp.ndarray
    sigma: jnp.ndarray
    alpha: jnp.ndarray
    family: str = dataclasses.field(metadata=dict(static=True), default="squared_exponential")
    metric: str = dataclasses.field(metadata=dict(static=True), default="euclidean")

    def __call__(self, d):
        g, s = self.gamma, self.sigma
        if self.family == "squared_exponential":
            return s * jnp.exp(-(d**2) / (2.0 * g**2))
        if self.family == "matern12":
            return s * jnp.exp(-d / g)
        if self.family == "matern32":
            c = jnp.sqrt(3.0) * d / g
            return s * (1.0 + c) * jnp.exp(-c)
        if self.family == "matern52":
            c = jnp.sqrt(5.0) * d / g
            h = 5.0 * d**2 / (3.0 * g**2)
            return s * (1.0 + c + h) * jnp.exp(-c)
        if self.family == "rational_quadratic":
            return s * (1.0 + d**2 / (2.0 * self.alpha * g**2)) ** (-self.alpha)
        raise ValueError(f"unknown kernel family {self.family!r}")


_FAMILY_IDS = {1: "squared_exponential", 2: "matern12", 3: "matern32", 4: "matern52", 5: "rational_quadratic"}


def get_kernel(kernel_id: int, log_gamma: float, log_sigma: float, metric: str = "euclidean", alpha: float = 1.0, dtype=jnp.float64) -> GPKernel:
    """Factory with the reference's ``10^x`` hyperparameter transform."""
    return GPKernel(
        gamma=jnp.asarray(10.0**log_gamma, dtype),
        sigma=jnp.asarray(10.0**log_sigma, dtype),
        alpha=jnp.asarray(alpha, dtype),
        family=_FAMILY_IDS[kernel_id],
        metric=metric,
    )


# ---------------------------------------------------------------------------
# Exact GP
# ---------------------------------------------------------------------------


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GPModel:
    """Fitted exact GP: training inputs + Cholesky factor + weights.

    ``x_train``: ``(n, D_in)``; ``alpha``: ``(n, D_out)``; ``chol``: lower
    Cholesky of the jittered kernel matrix; ``z``: grid for the distance
    transforms.
    """

    kernel: GPKernel
    x_train: jnp.ndarray
    z: jnp.ndarray
    alpha: jnp.ndarray
    chol: jnp.ndarray


def gp_fit(x_train, y_train, kernel: GPKernel, z, jitter_scale: float | None = None) -> GPModel:
    """Fit the posterior weights (robust Cholesky; ``gaussian_process.jl:48-82``)."""
    x_train = jnp.asarray(x_train)
    y_train = jnp.asarray(y_train)
    D = distance_matrix(x_train, x_train, z, kernel.metric)
    K = kernel(D)
    if jitter_scale is None:
        import numpy as np

        jitter_scale = float(np.sqrt(np.finfo(np.float64).eps))  # numpy: stays concrete under jit
    K = K + jnp.max(K) * jitter_scale * jnp.eye(K.shape[0], dtype=K.dtype)
    chol = jsl.cholesky(K, lower=True)
    alpha = jsl.cho_solve((chol, True), y_train)
    return GPModel(kernel=kernel, x_train=x_train, z=jnp.asarray(z), alpha=alpha, chol=chol)


def gp_predict(model: GPModel, x):
    """Mean prediction for a batch ``(m, D_in) -> (m, D_out)`` (one matmul).

    Parity: ``model_output`` (``gaussian_process.jl:112-117``), vectorized.
    """
    x = jnp.atleast_2d(jnp.asarray(x))
    d = distance_matrix(x, model.x_train, model.z, model.kernel.metric)
    return model.kernel(d) @ model.alpha


def gp_uncertainty(model: GPModel, x):
    """Posterior variance at each query point (``gaussian_process.jl:130-139``)."""
    x = jnp.atleast_2d(jnp.asarray(x))
    kx = model.kernel(distance_matrix(x, model.x_train, model.z, model.kernel.metric))  # (m, n)
    v = jsl.cho_solve((model.chol, True), kx.T)  # (n, m)
    k_self = model.kernel(jnp.zeros((x.shape[0],), x.dtype))
    return k_self - jnp.sum(kx.T * v, axis=0)


def mean_log_marginal_loss(model: GPModel, y_train, add_constant: bool = False):
    """Mean (over output dims) negative log marginal likelihood terms.

    Parity: ``mean_log_marginal_loss`` (``gaussian_process.jl:182-202``).
    """
    y = jnp.asarray(y_train)
    n, D = y.shape
    total = -0.5 * jnp.sum(y * model.alpha) / D
    if add_constant:
        c = jnp.sum(jnp.log(jnp.diag(model.chol))) + 0.5 * n * jnp.log(2.0 * jnp.pi)
        total = total - c
    return total


# ---------------------------------------------------------------------------
# Model selection (grid search)
# ---------------------------------------------------------------------------


def gp_flux_model(x_train, y_train, z, kernel: GPKernel):
    """Reference's ``gp_model`` wrapper (``GaussianProcesses.jl:77-101``):
    fit on (scaled state -> scaled flux) pairs and return a predict fn."""
    model = gp_fit(x_train, y_train, kernel, z)
    return model, partial(gp_predict, model)


def error_per_gamma(x_train, y_train, x_val, y_val, z, kernel_id: int, log_gammas, metric: str = "euclidean", log_sigma: float = 0.0):
    """Held-out MSE for each log gamma (``GaussianProcesses.jl:60-74``)."""
    errors = []
    for lg in log_gammas:
        kernel = get_kernel(kernel_id, float(lg), log_sigma, metric, dtype=jnp.asarray(x_train).dtype)
        model = gp_fit(x_train, y_train, kernel, z)
        pred = gp_predict(model, x_val)
        errors.append(float(jnp.mean((pred - y_val) ** 2)))
    return errors


def best_kernel(x_train, y_train, x_val, y_val, z, kernel_ids=(1, 2, 3, 4), log_gammas=None, metric: str = "euclidean", log_sigma: float = 0.0):
    """Grid search over kernel families x log gamma (``GaussianProcesses.jl:30-49``).

    Returns ``(kernel, mse)`` minimizing held-out MSE.
    """
    import numpy as np

    if log_gammas is None:
        log_gammas = np.linspace(-1.5, 1.5, 10)
    best = (None, float("inf"))
    for kid in kernel_ids:
        errs = error_per_gamma(x_train, y_train, x_val, y_val, z, kid, log_gammas, metric, log_sigma)
        i = int(np.argmin(errs))
        if errs[i] < best[1]:
            best = (get_kernel(kid, float(log_gammas[i]), log_sigma, metric, dtype=jnp.asarray(x_train).dtype), errs[i])
    return best
