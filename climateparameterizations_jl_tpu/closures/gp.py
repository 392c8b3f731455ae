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
import numpy as np

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
    # "xla" (any dtype) or "pallas" (fused MXU Gram kernel, f32, with an
    # analytic custom-VJP backward — see ops/gram.py; interpret off-TPU).
    backend: str = dataclasses.field(metadata=dict(static=True), default="xla")

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

    def gram(self, A, B, z):
        """Kernel matrix from feature matrices ``(n, D) x (m, D) -> (n, m)``."""
        if self.backend == "pallas":
            from climateparameterizations_jl_tpu.ops.gram import gram_pallas_diff

            tf = _DISTANCE_TRANSFORMS[self.metric]
            return gram_pallas_diff(
                self.family, tf(A, z), tf(B, z), self.gamma, self.sigma, self.alpha
            )
        return self(distance_matrix(A, B, z, self.metric))

    def self_variance(self, x):
        """``k(x, x)`` for each row (prior variance), shape ``(m,)``."""
        return self(jnp.zeros((x.shape[0],), x.dtype))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SpectralMixtureKernel:
    """Spectral-mixture-product kernel (GPML ``covSM``; reference
    ``src/GaussianProcesses/kernels.jl:133-204``, SpectralMixtureProductI/A).

    ``K(a, b) = prod_d sum_q w_q^2 exp(-0.5 (2 pi tau_d)^2 gamma_dq)
    cos(2 pi tau_d mu_dq)`` with ``tau = a - b``. Isotropic form (``I``):
    pass ``(Q,)`` hyperparameter rows shared across dimensions; ARD form
    (``A``): ``(D, Q)`` arrays. The product over feature dimensions runs as
    a ``lax.scan`` carrying the ``(n, m)`` Gram slab — never materializing
    the ``(n, m, D, Q)`` tensor.
    """

    w: jnp.ndarray  # (Q,) or (D, Q) mixture weights (squared inside)
    mu: jnp.ndarray  # spectral means, same shape
    gamma: jnp.ndarray  # spectral variances, same shape
    metric: str = dataclasses.field(metadata=dict(static=True), default="euclidean")

    @classmethod
    def from_hyperparameters(cls, hyp, D: int | None = None, dtype=jnp.float64) -> "SpectralMixtureKernel":
        """Reference constructors: flat ``3Q`` vector (I) or ``3DQ`` (A)."""
        hyp = jnp.asarray(hyp, dtype)
        if D is None:
            Q = hyp.shape[0] // 3
            if 3 * Q != hyp.shape[0]:
                raise ValueError("isotropic SM kernel needs a length-3Q hyperparameter vector")
            return cls(w=hyp[:Q], mu=hyp[Q : 2 * Q], gamma=hyp[2 * Q :])
        Q = hyp.shape[0] // (3 * D)
        if Q == 0 or 3 * D * Q != hyp.shape[0]:
            raise ValueError(
                f"ARD SM kernel with D={D} needs a length-3*D*Q hyperparameter vector, got {hyp.shape[0]}"
            )
        r = lambda a: a.reshape(D, Q, order="F")  # noqa: E731 — Julia column-major reshape
        return cls(w=r(hyp[: D * Q]), mu=r(hyp[D * Q : 2 * D * Q]), gamma=r(hyp[2 * D * Q :]))

    def _per_dim(self, tau, w, mu, gamma):
        """``sum_q w_q^2 h((2 pi tau)^2 gamma_q, 2 pi tau mu_q)`` on an (n, m) slab."""
        t = 2.0 * jnp.pi * tau[..., None]  # (n, m, Q)
        return jnp.sum((w**2) * jnp.exp(-0.5 * t**2 * gamma) * jnp.cos(t * mu), axis=-1)

    def gram(self, A, B, z=None):
        A = jnp.asarray(A)
        B = jnp.asarray(B)
        if self.metric != "euclidean":
            if z is None:
                raise ValueError(f"metric {self.metric!r} needs the grid z")
            tf = _DISTANCE_TRANSFORMS[self.metric]
            A, B = tf(A, z), tf(B, z)
        D = A.shape[-1]
        w, mu, gamma = (
            (jnp.broadcast_to(p, (D,) + p.shape) if p.ndim == 1 else p)
            for p in (self.w, self.mu, self.gamma)
        )

        def body(carry, inputs):
            a_d, b_d, w_d, mu_d, g_d = inputs
            tau = a_d[:, None] - b_d[None, :]
            return carry * self._per_dim(tau, w_d, mu_d, g_d), None

        init = jnp.ones((A.shape[0], B.shape[0]), A.dtype)
        K, _ = jax.lax.scan(body, init, (A.T, B.T, w, mu, gamma))
        return K

    def __call__(self, d):
        raise TypeError("SpectralMixtureKernel is not distance-based; use .gram(A, B)")

    def self_variance(self, x):
        D = x.shape[-1]
        w = self.w if self.w.ndim == 2 else jnp.broadcast_to(self.w, (D,) + self.w.shape)
        return jnp.broadcast_to(jnp.prod(jnp.sum(w**2, axis=-1)), (x.shape[0],)).astype(x.dtype)


_FAMILY_IDS = {1: "squared_exponential", 2: "matern12", 3: "matern32", 4: "matern52", 5: "rational_quadratic"}

#: Components used when the grid search parameterizes a spectral-mixture
#: kernel by a single length scale (see :func:`default_spectral_mixture`).
SM_DEFAULT_Q = 3


def default_spectral_mixture(length_scale, Q: int = SM_DEFAULT_Q, metric: str = "euclidean", dtype=jnp.float64) -> SpectralMixtureKernel:
    """Isotropic Q-component SM kernel parameterized by ONE length scale.

    The q=0 component reproduces a squared-exponential of that length scale
    (an SE kernel's spectral density is a zero-mean Gaussian with std
    ``1/(2 pi l)``); higher components add harmonics at multiples of that
    spectral std. This gives the grid search (``best_kernel``) a 1-D axis
    for kernel id 6 commensurate with the log-gamma axis of ids 1-5 — the
    reference never grid-searched its SM kernel at all
    (``GaussianProcesses.jl:30-49`` sweeps ids 1-4 only).
    """
    ls = jnp.asarray(length_scale, dtype)
    sd = 1.0 / (2.0 * jnp.pi * ls)
    w = jnp.full((Q,), 1.0 / jnp.sqrt(Q), dtype)
    mu = jnp.arange(Q, dtype=dtype) * sd
    gamma = jnp.full((Q,), sd**2, dtype)
    return SpectralMixtureKernel(w=w, mu=mu, gamma=gamma, metric=metric)


def get_kernel(kernel_id: int, log_gamma, log_sigma: float = 0.0, metric: str = "euclidean", alpha: float = 1.0, dtype=jnp.float64, backend: str = "xla"):
    """Factory with the reference's ``10^x`` hyperparameter transform.

    Ids 1-5 build a :class:`GPKernel`. Id 6 (``GaussianProcesses.jl:137``,
    SpectralMixtureProductI) builds a :class:`SpectralMixtureKernel`: pass a
    length-``3Q`` hyperparameter vector as ``log_gamma`` (arrays pass
    through untransformed, mirroring the reference's ``g(x)`` which only
    applies ``10^x`` to scalars) — or a scalar, interpreted as the log10
    length scale of :func:`default_spectral_mixture`.
    """
    if kernel_id == 6:
        hyp = jnp.asarray(log_gamma, dtype)
        if hyp.ndim == 0:
            return default_spectral_mixture(10.0**hyp, metric=metric, dtype=dtype)
        sm = SpectralMixtureKernel.from_hyperparameters(hyp, dtype=dtype)
        return dataclasses.replace(sm, metric=metric)
    return GPKernel(
        gamma=jnp.asarray(10.0**log_gamma, dtype),
        sigma=jnp.asarray(10.0**log_sigma, dtype),
        alpha=jnp.asarray(alpha, dtype),
        family=_FAMILY_IDS[kernel_id],
        metric=metric,
        backend=backend,
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
    K = kernel.gram(x_train, x_train, z)
    if jitter_scale is None:
        import numpy as np

        # Dtype-aware jitter (numpy: stays concrete under jit). f64 matches
        # the reference's robust-Cholesky scale; f32 needs ~sqrt(eps_f32).
        jitter_scale = float(np.sqrt(np.finfo(np.dtype(K.dtype)).eps))
    K = K + jnp.max(K) * jitter_scale * jnp.eye(K.shape[0], dtype=K.dtype)
    chol = jsl.cholesky(K, lower=True)
    alpha = jsl.cho_solve((chol, True), y_train)
    return GPModel(kernel=kernel, x_train=x_train, z=None if z is None else jnp.asarray(z), alpha=alpha, chol=chol)


def gp_fit_multi(x_train, y_trains, kernels, z, jitter_scale: float | None = None) -> list:
    """Fit several exact GPs sharing the SAME predictors as few programs as possible.

    The reference builds its three flux GPs sequentially on identical
    predictors (``run_GP_DE.jl:132-134``, ``Benchmarking.jl:40-52``). Here:

    - kernels that are equal (family, metric, and hyperparameters) share ONE
      Gram build and ONE Cholesky with their targets stacked as multi-RHS;
    - kernels of the same family/metric but different hyperparameters share
      the pairwise-distance matrix (the O(n^2 D) matmul) and factorize as
      one BATCHED Cholesky (native on TPU);
    - anything else falls back to an individual :func:`gp_fit`.

    Returns a list of :class:`GPModel`, index-aligned with ``y_trains``.
    """
    x_train = jnp.asarray(x_train)
    ys_orig = [jnp.asarray(y) for y in y_trains]
    # The grouped path concatenates targets on the last axis and slices the
    # stacked solve back out — promote 1-D targets (valid for gp_fit) to
    # (n, 1) for the concat and squeeze the resulting alpha, so both paths
    # accept exactly what gp_fit accepts.
    was_1d = [y.ndim == 1 for y in ys_orig]
    ys = [y[:, None] if y.ndim == 1 else y for y in ys_orig]
    if len(ys) != len(kernels):
        raise ValueError(f"{len(ys)} target sets for {len(kernels)} kernels")
    out: list = [None] * len(ys)

    # Group GPKernels by (family, metric); exact-duplicate hyperparameters
    # inside a group collapse further to a single multi-RHS solve.
    groups: dict = {}
    for i, k in enumerate(kernels):
        if isinstance(k, GPKernel) and k.backend == "xla":
            groups.setdefault((k.family, k.metric), []).append(i)
        else:  # SpectralMixture / pallas backend: individual fits
            out[i] = gp_fit(x_train, ys_orig[i], k, z, jitter_scale)

    for (family, metric), idxs in groups.items():
        d = distance_matrix(x_train, x_train, z, metric)
        if jitter_scale is None:
            import numpy as np

            js = float(np.sqrt(np.finfo(np.dtype(d.dtype)).eps))
        else:
            js = jitter_scale
        eye = jnp.eye(x_train.shape[0], dtype=d.dtype)

        # Collapse identical hyperparameters to one factorization (skipped
        # under jit, where hyperparameters are tracers: every kernel then
        # gets its own slot in the single batched Cholesky, same complexity).
        unique: dict = {}
        for i in idxs:
            k = kernels[i]
            try:
                key = (float(k.gamma), float(k.sigma), float(k.alpha))
            except (jax.errors.ConcretizationTypeError, jax.errors.TracerArrayConversionError):
                key = i
            unique.setdefault(key, []).append(i)
        members = list(unique.values())
        gammas = jnp.stack([kernels[m[0]].gamma for m in members])
        sigmas = jnp.stack([kernels[m[0]].sigma for m in members])
        alphas = jnp.stack([kernels[m[0]].alpha for m in members])

        def build_chol(g, s, a):
            k = GPKernel(gamma=g, sigma=s, alpha=a, family=family, metric=metric)
            K = k(d)
            K = K + jnp.max(K) * js * eye
            return jsl.cholesky(K, lower=True)

        chols = jax.vmap(build_chol)(gammas, sigmas, alphas)
        for j, member_idxs in enumerate(members):
            y_cat = jnp.concatenate([ys[i] for i in member_idxs], axis=-1)
            alpha_cat = jsl.cho_solve((chols[j], True), y_cat)
            offset = 0
            for i in member_idxs:
                D_out = ys[i].shape[-1]
                alpha = alpha_cat[:, offset : offset + D_out]
                out[i] = GPModel(
                    kernel=kernels[i], x_train=x_train,
                    z=None if z is None else jnp.asarray(z),
                    alpha=alpha[:, 0] if was_1d[i] else alpha, chol=chols[j],
                )
                offset += D_out
    return out


def gp_predict(model: GPModel, x):
    """Mean prediction for a batch ``(m, D_in) -> (m, D_out)`` (one matmul).

    Parity: ``model_output`` (``gaussian_process.jl:112-117``), vectorized.
    """
    x = jnp.atleast_2d(jnp.asarray(x))
    return model.kernel.gram(x, model.x_train, model.z) @ model.alpha


def gp_uncertainty(model: GPModel, x):
    """Posterior variance at each query point (``gaussian_process.jl:130-139``)."""
    x = jnp.atleast_2d(jnp.asarray(x))
    kx = model.kernel.gram(x, model.x_train, model.z)  # (m, n)
    v = jsl.cho_solve((model.chol, True), kx.T)  # (n, m)
    return model.kernel.self_variance(x) - jnp.sum(kx.T * v, axis=0)


def mean_log_marginal_loss(model: GPModel, y_train, add_constant: bool = False):
    """Mean (over output dims) NEGATIVE log marginal likelihood — a loss to
    MINIMIZE (smaller = better fit).

    ``0.5 y' K^-1 y`` per output dim (+ the logdet and 2-pi constants when
    ``add_constant``). Parity: ``mean_log_marginal_loss``
    (``gaussian_process.jl:182-202``).
    """
    y = jnp.asarray(y_train)
    if y.ndim == 1:  # gp_fit accepts 1-D targets; treat as one output dim
        y = y[:, None]
    n, D = y.shape
    alpha = model.alpha if model.alpha.ndim == 2 else model.alpha[:, None]
    total = 0.5 * jnp.sum(y * alpha) / D
    if add_constant:
        total = total + jnp.sum(jnp.log(jnp.diag(model.chol))) + 0.5 * n * jnp.log(2.0 * jnp.pi)
    return total


def optimize_kernel_hyperparameters(
    x_train,
    y_train,
    kernel,
    z,
    iters: int = 100,
    learning_rate: float = 0.05,
):
    """Type-II maximum likelihood: gradient-descend the (mean) negative log
    marginal likelihood over the kernel hyperparameters.

    Goes beyond the reference's grid search (``GaussianProcesses.jl:30-49``
    sweeps log gamma only): every hyperparameter — ``(gamma, sigma, alpha)``
    of a :class:`GPKernel`, or the full ``(w, mu, gamma)`` mixture of a
    :class:`SpectralMixtureKernel` — moves under gradients THROUGH the
    Cholesky factorization. Works on both Gram backends: the XLA path (any
    dtype, the f64 default) and the ``backend="pallas"`` MXU kernel, whose
    analytic custom-VJP backward (``ops/gram.py::gram_pallas_diff``) makes
    the fused forward differentiable (f32 — pair with ``jitter_scale``).
    Positive parameters are optimized in log space. Whole optimization is
    one jitted optax loop.

    Returns ``(kernel, losses)`` with the fitted hyperparameters.
    """
    import optax

    x_train = jnp.asarray(x_train)
    y_train = jnp.asarray(y_train)

    positive = {"gamma", "sigma", "alpha"} if isinstance(kernel, GPKernel) else {"gamma"}
    # Coerce ALL numeric hyperparameters (python scalars, numpy scalars,
    # numpy arrays) to jnp arrays FIRST: the jnp-array filter below would
    # otherwise skip them and "optimize" an empty dict, returning the kernel
    # unchanged with a flat loss curve and no error.
    def _numeric(v):
        if isinstance(v, bool) or isinstance(v, str) or v is None:
            return False
        if isinstance(v, jnp.ndarray):
            return False  # already the right type
        try:
            return np.issubdtype(np.asarray(v).dtype, np.number)
        except Exception:
            return False

    kernel = dataclasses.replace(
        kernel,
        **{
            f.name: jnp.asarray(getattr(kernel, f.name), jnp.result_type(float))
            for f in dataclasses.fields(kernel)
            if _numeric(getattr(kernel, f.name))
        },
    )
    fields = [f.name for f in dataclasses.fields(kernel) if isinstance(getattr(kernel, f.name), jnp.ndarray)]
    if not fields:
        raise ValueError("optimize_kernel_hyperparameters: kernel exposes no numeric hyperparameters")

    def to_raw(k):
        return {n: (jnp.log(getattr(k, n)) if n in positive else getattr(k, n)) for n in fields}

    def from_raw(raw):
        return dataclasses.replace(
            kernel, **{n: (jnp.exp(v) if n in positive else v) for n, v in raw.items()}
        )

    def loss_fn(raw):
        model = gp_fit(x_train, y_train, from_raw(raw), z)
        # add_constant=True: the logdet term is what penalizes overfit
        # length scales — without it the MLE degenerates.
        return mean_log_marginal_loss(model, y_train, add_constant=True)

    opt = optax.adam(learning_rate)
    raw = to_raw(kernel)
    state = opt.init(raw)

    @jax.jit
    def step(raw, state):
        loss, g = jax.value_and_grad(loss_fn)(raw)
        updates, state = opt.update(g, state, raw)
        return optax.apply_updates(raw, updates), state, loss

    losses = []
    for _ in range(iters):
        raw, state, loss = step(raw, state)
        losses.append(float(loss))
    return from_raw(raw), losses


# ---------------------------------------------------------------------------
# Model selection (grid search)
# ---------------------------------------------------------------------------


def gp_flux_model(x_train, y_train, z, kernel: GPKernel):
    """Reference's ``gp_model`` wrapper (``GaussianProcesses.jl:77-101``):
    fit on (scaled state -> scaled flux) pairs and return a predict fn."""
    model = gp_fit(x_train, y_train, kernel, z)
    return model, partial(gp_predict, model)


def error_per_gamma(x_train, y_train, x_val, y_val, z, kernel_id: int, log_gammas, metric: str = "euclidean", log_sigma: float = 0.0):
    """Held-out MSE for each log gamma (``GaussianProcesses.jl:60-74``).

    The whole grid is ONE jitted vmap: every gamma's Gram build, Cholesky,
    solve, and validation MSE run as a single batched XLA program (the
    reference refits in a sequential Julia loop). Batched Cholesky is native
    on TPU; G grid points cost one kernel launch.
    """
    errs = _error_per_gamma_vmapped(
        jnp.asarray(x_train), jnp.asarray(y_train), jnp.asarray(x_val), jnp.asarray(y_val),
        z if z is None else jnp.asarray(z),
        jnp.asarray(log_gammas, jnp.asarray(x_train).dtype),
        kernel_id, metric, log_sigma,
    )
    return [float(e) for e in errs]


@partial(jax.jit, static_argnums=(6, 7, 8))
def _error_per_gamma_vmapped(x_train, y_train, x_val, y_val, z, log_gammas, kernel_id, metric, log_sigma):
    dtype = x_train.dtype

    def fit_and_score(log_gamma):
        if kernel_id == 6:
            kernel = default_spectral_mixture(10.0**log_gamma, metric=metric, dtype=dtype)
        else:
            kernel = GPKernel(
                gamma=10.0**log_gamma,
                sigma=jnp.asarray(10.0**log_sigma, dtype),
                alpha=jnp.asarray(1.0, dtype),
                family=_FAMILY_IDS[kernel_id],
                metric=metric,
            )
        model = gp_fit(x_train, y_train, kernel, z)
        pred = gp_predict(model, x_val)
        return jnp.mean((pred - y_val) ** 2)

    return jax.vmap(fit_and_score)(log_gammas)


def select_best_kernel(errors_by_kid: dict, log_gammas, metric: str, log_sigma: float, dtype):
    """Pick the (family, gamma) minimizing held-out error across a grid.

    ``errors_by_kid``: ``{kernel_id: sequence of errors per log_gamma}``.
    NaN points never win the argmin; raises if EVERY point is non-finite
    (returning ``(None, inf)`` would crash callers far from the cause).
    """
    import numpy as np

    best = (None, float("inf"))
    for kid, errs in errors_by_kid.items():
        errs = np.where(np.isfinite(errs), np.asarray(errs, float), np.inf)
        i = int(np.argmin(errs))
        if errs[i] < best[1]:
            best = (get_kernel(kid, float(log_gammas[i]), log_sigma, metric, dtype=dtype), float(errs[i]))
    if best[0] is None:
        raise ValueError("kernel grid search failed: every (family, gamma) point had non-finite error")
    return best


def best_kernel(x_train, y_train, x_val, y_val, z, kernel_ids=(1, 2, 3, 4), log_gammas=None, metric: str = "euclidean", log_sigma: float = 0.0):
    """Grid search over kernel families x log gamma (``GaussianProcesses.jl:30-49``).

    Returns ``(kernel, mse)`` minimizing held-out MSE.
    """
    import numpy as np

    if log_gammas is None:
        log_gammas = np.linspace(-1.5, 1.5, 10)
    errors = {
        kid: error_per_gamma(x_train, y_train, x_val, y_val, z, kid, log_gammas, metric, log_sigma)
        for kid in kernel_ids
    }
    return select_best_kernel(errors, log_gammas, metric, log_sigma, jnp.asarray(x_train).dtype)
