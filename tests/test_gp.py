"""Gaussian-process closure tests: kernels, distances, exact GP, model selection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climateparameterizations_jl_tpu.closures.gp import (
    GPKernel,
    best_kernel,
    distance_matrix,
    get_kernel,
    gp_fit,
    gp_predict,
    gp_uncertainty,
    mean_log_marginal_loss,
)


def _kernel(family="squared_exponential", gamma=1.0, sigma=1.0, alpha=1.0, metric="euclidean"):
    return GPKernel(
        gamma=jnp.asarray(gamma, jnp.float64),
        sigma=jnp.asarray(sigma, jnp.float64),
        alpha=jnp.asarray(alpha, jnp.float64),
        family=family,
        metric=metric,
    )


class TestDistances:
    def setup_method(self):
        rng = np.random.default_rng(0)
        self.A = jnp.asarray(rng.normal(size=(5, 8)))
        self.B = jnp.asarray(rng.normal(size=(7, 8)))
        self.z = jnp.linspace(-10.0, 0.0, 8)

    def test_euclidean_matches_norm(self):
        D = distance_matrix(self.A, self.B, self.z, "euclidean")
        expected = np.linalg.norm(np.array(self.A)[:, None] - np.array(self.B)[None], axis=-1)
        np.testing.assert_allclose(np.array(D), expected, rtol=1e-8)

    def test_derivative_distance(self):
        D = distance_matrix(self.A, self.B, self.z, "derivative")
        dz = np.diff(np.array(self.z))
        fa = np.diff(np.array(self.A), axis=-1) / dz
        fb = np.diff(np.array(self.B), axis=-1) / dz
        expected = np.linalg.norm(fa[:, None] - fb[None], axis=-1)
        np.testing.assert_allclose(np.array(D), expected, rtol=1e-8)

    def test_antiderivative_distance(self):
        D = distance_matrix(self.A, self.B, self.z, "antiderivative")
        dz = np.diff(np.array(self.z))
        fa = np.diff(np.array(self.A), axis=-1) * dz
        fb = np.diff(np.array(self.B), axis=-1) * dz
        expected = np.linalg.norm(fa[:, None] - fb[None], axis=-1)
        np.testing.assert_allclose(np.array(D), expected, rtol=1e-8)


class TestKernels:
    @pytest.mark.parametrize("family", ["squared_exponential", "matern12", "matern32", "matern52", "rational_quadratic"])
    def test_zero_distance_gives_sigma(self, family):
        k = _kernel(family, sigma=2.5)
        assert float(k(jnp.asarray(0.0))) == pytest.approx(2.5)

    @pytest.mark.parametrize("family", ["squared_exponential", "matern12", "matern32", "matern52", "rational_quadratic"])
    def test_monotone_decreasing(self, family):
        k = _kernel(family)
        d = jnp.linspace(0.0, 5.0, 50)
        vals = np.array(k(d))
        assert np.all(np.diff(vals) < 0)

    def test_get_kernel_factory(self):
        k = get_kernel(3, 0.5, 0.0, "derivative")
        assert k.family == "matern32"
        assert float(k.gamma) == pytest.approx(10**0.5)
        assert k.metric == "derivative"

    def test_get_kernel_id6_vector_hyp(self):
        """Id 6 = SpectralMixtureProductI (GaussianProcesses.jl:137): a raw
        3Q hyperparameter vector passes through untransformed."""
        from climateparameterizations_jl_tpu.closures.gp import SpectralMixtureKernel

        hyp = np.array([1.0, 0.5, 0.0, 0.3, 0.1, 0.2])  # Q = 2
        k = get_kernel(6, hyp, metric="derivative")
        assert isinstance(k, SpectralMixtureKernel)
        assert k.metric == "derivative"
        np.testing.assert_allclose(np.asarray(k.w), hyp[:2])
        np.testing.assert_allclose(np.asarray(k.mu), hyp[2:4])
        np.testing.assert_allclose(np.asarray(k.gamma), hyp[4:])

    def test_get_kernel_id6_scalar_is_se_like(self):
        """A scalar id-6 argument is the log10 length scale; the q=0
        component reproduces a unit-variance SE kernel of that scale, so the
        SM Gram must approach the SE Gram as the harmonics' weights shrink
        with Q=1."""
        from climateparameterizations_jl_tpu.closures.gp import default_spectral_mixture

        rng = np.random.default_rng(7)
        A = jnp.asarray(rng.normal(size=(6, 4)))
        z = jnp.linspace(0.0, 1.0, 4)
        sm = default_spectral_mixture(10.0**0.2, Q=1)
        se = _kernel("squared_exponential", gamma=10.0**0.2, sigma=1.0)
        np.testing.assert_allclose(np.asarray(sm.gram(A, A, z)), np.asarray(se.gram(A, A, z)), atol=1e-10)


class TestExactGP:
    def _make_1d_problem(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(np.sort(rng.uniform(-3, 3, size=40))[:, None])
        y = jnp.sin(x)
        z = jnp.asarray([0.0])  # single-feature: distances need >= 1 entry
        return x, y, z

    def test_interpolates_training_data(self):
        x, y, z = self._make_1d_problem()
        model = gp_fit(x, y, _kernel(gamma=1.0), z)
        pred = gp_predict(model, x)
        np.testing.assert_allclose(np.array(pred), np.array(y), atol=1e-4)

    def test_generalizes_to_test_points(self):
        x, y, z = self._make_1d_problem()
        model = gp_fit(x, y, _kernel(gamma=1.0), z)
        xq = jnp.asarray(np.linspace(-2.5, 2.5, 20)[:, None])
        pred = gp_predict(model, xq)
        np.testing.assert_allclose(np.array(pred[:, 0]), np.sin(np.array(xq[:, 0])), atol=1e-2)

    def test_uncertainty_zero_at_train_larger_away(self):
        x, y, z = self._make_1d_problem()
        model = gp_fit(x, y, _kernel(gamma=1.0), z)
        var_train = float(gp_uncertainty(model, x[:1])[0])
        var_far = float(gp_uncertainty(model, jnp.asarray([[10.0]]))[0])
        assert var_train < 1e-4
        assert var_far > 0.5

    def test_multi_output(self):
        """Vector-valued targets (the flux-profile case): one fit, D outputs."""
        rng = np.random.default_rng(2)
        X = jnp.asarray(rng.normal(size=(60, 12)))
        W = jnp.asarray(rng.normal(size=(12, 7)))
        Y = jnp.tanh(X @ W)
        z = jnp.linspace(-1.0, 0.0, 12)
        model = gp_fit(X, Y, _kernel(gamma=3.0), z)
        pred = gp_predict(model, X)
        assert pred.shape == (60, 7)
        np.testing.assert_allclose(np.array(pred), np.array(Y), atol=1e-3)

    def test_log_marginal_loss_finite(self):
        x, y, z = self._make_1d_problem()
        model = gp_fit(x, y, _kernel(gamma=1.0), z)
        lml = float(mean_log_marginal_loss(model, y, add_constant=True))
        assert np.isfinite(lml)

    def test_log_marginal_loss_accepts_1d_targets(self):
        """gp_fit accepts 1-D targets, so the NLL must too (same value)."""
        x, y, z = self._make_1d_problem()
        y1 = y[:, 0] if y.ndim == 2 else y
        m1 = gp_fit(x, y1, _kernel(gamma=1.0), z)
        m2 = gp_fit(x, y1[:, None], _kernel(gamma=1.0), z)
        l1 = float(mean_log_marginal_loss(m1, y1, add_constant=True))
        l2 = float(mean_log_marginal_loss(m2, y1[:, None], add_constant=True))
        np.testing.assert_allclose(l1, l2, rtol=1e-10)


class TestMultiFit:
    """gp_fit_multi: fused shared-predictor fits == sequential gp_fit."""

    def _problem(self):
        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(30, 6)))
        ys = [jnp.asarray(rng.normal(size=(30, d))) for d in (5, 7, 5)]
        z = jnp.linspace(0.0, 1.0, 6)
        return x, ys, z

    def test_identical_kernels_share_factorization(self):
        from climateparameterizations_jl_tpu.closures.gp import gp_fit_multi

        x, ys, z = self._problem()
        k = _kernel(gamma=0.8)
        models = gp_fit_multi(x, ys, [k, k, k], z)
        for y, m in zip(ys, models):
            ref = gp_fit(x, y, k, z)
            np.testing.assert_allclose(np.asarray(m.alpha), np.asarray(ref.alpha), rtol=1e-9)
            np.testing.assert_allclose(np.asarray(m.chol), np.asarray(ref.chol), rtol=1e-9)

    def test_mixed_families_and_hyperparameters(self):
        from climateparameterizations_jl_tpu.closures.gp import gp_fit_multi

        x, ys, z = self._problem()
        kernels = [
            _kernel("squared_exponential", gamma=0.5),
            _kernel("matern32", gamma=1.2),
            _kernel("squared_exponential", gamma=1.5, metric="derivative"),
        ]
        models = gp_fit_multi(x, ys, kernels, z)
        for y, k, m in zip(ys, kernels, models):
            ref = gp_fit(x, y, k, z)
            np.testing.assert_allclose(np.asarray(m.alpha), np.asarray(ref.alpha), rtol=1e-7, atol=1e-10)
            pred_m = gp_predict(m, x[:4])
            pred_r = gp_predict(ref, x[:4])
            np.testing.assert_allclose(np.asarray(pred_m), np.asarray(pred_r), rtol=1e-7, atol=1e-10)

    def test_length_mismatch_raises(self):
        from climateparameterizations_jl_tpu.closures.gp import gp_fit_multi

        x, ys, z = self._problem()
        with pytest.raises(ValueError):
            gp_fit_multi(x, ys, [_kernel()], z)


class TestModelSelection:
    def test_best_kernel_prefers_good_gamma(self):
        rng = np.random.default_rng(3)
        X = jnp.asarray(np.sort(rng.uniform(-3, 3, size=50))[:, None])
        Y = jnp.sin(X)
        Xv = jnp.asarray(np.linspace(-2.8, 2.8, 30)[:, None])
        Yv = jnp.sin(Xv)
        z = jnp.asarray([0.0])
        kernel, err = best_kernel(X, Y, Xv, Yv, z, kernel_ids=(1, 2), log_gammas=np.linspace(-1, 1, 5))
        assert err < 1e-2

    def test_grid_search_includes_spectral_mixture(self):
        """Kernel id 6 is reachable from the sweep (VERDICT r1 item 4)."""
        from climateparameterizations_jl_tpu.closures.gp import SpectralMixtureKernel, error_per_gamma

        rng = np.random.default_rng(4)
        X = jnp.asarray(np.sort(rng.uniform(-3, 3, size=40))[:, None])
        Y = jnp.sin(X)
        Xv = jnp.asarray(np.linspace(-2.5, 2.5, 20)[:, None])
        Yv = jnp.sin(Xv)
        z = jnp.asarray([0.0])
        errs = error_per_gamma(X, Y, Xv, Yv, z, 6, np.linspace(-0.5, 0.5, 4))
        assert all(np.isfinite(e) for e in errs)
        assert min(errs) < 1e-2
        kernel, err = best_kernel(X, Y, Xv, Yv, z, kernel_ids=(6,), log_gammas=np.linspace(-0.5, 0.5, 4))
        assert isinstance(kernel, SpectralMixtureKernel)
        assert err == pytest.approx(min(errs))


class TestHyperparameterOptimization:
    def test_mle_recovers_length_scale(self):
        """Type-II MLE moves a badly-initialized length scale to one that
        generalizes: held-out MSE after optimization beats the init by 10x."""
        from climateparameterizations_jl_tpu.closures.gp import optimize_kernel_hyperparameters

        rng = np.random.default_rng(11)
        X = jnp.asarray(np.sort(rng.uniform(-3, 3, size=60))[:, None])
        Y = jnp.sin(X)
        Xv = jnp.asarray(np.linspace(-2.7, 2.7, 40)[:, None])
        Yv = jnp.sin(Xv)
        z = jnp.asarray([0.0])
        bad = _kernel(gamma=0.03)  # far too short: interpolates noise-free but can't generalize

        def val_mse(k):
            return float(jnp.mean((gp_predict(gp_fit(X, Y, k, z), Xv) - Yv) ** 2))

        fitted, losses = optimize_kernel_hyperparameters(X, Y, bad, z, iters=120, learning_rate=0.05)
        assert losses[-1] < losses[0]
        assert float(fitted.gamma) > 0.2  # moved toward a physical scale
        assert val_mse(fitted) < 0.1 * val_mse(bad), (val_mse(fitted), val_mse(bad))

    def test_spectral_mixture_hyperparameters_optimize(self):
        from climateparameterizations_jl_tpu.closures.gp import (
            default_spectral_mixture,
            optimize_kernel_hyperparameters,
        )

        rng = np.random.default_rng(12)
        X = jnp.asarray(np.sort(rng.uniform(-3, 3, size=50))[:, None])
        Y = jnp.sin(2.0 * X)
        z = jnp.asarray([0.0])
        k0 = default_spectral_mixture(0.2, Q=2)
        fitted, losses = optimize_kernel_hyperparameters(X, Y, k0, z, iters=60, learning_rate=0.03)
        assert losses[-1] < losses[0]
        assert np.isfinite(np.asarray(fitted.gamma)).all()

    def test_numpy_typed_hyperparameters_still_optimize(self):
        """np.float32 / 0-d np.ndarray hyperparameters must be coerced and
        optimized — the old isinstance(int, float) guard skipped them, ran
        an empty optax loop, and returned the kernel unchanged."""
        from climateparameterizations_jl_tpu.closures.gp import GPKernel, optimize_kernel_hyperparameters

        rng = np.random.default_rng(13)
        X = jnp.asarray(np.sort(rng.uniform(-3, 3, size=40))[:, None])
        Y = jnp.sin(X)
        z = jnp.asarray([0.0])
        bad = GPKernel(
            gamma=np.float32(0.03), sigma=np.array(1.0), alpha=np.float64(1.0),
            family="squared_exponential", metric="euclidean",
        )
        fitted, losses = optimize_kernel_hyperparameters(X, Y, bad, z, iters=40, learning_rate=0.05)
        assert losses[-1] < losses[0]
        assert float(fitted.gamma) != pytest.approx(0.03)

    def test_ard_spectral_mixture_rejects_wrong_length(self):
        from climateparameterizations_jl_tpu.closures.gp import SpectralMixtureKernel

        with pytest.raises(ValueError, match="3\\*D\\*Q"):
            SpectralMixtureKernel.from_hyperparameters(np.ones(20), D=3)  # 20 % 9 != 0
        with pytest.raises(ValueError, match="3\\*D\\*Q"):
            SpectralMixtureKernel.from_hyperparameters(np.ones(2), D=3)  # Q would floor to 0


class TestGPClosureDE:
    def test_gp_closure_integrates(self):
        """Fit GPs on synthetic flux data and integrate the GP-closure column."""
        import jax

        from climateparameterizations_jl_tpu.data.containers import (
            coarsen_dataset,
            fit_wind_mixing_scalings,
            scaled_flux_arrays,
            scaled_state_array,
        )
        from climateparameterizations_jl_tpu.data.synthetic import synthetic_wind_mixing_les
        from climateparameterizations_jl_tpu.models.gp_closure import FluxGPs, solve_gp_closure
        from climateparameterizations_jl_tpu.models.wind_mixing import WindMixingModel
        from climateparameterizations_jl_tpu.physics.mpp import MPPParameters

        les = synthetic_wind_mixing_les(Nz=64, n_save=20, dt_save=600.0, n_substeps=2)
        coarse = coarsen_dataset(les, 32)
        scalings = fit_wind_mixing_scalings([coarse])
        x = scaled_state_array(coarse, scalings).astype(jnp.float64)
        uw_s, vw_s, wT_s = (a.astype(jnp.float64) for a in scaled_flux_arrays(coarse, scalings))
        z = jnp.linspace(-1.0, 0.0, 96)  # scaled-state pseudo-grid for distances
        k = _kernel(gamma=1.0)
        gps = FluxGPs(
            uw=gp_fit(x, uw_s, k, z),
            vw=gp_fit(x, vw_s, k, z),
            wT=gp_fit(x, wT_s, k, z),
        )
        tau = jnp.abs(coarse.t[-1] - coarse.t[0])
        model = WindMixingModel(
            H=coarse.H.astype(jnp.float64), tau=tau.astype(jnp.float64), f=coarse.f.astype(jnp.float64),
            g=coarse.g.astype(jnp.float64), alpha=coarse.alpha.astype(jnp.float64),
            kappa=jnp.float64(10.0), scalings=jax.tree.map(lambda a: a.astype(jnp.float64), scalings),
            mpp=MPPParameters.default(jnp.float64), Nz=32,
        )
        # Shared-Gram fast path (one cross-kernel matrix + stacked-alpha
        # matmul) must be numerically identical to three gp_predict calls.
        import dataclasses as dc

        from climateparameterizations_jl_tpu.models.gp_closure import _share_gram, gp_closure_rhs

        assert _share_gram(gps)
        broken = FluxGPs(uw=gps.uw, vw=dc.replace(gps.vw, x_train=gps.vw.x_train.copy()), wT=gps.wT)
        assert not _share_gram(broken)
        r_fast = gp_closure_rhs(model, gps, x[0], 0.0)
        r_slow = gp_closure_rhs(model, broken, x[0], 0.0)
        np.testing.assert_allclose(np.asarray(r_fast), np.asarray(r_slow), rtol=1e-10)

        dt_save = 600.0 / float(tau)
        traj = solve_gp_closure(model, gps, x[0], 0.0, dt_save, 10, n_substeps=2)
        assert traj.shape == (11, 96)
        assert np.isfinite(np.array(traj)).all()
        # GP closure keeps the trajectory near the training trajectory.
        err = float(jnp.mean((traj - x[:11]) ** 2))
        assert err < 0.1

        # Host-chunked dispatch equivalence (the tunnel-safe pattern
        # studies/gp_at_scale.py stage 6 relies on): chaining two 5-save
        # solves through the carried state and advanced t0 must reproduce
        # the single 10-save solve exactly.
        first = solve_gp_closure(model, gps, x[0], 0.0, dt_save, 5, n_substeps=2)
        second = solve_gp_closure(model, gps, first[-1], 5 * dt_save, dt_save, 5, n_substeps=2)
        chunked = jnp.concatenate([first, second[1:]], axis=0)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(traj), rtol=1e-12, atol=1e-12)

        # share_train_inputs: per-flux SEQUENTIAL fits (distinct jit outputs
        # for x_train/z, value-equal) must be rebindable onto the fused-Gram
        # fast path — the ADVICE r4 finding that the at-scale GP-DE paid
        # three cross-Grams per stage for identical kernels.
        import jax as _jax

        from climateparameterizations_jl_tpu.models.gp_closure import share_train_inputs

        fit_j = _jax.jit(lambda xx, yy: gp_fit(xx, yy, k, z))
        seq = FluxGPs(uw=fit_j(x, uw_s), vw=fit_j(x, vw_s), wT=fit_j(x, wT_s))
        assert not _share_gram(seq)  # distinct jit outputs: identity fails
        shared = share_train_inputs(seq)
        assert _share_gram(shared)
        r_seq = gp_closure_rhs(model, seq, x[0], 0.0)
        r_shared = gp_closure_rhs(model, shared, x[0], 0.0)
        np.testing.assert_allclose(np.asarray(r_shared), np.asarray(r_seq), rtol=1e-10)
        # Value-UNEQUAL training sets must be returned unchanged (safety);
        # `broken` (same values, different object) is exactly what the
        # helper exists to repair, so it uses shifted values instead.
        unequal = FluxGPs(uw=gps.uw, vw=dc.replace(gps.vw, x_train=gps.vw.x_train + 1.0), wT=gps.wT)
        assert share_train_inputs(unequal) == unequal


class TestSpectralMixtureKernel:
    def _kernel(self, D=None):
        import numpy as np

        from climateparameterizations_jl_tpu.closures.gp import SpectralMixtureKernel

        rng = np.random.default_rng(0)
        Q = 2
        if D is None:
            hyp = np.concatenate([rng.uniform(0.5, 1.0, Q), rng.uniform(0.0, 0.3, Q), rng.uniform(0.1, 0.5, Q)])
            return SpectralMixtureKernel.from_hyperparameters(hyp)
        hyp = np.concatenate([
            rng.uniform(0.5, 1.0, D * Q), rng.uniform(0.0, 0.3, D * Q), rng.uniform(0.1, 0.5, D * Q)
        ])
        return SpectralMixtureKernel.from_hyperparameters(hyp, D=D)

    def test_gram_matches_direct_formula(self):
        import numpy as np

        k = self._kernel()
        rng = np.random.default_rng(1)
        A = rng.normal(size=(4, 3))
        B = rng.normal(size=(5, 3))
        K = np.asarray(k.gram(A, B))
        w, mu, g = np.asarray(k.w), np.asarray(k.mu), np.asarray(k.gamma)
        for i in range(4):
            for j in range(5):
                prod = 1.0
                for d in range(3):
                    t = 2 * np.pi * (A[i, d] - B[j, d])
                    prod *= np.sum(w**2 * np.exp(-0.5 * t**2 * g) * np.cos(t * mu))
                np.testing.assert_allclose(K[i, j], prod, rtol=1e-6)

    def test_psd_and_fits(self):
        import jax.numpy as jnp
        import numpy as np

        from climateparameterizations_jl_tpu.closures.gp import gp_fit, gp_predict, gp_uncertainty

        k = self._kernel(D=4)
        rng = np.random.default_rng(2)
        x = rng.normal(size=(20, 4))
        y = np.sin(x.sum(axis=1, keepdims=True))
        model = gp_fit(x, y, k, z=jnp.linspace(0, 1, 4))
        pred = gp_predict(model, x)
        # Exact GP interpolates its training data (up to jitter).
        np.testing.assert_allclose(np.asarray(pred), y, atol=1e-3)
        var = np.asarray(gp_uncertainty(model, x))
        assert np.all(var > -1e-6)  # PSD posterior variance

    def test_self_variance_is_gram_diagonal(self):
        import numpy as np

        k = self._kernel()
        rng = np.random.default_rng(3)
        A = rng.normal(size=(6, 3))
        np.testing.assert_allclose(
            np.asarray(k.self_variance(A)), np.diag(np.asarray(k.gram(A, A))), rtol=1e-6
        )


class TestPallasGram:
    """Fused Pallas Gram kernel (ops/gram.py) vs the XLA path (interpret mode on CPU)."""

    @pytest.mark.parametrize("family", [
        "squared_exponential", "matern12", "matern32", "matern52", "rational_quadratic",
    ])
    @pytest.mark.parametrize("metric", ["euclidean", "derivative"])
    def test_matches_xla_gram(self, family, metric):
        rng = np.random.default_rng(0)
        A = jnp.asarray(rng.normal(size=(37, 12)), jnp.float32)
        B = jnp.asarray(rng.normal(size=(23, 12)), jnp.float32)
        z = jnp.linspace(-5.0, 0.0, 12)
        kw = dict(gamma=jnp.float32(1.7), sigma=jnp.float32(0.8), alpha=jnp.float32(1.3), family=family, metric=metric)
        k_xla = GPKernel(backend="xla", **kw)
        k_pl = GPKernel(backend="pallas", **kw)
        K0 = np.asarray(k_xla.gram(A, B, z), np.float32)
        K1 = np.asarray(k_pl.gram(A, B, z))
        assert K1.shape == (37, 23)
        np.testing.assert_allclose(K1, K0, rtol=2e-5, atol=2e-6)

    def test_fit_predict_with_pallas_backend(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(40, 6)), jnp.float32)
        y = jnp.asarray(np.sin(np.asarray(x).sum(axis=1, keepdims=True)), jnp.float32)
        z = jnp.linspace(0.0, 1.0, 6)
        k = GPKernel(
            gamma=jnp.float32(2.0), sigma=jnp.float32(1.0), alpha=jnp.float32(1.0),
            backend="pallas",
        )
        model = gp_fit(x, y, k, z)
        pred = gp_predict(model, x)
        np.testing.assert_allclose(np.asarray(pred), np.asarray(y), atol=5e-2)

    def test_large_padded_shapes(self):
        # M, N straddle the 256-tile boundary; D > 128 exercises lane padding.
        rng = np.random.default_rng(2)
        A = jnp.asarray(rng.normal(size=(300, 130)), jnp.float32)
        B = jnp.asarray(rng.normal(size=(257, 130)), jnp.float32)
        kw = dict(gamma=jnp.float32(3.0), sigma=jnp.float32(1.0), alpha=jnp.float32(1.0))
        K0 = np.asarray(GPKernel(backend="xla", **kw).gram(A, B, None), np.float32)
        K1 = np.asarray(GPKernel(backend="pallas", **kw).gram(A, B, None))
        np.testing.assert_allclose(K1, K0, rtol=2e-5, atol=2e-6)


class TestPallasGramGradients:
    """gram_pallas_diff custom VJP vs autodiff through the XLA path."""

    @pytest.mark.parametrize("family", [
        "squared_exponential", "matern12", "matern32", "matern52", "rational_quadratic",
    ])
    def test_vjp_matches_xla_autodiff(self, family):
        rng = np.random.default_rng(7)
        A = jnp.asarray(rng.normal(size=(11, 5)), jnp.float32)
        B = jnp.asarray(rng.normal(size=(9, 5)), jnp.float32)
        Kbar = jnp.asarray(rng.normal(size=(11, 9)), jnp.float32)
        hyp = (jnp.float32(1.3), jnp.float32(0.9), jnp.float32(1.4))

        def scalar(backend):
            def f(A, B, gamma, sigma, alpha):
                k = GPKernel(gamma=gamma, sigma=sigma, alpha=alpha, family=family, backend=backend)
                return jnp.sum(Kbar * k.gram(A, B, None))
            return f

        g_ref = jax.grad(scalar("xla"), argnums=(0, 1, 2, 3, 4))(A, B, *hyp)
        g_pl = jax.grad(scalar("pallas"), argnums=(0, 1, 2, 3, 4))(A, B, *hyp)
        for r, p, name in zip(g_ref, g_pl, ["A", "B", "gamma", "sigma", "alpha"]):
            np.testing.assert_allclose(
                np.asarray(p), np.asarray(r), rtol=2e-4, atol=2e-4, err_msg=name
            )

    @pytest.mark.parametrize("family", ["matern12", "matern32", "squared_exponential"])
    def test_training_gram_feature_gradients(self, family):
        # Regression: on a TRAINING Gram (A is B, zero-distance diagonal)
        # matern12's floored 1/d singularity used to put ~1e11-scale entries
        # into the rowsum(W)*A - W@B cancellation and return f32 garbage for
        # dA/dB. The coincident-pair mask makes the feature cotangents match
        # finite differences (the function is smooth along any direction:
        # coincident pairs move together, d stays 0).
        from climateparameterizations_jl_tpu.ops.gram import gram_pallas_diff

        rng = np.random.default_rng(11)
        X = jnp.asarray(rng.normal(size=(10, 4)), jnp.float32)
        Kbar = jnp.asarray(rng.normal(size=(10, 10)), jnp.float32)
        hyp = (jnp.float32(1.5), jnp.float32(0.8), jnp.float32(1.0))

        def f(X):
            return jnp.sum(Kbar * gram_pallas_diff(family, X, X, *hyp))

        g = jax.grad(f)(X)
        assert np.isfinite(np.asarray(g)).all()
        # f64 dense reference by central differences (f32 FD of the pallas
        # path is too noisy: the Kbar-weighted sum cancels heavily).
        X64, K64 = np.asarray(X, np.float64), np.asarray(Kbar, np.float64)
        gam, sig, alp = (float(h) for h in hyp)

        def f_ref(Xv):
            d2 = ((Xv[:, None, :] - Xv[None, :, :]) ** 2).sum(-1)
            d = np.sqrt(np.maximum(d2, 0.0))
            if family == "squared_exponential":
                K = sig * np.exp(-d2 / (2 * gam**2))
            elif family == "matern12":
                K = sig * np.exp(-d / gam)
            else:  # matern32
                c = np.sqrt(3.0) * d / gam
                K = sig * (1 + c) * np.exp(-c)
            return float((K64 * K).sum())

        g_ref = np.zeros_like(X64)
        h = 1e-6
        for i in range(X64.shape[0]):
            for j in range(X64.shape[1]):
                Xp, Xm = X64.copy(), X64.copy()
                Xp[i, j] += h
                Xm[i, j] -= h
                g_ref[i, j] = (f_ref(Xp) - f_ref(Xm)) / (2 * h)
        np.testing.assert_allclose(np.asarray(g), g_ref, rtol=2e-4, atol=2e-5)

    def test_ml2_optimization_runs_on_pallas_backend(self):
        from climateparameterizations_jl_tpu.closures.gp import optimize_kernel_hyperparameters

        rng = np.random.default_rng(8)
        x = jnp.asarray(rng.normal(size=(32, 4)), jnp.float32)
        y = jnp.asarray(np.sin(np.asarray(x).sum(axis=1, keepdims=True)), jnp.float32)
        k0 = GPKernel(
            gamma=jnp.float32(3.0), sigma=jnp.float32(1.0), alpha=jnp.float32(1.0),
            backend="pallas",
        )
        k, losses = optimize_kernel_hyperparameters(x, y, k0, None, iters=25, learning_rate=0.05)
        assert losses[-1] < losses[0]
        assert np.isfinite(losses).all()
        assert float(k.gamma) != 3.0  # hyperparameters actually moved


class TestVmappedGridSearch:
    def _data(self):
        rng = np.random.default_rng(3)
        X = jnp.asarray(np.sort(rng.uniform(-3, 3, size=40))[:, None])
        Xv = jnp.asarray(np.linspace(-2.8, 2.8, 25)[:, None])
        return X, jnp.sin(X), Xv, jnp.sin(Xv), jnp.asarray([0.0])

    def test_vmapped_matches_sequential_fits(self):
        """One batched program == the reference's sequential refit loop."""
        from climateparameterizations_jl_tpu.closures.gp import error_per_gamma

        X, Y, Xv, Yv, z = self._data()
        lgs = np.linspace(-1.0, 1.0, 6)
        errs = error_per_gamma(X, Y, Xv, Yv, z, 1, lgs)
        for lg, err in zip(lgs, errs):
            kernel = get_kernel(1, float(lg), 0.0)
            model = gp_fit(X, Y, kernel, z)
            direct = float(jnp.mean((gp_predict(model, Xv) - Yv) ** 2))
            np.testing.assert_allclose(err, direct, rtol=1e-6, atol=1e-12)

    def test_sharded_search_matches_best_kernel(self):
        """Gamma grid sharded over the 8-device mesh == single-device search."""
        from climateparameterizations_jl_tpu.parallel.sharding import (
            make_mesh,
            sharded_kernel_search,
        )

        X, Y, Xv, Yv, z = self._data()
        lgs = np.linspace(-1.0, 1.0, 11)  # non-multiple of 8: exercises padding
        k_ref, err_ref = best_kernel(X, Y, Xv, Yv, z, kernel_ids=(1, 2), log_gammas=lgs)
        mesh = make_mesh(8)
        k_sh, err_sh = sharded_kernel_search(mesh, X, Y, Xv, Yv, z, kernel_ids=(1, 2), log_gammas=lgs)
        np.testing.assert_allclose(err_sh, err_ref, rtol=1e-6)
        assert k_sh.family == k_ref.family
        np.testing.assert_allclose(float(k_sh.gamma), float(k_ref.gamma), rtol=1e-6)


class TestMultiFit1D:
    def test_matches_gp_fit_for_1d_targets(self):
        """gp_fit accepts (n,) targets; the fused multi-fit must too (it used
        to IndexError on the stacked-solve slice)."""
        from climateparameterizations_jl_tpu.closures.gp import get_kernel, gp_fit, gp_fit_multi, gp_predict

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.normal(size=(24, 4)))
        y1 = jnp.sin(x.sum(axis=1))
        y2 = jnp.cos(x.sum(axis=1))
        k = get_kernel(1, 0.0)
        models = gp_fit_multi(x, [y1, y2], [k, k], None)
        ref1 = gp_fit(x, y1, k, None)
        np.testing.assert_allclose(np.asarray(models[0].alpha), np.asarray(ref1.alpha), rtol=1e-8)
        assert models[0].alpha.ndim == 1  # same shape contract as gp_fit
        np.testing.assert_allclose(
            np.asarray(gp_predict(models[1], x)), np.asarray(y2), atol=5e-2
        )

    def test_hyperopt_accepts_python_scalar_kernel(self):
        """optimize_kernel_hyperparameters must coerce python-scalar
        hyperparameters instead of silently optimizing an empty dict."""
        from climateparameterizations_jl_tpu.closures.gp import GPKernel, optimize_kernel_hyperparameters

        rng = np.random.default_rng(4)
        x = jnp.asarray(rng.normal(size=(24, 3)), jnp.float32)
        y = jnp.sin(x.sum(axis=1, keepdims=True))
        k0 = GPKernel(gamma=3.0, sigma=1.0, alpha=1.0)  # python floats
        k, losses = optimize_kernel_hyperparameters(x, y, k0, None, iters=10)
        assert losses[-1] < losses[0]
        assert float(k.gamma) != 3.0


class TestBlockedGPFit:
    """Blocked fit (ops/blocked_gp.py): the same math as gp_fit with no
    device program larger than one tile op — the path past the tunnel's
    remote-compile wall at n >= 16,384 f64 (VERDICT r4 item 8)."""

    def _data(self, n=300, D=12, dtype=jnp.float64):
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(n, D)), dtype)
        y = jnp.asarray(np.sin(np.asarray(x[:, 0])) + 0.1 * rng.normal(size=n), dtype)
        y2 = jnp.stack([y, 2.0 * y], axis=-1)
        z = jnp.linspace(0.0, 1.0, D)
        return x, y, y2, z

    @pytest.mark.parametrize("block", [128, 300, 512], ids=["uneven", "exact", "oversize"])
    def test_matches_unblocked_fit(self, block):
        from climateparameterizations_jl_tpu.ops.blocked_gp import gp_fit_blocked

        x, y, _, z = self._data()
        k = _kernel(gamma=1.0)
        ref = gp_fit(x, y, k, z)
        m, tiles = gp_fit_blocked(x, y, k, z, block=block)
        np.testing.assert_allclose(np.asarray(m.alpha), np.asarray(ref.alpha), rtol=1e-8, atol=1e-10)
        # The tiles ARE the lower-Cholesky factor.
        n = x.shape[0]
        L = np.zeros((n, n))
        for (i, j), t in tiles.items():
            si, sj = i * block, j * block
            t = np.asarray(t)
            L[si : si + t.shape[0], sj : sj + t.shape[1]] = t
        np.testing.assert_allclose(L, np.asarray(ref.chol), rtol=1e-8, atol=1e-10)

    def test_blocked_cho_solve_multirhs(self):
        from climateparameterizations_jl_tpu.ops.blocked_gp import (
            blocked_cho_solve,
            blocked_gram_cholesky,
        )

        x, _, y2, z = self._data()
        k = _kernel(gamma=1.0)
        ref = gp_fit(x, y2, k, z)
        tiles, _ = blocked_gram_cholesky(k, x, z, block=128)
        out = blocked_cho_solve(tiles, y2, block=128)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref.alpha), rtol=1e-8, atol=1e-10)

    def test_uncertainty_matches(self):
        from climateparameterizations_jl_tpu.closures.gp import gp_uncertainty
        from climateparameterizations_jl_tpu.ops.blocked_gp import (
            gp_fit_blocked,
            gp_uncertainty_blocked,
        )

        x, y, _, z = self._data()
        k = _kernel(gamma=1.0)
        ref = gp_fit(x, y, k, z)
        m, tiles = gp_fit_blocked(x, y, k, z, block=128)
        rng = np.random.default_rng(1)
        xq = jnp.asarray(rng.normal(size=(37, x.shape[1])), x.dtype)
        var_ref = gp_uncertainty(ref, xq)
        var = gp_uncertainty_blocked(m, tiles, xq, block=128, query_chunk=16)
        np.testing.assert_allclose(np.asarray(var), np.asarray(var_ref), rtol=1e-7, atol=1e-9)

    def test_prediction_matches(self):
        from climateparameterizations_jl_tpu.closures.gp import gp_predict
        from climateparameterizations_jl_tpu.ops.blocked_gp import gp_fit_blocked

        x, y, _, z = self._data()
        k = _kernel(gamma=1.0)
        ref = gp_fit(x, y, k, z)
        m, _ = gp_fit_blocked(x, y, k, z, block=128)
        rng = np.random.default_rng(2)
        xq = jnp.asarray(rng.normal(size=(9, x.shape[1])), x.dtype)
        np.testing.assert_allclose(
            np.asarray(gp_predict(m, xq)), np.asarray(gp_predict(ref, xq)), rtol=1e-8
        )
