"""Tests: KPP parameter calibration, predict helper, polynomial
decomposition, profiling utilities."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climateparameterizations_jl_tpu.data.containers import coarsen_dataset
from climateparameterizations_jl_tpu.data.synthetic import synthetic_free_convection_les
from climateparameterizations_jl_tpu.physics.kpp import KPPParameters
from climateparameterizations_jl_tpu.train.kpp_calibration import (
    calibrate_kpp,
    make_kpp_loss_fn,
    random_line_search,
    random_plugin,
)
from climateparameterizations_jl_tpu.utils.polynomial import (
    basis_functions,
    polynomial_decomposition,
    reconstruct,
)
from climateparameterizations_jl_tpu.utils.predict import predict
from climateparameterizations_jl_tpu.utils.profiling import Timer, time_fn


@pytest.fixture(scope="module")
def fc_dataset():
    ds = synthetic_free_convection_les(Nz=64, n_save=16, dt_save=1800.0)
    return coarsen_dataset(ds, 32)


class TestKPPCalibration:
    def test_diurnal_dataset_threads_cycle_into_forward(self):
        """Calibrating KPP on a diurnal dataset must use the sinusoidal
        surface flux, not its amplitude as a constant (silent wrong physics)."""
        import dataclasses as dc

        from climateparameterizations_jl_tpu.data.synthetic import synthetic_wind_mixing_les
        from climateparameterizations_jl_tpu.train.kpp_calibration import make_kpp_forward_fn

        ds = coarsen_dataset(
            synthetic_wind_mixing_les(Nz=64, n_save=8, dt_save=3600.0, n_substeps=1, diurnal=True), 32
        )
        fwd, y = make_kpp_forward_fn(ds, np.arange(0, 8, 2), 32)
        d = KPPParameters.default()
        v = jnp.asarray([float(d.CSL), float(d.CNL), float(d.Cb_T), float(d.CKE)])
        out = np.asarray(fwd(v))
        assert np.isfinite(out).all() and np.isfinite(np.asarray(y)).all()
        # The constant-flux twin (amplitude stripped) must produce a
        # DIFFERENT trajectory — same output would mean the cycle was dropped.
        ds_const = dc.replace(ds, diurnal_amplitude=jnp.zeros_like(ds.diurnal_amplitude))
        fwd_const, _ = make_kpp_forward_fn(ds_const, np.arange(0, 8, 2), 32)
        assert not np.allclose(out, np.asarray(fwd_const(v)))

    def test_mixed_diurnal_suite_refused(self):
        from climateparameterizations_jl_tpu.data.containers import stack_datasets
        from climateparameterizations_jl_tpu.data.synthetic import synthetic_wind_mixing_les
        from climateparameterizations_jl_tpu.train.kpp_calibration import make_kpp_forward_fn

        const = coarsen_dataset(synthetic_wind_mixing_les(Nz=64, n_save=8, dt_save=3600.0, n_substeps=1), 32)
        diur = coarsen_dataset(
            synthetic_wind_mixing_les(Nz=64, n_save=8, dt_save=3600.0, n_substeps=1, diurnal=True), 32
        )
        with pytest.raises(ValueError, match="mixed"):
            make_kpp_forward_fn(stack_datasets([const, diur]), np.arange(0, 8, 2), 32)

    def test_loss_fn_finite_and_vmappable(self, fc_dataset):
        loss_fn = make_kpp_loss_fn(fc_dataset, np.arange(0, 16, 4), 32)
        defaults = KPPParameters.default()
        v = jnp.asarray([float(defaults.CSL), float(defaults.CNL), float(defaults.Cb_T), float(defaults.CKE)])
        l0 = loss_fn(v)
        assert np.isfinite(float(l0))
        batch = jnp.stack([v, v * 1.1, v * 0.9])
        losses = jax.vmap(loss_fn)(batch)
        assert losses.shape == (3,)
        # vmapped and unbatched compilations of the same f32 solve differ by
        # a few ULPs per step (XLA lowers batched ops differently); through
        # 16 steps the trajectory wiggles ~1e-5 absolute, which the MSE's
        # 2*r*delta cross-term turns into ~2e-4 relative on this loss. Bound
        # the compilation noise, don't demand bitwise batching invariance.
        np.testing.assert_allclose(float(losses[0]), float(l0), rtol=2e-3)

    def test_random_plugin_improves_over_worst(self, fc_dataset):
        loss_fn = make_kpp_loss_fn(fc_dataset, np.arange(0, 16, 4), 32)
        best, best_loss, losses = random_plugin(
            loss_fn, {"CSL": (0.01, 0.99), "CNL": (0.0, 8.0), "Cb_T": (0.1, 6.0), "CKE": (0.0, 5.0)},
            n_samples=16, key=jax.random.PRNGKey(0),
        )
        finite = np.asarray(losses)[np.isfinite(np.asarray(losses))]
        assert float(best_loss) == finite.min()
        assert best.shape == (4,)

    def test_line_search_monotone(self, fc_dataset):
        loss_fn = make_kpp_loss_fn(fc_dataset, np.arange(0, 16, 4), 32)
        v0 = jnp.asarray([0.5, 4.0, 2.0, 2.0])
        _, history = random_line_search(loss_fn, v0, jax.random.PRNGKey(1), n_iters=5)
        h = np.asarray(history)
        assert np.all(np.diff(h) <= 1e-12)  # never worsens

    def test_full_pipeline(self, fc_dataset):
        params, info = calibrate_kpp(
            fc_dataset, np.arange(0, 16, 4), 32,
            key=jax.random.PRNGKey(2), n_plugin=8, n_line_search=3,
        )
        assert isinstance(params, KPPParameters)
        assert info["final_loss"] <= info["plugin_best_loss"] + 1e-12
        assert 0.0 < float(params.CSL) < 1.0

    def test_gradient_refine_beats_line_search(self, fc_dataset):
        """Exact-gradient refinement (possible since the KPP solve's grads
        are finite in every regime) must reach at least the FD line search's
        loss from the same plugin start — it moves ALL coordinates per step,
        the line search one."""
        from climateparameterizations_jl_tpu.train.kpp_calibration import gradient_refine_kpp

        tsteps = np.arange(0, 16, 4)
        loss_fn = make_kpp_loss_fn(fc_dataset, tsteps, 32)
        priors = {"CSL": (0.01, 0.99), "CNL": (0.0, 8.0), "Cb_T": (0.1, 6.0), "CKE": (0.0, 5.0)}
        v0, l0, _ = random_plugin(loss_fn, priors, n_samples=8, key=jax.random.PRNGKey(3))
        lo = [priors[n][0] for n in priors]
        hi = [priors[n][1] for n in priors]
        v_grad, h_grad = gradient_refine_kpp(loss_fn, v0, (lo, hi), n_iters=25)
        _, h_ls = random_line_search(loss_fn, v0, jax.random.PRNGKey(4), n_iters=25, bounds=(lo, hi))
        assert np.all(np.isfinite(h_grad))
        assert min(h_grad) <= float(l0) + 1e-12
        assert min(h_grad) <= h_ls[-1] * 1.05  # at least matches the FD search
        # Refined values respect the box.
        assert np.all(np.asarray(v_grad) >= np.asarray(lo) - 1e-9)
        assert np.all(np.asarray(v_grad) <= np.asarray(hi) + 1e-9)


class TestPredict:
    def test_scaled_and_unscaled(self):
        x = jnp.ones((5, 3))
        y = 2.0 * jnp.ones((5, 2))
        model = lambda x: jnp.ones((x.shape[0], 2))  # noqa: E731
        pred, truth = predict(model, x, y)
        np.testing.assert_allclose(np.asarray(pred), 1.0)
        np.testing.assert_allclose(np.asarray(truth), 2.0)
        pred_u, truth_u = predict(model, x, y, unscale_fn=lambda z: 10.0 * z)
        np.testing.assert_allclose(np.asarray(pred_u), 10.0)
        np.testing.assert_allclose(np.asarray(truth_u), 20.0)


class TestPolynomialDecomposition:
    @pytest.mark.parametrize("kind", ["legendre", "chebyshev", "fourier"])
    def test_reconstructs_smooth_function(self, kind):
        x = jnp.linspace(-1.0, 1.0, 201)
        f = jnp.exp(-(x**2)) * jnp.cos(2 * x)
        coeffs = polynomial_decomposition(f, x, kind=kind, n=16)
        f_rec = reconstruct(coeffs, x, kind=kind)
        err = float(jnp.max(jnp.abs(f - f_rec)))
        # Fourier converges slower for non-periodic derivatives (C0 extension).
        tol = 5e-2 if kind == "fourier" else 2e-2
        assert err < tol, (kind, err)

    def test_legendre_exact_for_polynomials(self):
        x = jnp.linspace(-1.0, 1.0, 401)
        f = 3.0 + 2.0 * x - x**2
        coeffs = polynomial_decomposition(f, x, kind="legendre", n=5)
        f_rec = reconstruct(coeffs, x, kind="legendre")
        np.testing.assert_allclose(np.asarray(f_rec), np.asarray(f), atol=1e-3)
        # Degree-3+ coefficients vanish for a quadratic (up to trapezoid error).
        assert abs(float(coeffs[3])) < 1e-3 and abs(float(coeffs[4])) < 1e-3

    def test_basis_shapes(self):
        x = jnp.linspace(0.0, 1.0, 33)
        for kind in ("legendre", "chebyshev", "fourier"):
            phi = basis_functions(kind, 7, x, domain=(0.0, 1.0))
            assert phi.shape == (7, 33)


class TestProfiling:
    def test_time_fn(self):
        fn = jax.jit(lambda x: (x * x).sum())
        stats = time_fn(fn, jnp.arange(1024.0), iters=3, warmup=1)
        assert stats["compile_s"] > 0
        assert stats["median_s"] > 0
        assert stats["iters"] == 3

    def test_timer_sections(self):
        timer = Timer()
        with timer("a"):
            pass
        with timer("a"):
            pass
        with timer("b"):
            pass
        report = timer.report()
        assert report["a"]["count"] == 2
        assert report["b"]["count"] == 1


class TestEKI:
    def test_linear_gaussian_recovers_truth(self):
        """EKI on a linear forward map converges to the generating parameters."""
        from climateparameterizations_jl_tpu.train.eki import eki_calibrate

        rng = np.random.default_rng(0)
        A = jnp.asarray(rng.normal(size=(12, 2)))
        theta_true = jnp.asarray([0.7, 2.5])
        y = A @ theta_true
        forward = lambda v: A @ v  # noqa: E731
        priors = {"a": (0.0, 1.0), "b": (0.0, 5.0)}
        result = eki_calibrate(
            forward, y, priors, key=jax.random.PRNGKey(1),
            n_ensemble=64, n_iterations=12, noise_std=1e-3,
        )
        np.testing.assert_allclose(np.asarray(result.theta_mean), np.asarray(theta_true), atol=0.05)
        # Misfit collapses and the ensemble stays inside the prior box.
        assert result.misfit_history[-1] < 0.01 * result.misfit_history[0]
        ens = np.asarray(result.ensemble)
        assert np.all(ens[:, 0] >= 0.0) and np.all(ens[:, 0] <= 1.0)
        assert np.all(ens[:, 1] >= 0.0) and np.all(ens[:, 1] <= 5.0)
        assert np.all(np.asarray(result.theta_std) >= 0.0)

    def test_tempering_prevents_saturation_collapse(self):
        """When the best fit sits at a prior-box corner (sigmoid saturation)
        and noise_std is overconfident, the untempered update overshoots and
        freezes at the WRONG corner with a rising misfit; tempering (N
        annealed partial updates) converges to the right one. This is the
        failure mode observed calibrating mPP against LES-generated data."""
        from climateparameterizations_jl_tpu.train.eki import eki_calibrate

        rng = np.random.default_rng(0)
        A = jnp.asarray(rng.normal(size=(20, 2)), jnp.float32)
        # f32 throughout: the exact collapse is an f32 phenomenon (members
        # become bitwise identical in the saturated tails).
        y = (A @ jnp.asarray([2.0, 8.0], jnp.float32)).astype(jnp.float32)
        forward = lambda v: (A @ v.astype(jnp.float32)).astype(jnp.float32)  # noqa: E731
        priors = {"a": (0.0, 1.0), "b": (0.0, 5.0)}
        kw = dict(key=jax.random.PRNGKey(1), n_ensemble=32, n_iterations=10, noise_std=1e-3)
        bad = eki_calibrate(forward, y, priors, tempered=False, **kw)
        good = eki_calibrate(forward, y, priors, tempered=True, **kw)
        # Untempered: misfit rises (collapsed at the wrong corner).
        assert bad.misfit_history[-1] > bad.misfit_history[0]
        # Tempered (the default): converges to the correct corner (1, 5).
        assert good.misfit_history[-1] < 0.5 * good.misfit_history[0]
        np.testing.assert_allclose(np.asarray(good.theta_mean), [1.0, 5.0], atol=0.05)

    def test_mesh_sharded_matches_single_device(self):
        """EKI with the ensemble axis sharded over the mesh == unsharded."""
        from jax.sharding import Mesh

        from climateparameterizations_jl_tpu.train.eki import eki_calibrate

        rng = np.random.default_rng(0)
        A = jnp.asarray(rng.normal(size=(12, 2)))
        y = A @ jnp.asarray([0.7, 2.5])
        forward = lambda v: A @ v  # noqa: E731
        priors = {"a": (0.0, 1.0), "b": (0.0, 5.0)}
        kw = dict(key=jax.random.PRNGKey(1), n_ensemble=32, n_iterations=4, noise_std=1e-3)
        ref = eki_calibrate(forward, y, priors, **kw)
        mesh = Mesh(np.array(jax.devices()), ("ens",))
        sharded = eki_calibrate(forward, y, priors, mesh=mesh, **kw)
        np.testing.assert_allclose(
            np.asarray(sharded.ensemble), np.asarray(ref.ensemble), rtol=1e-5, atol=1e-6
        )
        with pytest.raises(ValueError):
            eki_calibrate(forward, y, priors, mesh=mesh, key=jax.random.PRNGKey(1), n_ensemble=30)

    def test_kpp_eki_smoke(self, fc_dataset):
        """EKI drives the vmapped KPP ensemble; misfit decreases, params stay bounded."""
        from climateparameterizations_jl_tpu.train.eki import calibrate_kpp_eki

        params, result = calibrate_kpp_eki(
            fc_dataset, np.arange(0, 16, 4), 32, key=jax.random.PRNGKey(2),
            n_ensemble=16, n_iterations=3,
        )
        assert result.misfit_history[-1] <= result.misfit_history[0]
        assert np.all(np.isfinite(np.asarray(result.theta_mean)))
        assert 0.01 <= float(params.CSL) <= 0.99
        assert np.all(np.asarray(result.theta_std) >= 0.0)


class TestPolynomialAnimation:
    def test_animation_writes_gif(self, tmp_path):
        import os

        from climateparameterizations_jl_tpu.eval.animations import (
            animate_polynomial_decomposition,
        )

        x = np.linspace(-1.0, 1.0, 64)
        f = np.tanh(3 * x) + 0.2 * x**2
        p = animate_polynomial_decomposition(f, x, str(tmp_path / "poly.gif"), kind="chebyshev", n_max=6)
        assert os.path.getsize(p) > 0
