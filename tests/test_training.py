"""End-to-end training tests: the minimum slice of SURVEY.md §7 on synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climateparameterizations_jl_tpu.closures.mlp import free_convection_mlp, wind_mixing_mlp
from climateparameterizations_jl_tpu.data.containers import (
    coarsen_dataset,
    direct_regression_pairs,
    fit_wind_mixing_scalings,
    stack_datasets,
    training_tensors,
)
from climateparameterizations_jl_tpu.data.synthetic import (
    synthetic_free_convection_les,
    synthetic_wind_mixing_les,
)
from climateparameterizations_jl_tpu.models.free_convection import FreeConvectionModel
from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs, WindMixingModel, WindMixingScalings
from climateparameterizations_jl_tpu.physics.mpp import MPPParameters
from climateparameterizations_jl_tpu.train.checkpoint import load_checkpoint, save_checkpoint
from climateparameterizations_jl_tpu.train.loss import LossChannels, calculate_loss_scalings
from climateparameterizations_jl_tpu.train.mpp_calibration import optimise_mpp_parameters
from climateparameterizations_jl_tpu.train.nde import (
    NDETrainConfig,
    train_free_convection_nde,
    train_wind_mixing_nde,
)
from climateparameterizations_jl_tpu.train.nn import train_flux_nn

f32 = jnp.float32


@pytest.fixture(scope="module")
def wm_setup():
    les1 = synthetic_wind_mixing_les(Qu=-5e-4, Qb=3e-8, Nz=64, n_save=30, dt_save=600.0, n_substeps=2)
    les2 = synthetic_wind_mixing_les(Qu=-2e-4, Qb=1e-8, Nz=64, n_save=30, dt_save=600.0, n_substeps=2)
    coarse = [coarsen_dataset(d, 32) for d in (les1, les2)]
    scalings = fit_wind_mixing_scalings(coarse)
    suite = stack_datasets(coarse)
    tau = jnp.abs(coarse[0].t[-1] - coarse[0].t[0])
    model = WindMixingModel(
        H=coarse[0].H,
        tau=tau,
        f=coarse[0].f,
        g=coarse[0].g,
        alpha=coarse[0].alpha,
        kappa=f32(10.0),
        scalings=scalings,
        mpp=MPPParameters.default(),
        Nz=32,
        zero_weights=True,
    )
    batch = training_tensors(suite, scalings, tsteps=np.arange(0, 15), tau=tau)
    return model, suite, scalings, batch


class TestLossScalings:
    def test_fractions_hit_targets(self):
        """The closed-form weights push channel shares to the requested fractions."""
        losses = LossChannels(
            u=jnp.asarray(0.3), v=jnp.asarray(0.2), T=jnp.asarray(2.0),
            dudz=jnp.asarray(5.0), dvdz=jnp.asarray(3.0), dTdz=jnp.asarray(0.7),
        )
        fractions = {"T": 0.8, "dTdz": 0.8, "profile": 0.5}
        w = calculate_loss_scalings(losses, fractions, train_gradient=True)
        scaled_T = float(w.T * losses.T)
        scaled_uv = float(w.u * losses.u + w.v * losses.v)
        assert scaled_T / (scaled_T + scaled_uv) == pytest.approx(0.8, rel=1e-5)
        scaled_dT = float(w.dTdz * losses.dTdz)
        scaled_duv = float(w.dudz * losses.dudz + w.dvdz * losses.dvdz)
        assert scaled_dT / (scaled_dT + scaled_duv) == pytest.approx(0.8, rel=1e-5)
        profile = scaled_T + scaled_uv
        gradient = scaled_dT + scaled_duv
        assert profile / (profile + gradient) == pytest.approx(0.5, rel=1e-5)

    def test_zero_velocity_suite_stays_finite(self):
        """u = v = 0 exactly (free-convection-style batch): the velocity
        weight is irrelevant but must be 0, not inf (inf * 0 = NaN total)."""
        from climateparameterizations_jl_tpu.train.loss import apply_loss_scalings

        zero = jnp.asarray(0.0)
        losses = LossChannels(u=zero, v=zero, T=jnp.asarray(2.0),
                              dudz=zero, dvdz=zero, dTdz=jnp.asarray(0.7))
        w = calculate_loss_scalings(losses, {"T": 0.8, "dTdz": 0.8, "profile": 0.5})
        total = float(sum(jax.tree.leaves(apply_loss_scalings(losses, w))))
        assert np.isfinite(float(w.u)) and float(w.u) == 0.0
        assert np.isfinite(total) and total > 0.0


class TestWindMixingNDETraining:
    def test_loss_decreases(self, wm_setup):
        model, suite, scalings, batch = wm_setup
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        nns = FluxNNs(
            uw=wind_mixing_mlp(keys[0], 32, scale=1e-5),
            vw=wind_mixing_mlp(keys[1], 32, scale=1e-5),
            wT=wind_mixing_mlp(keys[2], 32, scale=1e-5),
        )
        config = NDETrainConfig(learning_rate=3e-3, maxiters=15, n_substeps=2, method="rk4")
        nns2, history = train_wind_mixing_nde(model, nns, batch, config)
        first = history[0].total()
        last = min(h.total() for h in history)
        assert np.isfinite(first) and np.isfinite(last)
        assert last < first  # optimizer makes progress

    def test_training_fractions_mode(self, wm_setup):
        model, suite, scalings, batch = wm_setup
        nns = FluxNNs(uw=None, vw=None, wT=wind_mixing_mlp(jax.random.PRNGKey(1), 32, scale=1e-5))
        config = NDETrainConfig(
            learning_rate=1e-3, maxiters=3, n_substeps=2,
            training_fractions={"T": 0.8, "dTdz": 0.8, "profile": 0.5},
        )
        _, history = train_wind_mixing_nde(model, nns, batch, config)
        assert len(history) == 3
        assert np.isfinite(history[-1].total())

    def test_trained_triple_nn_beats_mpp_baseline(self):
        """Wind-mixing core claim end-to-end: the trained triple-NN NDE
        tracks the LES trajectory much better than mPP physics alone."""
        from climateparameterizations_jl_tpu.data.synthetic import synthetic_wind_mixing_les
        from climateparameterizations_jl_tpu.train.nde import _solve

        les = synthetic_wind_mixing_les(Qu=-5e-4, Qb=3e-8, Nz=64, n_save=30, dt_save=600.0, n_substeps=2)
        coarse = [coarsen_dataset(les, 32)]
        scalings = fit_wind_mixing_scalings(coarse)
        suite = stack_datasets(coarse)
        tau = jnp.abs(coarse[0].t[-1] - coarse[0].t[0])
        model = WindMixingModel(
            H=coarse[0].H, tau=tau, f=coarse[0].f, g=coarse[0].g, alpha=coarse[0].alpha,
            kappa=f32(10.0), scalings=scalings, mpp=MPPParameters.default(), Nz=32, zero_weights=True,
        )
        batch = training_tensors(suite, scalings, tsteps=np.arange(0, 24), tau=tau)
        ks = jax.random.split(jax.random.PRNGKey(5), 3)
        nns0 = FluxNNs(*[wind_mixing_mlp(k, 32, scale=1e-4) for k in ks])
        config = NDETrainConfig(learning_rate=3e-3, maxiters=200, n_substeps=4, method="split")
        nns, _ = train_wind_mixing_nde(model, nns0, batch, config)

        def traj_mse(nns_):
            pred = _solve(model, nns_, batch, config)
            return float(jnp.mean((pred - batch.targets) ** 2))

        err_nde = traj_mse(nns)
        err_mpp = traj_mse(FluxNNs(uw=None, vw=None, wT=None))
        # Prototype reaches ~7% of the mPP-only error; assert 3x margin.
        assert err_nde < 0.3 * err_mpp, (err_nde, err_mpp)

        # Embedded in the dimensional host column (implicit mPP + 3 NN
        # forcings), the trained closure must improve on physics-only too
        # (the reference's NDE_oceananigans claim).
        from climateparameterizations_jl_tpu.eval.profile import nde_profile

        ev = nde_profile(
            model, nns, coarse[0], np.arange(0, 24), include_kpp=False,
            include_embedded=True, embedded_substeps=10,
        )
        emb = float(np.mean(ev["losses_embedded_T"]))
        emb_base = float(np.mean(ev["losses_embedded_baseline_T"]))
        assert emb < emb_base, (emb, emb_base)


class TestMPPCalibration:
    def test_recovers_lower_loss(self, wm_setup):
        model, suite, scalings, batch = wm_setup
        import dataclasses as dc

        # Perturb the parameters away from those that generated the data.
        wrong = MPPParameters(
            nu_0=f32(3e-4), nu_minus=f32(3e-2), Ri_c=f32(0.4), delta_Ri=f32(2.0), Pr=f32(1.5)
        )
        m = dc.replace(model, mpp=wrong)
        config = NDETrainConfig(learning_rate=0.05, maxiters=10, n_substeps=2, train_gradient=False)
        fitted, history = optimise_mpp_parameters(m, batch, config, initial=wrong)
        losses = [h[0] for h in history]
        assert losses[-1] < losses[0]  # calibration reduces trajectory loss
        assert float(fitted.nu_0) >= 0.0

    def test_lbfgs_matches_or_beats_adam(self, wm_setup):
        """The reference calibrates mPP with BFGS/LBFGS (optimise_modified_
        pacanowski_philander_args.jl:66-72); our optax.lbfgs path must reach
        at-most adam's loss within the same iteration budget."""
        import dataclasses as dc

        wrong = MPPParameters(
            nu_0=f32(3e-4), nu_minus=f32(3e-2), Ri_c=f32(0.4), delta_Ri=f32(2.0), Pr=f32(1.5)
        )
        model, suite, scalings, batch = wm_setup
        m = dc.replace(model, mpp=wrong)
        iters = 8
        base = dict(learning_rate=0.05, maxiters=iters, n_substeps=2, train_gradient=False)
        _, hist_adam = optimise_mpp_parameters(m, batch, NDETrainConfig(**base), initial=wrong)
        _, hist_lbfgs = optimise_mpp_parameters(
            m, batch, NDETrainConfig(**{**base, "optimizer": "lbfgs"}), initial=wrong
        )
        best_adam = min(h[0] for h in hist_adam)
        best_lbfgs = min(h[0] for h in hist_lbfgs)
        assert np.isfinite(best_lbfgs)
        assert best_lbfgs <= best_adam * 1.05, (best_lbfgs, best_adam)

    def test_eki_calibration_reduces_misfit(self, wm_setup):
        """Gradient-free mPP calibration via EKI (+ posterior spread)."""
        import dataclasses as dc

        from climateparameterizations_jl_tpu.train.mpp_calibration import calibrate_mpp_eki

        model, suite, scalings, batch = wm_setup
        wrong = MPPParameters(
            nu_0=f32(3e-4), nu_minus=f32(3e-2), Ri_c=f32(0.4), delta_Ri=f32(2.0), Pr=f32(1.5)
        )
        m = dc.replace(model, mpp=wrong)
        # Split (implicit-diffusion) solver: stiff large-nu prior draws stay
        # stable, keeping the ensemble forward map well-posed.
        config = NDETrainConfig(n_substeps=2, train_gradient=False, method="split")
        fitted, result = calibrate_mpp_eki(
            m, batch, config, key=jax.random.PRNGKey(0), n_ensemble=16, n_iterations=3
        )
        assert result.misfit_history[-1] <= result.misfit_history[0]
        assert np.all(np.isfinite(np.asarray(result.theta_mean)))
        assert float(fitted.nu_0) > 0.0
        assert np.all(np.asarray(result.theta_std) >= 0.0)

    def test_eki_zero_parameter_default_prior_raises(self, wm_setup):
        """A zero base parameter makes the multiplicative default prior a
        degenerate (0, 0) box -> 0/0 NaN ensemble; must fail loudly."""
        import dataclasses as dc

        from climateparameterizations_jl_tpu.train.mpp_calibration import calibrate_mpp_eki

        model, suite, scalings, batch = wm_setup
        m = dc.replace(model, mpp=dc.replace(model.mpp, nu_minus=f32(0.0)))
        config = NDETrainConfig(n_substeps=2, train_gradient=False, method="split")
        with pytest.raises(ValueError, match="nu_minus"):
            calibrate_mpp_eki(m, batch, config, key=jax.random.PRNGKey(0), n_ensemble=4, n_iterations=1)


class TestDirectFluxRegression:
    def test_unknown_causality_mode_raises(self, wm_setup):
        model, suite, scalings, batch = wm_setup
        x, y = direct_regression_pairs(suite, scalings, "wT")
        nn = wind_mixing_mlp(jax.random.PRNGKey(2), 32, hidden=(16,))
        with pytest.raises(ValueError, match="causality"):
            train_flux_nn(nn, x, y, epochs=1, causality="Hard")  # case slip must not train unmasked

    def test_fits_synthetic_fluxes(self, wm_setup):
        model, suite, scalings, batch = wm_setup
        x, y = direct_regression_pairs(suite, scalings, "wT")
        nn = wind_mixing_mlp(jax.random.PRNGKey(2), 32, hidden=(64,), activation="relu")
        nn, history = train_flux_nn(nn, x, y, learning_rate=3e-3, epochs=200, gradient_scaling=5e-3, dz_hat=1 / 32)
        assert history[-1] < history[0]
        assert history[-1] < 0.3 * history[0]  # substantial fit progress

    def test_scanned_path_matches_epoch_loop(self, wm_setup):
        """The one-dispatch lax.scan fast path (no callback, full batch) is
        step-for-step the per-epoch jitted loop (a no-op callback forces the
        loop for the reference side)."""
        model, suite, scalings, batch = wm_setup
        x, y = direct_regression_pairs(suite, scalings, "wT")
        nn0 = wind_mixing_mlp(jax.random.PRNGKey(3), 32, hidden=(16,))
        fast, h_fast = train_flux_nn(nn0, x, y, learning_rate=1e-3, epochs=8)
        slow, h_slow = train_flux_nn(nn0, x, y, learning_rate=1e-3, epochs=8, callback=lambda *a: None)
        np.testing.assert_allclose(np.asarray(h_fast), np.asarray(h_slow), rtol=1e-6)
        for a, b in zip(jax.tree.leaves(fast), jax.tree.leaves(slow)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8)

    def test_ensemble_pretraining_matches_solo(self, wm_setup):
        """Stacked flux pretraining (members x fluxes on one axis) equals
        the solo runs net-by-net."""
        import jax.numpy as jnp

        from climateparameterizations_jl_tpu.train.deep_ensemble import (
            stack_members,
            unstack_members,
        )
        from climateparameterizations_jl_tpu.train.nn import train_flux_nn_ensemble

        model, suite, scalings, batch = wm_setup
        x, y_uw = direct_regression_pairs(suite, scalings, "uw")
        _, y_wT = direct_regression_pairs(suite, scalings, "wT")
        nets = [wind_mixing_mlp(jax.random.PRNGKey(s), 32, hidden=(16,)) for s in (4, 5)]
        targets = jnp.stack([y_uw, y_wT])
        stacked, hist = train_flux_nn_ensemble(stack_members(nets), x, targets, learning_rate=1e-3, epochs=6)
        assert np.asarray(hist).shape == (2, 6)
        for net, y_t, h in zip(nets, (y_uw, y_wT), np.asarray(hist)):
            solo, h_solo = train_flux_nn(net, x, y_t, learning_rate=1e-3, epochs=6)
            np.testing.assert_allclose(h, np.asarray(h_solo), rtol=1e-5)
        solo_nets = [train_flux_nn(n, x, t, learning_rate=1e-3, epochs=6)[0] for n, t in zip(nets, (y_uw, y_wT))]
        for s, e in zip(solo_nets, unstack_members(stacked)):
            for a, b in zip(jax.tree.leaves(s), jax.tree.leaves(e)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7)


class TestFreeConvectionNDETraining:
    def test_loss_decreases(self):
        les = synthetic_free_convection_les(Nz=64, n_save=30, dt_save=600.0)
        coarse = coarsen_dataset(les, 32)
        from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling

        T_scaling = ZeroMeanUnitVarianceScaling.fit(coarse.T)
        wT_scaling = ZeroMeanUnitVarianceScaling.fit(coarse.wT)
        model = FreeConvectionModel(
            H=coarse.H,
            tau=jnp.abs(coarse.t[-1] - coarse.t[0]),
            T_scaling=T_scaling,
            wT_scaling=wT_scaling,
            bottom_flux=wT_scaling.scale(f32(0.0)),
            top_flux=wT_scaling.scale(coarse.theta_top),
            Nz=32,
        )
        T_scaled = T_scaling.scale(coarse.T)  # (Nt, 32)
        tsteps = np.arange(0, 20)
        targets = T_scaled[None, tsteps]  # (1, 20, 32)
        T0 = targets[:, 0]
        t = (coarse.t[tsteps] - coarse.t[0]) / model.tau
        nn = free_convection_mlp(jax.random.PRNGKey(0), 32)
        nn = jax.tree.map(lambda a: a * 1e-3, nn)
        config = NDETrainConfig(learning_rate=2e-3, maxiters=15, n_substeps=2)
        nn2, history = train_free_convection_nde(model, nn, T0, targets, t, config)
        totals = [float(h.T) for h in history]
        assert totals[-1] < totals[0]

    def test_trained_nde_beats_physics_baseline(self):
        """The reference's core scientific claim, end-to-end: an NDE trained
        against LES profiles reproduces the trajectory far better than the
        physics-only column, INCLUDING beyond the training window."""
        from climateparameterizations_jl_tpu.models.free_convection import solve_free_convection_nde

        les = synthetic_free_convection_les(Nz=64, n_save=40, dt_save=600.0)
        coarse = coarsen_dataset(les, 32)
        from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling

        T_scaling = ZeroMeanUnitVarianceScaling.fit(coarse.T)
        wT_scaling = ZeroMeanUnitVarianceScaling.fit(coarse.wT)
        model = FreeConvectionModel(
            H=coarse.H, tau=jnp.abs(coarse.t[-1] - coarse.t[0]),
            T_scaling=T_scaling, wT_scaling=wT_scaling,
            bottom_flux=wT_scaling.scale(f32(0.0)),
            top_flux=wT_scaling.scale(coarse.theta_top), Nz=32,
        )
        T_all = T_scaling.scale(coarse.T)[None]  # (1, 41, 32)
        t_all = (coarse.t - coarse.t[0]) / model.tau
        n_train = 32
        targets = T_all[:, :n_train]
        T0 = T_all[:, 0]
        nn = jax.tree.map(lambda a: a * 1e-3, free_convection_mlp(jax.random.PRNGKey(0), 32))
        config = NDETrainConfig(learning_rate=2e-3, maxiters=150, n_substeps=2)
        nn_trained, _ = train_free_convection_nde(model, nn, T0, targets, t_all[:n_train], config)

        # Evaluate over the FULL span (the last 9 frames extrapolate).
        dt_save = t_all[1] - t_all[0]
        n_save = t_all.shape[0] - 1
        mse = lambda nn_: float(  # noqa: E731
            jnp.mean(
                (jnp.moveaxis(solve_free_convection_nde(model, nn_, T0, t_all[0], dt_save, n_save, n_substeps=2), 0, -2) - T_all) ** 2
            )
        )
        err_nde, err_physics = mse(nn_trained), mse(None)
        # In-window the prototype reaches ~0.2% of the baseline error; keep a
        # wide margin for extrapolation + seed drift: 10x better, full span.
        assert err_nde < 0.1 * err_physics, (err_nde, err_physics)

        # The same NN EMBEDDED in the dimensional host column (implicit
        # conv-adj + NN forcing) must also beat the physics-only host —
        # the reference's oceananigans_nn.jl claim. Measured: embedded
        # matches the NDE (7.3e-8 vs 7.1e-8) and beats the baseline ~90x.
        from climateparameterizations_jl_tpu.eval.profile import free_convection_profile

        ev = free_convection_profile(
            model, nn_trained, coarse, np.arange(0, 40, 2), n_substeps=8,
            include_kpp=False, include_tke=False,
            include_embedded=True, embedded_substeps=10,
        )
        emb = float(np.mean(ev["losses_embedded_T"]))
        emb_base = float(np.mean(ev["losses_embedded_baseline_T"]))
        assert emb < 0.1 * emb_base, (emb, emb_base)


class TestCheckpoint:
    def test_roundtrip(self, tmp_path, wm_setup):
        model, suite, scalings, batch = wm_setup
        nns = FluxNNs(uw=None, vw=None, wT=wind_mixing_mlp(jax.random.PRNGKey(3), 32))
        state = {"nns": nns, "scalings": scalings}
        save_checkpoint(str(tmp_path / "run1"), state, meta={"stage": "test"})
        skeleton = {"nns": jax.tree.map(jnp.zeros_like, nns), "scalings": jax.tree.map(jnp.zeros_like, scalings)}
        restored, meta = load_checkpoint(str(tmp_path / "run1"), skeleton)
        assert meta["stage"] == "test"
        np.testing.assert_allclose(
            np.array(restored["nns"].wT.weights[0]), np.array(nns.wT.weights[0])
        )
        np.testing.assert_allclose(float(restored["scalings"].T.mu), float(scalings.T.mu))

    def test_orbax_roundtrip(self, tmp_path, wm_setup):
        """Orbax backend: pytree round-trip, including a mesh-sharded array."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from climateparameterizations_jl_tpu.train.checkpoint import (
            load_checkpoint_orbax,
            save_checkpoint_orbax,
        )

        model, suite, scalings, batch = wm_setup
        nns = FluxNNs(uw=None, vw=None, wT=wind_mixing_mlp(jax.random.PRNGKey(3), 32))
        mesh = Mesh(np.array(jax.devices()), ("data",))
        sharded = jax.device_put(
            jnp.arange(float(8 * 4)).reshape(8, 4),
            NamedSharding(mesh, P("data", None)),
        )
        state = {"nns": nns, "ensemble_state": sharded}
        save_checkpoint_orbax(str(tmp_path / "orun"), state, meta={"stage": "orbax"})
        restored, meta = load_checkpoint_orbax(str(tmp_path / "orun"))
        assert meta["stage"] == "orbax"
        np.testing.assert_allclose(
            np.array(restored["nns"]["wT"]["weights"][0] if isinstance(restored["nns"], dict) else restored["nns"].wT.weights[0]),
            np.array(nns.wT.weights[0]),
        )
        np.testing.assert_allclose(np.array(restored["ensemble_state"]), np.array(sharded))

    def test_resume_matches_uninterrupted(self, tmp_path, wm_setup):
        """Checkpoint after 3 iters + resume for 3 == one 6-iter run exactly.

        Parity: optimizer-state restore in ``train_NDE_args.jl:140-146`` —
        resuming must restore ADAM moments, not just the weights.
        """
        model, suite, scalings, batch = wm_setup
        config = NDETrainConfig(learning_rate=1e-2, maxiters=6, n_substeps=2, method="split")
        ks = jax.random.split(jax.random.PRNGKey(7), 3)
        nns0 = FluxNNs(*[wind_mixing_mlp(k, 32, scale=1e-4) for k in ks])

        nns_full, _ = train_wind_mixing_nde(model, nns0, batch, config)

        half = NDETrainConfig(learning_rate=1e-2, maxiters=3, n_substeps=2, method="split")
        ckpt = str(tmp_path / "resume_run")
        nns_a, _ = train_wind_mixing_nde(model, nns0, batch, half, checkpoint_dir=ckpt)
        nns_b, _ = train_wind_mixing_nde(model, nns0, batch, half, checkpoint_dir=ckpt, resume_from=ckpt)

        for w_full, w_res in zip(nns_full.wT.weights, nns_b.wT.weights):
            np.testing.assert_allclose(np.array(w_full), np.array(w_res), rtol=1e-5, atol=1e-7)

    def test_extract_compaction(self, tmp_path, wm_setup):
        """extract_checkpoint compacts history.jsonl into dense loss arrays."""
        from climateparameterizations_jl_tpu.train.checkpoint import (
            extract_checkpoint,
            history_path,
            load_extracted_losses,
        )

        model, suite, scalings, batch = wm_setup
        run = str(tmp_path / "run")
        hist = history_path(run)
        for i in range(5):
            hist.append({"iter": i, "loss": 1.0 / (i + 1)})
        nns = FluxNNs(uw=None, vw=None, wT=wind_mixing_mlp(jax.random.PRNGKey(3), 32))
        save_checkpoint(run, nns, meta={"stage": "s0"})

        out = str(tmp_path / "extracted")
        extract_checkpoint(run, out)
        losses = load_extracted_losses(out)
        assert losses["loss"].shape == (5,)
        np.testing.assert_allclose(losses["loss"], [1.0 / (i + 1) for i in range(5)])
        restored, meta = load_checkpoint(out, jax.tree.map(jnp.zeros_like, nns))
        assert meta["n_iterations"] == 5
        np.testing.assert_allclose(np.array(restored.wT.weights[0]), np.array(nns.wT.weights[0]))
