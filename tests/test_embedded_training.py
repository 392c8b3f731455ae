"""A-posteriori (embedded) training tests: gradients through the host column.

The capability the reference lacks (Zygote cannot differentiate through
Oceananigans): optimizing the flux NNs against the SAME host column model
``evaluate --embedded`` scores. Pins (1) the trainer's solve is bit-identical
to the eval harness's embedded run, (2) gradients through the host (implicit
tridiagonal solve included) are finite and nonzero in every base-closure
mode, (3) training makes progress, (4) mixed diurnal/constant suites keep
constant members on their frozen flux.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climateparameterizations_jl_tpu.closures.mlp import wind_mixing_mlp
from climateparameterizations_jl_tpu.data.containers import (
    coarsen_dataset,
    enforce_surface_fluxes,
    fit_wind_mixing_scalings,
    stack_datasets,
)
from climateparameterizations_jl_tpu.data.synthetic import synthetic_wind_mixing_les
from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs, WindMixingModel
from climateparameterizations_jl_tpu.physics.mpp import MPPParameters
from climateparameterizations_jl_tpu.train.embedded import (
    _solve_embedded,
    embedded_training_tensors,
    host_from_suite,
    make_embedded_loss_fn,
    train_embedded_wind_mixing,
)
from climateparameterizations_jl_tpu.train.loss import LossChannels
from climateparameterizations_jl_tpu.train.nde import NDETrainConfig

f32 = jnp.float32


def _model(ds, **overrides):
    scalings = fit_wind_mixing_scalings(ds)
    t_row = ds.t.reshape(-1, ds.t.shape[-1])[0] if ds.t.ndim > 1 else ds.t
    first = lambda x: jnp.asarray(x).reshape(-1)[0]  # noqa: E731
    kw = dict(
        H=first(ds.H), tau=jnp.abs(t_row[-1] - t_row[0]), f=first(ds.f), g=first(ds.g),
        alpha=first(ds.alpha), kappa=f32(10.0), scalings=scalings,
        mpp=MPPParameters.default(), Nz=32,
    )
    kw.update(overrides)
    return WindMixingModel(**kw)


def _nns(key, scale=1e-3):
    k1, k2, k3 = jax.random.split(key, 3)
    return FluxNNs(
        uw=wind_mixing_mlp(k1, 32, scale=scale),
        vw=wind_mixing_mlp(k2, 32, scale=scale),
        wT=wind_mixing_mlp(k3, 32, scale=scale),
    )


@pytest.fixture(scope="module")
def suite():
    les1 = synthetic_wind_mixing_les(Qu=-5e-4, Qb=3e-8, Nz=64, n_save=12, dt_save=600.0, n_substeps=2)
    les2 = synthetic_wind_mixing_les(Qu=-2e-4, Qb=1e-8, Nz=64, n_save=12, dt_save=600.0, n_substeps=2)
    return stack_datasets([coarsen_dataset(d, 32) for d in (les1, les2)])


class TestEmbeddedSolveMatchesEval:
    def test_trainer_trajectory_equals_eval_embedded(self):
        """The a-posteriori trainer optimizes EXACTLY the trajectory that
        evaluate --embedded scores (same host_for_wind_mixing, same stepper):
        train-time and deploy-time dynamics cannot diverge."""
        from climateparameterizations_jl_tpu.eval.profile import nde_profile

        ds = enforce_surface_fluxes(coarsen_dataset(
            synthetic_wind_mixing_les(Nz=64, n_save=12, dt_save=600.0, n_substeps=2), 32
        ))
        model = _model(ds)
        nns = _nns(jax.random.PRNGKey(0))
        tsteps = np.arange(0, 12)
        ev = nde_profile(model, nns, ds, tsteps, n_substeps=4,
                         include_embedded=True, embedded_substeps=6, include_kpp=False)
        batch = embedded_training_tensors(ds, model.scalings, tsteps)
        host = host_from_suite(model, ds)
        config = NDETrainConfig(n_substeps=6)
        pred = _solve_embedded(host, nns, batch, config)  # (Nt, 3Nz) scaled
        T_pred = model.scalings.T.unscale(pred[..., 2 * 32 :])
        np.testing.assert_allclose(np.asarray(T_pred), ev["embedded_T"], rtol=2e-5, atol=2e-6)

    def test_targets_match_nde_training_tensors(self, suite):
        """Embedded targets are the same scaled truth the NDE trainer fits."""
        from climateparameterizations_jl_tpu.data.containers import training_tensors

        scalings = fit_wind_mixing_scalings(suite)
        tsteps = np.arange(0, 8)
        emb = embedded_training_tensors(suite, scalings, tsteps)
        nde = training_tensors(suite, scalings, tsteps)
        np.testing.assert_allclose(np.asarray(emb.targets), np.asarray(nde.targets), rtol=1e-6)
        assert emb.state0.T.shape == (2, 32)
        assert emb.t.shape == (8,)


class TestEmbeddedGradients:
    @pytest.mark.parametrize("overrides", [
        dict(),  # mPP host
        dict(use_mpp=False, use_conv_adj=True),  # conv-adj host
        dict(use_mpp=False, use_conv_adj=False),  # zero-physics host
        dict(diurnal=True),  # time-varying surface flux
        dict(zero_weights=False),  # affine NN dimensionalization
    ])
    def test_grad_finite_nonzero(self, suite, overrides):
        diurnal = bool(overrides.get("diurnal", False))
        ds = suite
        if diurnal:
            import dataclasses as dc

            ds = dc.replace(suite, diurnal_amplitude=jnp.asarray([3e-6, 0.0], f32))
        model = _model(ds, **overrides)
        host = host_from_suite(model, ds)
        batch = embedded_training_tensors(ds, model.scalings, np.arange(0, 6))
        config = NDETrainConfig(n_substeps=2)
        loss_fn = make_embedded_loss_fn(host, batch, LossChannels.ones(5e-3), config)
        (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(_nns(jax.random.PRNGKey(1)))
        assert np.isfinite(float(total))
        leaves = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)

    def test_remat_matches_no_remat(self, suite):
        """The rematerialized backward pass computes the same gradients.

        Compared in float64: the f32 gradient through 8 implicit steps
        carries ~1e-6 relative cancellation noise and remat's different
        fusion lands elsewhere in that noise ball (measured: f64 agreement
        4e-15, f32 disagreement up to 78% on a near-cancelled leaf)."""
        from climateparameterizations_jl_tpu.embed.column_model import run_embedded_column

        f64 = jnp.float64
        to64 = lambda tree: jax.tree.map(  # noqa: E731
            lambda x: jnp.asarray(x, f64)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x,
            tree,
        )
        model = _model(suite)
        host = to64(host_from_suite(model, suite))
        batch = embedded_training_tensors(suite, model.scalings, np.arange(0, 5))
        state0 = to64(batch.state0)
        nns = to64(_nns(jax.random.PRNGKey(2)))
        dt = jnp.asarray((batch.t[-1] - batch.t[0]) / (4 * 2), f64)

        def loss(nns, remat):
            traj = run_embedded_column(host, nns, state0, dt, 4, 2, t0=jnp.asarray(batch.t[0], f64), remat=remat)
            return jnp.mean(traj.T**2) + jnp.mean(traj.u**2)

        g0 = jax.grad(lambda n: loss(n, False))(nns)
        g1 = jax.grad(lambda n: loss(n, True))(nns)
        for a, b in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-9, atol=1e-12)


class TestEmbeddedTraining:
    def test_loss_decreases(self, suite):
        model = _model(suite)
        nns = _nns(jax.random.PRNGKey(0), scale=1e-5)
        config = NDETrainConfig(learning_rate=3e-3, maxiters=12, n_substeps=2)
        nns2, history = train_embedded_wind_mixing(model, nns, suite, config, tsteps=np.arange(0, 8))
        first = history[0].total()
        best = min(h.total() for h in history)
        assert np.isfinite(first) and np.isfinite(best)
        assert best < first

    def test_auto_balanced_fractions(self, suite):
        model = _model(suite)
        nns = _nns(jax.random.PRNGKey(3), scale=1e-4)
        config = NDETrainConfig(
            learning_rate=1e-3, maxiters=3, n_substeps=2,
            training_fractions={"T": 0.8, "dTdz": 0.8, "profile": 0.5},
        )
        _, history = train_embedded_wind_mixing(model, nns, suite, config, tsteps=np.arange(0, 6))
        h0 = history[0]
        # The first iteration's scaled channels hit the requested fractions.
        profile = float(h0.u + h0.v + h0.T)
        gradient = float(h0.dudz + h0.dvdz + h0.dTdz)
        assert float(h0.T) / profile == pytest.approx(0.8, rel=0.05)
        assert profile / (profile + gradient) == pytest.approx(0.5, rel=0.05)

    def test_curriculum_and_checkpoint(self, suite, tmp_path):
        from climateparameterizations_jl_tpu.train.nde import CurriculumStage

        model = _model(suite)
        nns = _nns(jax.random.PRNGKey(4), scale=1e-5)
        config = NDETrainConfig(learning_rate=1e-3, maxiters=2, n_substeps=2)
        stages = [
            CurriculumStage(tsteps=np.arange(0, 4), maxiters=2),
            CurriculumStage(tsteps=np.arange(0, 8), maxiters=2),
        ]
        ckpt = str(tmp_path / "state")
        nns2, history = train_embedded_wind_mixing(
            model, nns, suite, config, stages=stages, checkpoint_dir=ckpt
        )
        assert len(history) == 4
        assert os.path.isdir(ckpt)
        # Resume restores params + optimizer state without error.
        nns3, h3 = train_embedded_wind_mixing(
            model, nns, suite, config, tsteps=np.arange(0, 4), resume_from=ckpt
        )
        assert len(h3) == 2 and np.isfinite(h3[-1].total())


class TestMixedSuiteHost:
    def test_constant_member_keeps_frozen_flux(self, suite):
        """Per-column diurnal amplitudes: the amp=0 member of a mixed suite
        sees its constant Ftheta, the diurnal member the sinusoid."""
        import dataclasses as dc

        from climateparameterizations_jl_tpu.core.constants import SECONDS_PER_DAY, diurnal_cycle
        from climateparameterizations_jl_tpu.embed.column_model import surface_heat_flux

        ds = dc.replace(suite, diurnal_amplitude=jnp.asarray([4e-6, 0.0], f32))
        model = _model(ds, diurnal=True)
        host = host_from_suite(model, ds)
        t = jnp.asarray(SECONDS_PER_DAY / 4.0, f32)  # peak of the cycle
        flux = surface_heat_flux(host, t)
        np.testing.assert_allclose(float(flux[0]), 4e-6 * float(diurnal_cycle(t)), rtol=1e-6)
        np.testing.assert_allclose(float(flux[1]), float(ds.theta_top[1]), rtol=1e-6)

    def test_amplitude_none_falls_back_to_ftheta(self, suite):
        """Single-diurnal-sim behavior unchanged: Ftheta is the amplitude."""
        from climateparameterizations_jl_tpu.core.constants import SECONDS_PER_DAY, diurnal_cycle
        from climateparameterizations_jl_tpu.embed.column_model import surface_heat_flux

        model = _model(suite, diurnal=True)
        host = host_from_suite(model, suite)
        assert host.diurnal_amplitude is None or np.all(np.asarray(host.diurnal_amplitude) == 0)
        import dataclasses as dc

        host = dc.replace(host, diurnal_amplitude=None)
        t = jnp.asarray(SECONDS_PER_DAY / 4.0, f32)
        np.testing.assert_allclose(
            np.asarray(surface_heat_flux(host, t)),
            np.asarray(host.Ftheta * diurnal_cycle(t)), rtol=1e-6,
        )


class TestEmbeddedFreeConvection:
    """FC a-posteriori counterpart: the host is the SAME conv-adj column
    evaluate-fc --embedded scores."""

    @pytest.fixture(scope="class")
    def fc_suite(self):
        from climateparameterizations_jl_tpu.data.free_convection import (
            load_free_convection_simulation,
        )

        return stack_datasets([
            load_free_convection_simulation(1, Nz=16, n_save=10),
            load_free_convection_simulation(5, Nz=16, n_save=10),
        ])

    def _fc_model(self, ds):
        from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling
        from climateparameterizations_jl_tpu.data.free_convection import build_free_convection_model

        T_s = ZeroMeanUnitVarianceScaling.fit(ds.T.reshape(-1))
        wT_s = ZeroMeanUnitVarianceScaling.fit(ds.wT.reshape(-1))
        return build_free_convection_model(ds, T_s, wT_s)

    def test_trainer_trajectory_equals_eval_embedded(self):
        from climateparameterizations_jl_tpu.closures.mlp import free_convection_mlp
        from climateparameterizations_jl_tpu.data.free_convection import (
            load_free_convection_simulation,
        )
        from climateparameterizations_jl_tpu.eval.profile import free_convection_profile
        from climateparameterizations_jl_tpu.train.embedded import (
            _solve_embedded_fc,
            embedded_fc_training_tensors,
            host_from_fc_suite,
        )

        ds = load_free_convection_simulation(2, Nz=16, n_save=10)
        model = self._fc_model(ds)
        nn = free_convection_mlp(jax.random.PRNGKey(0), 16)
        tsteps = np.arange(0, 10)
        ev = free_convection_profile(
            model, nn, ds, tsteps, n_substeps=2, include_kpp=False, include_tke=False,
            include_embedded=True, embedded_substeps=4,
        )
        batch = embedded_fc_training_tensors(ds, model.T_scaling, tsteps)
        host = host_from_fc_suite(model, ds)
        pred = _solve_embedded_fc(host, nn, batch, NDETrainConfig(n_substeps=4))
        T_pred = model.T_scaling.unscale(pred)
        np.testing.assert_allclose(np.asarray(T_pred), ev["embedded_T"], rtol=2e-5, atol=2e-6)

    def test_grad_finite_nonzero_and_loss_decreases(self, fc_suite):
        from climateparameterizations_jl_tpu.closures.mlp import free_convection_mlp
        from climateparameterizations_jl_tpu.train.embedded import (
            make_embedded_fc_loss_fn,
            embedded_fc_training_tensors,
            host_from_fc_suite,
            train_embedded_free_convection,
        )

        model = self._fc_model(fc_suite)
        host = host_from_fc_suite(model, fc_suite)
        assert host.Ftheta.shape == (2,)  # per-sim surface fluxes
        nn = free_convection_mlp(jax.random.PRNGKey(1), 16)
        batch = embedded_fc_training_tensors(fc_suite, model.T_scaling, np.arange(0, 6))
        assert batch.targets.shape == (2, 6, 16)
        config = NDETrainConfig(n_substeps=2)
        loss_fn = make_embedded_fc_loss_fn(host, batch, config)
        (total, channels), grads = jax.value_and_grad(loss_fn, has_aux=True)(nn)
        assert np.isfinite(float(total)) and float(channels.T) == float(total)
        leaves = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(np.asarray(g))) for g in leaves)
        assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)

        config = NDETrainConfig(learning_rate=3e-3, maxiters=10, n_substeps=2)
        _, history = train_embedded_free_convection(model, nn, fc_suite, config, tsteps=np.arange(0, 6))
        assert min(h.total() for h in history) < history[0].total()

    def test_cli_finetune_round_trip(self, tmp_path):
        """train-fc-nde -> train-embedded-fc --init-from -> evaluate-fc."""
        import json

        from climateparameterizations_jl_tpu.cli.main import main

        nde_out = str(tmp_path / "fc_nde")
        rc = main([
            "train-fc-nde", "--sim-ids", "1,5", "--nz", "16", "--n-save", "10",
            "--dt-save", "600", "--maxiters", "2", "--n-train-steps", "8",
            "--n-substeps", "4", "--output", nde_out,
        ])
        assert rc == 0
        emb_out = str(tmp_path / "fc_emb")
        rc = main([
            "train-embedded-fc", "--init-from", nde_out, "--nz", "16",
            "--n-save", "10", "--dt-save", "600", "--maxiters", "2",
            "--n-train-steps", "8", "--substeps", "2", "--output", emb_out,
        ])
        assert rc == 0
        with open(os.path.join(emb_out, "meta.json")) as fh:
            meta = json.load(fh)
        assert meta["command"] == "train-embedded-fc"
        assert meta["sim_ids"] == [1, 5]  # suite resolved from the checkpoint
        ev_out = str(tmp_path / "fc_ev")
        rc = main([
            "evaluate-fc", "--checkpoint", emb_out, "--sim-ids", "1", "--nz", "16",
            "--n-save", "10", "--dt-save", "600", "--n-eval-steps", "10",
            "--eval-stride", "2", "--n-substeps", "4", "--embedded", "--output", ev_out,
        ])
        assert rc == 0


class TestTrainEmbeddedCLI:
    def test_fresh_init_smoke(self, tmp_path):
        from climateparameterizations_jl_tpu.cli.main import main

        out = str(tmp_path / "emb")
        rc = main([
            "train-embedded", "--sims", "strong_wind,strong_wind_weak_cooling",
            "--n-save", "8", "--n-train-steps", "6", "--substeps", "2",
            "--maxiters", "2", "--output", out,
        ])
        assert rc == 0
        import json

        with open(os.path.join(out, "meta.json")) as fh:
            meta = json.load(fh)
        assert meta["command"] == "train-embedded"
        assert meta["sims"] == "strong_wind,strong_wind_weak_cooling"
        assert meta["train_sims"] == "strong_wind,strong_wind_weak_cooling"

    def test_finetune_from_checkpoint(self, tmp_path):
        """train-nde -> train-embedded --init-from round-trip: sims and model
        flags resolve from the checkpoint; evaluate can read the result."""
        from climateparameterizations_jl_tpu.cli.main import main

        nde_out = str(tmp_path / "nde")
        rc = main([
            "train-nde", "--sims", "strong_wind", "--n-save", "8",
            "--n-train-steps", "6", "--maxiters", "2", "--n-substeps", "2",
            "--output", nde_out,
        ])
        assert rc == 0
        emb_out = str(tmp_path / "emb")
        rc = main([
            "train-embedded", "--init-from", nde_out, "--n-save", "8",
            "--n-train-steps", "6", "--substeps", "2", "--maxiters", "2",
            "--output", emb_out,
        ])
        assert rc == 0
        import json

        with open(os.path.join(emb_out, "meta.json")) as fh:
            meta = json.load(fh)
        assert meta["sims"] == "strong_wind"  # scaling context from the checkpoint
        ev_out = str(tmp_path / "ev")
        rc = main([
            "evaluate", "--checkpoint", emb_out, "--test-sims", "strong_wind",
            "--n-save", "8", "--n-train-steps", "6", "--eval-stride", "1",
            "--n-substeps", "2", "--output", ev_out,
        ])
        assert rc == 0
