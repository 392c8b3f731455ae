"""Window-parallel (multiple-shooting) NDE training tensors + solve.

The TPU-first redesign of the reference's full-window training stage
(``wind_mixing/train_NDE_args.jl:197`` integrates ``1:9:1153`` as one
1,152-step sequential solve per iteration): every (sim, window) pair rides
the batch axis, so the per-iteration scan shortens ``n_windows``-fold.
These tests pin the semantics that make the redesign *equivalent where it
must be*: K=1 reproduces the plain batch exactly, windows anchor at truth,
and the batched per-row ``t0`` keeps the diurnal BC phase of each window.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climateparameterizations_jl_tpu.data.containers import (
    coarsen_dataset,
    fit_wind_mixing_scalings,
    multiple_shooting_tensors,
    scaled_state_array,
    stack_datasets,
    training_tensors,
)
from climateparameterizations_jl_tpu.data.synthetic import synthetic_wind_mixing_les
from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs, WindMixingModel
from climateparameterizations_jl_tpu.physics.mpp import MPPParameters
from climateparameterizations_jl_tpu.closures.mlp import wind_mixing_mlp
from climateparameterizations_jl_tpu.train.nde import NDETrainConfig, _solve, train_wind_mixing_nde

f32 = jnp.float32


def _suite(diurnal=False, n_save=24):
    specs = [(-5e-4, 3e-8), (-2e-4, 1e-8)]
    coarse = [
        coarsen_dataset(
            synthetic_wind_mixing_les(Qu=qu, Qb=qb, Nz=64, n_save=n_save, dt_save=600.0,
                                      n_substeps=2, diurnal=diurnal),
            32,
        )
        for qu, qb in specs
    ]
    scalings = fit_wind_mixing_scalings(coarse)
    suite = stack_datasets(coarse)
    tau = jnp.abs(coarse[0].t[-1] - coarse[0].t[0])
    model = WindMixingModel(
        H=coarse[0].H, tau=tau, f=coarse[0].f, g=coarse[0].g, alpha=coarse[0].alpha,
        kappa=f32(10.0), scalings=scalings, mpp=MPPParameters.default(), Nz=32,
        zero_weights=True, diurnal=diurnal,
    )
    return suite, model, scalings, tau


@pytest.fixture(scope="module")
def wm():
    return _suite()


@pytest.fixture(scope="module")
def wm_diurnal():
    return _suite(diurnal=True)


def _nns(key=0, Nz=32):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    return FluxNNs(*[wind_mixing_mlp(k, Nz, scale=1e-4) for k in ks])


class TestBatchConstruction:
    def test_k1_reproduces_plain_batch(self, wm):
        suite, model, scalings, tau = wm
        tsteps = np.arange(0, 25, 2)
        plain = training_tensors(suite, scalings, tsteps, tau=tau)
        ms = multiple_shooting_tensors(suite, scalings, tsteps, n_windows=1, tau=tau)
        np.testing.assert_array_equal(np.asarray(ms.x0), np.asarray(plain.x0))
        np.testing.assert_array_equal(np.asarray(ms.targets), np.asarray(plain.targets))
        np.testing.assert_array_equal(np.asarray(ms.t), np.asarray(plain.t))
        for field in ("uw_bot", "uw_top", "vw_bot", "vw_top", "wT_bot", "wT_top"):
            np.testing.assert_array_equal(
                np.asarray(getattr(ms.bcs, field)), np.asarray(getattr(plain.bcs, field))
            )
        np.testing.assert_allclose(np.asarray(ms.t0), np.asarray(plain.t)[0])

    def test_windows_anchor_at_truth_and_share_boundaries(self, wm):
        suite, model, scalings, tau = wm
        tsteps = np.arange(0, 25, 2)  # 12 intervals
        K = 3
        ms = multiple_shooting_tensors(suite, scalings, tsteps, n_windows=K, tau=tau)
        S, W = 2, 5  # 12/3 = 4 intervals -> 5 frames per window
        assert ms.x0.shape == (S * K, 96)
        assert ms.targets.shape == (S * K, W, 96)
        assert ms.t.shape == (W,)
        assert ms.t0.shape == (S * K,)
        x = scaled_state_array(suite, scalings)
        for s in range(S):
            for k in range(K):
                row = s * K + k
                start_frame = tsteps[k * 4]
                np.testing.assert_array_equal(
                    np.asarray(ms.x0[row]), np.asarray(x[s, start_frame])
                )
                # Shared boundary: window k's last frame == window k+1's first.
                if k + 1 < K:
                    np.testing.assert_array_equal(
                        np.asarray(ms.targets[row, -1]), np.asarray(ms.targets[s * K + k + 1, 0])
                    )

    def test_rejects_nondivisible_and_nonuniform(self, wm):
        suite, model, scalings, tau = wm
        with pytest.raises(ValueError, match="divide"):
            multiple_shooting_tensors(suite, scalings, np.arange(0, 25, 2), n_windows=5, tau=tau)
        with pytest.raises(ValueError, match="strided"):
            multiple_shooting_tensors(suite, scalings, [0, 1, 2, 4], n_windows=1, tau=tau)


class TestSolveEquivalence:
    @pytest.mark.parametrize("fixture", ["wm", "wm_diurnal"])
    def test_batched_solve_matches_per_window_loop(self, fixture, request):
        """One batched (S*K)-row solve == K separate scalar-t0 window solves.

        The diurnal variant exercises the per-row t0: each window's top-BC
        sinusoid must run at its own absolute phase."""
        suite, model, scalings, tau = request.getfixturevalue(fixture)
        tsteps = np.arange(0, 25, 2)
        K = 3
        ms = multiple_shooting_tensors(suite, scalings, tsteps, n_windows=K, tau=tau)
        nns = _nns()
        config = NDETrainConfig(n_substeps=2, method="split")
        batched = _solve(model, nns, ms, config)  # (S*K, W, 96)

        for k in range(K):
            rows = np.arange(2) * K + k  # both sims, window k
            window_tsteps = tsteps[k * 4 : k * 4 + 5]
            wb = training_tensors(suite, scalings, window_tsteps, tau=tau)
            ref = _solve(model, nns, wb, config)
            np.testing.assert_allclose(
                np.asarray(batched[rows]), np.asarray(ref), rtol=1e-4, atol=5e-6
            )

    def test_diurnal_phase_matters(self, wm_diurnal):
        """Zeroing t0 must CHANGE the diurnal solution (guards against the
        per-row t0 being silently dropped by a future solver edit)."""
        import dataclasses

        suite, model, scalings, tau = wm_diurnal
        tsteps = np.arange(0, 25, 2)
        ms = multiple_shooting_tensors(suite, scalings, tsteps, n_windows=3, tau=tau)
        nns = _nns()
        config = NDETrainConfig(n_substeps=2, method="split")
        out = _solve(model, nns, ms, config)
        out0 = _solve(model, nns, dataclasses.replace(ms, t0=jnp.zeros_like(ms.t0)), config)
        # Windows 2+ start at nonzero absolute time; wrong phase shifts wT_top.
        assert not np.allclose(np.asarray(out[1:]), np.asarray(out0[1:]), atol=1e-7)


class TestTraining:
    def test_shooting_stage_trains(self, wm):
        suite, model, scalings, tau = wm
        tsteps = np.arange(0, 25, 2)
        ms = multiple_shooting_tensors(suite, scalings, tsteps, n_windows=4, tau=tau)
        nns = _nns()
        config = NDETrainConfig(
            learning_rate=1e-3, maxiters=8, n_substeps=2, method="split",
            training_fractions={"T": 0.8, "dTdz": 0.8, "profile": 0.5},
        )
        nns2, hist = train_wind_mixing_nde(model, nns, ms, config)
        assert np.isfinite(float(hist[-1].total()))
        assert float(hist[-1].total()) < float(hist[0].total())


class TestComposedEnsembleShooting:
    def test_stacked_members_on_shooting_batch_match_solo(self, wm):
        """The r4 batch-axis composition (sims x K windows x M members in ONE
        jitted step): training M stacked members over a multiple-shooting
        batch must equal the M independent solo trainings over the SAME
        batch — the member vmap sits outside the batch-shape-agnostic
        ``_solve``, so neither axis may couple."""
        from climateparameterizations_jl_tpu.train.deep_ensemble import (
            stack_members,
            train_wind_mixing_deep_ensemble,
            unstack_members,
        )

        suite, model, scalings, tau = wm
        tsteps = np.arange(0, 25, 2)
        ms = multiple_shooting_tensors(suite, scalings, tsteps, n_windows=4, tau=tau)
        members = [_nns(3), _nns(4)]
        config = NDETrainConfig(
            learning_rate=1e-3, maxiters=3, n_substeps=2, method="split",
            training_fractions={"T": 0.8, "dTdz": 0.8, "profile": 0.5},
        )
        solo = [train_wind_mixing_nde(model, m, ms, config)[0] for m in members]
        stacked, hist = train_wind_mixing_deep_ensemble(model, stack_members(members), ms, config)
        ens = unstack_members(stacked)
        for s, e in zip(solo, ens):
            for a, b in zip(jax.tree.leaves(s), jax.tree.leaves(e)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-7)
        assert np.isfinite(float(hist[-1].total()))
