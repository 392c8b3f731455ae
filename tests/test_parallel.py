"""Parallel-layer tests: DP train step and sharded ensembles vs single-device."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from helpers import make_wind_batch, make_wind_model_nns

from climateparameterizations_jl_tpu.models.wind_mixing import (
    BoundaryConditions,
    solve_wind_mixing_split,
)
from climateparameterizations_jl_tpu.parallel.sharding import (
    make_mesh,
    make_sharded_ensemble_solver,
    make_sharded_nde_train_step,
    replicate,
    shard_training_batch,
)
from climateparameterizations_jl_tpu.train.loss import LossChannels
from climateparameterizations_jl_tpu.train.nde import NDETrainConfig, make_wind_mixing_loss_fn

f32 = jnp.float32


@pytest.fixture(scope="module")
def setup():
    # Shared with test_collective_audit.py: these equivalence tests pin the
    # numerics of the SAME configuration whose compiled HLO that suite audits.
    model, nns = make_wind_model_nns()
    return model, nns, make_wind_batch(S=8)


class TestDataParallelTrainStep:
    def test_matches_single_device_step(self, setup):
        """8-way sharded train step == unsharded step (XLA psum grads)."""
        model, nns, batch = setup
        config = NDETrainConfig(n_substeps=2, method="split")
        optimizer = optax.adam(1e-3)
        scalings = LossChannels.ones(config.gradient_scaling)

        # Unsharded reference step.
        loss_fn = make_wind_mixing_loss_fn(model, batch, scalings, config)

        def ref_step(nns, opt_state):
            (total, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(nns)
            updates, opt_state = optimizer.update(grads, opt_state, nns)
            return optax.apply_updates(nns, updates), total

        opt_state = optimizer.init(nns)
        nns_ref, total_ref = ref_step(nns, opt_state)

        mesh = make_mesh(8)
        with mesh:
            sharded = shard_training_batch(batch, mesh)
            nns_r = replicate(nns, mesh)
            step = make_sharded_nde_train_step(model, sharded, config, optimizer)
            nns_sh, _, total_sh, _ = step(nns_r, optimizer.init(nns_r))
            jax.block_until_ready(nns_sh)

        np.testing.assert_allclose(float(total_sh), float(total_ref), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(nns_sh), jax.tree.leaves(nns_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7)

    def test_batch_actually_sharded(self, setup):
        model, nns, batch = setup
        mesh = make_mesh(8)
        sharded = shard_training_batch(batch, mesh)
        assert len(sharded.x0.sharding.device_set) == 8
        # Replicated scalars stay replicated.
        assert sharded.tau.sharding.is_fully_replicated


class TestShardedEnsemble:
    def test_matches_unsharded_solve(self, setup):
        model, nns, batch = setup
        config = NDETrainConfig(n_substeps=2, method="split")
        E = 16
        rng = np.random.default_rng(1)
        x0 = jnp.asarray(rng.normal(size=(E, 96)) * 0.1, f32)
        zeros = jnp.zeros((E,), f32)
        bcs = BoundaryConditions(
            uw_bot=zeros, uw_top=zeros - 0.5, vw_bot=zeros, vw_top=zeros,
            wT_bot=zeros, wT_top=zeros + 0.3, diurnal_amplitude=zeros,
        )
        ref = solve_wind_mixing_split(model, nns, bcs, x0, 0.0, 1e-3, 3, 2)

        mesh = make_mesh(8)
        solver = make_sharded_ensemble_solver(model, config, mesh)
        with mesh:
            out = solver(nns, bcs, x0, jnp.float32(0.0), jnp.float32(1e-3), 3)
            jax.block_until_ready(out)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-7)
        assert len(out.sharding.device_set) == 8

    def test_fast_assembly_matches_unsharded(self, setup):
        """The matmul-assembled split path composes with the sharded solver
        (GSPMD must partition the divergence matmul + BC row correctly)."""
        model, nns, batch = setup
        config = NDETrainConfig(n_substeps=2, method="split", fast_assembly=True)
        E = 16
        rng = np.random.default_rng(2)
        x0 = jnp.asarray(rng.normal(size=(E, 96)) * 0.1, f32)
        zeros = jnp.zeros((E,), f32)
        bcs = BoundaryConditions(
            uw_bot=zeros, uw_top=zeros - 0.5, vw_bot=zeros, vw_top=zeros,
            wT_bot=zeros, wT_top=zeros + 0.3, diurnal_amplitude=zeros,
        )
        ref = solve_wind_mixing_split(model, nns, bcs, x0, 0.0, 1e-3, 3, 2)

        mesh = make_mesh(8)
        solver = make_sharded_ensemble_solver(model, config, mesh)
        with mesh:
            out = solver(nns, bcs, x0, jnp.float32(0.0), jnp.float32(1e-3), 3)
            jax.block_until_ready(out)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-7)
        assert len(out.sharding.device_set) == 8

    def test_sharded_solvers_forward_every_config_knob(self, setup, monkeypatch):
        """Both sharded factories must route through train.nde.solve_with_config.

        The fast paths are numerically identical to the defaults, so the
        equivalence tests above can NOT catch a silently-dropped solver knob
        (the bug class: make_sharded_suite_ensemble_solver ignored
        tridiag_backend/fast_assembly/... while its rows were labeled by the
        config). Pin the dispatch structurally instead.
        """
        from climateparameterizations_jl_tpu.parallel import sharding as sh

        model, nns, batch = setup
        config = NDETrainConfig(n_substeps=2, method="split", fast_assembly=True,
                                tridiag_backend="pcr", split_unroll=2, implicit_solve_grad=False)
        seen = []
        real = sh.solve_with_config

        def spy(model_, nns_, bcs_, x0_, t0_, dt_save_, n_save_, config_):
            seen.append(config_)
            return real(model_, nns_, bcs_, x0_, t0_, dt_save_, n_save_, config_)

        monkeypatch.setattr(sh, "solve_with_config", spy)
        z = f32(0.0)
        bcs = BoundaryConditions(uw_bot=z, uw_top=z - 0.5, vw_bot=z, vw_top=z,
                                 wT_bot=z, wT_top=z + 0.3, diurnal_amplitude=z)
        x0 = jnp.zeros((8, 96), f32) + 0.01

        mesh = make_mesh(8)
        with mesh:
            sh.make_sharded_ensemble_solver(model, config, mesh)(nns, bcs, x0, f32(0.0), f32(1e-3), 2)
        from climateparameterizations_jl_tpu.parallel.sharding import make_mesh_2d, make_sharded_suite_ensemble_solver

        mesh2 = make_mesh_2d(4, 2)
        with mesh2:
            make_sharded_suite_ensemble_solver(model, config, mesh2)(
                nns, bcs, x0.reshape(4, 2, 96), f32(0.0), f32(1e-3), 2)
        assert len(seen) == 2 and all(c is config for c in seen)

    def test_2d_mesh_suite_ensemble_matches_unsharded(self, setup):
        """(sims x members) block sharded over a 2-D (4, 2) mesh == single device."""
        from climateparameterizations_jl_tpu.parallel.sharding import (
            make_mesh_2d,
            make_sharded_suite_ensemble_solver,
        )

        model, nns, batch = setup
        config = NDETrainConfig(n_substeps=2, method="split")
        S, E = 4, 6
        rng = np.random.default_rng(2)
        x0 = jnp.asarray(rng.normal(size=(S, E, 96)) * 0.1, f32)
        per_sim = jnp.asarray(rng.normal(size=(S,)) * 0.1, f32)
        zeros = jnp.zeros((S,), f32)
        bcs = BoundaryConditions(
            uw_bot=zeros, uw_top=per_sim - 0.5, vw_bot=zeros, vw_top=zeros,
            wT_bot=zeros, wT_top=zeros + 0.3, diurnal_amplitude=zeros,
        )
        ref = solve_wind_mixing_split(model, nns, bcs, x0, 0.0, 1e-3, 3, 2)

        mesh = make_mesh_2d(4, 2)
        solver = make_sharded_suite_ensemble_solver(model, config, mesh)
        with mesh:
            out = solver(nns, bcs, x0, jnp.float32(0.0), jnp.float32(1e-3), 3)
            jax.block_until_ready(out)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-7)
        assert len(out.sharding.device_set) == 8


class TestShardedEmbeddedTrainStep:
    """A-posteriori (embedded) DP training: per-sim data lives in BOTH the
    batch and the host model (surface fluxes) — both trees shard."""

    def test_wind_mixing_matches_single_device_step(self):
        from helpers import make_embedded_wind_problem

        from climateparameterizations_jl_tpu.parallel.sharding import (
            make_sharded_embedded_train_step,
            shard_embedded_problem,
        )
        from climateparameterizations_jl_tpu.train.embedded import make_embedded_loss_fn

        _, nns, host, batch = make_embedded_wind_problem(8)
        config = NDETrainConfig(n_substeps=2)
        optimizer = optax.sgd(1e-3)
        scalings = LossChannels.ones(config.gradient_scaling)

        loss_fn = make_embedded_loss_fn(host, batch, scalings, config)
        (total_ref, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(nns)
        updates, _ = optimizer.update(grads, optimizer.init(nns), nns)
        nns_ref = optax.apply_updates(nns, updates)

        mesh = make_mesh(8)
        with mesh:
            host_sh, batch_sh = shard_embedded_problem(host, batch, mesh)
            nns_r = replicate(nns, mesh)
            step = make_sharded_embedded_train_step(host_sh, batch_sh, config, optimizer)
            nns_sh, _, total_sh, _ = step(nns_r, optimizer.init(nns_r))
            jax.block_until_ready(nns_sh)

        np.testing.assert_allclose(float(total_sh), float(total_ref), rtol=1e-5)
        # SGD keeps updates linear in the gradient, so f32 psum
        # reduction-order noise stays proportional (adam's m/sqrt(v) blows it
        # up on near-zero gradient components, making one-step compares flaky).
        for a, b in zip(jax.tree.leaves(nns_sh), jax.tree.leaves(nns_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7)

    def test_free_convection_matches_single_device_step(self):
        from helpers import make_embedded_fc_problem

        from climateparameterizations_jl_tpu.parallel.sharding import (
            make_sharded_embedded_train_step,
            shard_embedded_problem,
        )
        from climateparameterizations_jl_tpu.train.embedded import make_embedded_fc_loss_fn

        nn, host, batch = make_embedded_fc_problem(8)
        config = NDETrainConfig(n_substeps=2)
        optimizer = optax.sgd(1e-3)

        loss_fn = make_embedded_fc_loss_fn(host, batch, config)
        (total_ref, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(nn)
        updates, _ = optimizer.update(grads, optimizer.init(nn), nn)
        nn_ref = optax.apply_updates(nn, updates)

        mesh = make_mesh(8)
        with mesh:
            host_sh, batch_sh = shard_embedded_problem(host, batch, mesh)
            nn_r = replicate(nn, mesh)
            step = make_sharded_embedded_train_step(host_sh, batch_sh, config, optimizer, free_convection=True)
            nn_sh, _, total_sh, _ = step(nn_r, optimizer.init(nn_r))
            jax.block_until_ready(nn_sh)

        np.testing.assert_allclose(float(total_sh), float(total_ref), rtol=1e-5)
        for a, b in zip(jax.tree.leaves(nn_sh), jax.tree.leaves(nn_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7)

    def test_both_trees_actually_sharded(self):
        from helpers import make_embedded_wind_problem

        from climateparameterizations_jl_tpu.parallel.sharding import shard_embedded_problem

        _, _, host, batch = make_embedded_wind_problem(8)
        mesh = make_mesh(8)
        host_sh, batch_sh = shard_embedded_problem(host, batch, mesh)
        assert len(batch_sh.targets.sharding.device_set) == 8
        assert len(host_sh.Ftheta.sharding.device_set) == 8
        # Physical scalars replicate.
        assert host_sh.H.sharding.is_fully_replicated
        assert batch_sh.t.sharding.is_fully_replicated
