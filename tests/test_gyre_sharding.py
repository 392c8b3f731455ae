"""Sharded double gyre: y-decomposition over the 8-device CPU mesh matches
the single-device run."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climateparameterizations_jl_tpu.embed.double_gyre import (
    DoubleGyreModel,
    DoubleGyreState,
    run_double_gyre,
)
from climateparameterizations_jl_tpu.parallel.gyre_sharding import (
    make_gyre_mesh,
    run_double_gyre_sharded,
    shard_gyre_state,
    state_shardings,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def setup():
    model = DoubleGyreModel.default(Nx=16, Ny=24, Nz=8)  # Ny divisible by 8
    state0 = DoubleGyreState.rest(model)
    return model, state0


class TestGyreSharding:
    def test_sharded_state_layout(self, setup):
        model, state0 = setup
        mesh = make_gyre_mesh(8)
        sharded = shard_gyre_state(state0, mesh)
        # T (Ny, Nx, Nz) split over y: each device holds Ny/8 rows.
        assert sharded.T.sharding.is_equivalent_to(state_shardings(mesh).T, ndim=3)
        shard_shapes = {s.data.shape for s in sharded.T.addressable_shards}
        assert shard_shapes == {(3, 16, 8)}

    def test_matches_unsharded_run(self, setup):
        model, state0 = setup
        mesh = make_gyre_mesh(8)
        traj_1 = run_double_gyre(model, state0, dt=1800.0, n_save=2, save_every=6)
        traj_8 = run_double_gyre_sharded(model, state0, dt=1800.0, n_save=2, save_every=6, mesh=mesh)
        for field in ("u", "v", "T", "eta"):
            a = np.asarray(getattr(traj_1, field))
            b = np.asarray(getattr(traj_8, field))
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6, err_msg=field)

    def test_nn_knobs_match_unsharded(self, setup):
        # Regression: the sharded runner used to DROP T_remap /
        # nn_stability_gate / tridiag_backend, silently running the NN
        # closure ungated on raw basin temperatures — the exact long runs
        # the sharded path exists for.
        from climateparameterizations_jl_tpu.closures.mlp import mlp_init
        from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling

        model, state0 = setup
        mesh = make_gyre_mesh(8)
        nn = mlp_init(jax.random.PRNGKey(3), [model.Nz, 8, model.Nz - 1])
        Ts = ZeroMeanUnitVarianceScaling(mu=jnp.float32(19.7), sigma=jnp.float32(0.02))
        ws = ZeroMeanUnitVarianceScaling(mu=jnp.float32(0.0), sigma=jnp.float32(1e-5))
        kw = dict(dt=1800.0, n_save=2, save_every=4, nn=nn, T_scaling=Ts, wT_scaling=ws,
                  T_remap=(18.6, 85.0), nn_stability_gate=0.02, tridiag_backend="pcr")
        traj_1 = run_double_gyre(model, state0, **kw)
        traj_8 = run_double_gyre_sharded(model, state0, mesh=mesh, **kw)
        gate_off = run_double_gyre_sharded(model, state0, mesh=mesh,
                                           **{**kw, "nn_stability_gate": None})
        for field in ("u", "v", "T", "eta"):
            a = np.asarray(getattr(traj_1, field))
            b = np.asarray(getattr(traj_8, field))
            assert np.all(np.isfinite(a)) and np.all(np.isfinite(b))
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6, err_msg=field)
        # the gate must actually change the closure (knob not silently dropped)
        assert not np.allclose(np.asarray(traj_8.T[-1]), np.asarray(gate_off.T[-1]))

    def test_uneven_v_axis_replicated(self, setup):
        # v has Ny+1 = 25 rows (not divisible by 8): stored replicated.
        model, state0 = setup
        mesh = make_gyre_mesh(8)
        sharded = shard_gyre_state(state0, mesh)
        assert sharded.v.shape == (25, 16, 8)
        assert sharded.v.sharding.is_fully_replicated
        assert np.all(np.isfinite(np.asarray(sharded.v)))


def test_sharded_subframe_dispatch_matches():
    """The step-capped sub-frame dispatch path of the sharded runner must
    reproduce the one-dispatch-per-frame trajectory (to ulp: different scan
    lengths compile differently)."""
    from climateparameterizations_jl_tpu.embed.double_gyre import DoubleGyreModel, DoubleGyreState
    from climateparameterizations_jl_tpu.parallel.gyre_sharding import (
        make_gyre_mesh,
        run_double_gyre_sharded,
    )

    model = DoubleGyreModel.default(Nx=16, Ny=24, Nz=8)
    state0 = DoubleGyreState.rest(model)
    mesh = make_gyre_mesh(8)
    ref = run_double_gyre_sharded(model, state0, dt=1800.0, n_save=2, save_every=6, mesh=mesh)
    sub = run_double_gyre_sharded(
        model, state0, dt=1800.0, n_save=2, save_every=6, mesh=mesh, max_steps_per_dispatch=4,
    )
    for field in ("u", "v", "T", "eta"):
        np.testing.assert_allclose(
            np.asarray(getattr(sub, field)), np.asarray(getattr(ref, field)),
            rtol=1e-5, atol=1e-6, err_msg=field,
        )
