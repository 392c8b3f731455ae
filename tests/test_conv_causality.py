"""Tests: conv closure variant + spatial-causality constraints."""

import jax
import jax.numpy as jnp
import numpy as np

from climateparameterizations_jl_tpu.closures.mlp import (
    apply_closure,
    apply_spatial_causality_mask,
    free_convection_conv_mlp,
    free_convection_mlp,
    spatial_causality_mask,
    spatial_causality_penalty,
)
from climateparameterizations_jl_tpu.train.nn import train_flux_nn


class TestConvMLP:
    def test_shapes_and_batching(self):
        nn = free_convection_conv_mlp(jax.random.PRNGKey(0), Nz=32, conv_width=3)
        x = jax.random.normal(jax.random.PRNGKey(1), (5, 32), jnp.float32)
        out = apply_closure(nn, x)
        assert out.shape == (5, 31)
        single = apply_closure(nn, x[0])
        np.testing.assert_allclose(np.asarray(single), np.asarray(out[0]), rtol=1e-5, atol=1e-6)

    def test_conv_is_valid_convolution(self):
        # Linear check: with relu bypassed (positive inputs + zero bias), the
        # conv front-end equals the textbook valid correlation.
        nn = free_convection_conv_mlp(jax.random.PRNGKey(0), Nz=8, conv_width=2)
        kernel = jnp.abs(nn.kernel) + 0.1  # keep outputs positive
        nn = jax.tree.map(lambda x: x, nn)
        import dataclasses

        nn = dataclasses.replace(nn, kernel=kernel)
        x = jnp.arange(1.0, 9.0)[None, :]
        from climateparameterizations_jl_tpu.closures.mlp import mlp_apply

        conv_out = kernel[0] * x[:, :7] + kernel[1] * x[:, 1:]
        expected = mlp_apply(nn.mlp, jax.nn.relu(conv_out))
        np.testing.assert_allclose(np.asarray(apply_closure(nn, x)), np.asarray(expected), rtol=1e-6)

    def test_usable_in_nde(self):
        from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling
        from climateparameterizations_jl_tpu.models.free_convection import (
            FreeConvectionModel,
            solve_free_convection_nde,
        )

        f32 = jnp.float32
        model = FreeConvectionModel(
            H=f32(256.0), tau=f32(86400.0),
            T_scaling=ZeroMeanUnitVarianceScaling(f32(19.0), f32(0.5)),
            wT_scaling=ZeroMeanUnitVarianceScaling(f32(0.0), f32(1e-5)),
            bottom_flux=f32(0.0), top_flux=f32(0.1), Nz=32,
        )
        nn = free_convection_conv_mlp(jax.random.PRNGKey(2), Nz=32, conv_width=2)
        traj = solve_free_convection_nde(model, nn, jnp.zeros(32), 0.0, 0.02, 4, n_substeps=8)
        assert traj.shape == (5, 32)
        assert np.all(np.isfinite(np.asarray(traj)))


class TestSpatialCausality:
    def test_mask_matches_reference_definition(self):
        mask = np.asarray(spatial_causality_mask((4, 3)))
        # mask[i, j] = i < j (train_free_convection_nde.jl:193)
        expected = np.array([[False, True, True], [False, False, True], [False, False, False], [False, False, False]])
        np.testing.assert_array_equal(mask, expected)

    def test_penalty_counts_only_masked_entries(self):
        nn = free_convection_mlp(jax.random.PRNGKey(0), Nz=8)
        p = float(spatial_causality_penalty(nn))
        assert p > 0
        masked = apply_spatial_causality_mask(nn)
        assert float(spatial_causality_penalty(masked)) == 0.0
        # Causal (lower-triangle) entries untouched.
        W0, W0m = np.asarray(nn.weights[0]), np.asarray(masked.weights[0])
        tril = np.tril_indices_from(W0)
        np.testing.assert_array_equal(W0[tril], W0m[tril])

    def test_hard_causality_training_keeps_mask(self):
        key = jax.random.PRNGKey(3)
        nn = free_convection_mlp(key, Nz=8)
        x = jax.random.normal(key, (64, 8), jnp.float32)
        y = jax.random.normal(key, (64, 9), jnp.float32) * 0.1
        nn_trained, history = train_flux_nn(nn, x, y, epochs=5, causality="hard")
        assert float(spatial_causality_penalty(nn_trained)) == 0.0
        assert np.isfinite(history[-1])

    def test_soft_causality_shrinks_acausal_weights(self):
        key = jax.random.PRNGKey(4)
        nn = free_convection_mlp(key, Nz=8)
        x = jax.random.normal(key, (64, 8), jnp.float32)
        y = jax.random.normal(key, (64, 9), jnp.float32) * 0.1
        p0 = float(spatial_causality_penalty(nn))
        nn_soft, _ = train_flux_nn(nn, x, y, learning_rate=1e-2, epochs=200, causality="soft", causality_weight=10.0)
        assert float(spatial_causality_penalty(nn_soft)) < 0.2 * p0


def test_hard_mask_enforces_causality_through_all_layers():
    """Output face i must not depend on input level j > i after hard masking."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from climateparameterizations_jl_tpu.closures.mlp import (
        apply_spatial_causality_mask,
        mlp_apply,
        mlp_init,
    )

    Nz = 8
    nn = apply_spatial_causality_mask(mlp_init(jax.random.PRNGKey(0), (Nz, Nz, Nz - 1), "relu"))
    # Jacobian of output wrt input: entries above the diagonal must vanish
    # (output i only sees inputs j <= i with every layer lower-triangular).
    x = jnp.asarray(np.random.default_rng(0).normal(size=(Nz,)), jnp.float32)
    J = np.asarray(jax.jacobian(lambda x: mlp_apply(nn, x))(x))  # (Nz-1, Nz)
    for i in range(Nz - 1):
        assert np.allclose(J[i, i + 1 :], 0.0), f"face {i} leaks from deeper levels"


def test_hard_causality_survives_nde_training_cli(tmp_path):
    """Regression: --spatial-causality hard used to be a silent no-op with
    --pretrain-epochs 0 (and the mask was destroyed by the first NDE
    optimizer update otherwise). The mask must hold in the SAVED checkpoint
    after NDE training."""
    import numpy as np

    from climateparameterizations_jl_tpu.cli.main import main
    from climateparameterizations_jl_tpu.closures.mlp import spatial_causality_mask

    out = str(tmp_path / "fc_hard")
    rc = main([
        "train-fc-nde", "--sim-ids", "1", "--nz", "16", "--n-save", "8", "--dt-save", "600",
        "--pretrain-epochs", "0", "--spatial-causality", "hard",
        "--maxiters", "3", "--n-train-steps", "8", "--output", out,
    ])
    assert rc == 0
    import os

    state = np.load(os.path.join(out, "state.npz"))
    w_keys = [k for k in state.files if "weights" in k]
    assert w_keys, state.files
    for k in w_keys:
        W = state[k]
        if W.ndim == 2:
            mask = np.asarray(spatial_causality_mask(W.shape))
            assert np.allclose(W[mask], 0.0), f"{k} has nonzero acausal entries after NDE training"
