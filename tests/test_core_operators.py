"""Operator parity tests: stencils vs the reference's dense matrices.

Mirrors the invariants of reference ``src/differentiation_operators.jl`` and
the test strategy of ``test/test_coarse_graining.jl`` / ``test_feature_scaling.jl``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climateparameterizations_jl_tpu.core import (
    ColumnGrid,
    D_center_matrix,
    D_face_matrix,
    cell_to_cell_derivative,
    coarse_grain_center,
    coarse_grain_face,
    coarse_grain_linear_interpolation,
    convective_adjust_profile,
    d_center_to_face,
    d_face_to_center,
    smoothing_filter,
    MinMaxScaling,
    ZeroMeanUnitVarianceScaling,
)
from climateparameterizations_jl_tpu.core.filters import smoothing_filter_matrix


class TestGrid:
    def test_coordinates(self):
        g = ColumnGrid(Nz=32, H=256.0)
        assert g.dz == 8.0
        assert g.zf[0] == -256.0 and g.zf[-1] == 0.0
        assert len(g.zc) == 32 and len(g.zf) == 33
        np.testing.assert_allclose(g.zc, 0.5 * (g.zf[:-1] + g.zf[1:]))


class TestDerivativeOperators:
    @pytest.mark.parametrize("N", [8, 32, 33])
    def test_face_to_center_matches_dense(self, N):
        rng = np.random.default_rng(0)
        w = rng.normal(size=N + 1)
        dz = 1.0 / N
        expected = D_center_matrix(N, dz) @ w
        np.testing.assert_allclose(d_face_to_center(jnp.asarray(w), dz), expected, rtol=1e-12)

    @pytest.mark.parametrize("N", [8, 32])
    def test_center_to_face_matches_dense(self, N):
        rng = np.random.default_rng(1)
        c = rng.normal(size=N)
        dz = 1.0 / N
        expected = D_face_matrix(N, dz) @ c
        out = d_center_to_face(jnp.asarray(c), dz)
        np.testing.assert_allclose(out, expected, rtol=1e-12)
        assert out[0] == 0.0 and out[-1] == 0.0

    def test_batched(self):
        rng = np.random.default_rng(2)
        w = rng.normal(size=(5, 7, 33))
        out = d_face_to_center(jnp.asarray(w), 0.25)
        assert out.shape == (5, 7, 32)
        np.testing.assert_allclose(out[3, 2], d_face_to_center(jnp.asarray(w[3, 2]), 0.25))

    def test_cell_to_cell(self):
        rng = np.random.default_rng(3)
        c = rng.normal(size=16)
        dz = 1.0 / 16
        face = D_face_matrix(16, dz) @ c
        expected = 0.5 * (face[:-1] + face[1:])
        np.testing.assert_allclose(cell_to_cell_derivative(jnp.asarray(c), dz), expected, rtol=1e-12)

    def test_adjointness(self):
        """<Dᶜ w, c> = -<w, Dᶠ c> for interior-supported fields (summation by parts)."""
        N, dz = 32, 0.5
        rng = np.random.default_rng(4)
        c = rng.normal(size=N)
        w = rng.normal(size=N + 1)
        w[0] = w[-1] = 0.0  # boundary faces
        lhs = np.sum(np.asarray(d_face_to_center(jnp.asarray(w), dz)) * c)
        rhs = -np.sum(w * np.asarray(d_center_to_face(jnp.asarray(c), dz)))
        np.testing.assert_allclose(lhs, rhs, rtol=1e-10)


class TestScalings:
    @pytest.mark.parametrize("shape", [(100,), (10, 20), (4, 5, 6)])
    def test_zero_mean_unit_variance_roundtrip(self, shape):
        rng = np.random.default_rng(5)
        data = jnp.asarray(rng.normal(3.0, 2.5, size=shape))
        s = ZeroMeanUnitVarianceScaling.fit(data)
        scaled = s(data)
        np.testing.assert_allclose(float(jnp.mean(scaled)), 0.0, atol=1e-10)
        np.testing.assert_allclose(float(jnp.std(scaled, ddof=1)), 1.0, rtol=1e-10)
        np.testing.assert_allclose(s.unscale(scaled), data, rtol=1e-10)

    @pytest.mark.parametrize("shape", [(100,), (10, 20)])
    def test_min_max_roundtrip(self, shape):
        rng = np.random.default_rng(6)
        data = jnp.asarray(rng.normal(size=shape))
        s = MinMaxScaling.fit(data, a=-1.0, b=2.0)
        scaled = s(data)
        np.testing.assert_allclose(float(jnp.min(scaled)), -1.0, atol=1e-12)
        np.testing.assert_allclose(float(jnp.max(scaled)), 2.0, atol=1e-12)
        np.testing.assert_allclose(s.unscale(scaled), data, rtol=1e-10)

    def test_scaling_is_pytree(self):
        s = ZeroMeanUnitVarianceScaling.fit(jnp.arange(10.0))
        leaves = jax.tree_util.tree_leaves(s)
        assert len(leaves) == 2

        @jax.jit
        def apply(sc, x):
            return sc(x)

        np.testing.assert_allclose(apply(s, jnp.asarray(4.5)), s(jnp.asarray(4.5)))


class TestCoarseGraining:
    def test_center_block_mean(self):
        phi = jnp.arange(128.0)
        out = coarse_grain_center(phi, 32)
        assert out.shape == (32,)
        np.testing.assert_allclose(out, phi.reshape(32, 4).mean(axis=1))

    def test_center_mean_preservation(self):
        rng = np.random.default_rng(7)
        phi = jnp.asarray(rng.normal(size=256))
        out = coarse_grain_center(phi, 32)
        np.testing.assert_allclose(float(out.mean()), float(phi.mean()), rtol=1e-10)

    def test_center_linear_profile_exact(self):
        z = np.linspace(0.0, 1.0, 128)
        phi = 3.0 * z + 1.0
        out = np.asarray(coarse_grain_center(jnp.asarray(phi), 32))
        zc = np.asarray(coarse_grain_center(jnp.asarray(z), 32))
        np.testing.assert_allclose(out, 3.0 * zc + 1.0, rtol=1e-12)

    def test_face_preserves_endpoints_integer_ratio(self):
        rng = np.random.default_rng(8)
        phi = rng.normal(size=257)  # (257-2)/(33-2) is not integer
        out = np.asarray(coarse_grain_face(jnp.asarray(phi), 33))
        assert out[0] == pytest.approx(phi[0])
        assert out[-1] == pytest.approx(phi[-1])

    def test_face_integer_ratio_interior_is_block_mean(self):
        phi = np.arange(64.0)  # (64-2)/(33-2) = 2 exactly
        out = np.asarray(coarse_grain_face(jnp.asarray(phi), 33))
        interior = phi[1:-1].reshape(31, 2).mean(axis=1)
        np.testing.assert_allclose(out[1:-1], interior)

    def test_face_linear_interp_linear_profile_exact(self):
        z = np.linspace(-256.0, 0.0, 129)
        phi = 0.5 * z + 2.0
        out = np.asarray(coarse_grain_linear_interpolation(jnp.asarray(phi), 33))
        zf = np.linspace(-256.0, 0.0, 33)
        np.testing.assert_allclose(out, 0.5 * zf + 2.0, rtol=1e-12)

    def test_batched(self):
        rng = np.random.default_rng(9)
        phi = jnp.asarray(rng.normal(size=(17, 128)))
        out = coarse_grain_center(phi, 32)
        assert out.shape == (17, 32)
        np.testing.assert_allclose(out[5], coarse_grain_center(phi[5], 32))


class TestSmoothingFilter:
    def test_rows_sum_to_one(self):
        for N, w in [(31, 3), (33, 3), (32, 5)]:
            W = smoothing_filter_matrix(N, w)
            np.testing.assert_allclose(W.sum(axis=1), np.ones(N), rtol=1e-6)

    def test_constant_preserved(self):
        phi = jnp.full((33,), 3.5, jnp.float32)
        np.testing.assert_allclose(smoothing_filter(phi, 3), phi, rtol=1e-6)

    def test_interior_running_mean(self):
        phi = jnp.asarray(np.arange(9.0, dtype=np.float32))
        out = np.asarray(smoothing_filter(phi, 3))
        np.testing.assert_allclose(out[4], (3.0 + 4.0 + 5.0) / 3.0, rtol=1e-6)


class TestConvectiveAdjustProfile:
    def test_removes_unstable_kink(self):
        # Temperature ordered bottom->top: should be non-decreasing upward.
        x = np.array([1.0, 1.1, 1.2, 2.0, 1.5, 1.6, 1.7, 1.8, 1.9, 2.0])
        out = np.asarray(convective_adjust_profile(jnp.asarray(x)))
        # The reference sweep only touches indices 1..n-4, so check those.
        interior = out[1 : len(x) - 3]
        nxt = out[2 : len(x) - 2]
        assert np.all(interior <= nxt + 1e-12)

    def test_stable_profile_unchanged(self):
        x = jnp.linspace(0.0, 1.0, 12)
        np.testing.assert_allclose(convective_adjust_profile(x), x)

    def test_batched_matches_vmap(self):
        """Leading axes batch natively: (B, n) == vmap over rows.

        Regression: the sweep used to index axis 0, so a batched input
        compared whole rows (and silently clamped out-of-bounds indices).
        """
        rng = np.random.default_rng(3)
        xb = jnp.asarray(rng.normal(size=(3, 12)).cumsum(axis=-1))
        import jax

        batched = convective_adjust_profile(xb)
        rowwise = jax.vmap(convective_adjust_profile)(xb)
        np.testing.assert_allclose(np.asarray(batched), np.asarray(rowwise))
