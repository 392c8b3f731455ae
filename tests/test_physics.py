"""Physics-layer tests: mPP diffusivity, Richardson number, convective adjustment."""

import jax.numpy as jnp
import numpy as np
import pytest

from climateparameterizations_jl_tpu.ops.tridiagonal import implicit_diffusion_step
from climateparameterizations_jl_tpu.physics.convective_adjustment import (
    convective_adjustment_flux,
    convective_adjustment_implicit_step,
)
from climateparameterizations_jl_tpu.physics.mpp import MPPParameters, mpp_diffusivity, tanh_step
from climateparameterizations_jl_tpu.physics.richardson import richardson_profile, sanitize_richardson


class TestTanhStep:
    def test_limits(self):
        assert tanh_step(-100.0) == pytest.approx(1.0)
        assert tanh_step(100.0) == pytest.approx(0.0, abs=1e-12)
        assert tanh_step(0.0) == pytest.approx(0.5)

    def test_monotone_decreasing(self):
        x = jnp.linspace(-5, 5, 101)
        y = tanh_step(x)
        assert np.all(np.diff(np.array(y)) < 0)


class TestMPPDiffusivity:
    def test_shear_unstable_limit(self):
        p = MPPParameters.default()
        nu = mpp_diffusivity(jnp.asarray(-100.0), p)
        assert float(nu) == pytest.approx(float(p.nu_0 + p.nu_minus), rel=1e-6)

    def test_stratified_limit(self):
        p = MPPParameters.default()
        nu = mpp_diffusivity(jnp.asarray(100.0), p)
        assert float(nu) == pytest.approx(float(p.nu_0), rel=1e-6)

    def test_vector_roundtrip(self):
        p = MPPParameters.default()
        p2 = MPPParameters.from_vector(p.as_vector())
        assert float(p2.Ri_c) == pytest.approx(0.25)


class TestRichardson:
    def test_sanitize(self):
        Ri = jnp.asarray([jnp.nan, jnp.inf, -jnp.inf, 1.0])
        out = np.array(sanitize_richardson(Ri))
        assert out[0] == 0.0 and out[1] == 1e10 and out[2] == -1e10 and out[3] == 1.0

    def test_stable_profile_positive_Ri(self):
        Nz = 16
        # Linearly stratified (T increasing upward), weak shear.
        T = jnp.linspace(0.0, 1.0, Nz)
        u = 0.01 * jnp.linspace(0.0, 1.0, Nz)
        v = jnp.zeros(Nz)
        Ri = richardson_profile(u, v, T, H=100.0, g=9.81, alpha=2e-4, sigma_u=1.0, sigma_v=1.0, sigma_T=1.0)
        assert Ri.shape == (Nz + 1,)
        # Interior faces: buoyancy gradient positive, shear tiny -> large positive Ri.
        assert np.all(np.array(Ri[1:-1]) > 0)


class TestConvectiveAdjustment:
    def test_flux_zero_for_stable(self):
        T = jnp.linspace(0.0, 1.0, 32)  # stable: dT/dz > 0
        flux = convective_adjustment_flux(T, 1.0 / 32, kappa=10.0)
        np.testing.assert_allclose(np.array(flux), 0.0)

    def test_flux_negative_for_unstable(self):
        T = jnp.linspace(1.0, 0.0, 32)  # unstable: dT/dz < 0
        flux = convective_adjustment_flux(T, 1.0 / 32, kappa=10.0)
        assert np.all(np.array(flux[1:-1]) < 0)

    def test_implicit_step_conserves_heat(self):
        rng = np.random.default_rng(0)
        T = jnp.asarray(rng.normal(size=(5, 32)))
        T2 = convective_adjustment_implicit_step(T, dt=600.0, dz=8.0, kappa=10.0)
        np.testing.assert_allclose(np.array(T2.sum(-1)), np.array(T.sum(-1)), rtol=1e-10)

    def test_implicit_step_reduces_instability(self):
        # Strongly unstable profile: heavy (cold) water on top.
        T = jnp.linspace(1.0, 0.0, 32)
        dz = 8.0
        out = T
        for _ in range(50):
            out = convective_adjustment_implicit_step(out, dt=600.0, dz=dz, kappa=10.0)
        grad_before = np.diff(np.array(T)).min()
        grad_after = np.diff(np.array(out)).min()
        assert grad_after > grad_before  # mixing reduced the unstable gradient

    def test_implicit_diffusion_smooths(self):
        T = jnp.zeros(32).at[16].set(1.0)
        nu = jnp.full(33, 1e-2).at[0].set(0.0).at[-1].set(0.0)
        out = implicit_diffusion_step(T, nu, dt=100.0, dz=1.0)
        assert float(out[16]) < 1.0
        np.testing.assert_allclose(float(out.sum()), 1.0, rtol=1e-10)


class TestEncroachmentLaw:
    def test_convective_deepening_follows_sqrt_law(self):
        """Golden physics: surface cooling into linear stratification deepens
        the mixed layer as h(t) = sqrt(2 F t / Gamma) (encroachment, the
        no-entrainment conv-adj limit). The implicit conv-adj column must
        track it within discretization error."""
        from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling
        from climateparameterizations_jl_tpu.models.free_convection import (
            FreeConvectionModel,
            solve_free_convection_nde,
        )

        f32 = jnp.float32
        Nz, H = 64, 128.0
        Gamma, F, t_end = 0.02, 1e-4, 86400.0
        zc = (np.arange(Nz) + 0.5) * (H / Nz) - H
        T0 = 20.0 + Gamma * (zc + H)
        Ts = ZeroMeanUnitVarianceScaling(f32(20.0), f32(1.0))
        ws = ZeroMeanUnitVarianceScaling(f32(0.0), f32(1e-4))
        model = FreeConvectionModel(
            H=f32(H), tau=f32(t_end), T_scaling=Ts, wT_scaling=ws,
            bottom_flux=ws.scale(f32(0.0)), top_flux=ws.scale(f32(F)),
            Nz=Nz, base_closure="convective_adjustment",
        )
        n_save = 24
        traj = solve_free_convection_nde(
            model, None, Ts.scale(jnp.asarray(T0, f32)), 0.0, 1.0 / n_save, n_save,
            n_substeps=200, method="split",
        )
        T = np.asarray(Ts.unscale(traj))
        for frac in (0.5, 1.0):
            k = int(frac * n_save)
            h_theory = np.sqrt(2 * F * (frac * t_end) / Gamma)
            dev = np.abs(T[k] - T0)
            mixed = dev > 0.02 * np.max(dev)
            h_measured = -zc[mixed].min()
            # Measured 0.91-0.92 of theory (cell-face snapping at dz = 2 m).
            assert 0.8 < h_measured / h_theory < 1.15, (h_measured, h_theory)
