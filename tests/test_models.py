"""Column-model tests: wind-mixing NDE, free-convection NDE, steppers."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climateparameterizations_jl_tpu.closures.mlp import free_convection_mlp, wind_mixing_mlp
from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling
from climateparameterizations_jl_tpu.models.free_convection import (
    FreeConvectionModel,
    solve_free_convection_nde,
)
from climateparameterizations_jl_tpu.models.timestepper import solve_fixed_step
from climateparameterizations_jl_tpu.models.wind_mixing import (
    BoundaryConditions,
    FluxNNs,
    WindMixingModel,
    WindMixingScalings,
    predict_flux,
    solve_wind_mixing_nde,
    solve_wind_mixing_split,
    split_uvT,
)
from climateparameterizations_jl_tpu.physics.mpp import MPPParameters

f32 = jnp.float32


def _scaling(mu, sigma):
    return ZeroMeanUnitVarianceScaling(f32(mu), f32(sigma))


def make_model(**overrides):
    scalings = WindMixingScalings(
        u=_scaling(0.0, 0.1),
        v=_scaling(0.0, 0.1),
        T=_scaling(19.0, 0.5),
        uw=_scaling(0.0, 1e-4),
        vw=_scaling(0.0, 1e-4),
        wT=_scaling(0.0, 1e-5),
    )
    kw = dict(
        H=f32(256.0),
        tau=f32(691200.0),
        f=f32(1e-4),
        g=f32(9.80665),
        alpha=f32(2e-4),
        kappa=f32(10.0),
        scalings=scalings,
        mpp=MPPParameters.default(),
        Nz=32,
    )
    kw.update(overrides)
    return WindMixingModel(**kw)


def zero_bcs():
    z = f32(0.0)
    return BoundaryConditions(uw_bot=z, uw_top=z, vw_bot=z, vw_top=z, wT_bot=z, wT_top=z)


NO_NNS = FluxNNs(uw=None, vw=None, wT=None)


class TestTimestepper:
    def test_exponential_decay(self):
        rhs = lambda x, t: -x  # noqa: E731
        traj = solve_fixed_step(rhs, jnp.ones(4), 0.0, 0.1, 10, n_substeps=4, method="rk4")
        expected = np.exp(-0.1 * np.arange(11))
        np.testing.assert_allclose(np.array(traj[:, 0]), expected, rtol=1e-6)

    def test_output_includes_initial_state(self):
        rhs = lambda x, t: jnp.zeros_like(x)  # noqa: E731
        x0 = jnp.asarray([3.0])
        traj = solve_fixed_step(rhs, x0, 0.0, 1.0, 3)
        assert traj.shape == (4, 1)
        np.testing.assert_allclose(np.array(traj), 3.0)


class TestWindMixingInertialOscillation:
    """With all fluxes off, the momentum equations are an inertial oscillation.

    In scaled space with mu_u = mu_v = 0 and sigma_u = sigma_v:
    du/dt_hat = f tau v, dv/dt_hat = -f tau u -> (u + iv)(t) rotating at f tau.
    """

    @pytest.mark.parametrize("method", ["euler", "heun"])
    def test_low_order_methods_do_not_amplify_rotation(self, method):
        """Repo-wide Coriolis rule: euler/heun must not integrate the
        rotation forward-explicitly (amplifies |u+iv| by sqrt(1+(f tau dt)^2)
        per step — 100 steps at omega dt ~ 0.3 would grow the amplitude
        ~70x). The forward-backward split keeps it neutral."""
        model = make_model(use_mpp=False, use_conv_adj=False, zero_weights=True)
        bcs = zero_bcs()
        Nz = model.Nz
        omega = float(model.f * model.tau)
        dt = 0.3 / omega
        x0 = jnp.concatenate([jnp.ones(Nz), jnp.zeros(Nz), jnp.zeros(Nz)]).astype(jnp.float32)
        traj = solve_wind_mixing_nde(model, NO_NNS, bcs, x0, 0.0, dt * 10, 10, n_substeps=10, method=method)
        u, v, _ = split_uvT(traj, Nz)
        amp = np.sqrt(np.array(u[:, 0]) ** 2 + np.array(v[:, 0]) ** 2)
        assert amp[-1] < 1.05, amp[-1]

    def test_rotation_matches_analytic(self):
        model = make_model(use_mpp=False, use_conv_adj=False, zero_weights=True)
        bcs = zero_bcs()
        Nz = model.Nz
        u0, v0 = 1.0, 0.0
        x0 = jnp.concatenate([jnp.full((Nz,), u0), jnp.full((Nz,), v0), jnp.zeros(Nz)]).astype(jnp.float32)
        dt_save = 1e-3
        n_save = 20
        traj = solve_wind_mixing_nde(model, NO_NNS, bcs, x0, 0.0, dt_save, n_save, n_substeps=8)
        omega = float(model.f * model.tau)
        t = dt_save * np.arange(n_save + 1)
        u_expected = u0 * np.cos(omega * t)
        v_expected = -u0 * np.sin(omega * t)
        u, v, _ = split_uvT(traj, Nz)
        np.testing.assert_allclose(np.array(u[:, 0]), u_expected, atol=2e-4)
        np.testing.assert_allclose(np.array(v[:, 0]), v_expected, atol=2e-4)


class TestWindMixingMPP:
    def test_heat_conserved_with_zero_bc_fluxes(self):
        model = make_model()
        bcs = zero_bcs()
        rng = np.random.default_rng(1)
        x0 = jnp.asarray(rng.normal(size=(3, 96)) * 0.1, jnp.float32)
        traj = solve_wind_mixing_nde(model, NO_NNS, bcs, x0, 0.0, 5e-4, 10, n_substeps=8)
        _, _, T = split_uvT(traj, 32)
        # Zero BC flux => heat content (sum of scaled T, uniform grid) conserved.
        np.testing.assert_allclose(np.array(T.sum(-1)[-1]), np.array(T.sum(-1)[0]), rtol=1e-4)

    def test_split_matches_explicit(self):
        model = make_model()
        bcs = zero_bcs()
        rng = np.random.default_rng(2)
        x0 = jnp.asarray(rng.normal(size=(96,)) * 0.1, jnp.float32)
        expl = solve_wind_mixing_nde(model, NO_NNS, bcs, x0, 0.0, 2e-4, 10, n_substeps=16)
        splt = solve_wind_mixing_split(model, NO_NNS, bcs, x0, 0.0, 2e-4, 10, n_substeps=16)
        np.testing.assert_allclose(np.array(expl[-1]), np.array(splt[-1]), atol=2e-3)

    def test_split_matches_explicit_conv_adj_with_bc_fluxes(self):
        """Regression: in zero_weights mode with a NON-mPP base closure the
        explicit solver used to drop the prescribed boundary fluxes
        entirely (only the mPP term carried them), silently diverging from
        the split solver. With nonzero surface forcing both solvers must
        agree and the forcing must act."""
        model = make_model(use_mpp=False, use_conv_adj=True, zero_weights=True)
        bcs = dataclasses.replace(zero_bcs(), uw_top=f32(-0.5), wT_top=f32(0.3))
        rng = np.random.default_rng(7)
        # Stably-stratified T: the conv-adj switch stays off in both solvers
        # (the stiff explicit-min vs implicit-lagged schemes legitimately
        # differ when active — CLAUDE.md), isolating the BC-flux paths.
        x0 = jnp.concatenate([
            jnp.asarray(rng.normal(size=(64,)) * 0.1, jnp.float32),
            jnp.linspace(-0.5, 0.5, 32, dtype=jnp.float32),
        ])
        expl = solve_wind_mixing_nde(model, NO_NNS, bcs, x0, 0.0, 2e-4, 10, n_substeps=16)
        splt = solve_wind_mixing_split(model, NO_NNS, bcs, x0, 0.0, 2e-4, 10, n_substeps=16)
        np.testing.assert_allclose(np.array(expl[-1]), np.array(splt[-1]), atol=2e-3)
        # The surface forcing must actually reach the state (previously the
        # explicit trajectory was forcing-free).
        free = solve_wind_mixing_nde(model, NO_NNS, zero_bcs(), x0, 0.0, 2e-4, 10, n_substeps=16)
        assert float(jnp.abs(expl[-1] - free[-1]).max()) > 1e-4

    def test_surface_stress_accelerates_top(self):
        model = make_model()
        # Negative scaled top uw BC -> momentum injected at the surface.
        bcs = dataclasses.replace(zero_bcs(), uw_top=f32(-1.0))
        x0 = jnp.zeros(96, jnp.float32)
        traj = solve_wind_mixing_nde(model, NO_NNS, bcs, x0, 0.0, 5e-4, 5, n_substeps=8)
        u, _, _ = split_uvT(traj, 32)
        assert abs(float(u[-1, -1])) > abs(float(u[-1, 0]))  # top cell spun up most

    @pytest.mark.parametrize("method", ["rk4", "split"])
    def test_wind_gradient_matches_finite_differences(self, method):
        """FD validation of the coupled triple-NN discrete adjoint (f64)."""
        f64 = jnp.float64
        model = make_model()
        model = jax.tree.map(lambda a: jnp.asarray(a, f64) if hasattr(a, "dtype") else a, model)
        nns = FluxNNs(*[wind_mixing_mlp(k, 32, scale=1e-2, dtype=f64) for k in jax.random.split(jax.random.PRNGKey(4), 3)])
        bcs = jax.tree.map(lambda a: jnp.asarray(a, f64), zero_bcs())
        rng = np.random.default_rng(5)
        x0 = jnp.asarray(rng.normal(size=(96,)) * 0.1, f64)
        target = jnp.zeros((6, 96), f64)

        def loss(nns):
            if method == "split":
                traj = solve_wind_mixing_split(model, nns, bcs, x0, 0.0, 2e-4, 5, n_substeps=2)
            else:
                traj = solve_wind_mixing_nde(model, nns, bcs, x0, 0.0, 2e-4, 5, n_substeps=2)
            return jnp.mean((traj - target) ** 2)

        g = jax.grad(loss)(nns)
        eps = 1e-6
        W = nns.wT.weights[0]
        for (i, j) in ((0, 0), (5, 17)):
            bump = jnp.zeros_like(W).at[i, j].set(eps)
            mk = lambda Wb: nns._replace(wT=dataclasses.replace(nns.wT, weights=(Wb,) + nns.wT.weights[1:]))  # noqa: E731
            fd = (float(loss(mk(W + bump))) - float(loss(mk(W - bump)))) / (2 * eps)
            ad = float(g.wT.weights[0][i, j])
            np.testing.assert_allclose(ad, fd, rtol=1e-4, atol=1e-10)

    def test_nn_fluxes_and_gradients_finite(self):
        model = make_model()
        bcs = zero_bcs()
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        nns = FluxNNs(
            uw=wind_mixing_mlp(keys[0], 32, scale=1e-5),
            vw=wind_mixing_mlp(keys[1], 32, scale=1e-5),
            wT=wind_mixing_mlp(keys[2], 32, scale=1e-5),
        )
        x0 = jnp.asarray(np.random.default_rng(3).normal(size=(2, 96)) * 0.1, jnp.float32)

        def loss(nns):
            traj = solve_wind_mixing_nde(model, nns, bcs, x0, 0.0, 5e-4, 5, n_substeps=4)
            return jnp.mean(traj**2)

        g = jax.grad(loss)(nns)
        leaves = jax.tree_util.tree_leaves(g)
        assert leaves and all(bool(jnp.isfinite(leaf).all()) for leaf in leaves)

    def test_packed_flux_nns_match_unpacked(self):
        """PackedFluxNNs (one fused matmul chain) == per-flux MLPs: values + grads."""
        from climateparameterizations_jl_tpu.models.wind_mixing import pack_flux_nns, wind_mixing_rhs

        model = make_model()
        bcs = dataclasses.replace(zero_bcs(), uw_top=f32(-0.5), wT_top=f32(0.3))
        keys = jax.random.split(jax.random.PRNGKey(7), 3)
        nns = FluxNNs(
            uw=wind_mixing_mlp(keys[0], 32, scale=1e-2),
            vw=wind_mixing_mlp(keys[1], 32, scale=1e-2),
            wT=wind_mixing_mlp(keys[2], 32, scale=1e-2),
        )
        packed = pack_flux_nns(nns)
        assert packed is not None
        x0 = jnp.asarray(np.random.default_rng(5).normal(size=(4, 96)) * 0.1, jnp.float32)

        r_ref = wind_mixing_rhs(model, nns, bcs, x0, 0.0)
        r_pkd = wind_mixing_rhs(model, packed, bcs, x0, 0.0)
        np.testing.assert_allclose(np.asarray(r_pkd), np.asarray(r_ref), rtol=1e-5, atol=1e-6)

        s_ref = solve_wind_mixing_nde(model, nns, bcs, x0, 0.0, 1e-4, 4)
        s_pkd = solve_wind_mixing_nde(model, packed, bcs, x0, 0.0, 1e-4, 4)
        np.testing.assert_allclose(np.asarray(s_pkd), np.asarray(s_ref), rtol=1e-5, atol=1e-6)

        # Gradients w.r.t. the ORIGINAL per-flux pytree flow through the pack.
        def loss_packed(nns):
            return jnp.mean(wind_mixing_rhs(model, pack_flux_nns(nns), bcs, x0, 0.0) ** 2)

        def loss_ref(nns):
            return jnp.mean(wind_mixing_rhs(model, nns, bcs, x0, 0.0) ** 2)

        g_pkd = jax.grad(loss_packed)(nns)
        g_ref = jax.grad(loss_ref)(nns)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-8),
            g_pkd, g_ref,
        )

    def test_pack_flux_nns_rejects_mixed(self):
        from climateparameterizations_jl_tpu.models.wind_mixing import pack_flux_nns

        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        nns = FluxNNs(uw=None, vw=wind_mixing_mlp(keys[1], 32), wT=wind_mixing_mlp(keys[2], 32))
        assert pack_flux_nns(nns) is None
        nns2 = FluxNNs(
            uw=wind_mixing_mlp(keys[0], 32, activation="relu"),
            vw=wind_mixing_mlp(keys[1], 32),
            wT=wind_mixing_mlp(keys[2], 32),
        )
        assert pack_flux_nns(nns2) is None
        # Unequal output widths would make the equal-thirds split lie.
        from climateparameterizations_jl_tpu.closures.mlp import mlp_init

        nns3 = FluxNNs(
            uw=mlp_init(keys[0], (96, 50, 20, 31), "mish"),
            vw=mlp_init(keys[1], (96, 50, 20, 30), "mish"),
            wT=mlp_init(keys[2], (96, 50, 20, 31), "mish"),
        )
        assert pack_flux_nns(nns3) is None

    def test_predict_flux_boundary_values_zero_weights(self):
        """zero_weights mode: total boundary-face flux == BC - scaled zero."""
        model = make_model()
        bcs = dataclasses.replace(zero_bcs(), uw_top=f32(0.7), wT_bot=f32(-0.2))
        x = jnp.zeros(96, jnp.float32)
        uw, vw, wT = predict_flux(model, NO_NNS, bcs, x)
        s = model.scalings
        np.testing.assert_allclose(float(uw[-1]), 0.7 - float(s.uw.scale(0.0)), rtol=1e-5)
        np.testing.assert_allclose(float(wT[0]), -0.2 - float(s.wT.scale(0.0)), rtol=1e-5)

    def test_diurnal_top_flux(self):
        model = make_model(diurnal=True)
        bcs = dataclasses.replace(zero_bcs(), diurnal_amplitude=f32(1e-4))
        x = jnp.zeros(96, jnp.float32)
        # Quarter-day: sin(2 pi t/day) = 1 -> top wT = wT_scaling(amplitude).
        t_quarter = float(86400.0 / 4.0 / model.tau)
        _, _, wT = predict_flux(model, NO_NNS, bcs, x, t=t_quarter)
        s = model.scalings
        expected = float(s.wT.scale(1e-4)) - float(s.wT.scale(0.0))
        np.testing.assert_allclose(float(wT[-1]), expected, rtol=1e-4)

    def test_diurnal_mixed_suite_keeps_constant_members_frozen(self):
        """Amplitude-0 members of a mixed suite keep their frozen wT_top.

        Before the per-sim amplitude guard, a diurnal model zeroed EVERY
        member's surface flux to amplitude*sin(t) — constant-flux sims in a
        mixed suite lost their forcing entirely.
        """
        from climateparameterizations_jl_tpu.models.wind_mixing import _effective_bcs

        model = make_model(diurnal=True)
        bcs = dataclasses.replace(
            zero_bcs(),
            wT_top=jnp.asarray([0.7, 0.3], jnp.float32),
            diurnal_amplitude=jnp.asarray([0.0, 1e-4], jnp.float32),
        )
        t_quarter = float(86400.0 / 4.0 / model.tau)  # sin = 1
        eff = _effective_bcs(model, bcs, t_quarter)
        s = model.scalings
        np.testing.assert_allclose(float(eff.wT_top[0]), 0.7, rtol=1e-6)  # frozen
        np.testing.assert_allclose(float(eff.wT_top[1]), float(s.wT.scale(1e-4)), rtol=1e-4)


class TestFreeConvection:
    def make(self, base_closure="convective_adjustment", top_flux=0.0):
        return FreeConvectionModel(
            H=f32(256.0),
            tau=f32(691200.0),
            T_scaling=_scaling(19.0, 0.5),
            wT_scaling=_scaling(0.0, 1e-5),
            bottom_flux=f32(0.0),
            top_flux=f32(top_flux),
            Nz=32,
            base_closure=base_closure,
        )

    def test_stable_profile_stationary_without_forcing(self):
        model = self.make(base_closure="none")
        nn = None

        # With no NN we can't call solve (needs an MLP); use a zero-output NN.
        nn = free_convection_mlp(jax.random.PRNGKey(0), 32)
        nn = jax.tree.map(jnp.zeros_like, nn)
        T0 = jnp.linspace(-1.0, 1.0, 32).astype(jnp.float32)
        traj = solve_free_convection_nde(model, nn, T0, 0.0, 1e-3, 5)
        np.testing.assert_allclose(np.array(traj[-1]), np.array(T0), atol=1e-6)

    def test_conv_adj_mixes_unstable_profile(self):
        model = self.make()
        nn = jax.tree.map(jnp.zeros_like, free_convection_mlp(jax.random.PRNGKey(0), 32))
        T0 = jnp.linspace(1.0, -1.0, 32).astype(jnp.float32)  # unstable
        traj = solve_free_convection_nde(model, nn, T0, 0.0, 1e-4, 20, n_substeps=8)
        var0 = float(jnp.var(traj[0]))
        var1 = float(jnp.var(traj[-1]))
        assert var1 < var0  # adjustment homogenizes
        # Heat conserved (zero BC fluxes).
        np.testing.assert_allclose(float(traj[-1].sum()), float(traj[0].sum()), atol=1e-3)

    def test_surface_cooling_cools_column(self):
        # Positive (upward) top heat flux removes heat.
        model = self.make(top_flux=1.0)
        nn = jax.tree.map(jnp.zeros_like, free_convection_mlp(jax.random.PRNGKey(0), 32))
        T0 = jnp.zeros(32, jnp.float32)
        traj = solve_free_convection_nde(model, nn, T0, 0.0, 1e-4, 10, n_substeps=4)
        assert float(traj[-1].sum()) < float(traj[0].sum())

    def test_gradient_through_solver(self):
        model = self.make()
        nn = free_convection_mlp(jax.random.PRNGKey(1), 32)
        T0 = jnp.linspace(-1.0, 1.0, 32).astype(jnp.float32)
        target = jnp.zeros((6, 32), jnp.float32)

        def loss(nn):
            traj = solve_free_convection_nde(model, nn, T0, 0.0, 1e-3, 5, n_substeps=2)
            return jnp.mean((traj - target) ** 2)

        g = jax.grad(loss)(nn)
        leaves = jax.tree_util.tree_leaves(g)
        assert leaves and all(bool(jnp.isfinite(leaf).all()) for leaf in leaves)
        # Gradients should be nonzero (NN influences the trajectory).
        assert any(float(jnp.abs(leaf).max()) > 0 for leaf in leaves)

    @pytest.mark.parametrize("method", ["rk4", "split"])
    def test_gradient_matches_finite_differences(self, method):
        """Discrete-adjoint (grad-through-scan) == central finite differences.

        The correctness evidence for replacing the reference's continuous
        InterpolatingAdjoint with discretize-then-optimize (SURVEY.md
        section 4's suggested check), in f64 for a tight tolerance.
        """
        f64 = jnp.float64
        model = self.make()
        model = jax.tree.map(lambda a: jnp.asarray(a, f64) if hasattr(a, "dtype") else a, model)
        nn = free_convection_mlp(jax.random.PRNGKey(2), 32, dtype=f64)
        T0 = jnp.linspace(-1.0, 1.0, 32).astype(f64)
        target = jnp.zeros((6, 32), f64)

        def loss(nn):
            traj = solve_free_convection_nde(model, nn, T0, 0.0, 1e-3, 5, n_substeps=2, method=method)
            return jnp.mean((traj - target) ** 2)

        g = jax.grad(loss)(nn)
        # Probe a handful of weight entries with central differences.
        eps = 1e-6
        W = nn.weights[0]
        for (i, j) in ((0, 0), (3, 7), (10, 20)):
            bump = jnp.zeros_like(W).at[i, j].set(eps)
            nn_p = dataclasses.replace(nn, weights=(W + bump,) + nn.weights[1:])
            nn_m = dataclasses.replace(nn, weights=(W - bump,) + nn.weights[1:])
            fd = (float(loss(nn_p)) - float(loss(nn_m))) / (2 * eps)
            ad = float(g.weights[0][i, j])
            np.testing.assert_allclose(ad, fd, rtol=1e-5, atol=1e-10)


class TestEkmanTransport:
    def test_steady_transport_matches_theory(self):
        """Golden physics: depth-integrated steady Ekman transport is
        ``int v dz = Fu / f`` (and ``int u dz = 0``) for constant-viscosity
        wind-driven flow. Forward-Euler Coriolis in the split stepper grew
        this without bound (~150x after 40 days); the forward-backward
        rotation keeps the transport on the inertial circle."""
        import dataclasses as dc

        from climateparameterizations_jl_tpu.models.wind_mixing import solve_wind_mixing_split

        model = make_model()
        mpp = MPPParameters(
            nu_0=f32(1e-2), nu_minus=f32(0.0), Ri_c=f32(0.25), delta_Ri=f32(0.1), Pr=f32(1.0)
        )
        model = dc.replace(model, mpp=mpp)
        s = model.scalings
        Fu = -5e-4
        bcs = dataclasses.replace(zero_bcs(), uw_top=f32(Fu / float(s.uw.sigma)))
        Nz, H = model.Nz, float(model.H)
        zc = (np.arange(Nz) + 0.5) * (H / Nz) - H
        T0 = 19.0 + 0.02 * (zc + H)
        x0 = jnp.concatenate([jnp.zeros(Nz), jnp.zeros(Nz), s.T.scale(jnp.asarray(T0, f32))])
        n_save, substeps = 400, 20  # 5 tau = 40 days, dt_dim = 432 s
        traj = solve_wind_mixing_split(model, NO_NNS, bcs, x0, 0.0, 5.0 / n_save, n_save, substeps)
        u, v, _ = split_uvT(traj, Nz)
        dz = H / Nz
        U = np.asarray(s.u.unscale(u)).sum(axis=-1) * dz
        V = np.asarray(s.v.unscale(v)).sum(axis=-1) * dz
        # Average over ~one inertial period at the end (frames are 8640 s,
        # 2 pi / f = 62.8 ks ~ 7 frames).
        U_ss, V_ss = U[-8:].mean(), V[-8:].mean()
        theory = Fu / float(model.f)
        np.testing.assert_allclose(V_ss, theory, rtol=0.15)
        assert abs(U_ss) < 0.15 * abs(theory)
