"""Embedding-layer tests: host column model and 3-D double gyre."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climateparameterizations_jl_tpu.closures.mlp import free_convection_mlp, wind_mixing_mlp
from climateparameterizations_jl_tpu.core.scalings import ZeroMeanUnitVarianceScaling
from climateparameterizations_jl_tpu.embed.column_model import (
    HostColumnModel,
    HostColumnState,
    run_embedded_column,
    run_paired_columns,
)
from climateparameterizations_jl_tpu.embed.double_gyre import (
    DoubleGyreModel,
    DoubleGyreState,
    barotropic_streamfunction,
    run_double_gyre,
    solve_free_surface,
    vertical_velocity,
)
from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs, WindMixingScalings
from climateparameterizations_jl_tpu.physics.mpp import MPPParameters

f32 = jnp.float32


def _scaling(mu, sigma):
    return ZeroMeanUnitVarianceScaling(f32(mu), f32(sigma))


def make_host_model(dtype=jnp.float32, **overrides):
    d = lambda x: jnp.asarray(x, dtype)  # noqa: E731
    sc = lambda mu, sigma: ZeroMeanUnitVarianceScaling(d(mu), d(sigma))  # noqa: E731
    scalings = WindMixingScalings(
        u=sc(0.0, 0.1), v=sc(0.0, 0.1), T=sc(19.0, 0.5),
        uw=sc(0.0, 1e-4), vw=sc(0.0, 1e-4), wT=sc(0.0, 1e-5),
    )
    kw = dict(
        H=d(256.0), f=d(1e-4), g=d(9.80665), alpha=d(2e-4),
        Fu=d(-5e-4), Ftheta=d(1e-5), dTdz_bottom=d(0.01),
        scalings=scalings, mpp=MPPParameters.default(dtype), Nz=32,
    )
    kw.update(overrides)
    return HostColumnModel(**kw)


def stratified_state(Nz=32, H=256.0, dtype=jnp.float32):
    zc = (jnp.arange(Nz, dtype=dtype) + 0.5) * (H / Nz) - H
    T = 19.0 + 0.01 * (zc + H)
    return HostColumnState(u=jnp.zeros(Nz, dtype), v=jnp.zeros(Nz, dtype), T=T.astype(dtype))


class TestHostColumn:
    def test_baseline_finite_and_mixes(self):
        model = make_host_model()
        state0 = stratified_state()
        traj = run_embedded_column(model, None, state0, 60.0, n_save=20, save_every=10)
        assert traj.T.shape == (21, 32)
        assert np.all(np.isfinite(np.asarray(traj.T)))
        # Surface cooling (Ftheta > 0) removes heat from the top cell.
        assert float(traj.T[-1, -1]) < float(state0.T[-1])
        # Wind stress (Fu < 0) accelerates the surface eastward.
        assert float(traj.u[-1, -1]) > 0.0

    def test_mpp_conv_adjust_mixes_unstable_column_faster(self):
        """The convective_adjustment=true embedding branch
        (NDE_oceananigans.jl:49-54): kappa_T jumps to kappa_conv where
        Ri <= 0, so an unstable profile homogenizes much faster."""
        import dataclasses as dc

        Nz, H = 32, 256.0
        zc = (jnp.arange(Nz, dtype=jnp.float32) + 0.5) * (H / Nz) - H
        T_unstable = 19.0 - 0.01 * (zc + H)  # warm water below cold: Ri < 0
        state0 = HostColumnState(u=jnp.zeros(Nz, jnp.float32), v=jnp.zeros(Nz, jnp.float32), T=T_unstable.astype(jnp.float32))

        base = make_host_model(Fu=jnp.float32(0.0), Ftheta=jnp.float32(0.0), dTdz_bottom=jnp.float32(0.0))
        with_ca = dc.replace(base, mpp_conv_adjust=True)
        spread = lambda traj: float(jnp.max(traj.T[-1]) - jnp.min(traj.T[-1]))  # noqa: E731
        traj_plain = run_embedded_column(base, None, state0, 600.0, n_save=10, save_every=6)
        traj_ca = run_embedded_column(with_ca, None, state0, 600.0, n_save=10, save_every=6)
        assert np.isfinite(spread(traj_ca))
        # Conv-adj branch homogenizes the unstable stratification much faster.
        assert spread(traj_ca) < 0.3 * spread(traj_plain)

    def test_bottom_bc_kappa_uses_prescribed_gradient(self):
        """A transient instability at face 1 must NOT pair the conv-adj
        kappa with the (stable) prescribed bottom gradient: the old face-1
        switch dumped -kappa_conv*dTdz_bottom of spurious cooling into the
        bottom cell the moment an NN wiggle flipped the local gradient
        (~0.15 K instantly on LES-generated data)."""
        from climateparameterizations_jl_tpu.embed.column_model import host_column_step

        Nz, H = 32, 256.0
        dz = H / Nz
        model = make_host_model(
            closure="conv_adj", kappa_conv=f32(10.0),
            Fu=f32(0.0), Ftheta=f32(0.0), dTdz_bottom=f32(0.01),
        )
        zc = (jnp.arange(Nz, dtype=jnp.float32) + 0.5) * dz - H
        T = 19.0 + 0.01 * (zc + H)
        T = T.at[1].set(T[0] - 1e-4)  # face 1 momentarily unstable
        state = HostColumnState(u=jnp.zeros(Nz), v=jnp.zeros(Nz), T=T.astype(jnp.float32))
        dt = 150.0
        out = host_column_step(model, None, state, dt)
        dT0 = float(out.T[0] - state.T[0])
        # Spurious flux would cool cell 0 by kappa_conv*dTdz_bottom*dt/dz = 1.875 K.
        spurious = float(model.kappa_conv) * 0.01 * dt / dz
        assert abs(dT0) < 0.05 * spurious, (dT0, spurious)

    def test_heat_budget_closes(self):
        # With zero bottom-gradient flux, total heat change = -integral of
        # surface flux: d/dt sum(T) dz = -Ftheta. Exact in f64 (the implicit
        # diffusion with zeroed boundary faces is conservative); f32 only
        # adds tridiagonal-solve roundoff.
        model = make_host_model(dtype=jnp.float64, dTdz_bottom=jnp.float64(0.0))
        state0 = stratified_state(dtype=jnp.float64)
        dt, n_save, save_every = 60.0, 10, 5
        traj = run_embedded_column(model, None, state0, dt, n_save, save_every)
        dz = 256.0 / 32
        heat0 = float(jnp.sum(traj.T[0]) * dz)
        heat1 = float(jnp.sum(traj.T[-1]) * dz)
        expected = -float(model.Ftheta) * dt * n_save * save_every
        assert abs((heat1 - heat0) - expected) < 1e-6 * abs(expected)

    def test_paired_runs_differ_with_nn(self):
        model = make_host_model()
        key = jax.random.PRNGKey(0)
        nns = FluxNNs(*[wind_mixing_mlp(k, 32, scale=0.3) for k in jax.random.split(key, 3)])
        base, with_nn = run_paired_columns(model, nns, stratified_state(), 60.0, n_save=5, save_every=5)
        np.testing.assert_allclose(np.asarray(base.T[0]), np.asarray(with_nn.T[0]))
        assert float(jnp.max(jnp.abs(base.T[-1] - with_nn.T[-1]))) > 1e-7

    def test_conv_adj_mode_removes_instability(self):
        model = make_host_model(closure="conv_adj", kappa_conv=f32(1.0), Fu=f32(0.0), Ftheta=f32(0.0), dTdz_bottom=f32(0.0))
        Nz = 32
        zc = (jnp.arange(Nz, dtype=jnp.float32) + 0.5) * (256.0 / Nz) - 256.0
        T_unstable = 19.0 - 0.01 * (zc + 256.0)  # warm below cold: unstable
        state0 = HostColumnState(u=jnp.zeros(Nz), v=jnp.zeros(Nz), T=T_unstable)
        traj = run_embedded_column(model, None, state0, 600.0, n_save=20, save_every=5)
        dT_final = np.diff(np.asarray(traj.T[-1]))
        assert np.min(dT_final) > np.min(np.diff(np.asarray(T_unstable))) * 0.2

    def test_batched_ensemble(self):
        model = make_host_model()
        base = stratified_state()
        ens = HostColumnState(
            u=jnp.broadcast_to(base.u, (16, 32)),
            v=jnp.broadcast_to(base.v, (16, 32)),
            T=base.T[None] + 0.01 * jax.random.normal(jax.random.PRNGKey(2), (16, 32), jnp.float32),
        )
        traj = run_embedded_column(model, None, ens, 60.0, n_save=3, save_every=5)
        assert traj.T.shape == (4, 16, 32)
        assert np.all(np.isfinite(np.asarray(traj.T)))


class TestFreeSurfaceSolve:
    def test_solves_helmholtz_exactly(self):
        model = DoubleGyreModel.default(Nx=24, Ny=16, Nz=4)
        rhs = jax.random.normal(jax.random.PRNGKey(0), (16, 24), jnp.float32)
        dt = 1800.0
        x = solve_free_surface(model, rhs, dt)

        # Apply the discrete operator: (1 - g H dt^2 lap_N) x with zero-flux BCs.
        xp = jnp.pad(x, ((1, 1), (0, 0)), mode="edge")
        lap_y = (xp[2:] - 2 * x + xp[:-2]) / float(model.dy) ** 2
        xq = jnp.pad(x, ((0, 0), (1, 1)), mode="edge")
        lap_x = (xq[:, 2:] - 2 * x + xq[:, :-2]) / float(model.dx) ** 2
        applied = x - float(model.g * model.H) * dt * dt * (lap_y + lap_x)
        np.testing.assert_allclose(np.asarray(applied), np.asarray(rhs), atol=1e-4)


class TestDoubleGyre:
    @pytest.fixture(scope="class")
    def spun_up(self):
        model = DoubleGyreModel.default(Nx=24, Ny=24, Nz=8)
        state0 = DoubleGyreState.rest(model)
        traj = run_double_gyre(model, state0, dt=1800.0, n_save=4, save_every=24)
        return model, state0, traj

    def test_finite_and_shapes(self, spun_up):
        model, _, traj = spun_up
        assert traj.u.shape == (5, 24, 25, 8)
        assert traj.v.shape == (5, 25, 24, 8)
        assert traj.T.shape == (5, 24, 24, 8)
        assert traj.eta.shape == (5, 24, 24)
        for field in (traj.u, traj.v, traj.T, traj.eta):
            assert np.all(np.isfinite(np.asarray(field)))

    def test_volume_conserved(self, spun_up):
        _, _, traj = spun_up
        means = np.asarray(jnp.mean(traj.eta, axis=(1, 2)))
        assert np.all(np.abs(means) < 1e-6)

    def test_walls_closed(self, spun_up):
        _, _, traj = spun_up
        assert float(jnp.max(jnp.abs(traj.u[:, :, 0, :]))) == 0.0
        assert float(jnp.max(jnp.abs(traj.u[:, :, -1, :]))) == 0.0
        assert float(jnp.max(jnp.abs(traj.v[:, 0, :, :]))) == 0.0
        assert float(jnp.max(jnp.abs(traj.v[:, -1, :, :]))) == 0.0

    def test_double_gyre_circulation_develops(self, spun_up):
        model, _, traj = spun_up
        psi = np.asarray(barotropic_streamfunction(model, traj.u[-1]))
        # Two counter-rotating cells: psi changes sign between the southern
        # and northern halves and the circulation is nonzero.
        assert psi.min() < 0.0 < psi.max() or abs(psi).max() > 1e3
        south = psi[: psi.shape[0] // 2].mean()
        north = psi[psi.shape[0] // 2 :].mean()
        assert np.sign(south) != np.sign(north) or abs(psi).max() > 1e3

    def test_continuity_w_top_matches_eta_tendency(self, spun_up):
        # w integrates continuity, so w at the surface ~ free-surface motion:
        # small compared to interior |w| scale over a long run is not
        # guaranteed, but w must be exactly 0 at the bottom.
        model, _, traj = spun_up
        w = vertical_velocity(model, traj.u[-1], traj.v[-1])
        assert float(jnp.max(jnp.abs(w[..., 0]))) == 0.0

    def test_nn_closure_hook(self, spun_up):
        model, state0, _ = spun_up
        nn = free_convection_mlp(jax.random.PRNGKey(3), Nz=8)
        T_scaling = ZeroMeanUnitVarianceScaling(f32(10.0), f32(5.0))
        wT_scaling = ZeroMeanUnitVarianceScaling(f32(0.0), f32(1e-5))
        traj_nn = run_double_gyre(
            model, state0, dt=1800.0, n_save=1, save_every=12,
            nn=nn, T_scaling=T_scaling, wT_scaling=wT_scaling,
        )
        traj_base = run_double_gyre(model, state0, dt=1800.0, n_save=1, save_every=12)
        assert np.all(np.isfinite(np.asarray(traj_nn.T)))
        assert float(jnp.max(jnp.abs(traj_nn.T[-1] - traj_base.T[-1]))) > 1e-8

    def test_nn_stability_gate(self, spun_up):
        """The drift guard: gated NN flux vanishes in stably stratified
        columns, matches the ungated flux in unstable ones, and the forcing
        stays a conservative redistribution (column sum = 0) either way."""
        from climateparameterizations_jl_tpu.embed.double_gyre import nn_closure_forcing

        model, _, _ = spun_up
        nn = free_convection_mlp(jax.random.PRNGKey(3), Nz=8)
        T_scaling = ZeroMeanUnitVarianceScaling(f32(10.0), f32(5.0))
        wT_scaling = ZeroMeanUnitVarianceScaling(f32(1e-6), f32(1e-5))
        dz = float(model.dz)
        zc = (np.arange(8) + 0.5) * dz
        # Stable column: dT/dz = +5e-3 K/m everywhere (>> the auto gate scale).
        T_stable = jnp.asarray(np.broadcast_to(10.0 + 5e-3 * zc, (4, 4, 8)), jnp.float32)
        # Unstable column: dT/dz = -5e-3 K/m (convective — the training regime).
        T_unstable = jnp.asarray(np.broadcast_to(10.0 - 5e-3 * zc, (4, 4, 8)), jnp.float32)
        s = 0.1 * float(model.T_south - model.T_north) / float(model.H)
        for T in (T_stable, T_unstable):
            ungated = nn_closure_forcing(model, nn, T, T_scaling, wT_scaling)
            gated = nn_closure_forcing(model, nn, T, T_scaling, wT_scaling, stability_gate=s)
            # Conservative redistribution: the divergence telescopes to the
            # (zero) boundary faces, gate or no gate.
            np.testing.assert_allclose(np.asarray(jnp.sum(gated, axis=-1)) * dz, 0.0, atol=1e-8)
            scale = float(jnp.max(jnp.abs(ungated)))
            assert scale > 0.0
            if T is T_stable:  # sigmoid(-dTdz/s) = sigmoid(-4.5) suppresses ~100x
                assert float(jnp.max(jnp.abs(gated))) < 0.05 * scale
            else:  # unstable: gate ~ 1, flux untouched to ~1%
                np.testing.assert_allclose(np.asarray(gated), np.asarray(ungated),
                                           atol=0.02 * scale)


class TestDiurnalHostColumn:
    def test_surface_flux_follows_cycle(self):
        from climateparameterizations_jl_tpu.embed.column_model import surface_heat_flux

        model = make_host_model(diurnal=True)
        assert abs(float(surface_heat_flux(model, jnp.float32(0.0)))) < 1e-12
        np.testing.assert_allclose(
            float(surface_heat_flux(model, jnp.float32(86400.0 / 4))), float(model.Ftheta), rtol=1e-5
        )

    def test_diurnal_run_differs_from_constant(self):
        base = make_host_model(Fu=f32(0.0))
        diurnal = make_host_model(Fu=f32(0.0), diurnal=True)
        state0 = stratified_state()
        run = lambda m: run_embedded_column(m, None, state0, 600.0, n_save=4, save_every=12)  # noqa: E731
        T_const, T_diur = run(base).T, run(diurnal).T
        assert np.all(np.isfinite(np.asarray(T_diur)))
        # Constant peak cooling removes more heat than the sinusoidal cycle.
        assert float(T_diur[-1].sum()) > float(T_const[-1].sum())


class TestGyreMomentumAdvection:
    """WENO5 flux-form momentum (the reference passes WENO5 model-wide,
    double_gyre.jl:130) vs the 2nd-order advective form, behind
    ``momentum_advection``."""

    def _smooth_state(self, model, amp=0.5):
        """Wall-respecting smooth flow: psi = sin(pi x/Lx) sin(pi y/Ly)."""
        from climateparameterizations_jl_tpu.embed.double_gyre import DoubleGyreState

        Lx, Ly = float(model.Lx), float(model.Ly)
        xf = np.arange(model.Nx + 1) * float(model.dx)
        xc = (np.arange(model.Nx) + 0.5) * float(model.dx)
        yf = np.arange(model.Ny + 1) * float(model.dy)
        yc = (np.arange(model.Ny) + 0.5) * float(model.dy)
        zc = np.ones(model.Nz)
        u = amp * np.sin(np.pi * xf / Lx)[None, :, None] * np.cos(np.pi * yc / Ly)[:, None, None] * zc
        v = -amp * np.cos(np.pi * xc / Lx)[None, :, None] * np.sin(np.pi * yf / Ly)[:, None, None] * zc
        T = 10.0 + 8.0 * (np.arange(model.Nz) + 0.5) / model.Nz * np.ones((model.Ny, model.Nx, 1))
        return DoubleGyreState(
            u=jnp.asarray(u, jnp.float64), v=jnp.asarray(v, jnp.float64),
            T=jnp.asarray(T, jnp.float64), eta=jnp.zeros((model.Ny, model.Nx), jnp.float64),
        )

    def _operator_error(self, N):
        from climateparameterizations_jl_tpu.embed.double_gyre import (
            DoubleGyreModel,
            _u_advection_weno,
            vertical_velocity,
        )

        model = DoubleGyreModel.default(Nx=N, Ny=N, Nz=4, dtype=jnp.float64)
        state = self._smooth_state(model)
        w = vertical_velocity(model, state.u, state.v)
        adv = np.asarray(_u_advection_weno(model, state.u, state.v, w))
        # Analytic flux divergence of u for psi = (A L / pi) sin(pi x/L) sin(pi y/L)
        # (divergence-free, square basin): adv_u = A^2 k sin(kx) cos(kx), k = pi/L.
        A, L = 0.5, float(model.Lx)
        k = np.pi / L
        xf = np.arange(1, model.Nx) * float(model.dx)  # interior u faces
        exact = (A * A * k * np.sin(k * xf) * np.cos(k * xf))[None, :, None]
        err = np.abs(adv - exact)
        m = 3  # clear the edge-padded WENO stencils at the walls
        return err[m:-m, m:-m, :].max()

    def test_weno_operator_converges_to_analytic_advection(self):
        """The flux-form WENO5 u-advection divergence converges to the
        analytic advection of a smooth divergence-free flow at ~2nd order
        (limited by the advecting-velocity interpolation). A misaligned
        face indexing leaves an O(h) error and fails the ratio."""
        e16 = self._operator_error(16)
        e32 = self._operator_error(32)
        assert e32 < e16 / 3.0, (e16, e32)

    def test_weno5_default_and_unknown_raises(self):
        from climateparameterizations_jl_tpu.embed.double_gyre import (
            DoubleGyreModel,
            DoubleGyreState,
            double_gyre_step,
        )

        assert DoubleGyreModel.default(Nx=8, Ny=8, Nz=4).momentum_advection == "weno5"
        model = DoubleGyreModel.default(Nx=8, Ny=8, Nz=4, momentum_advection="WENO5")
        with pytest.raises(ValueError, match="momentum advection"):
            double_gyre_step(model, DoubleGyreState.rest(model), 600.0)


class TestSverdrupBalance:
    def test_linear_gyre_transport_matches_sverdrup(self):
        """Golden physics: after barotropic spin-up the linear double gyre
        carries ~the Sverdrup transport ``psi_max = curl(tau)_max Lx / beta``
        (exceeding it somewhat in the western boundary current), with two
        counter-rotating cells."""
        from climateparameterizations_jl_tpu.embed.double_gyre import (
            DoubleGyreModel,
            DoubleGyreState,
            barotropic_streamfunction,
            run_double_gyre,
        )

        model = DoubleGyreModel.default(Nx=24, Ny=24, Nz=4, linear_momentum=True)
        traj = run_double_gyre(model, DoubleGyreState.rest(model), 3600.0, n_save=2, save_every=480)
        psi = np.asarray(barotropic_streamfunction(model, traj.u[-1]))
        sverdrup = float(model.tau0) * 2 * np.pi / float(model.Ly) * float(model.Lx) / float(model.beta)
        # Measured: +44 / -48 Sv vs 42 Sv Sverdrup at this resolution.
        assert 0.7 < psi.max() / sverdrup < 1.5, (psi.max(), sverdrup)
        assert 0.7 < -psi.min() / sverdrup < 1.5, (psi.min(), sverdrup)


class TestInternalWaveStability:
    def test_forward_backward_pressure_coupling_is_stable(self):
        """Regression: internal gravity waves must not self-amplify.

        With the hydrostatic pressure computed from the *old* temperature
        (both halves of the baroclinic oscillation forward Euler), grid-scale
        internal waves amplify ~sqrt(1 + (omega dt)^2) per step; at the
        production 40 km spacing (omega dt ~ 0.4) a Gaussian T anomaly NaNs
        this exact scenario within 600 steps, and the reference-exact
        96x96x32 30-day gyre (``double_gyre.jl:181-183`` runs 2 *years*)
        blew up at day ~18. The forward-backward coupling (tracer step first,
        momentum sees the updated pressure) is neutrally stable to
        omega dt <= 2: the anomaly's wave field must decay, not grow.
        """
        from climateparameterizations_jl_tpu.embed.double_gyre import (
            DoubleGyreModel,
            DoubleGyreState,
            double_gyre_step,
        )

        model = DoubleGyreModel.default(
            Nx=16, Ny=16, Nz=8, Lx=0.64e6, Ly=0.64e6, tau0=0.0, t_restore=1e12
        )
        rest = DoubleGyreState.rest(model)
        z = (jnp.arange(8, dtype=jnp.float32) + 0.5) / 8.0
        x = jnp.arange(16, dtype=jnp.float32) - 8.0
        bump = jnp.exp(-(x[None, :, None] ** 2 + x[:, None, None] ** 2) / 8.0)
        T = 2.0 + 20.0 * z[None, None, :] + bump
        state = dataclasses.replace(rest, T=jnp.broadcast_to(T, rest.T.shape).astype(jnp.float32))

        step = jax.jit(lambda s: double_gyre_step(model, s, 1800.0))
        peak = 0.0
        for i in range(900):
            state = step(state)
            if i == 299:
                peak = float(jnp.abs(state.u).max())
        assert bool(jnp.isfinite(state.T).all()), "temperature went non-finite"
        final = float(jnp.abs(state.u).max())
        # Measured: 0.082 -> 0.040 fixed; 0.126 -> NaN with forward-Euler coupling.
        assert final < peak, (peak, final)
        assert final < 0.1, final


class TestDispatchChunking:
    def test_step_capped_dispatch_matches_one_shot(self):
        """The host-chunked dispatch (both caps: frames per dispatch and
        steps per dispatch, incl. splitting a single save interval into
        sub-dispatches) must reproduce the one-shot trajectory exactly —
        the 20-year reference run (good_double_gyre.jl, 5,840 steps per
        saved frame) exceeds the tunnel watchdog unless the STEP count per
        device program is capped, not just the frame count."""
        from climateparameterizations_jl_tpu.embed.double_gyre import (
            DoubleGyreModel,
            DoubleGyreState,
            run_double_gyre,
        )

        model = DoubleGyreModel.default(Nx=12, Ny=12, Nz=4)
        s0 = DoubleGyreState.rest(model)
        ref = run_double_gyre(model, s0, 1800.0, n_save=3, save_every=10)
        # frames cap only
        a = run_double_gyre(model, s0, 1800.0, n_save=3, save_every=10, max_frames_per_dispatch=1)
        # step cap forcing sub-frame dispatches (10 steps/frame, cap 3 -> 4 sub-dispatches)
        b = run_double_gyre(model, s0, 1800.0, n_save=3, save_every=10, max_steps_per_dispatch=3)
        for f in ("u", "v", "T", "eta"):
            # Frame-chunked dispatch reuses the identical interval program:
            # bitwise equal.
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f)), np.asarray(getattr(ref, f)), err_msg=f"frames:{f}"
            )
            # Sub-frame splitting compiles different scan lengths — XLA may
            # fuse/FMA differently, so equivalence is to f32 ulp, not bitwise.
            np.testing.assert_allclose(
                np.asarray(getattr(b, f)), np.asarray(getattr(ref, f)),
                rtol=1e-5, atol=1e-6, err_msg=f"steps:{f}"
            )


def test_host_nn_dimensionalization_follows_training_mode():
    """Regression: the embedded column must dimensionalize wind-mixing NN
    outputs by the TRAINING convention — affine (sigma*y + mu) for
    zero_weights=False models, not always the linear flux/sigma form
    keyed on nn_input. A zero-output NN makes the difference exact: affine
    faces carry mu, linear faces are zero."""
    from climateparameterizations_jl_tpu.closures.mlp import MLP
    from climateparameterizations_jl_tpu.embed.column_model import _nn_flux_faces
    from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs

    base = make_host_model()
    model = dataclasses.replace(
        base,
        scalings=dataclasses.replace(base.scalings, wT=_scaling(3e-6, 1e-5)),
    )
    mu = float(model.scalings.wT.mu)
    assert mu != 0.0
    Nz = model.Nz
    zero_nn = MLP(
        weights=(jnp.zeros((Nz - 1, 3 * Nz), jnp.float32),),
        biases=(jnp.zeros(Nz - 1, jnp.float32),),
    )
    nns = FluxNNs(uw=None, vw=None, wT=zero_nn)
    state = stratified_state(Nz=Nz)

    lin = dataclasses.replace(model, nn_dimensionalize="linear")
    aff = dataclasses.replace(model, nn_dimensionalize="affine")
    _, _, wT_lin = _nn_flux_faces(lin, nns, state)
    _, _, wT_aff = _nn_flux_faces(aff, nns, state)
    np.testing.assert_allclose(np.asarray(wT_lin[..., 1:-1]), 0.0)
    np.testing.assert_allclose(np.asarray(wT_aff[..., 1:-1]), mu, rtol=1e-6)

    # diagnose_nn_heat_flux must report the flux AS APPLIED — same
    # convention, not an unconditional affine unscale.
    from climateparameterizations_jl_tpu.embed.column_model import diagnose_nn_heat_flux

    lin_T = dataclasses.replace(lin, nn_input="T")
    aff_T = dataclasses.replace(aff, nn_input="T")
    zero_nn_T = MLP(
        weights=(jnp.zeros((Nz - 1, Nz), jnp.float32),),
        biases=(jnp.zeros(Nz - 1, jnp.float32),),
    )
    nns_T = FluxNNs(uw=None, vw=None, wT=zero_nn_T)
    wT_diag_lin = diagnose_nn_heat_flux(lin_T, nns_T, state.T)
    wT_diag_aff = diagnose_nn_heat_flux(aff_T, nns_T, state.T)
    np.testing.assert_allclose(np.asarray(wT_diag_lin[..., 1:-1]), 0.0)
    np.testing.assert_allclose(np.asarray(wT_diag_aff[..., 1:-1]), mu, rtol=1e-6)
