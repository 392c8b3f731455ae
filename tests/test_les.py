"""3-D LES data-generator tests: projection, conservation, physics, output."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climateparameterizations_jl_tpu.data.containers import ColumnTimeSeries, coarsen_dataset
from climateparameterizations_jl_tpu.data.les import (
    LESConfig,
    LESState,
    _divergence,
    _poisson_solve,
    initial_state,
    les_step,
    run_les,
    stable_dt,
)

f32 = jnp.float32


def small_config(**overrides):
    kw = dict(Nx=8, Ny=8, Nz=16, dtype=jnp.float64)
    kw.update(overrides)
    return LESConfig.default(**kw)


class TestPoisson:
    def test_inverts_discrete_laplacian(self):
        """poisson(laplacian(p)) == p (up to the pinned constant)."""
        c = small_config()
        rng = np.random.default_rng(0)
        p = jnp.asarray(rng.normal(size=(c.Ny, c.Nx, c.Nz)))
        p = p - jnp.mean(p)

        # Apply the discrete MAC laplacian: div(grad(p)).
        from climateparameterizations_jl_tpu.data.les import _xm, _xp, _ym, _yp

        gx = (p - _xm(p)) / c.dx
        gy = (p - _ym(p)) / c.dy
        gz_int = (p[..., 1:] - p[..., :-1]) / c.dz
        zeros = jnp.zeros_like(p[..., :1])
        gz = jnp.concatenate([zeros, gz_int, zeros], axis=-1)
        lap = _divergence(c, gx, gy, gz)

        p_rec = _poisson_solve(c, lap)
        # Equal up to an additive constant (the pinned gauge).
        diff = np.asarray(p_rec - p)
        np.testing.assert_allclose(diff - diff.mean(), 0.0, atol=1e-8)

    def test_projection_kills_divergence(self):
        c = small_config()
        key = jax.random.PRNGKey(1)
        state = initial_state(c, key, noise=1e-2)
        # Random (divergent) velocity field.
        k1, k2, k3 = jax.random.split(key, 3)
        state = LESState(
            u=0.01 * jax.random.normal(k1, state.u.shape, state.u.dtype),
            v=0.01 * jax.random.normal(k2, state.v.shape, state.v.dtype),
            w=state.w.at[..., 1:-1].set(0.01 * jax.random.normal(k3, state.w[..., 1:-1].shape, state.w.dtype)),
            T=state.T,
        )
        new = les_step(c, state, dt=1.0)
        div = np.asarray(_divergence(c, new.u, new.v, new.w))
        assert np.max(np.abs(div)) < 1e-10


class TestLESPhysics:
    def test_rest_state_stays_at_rest(self):
        """No forcing + no noise: the stratified rest state stays still.

        Velocities stay exactly zero (buoyancy is fully absorbed by the
        projection); T is steady everywhere except the top cell, which
        diffuses molecularly under the zero-flux lid (the bottom cell is
        held steady by the fixed-gradient BC).
        """
        c = small_config(Qu=0.0, Qb=0.0)
        state = initial_state(c, noise=0.0)
        out = state
        for _ in range(5):
            out = les_step(c, out, dt=30.0)
        assert float(jnp.max(jnp.abs(out.u))) < 1e-10
        assert float(jnp.max(jnp.abs(out.w))) < 1e-10
        np.testing.assert_allclose(
            np.asarray(out.T[..., :-1]), np.asarray(state.T[..., :-1]), atol=1e-9
        )
        # Top cell cools at the molecular rate nu * dTdz / dz.
        expected_drop = float(c.nu * c.dTdz / c.dz) * 5 * 30.0
        drop = float(jnp.mean(state.T[..., -1] - out.T[..., -1]))
        np.testing.assert_allclose(drop, expected_drop, rtol=1e-4)

    def test_heat_budget(self):
        """Total heat change == surface-flux loss + bottom-gradient outflux."""
        c = small_config(Qu=0.0, Qb=3e-8)
        state = initial_state(c, noise=0.0)
        n, dt = 20, 30.0
        out = state
        for _ in range(n):
            out = les_step(c, out, dt=dt)
        dz = float(c.dz)
        heat0 = float(jnp.mean(jnp.sum(state.T, axis=-1), axis=(0, 1))) * dz
        heat1 = float(jnp.mean(jnp.sum(out.T, axis=-1), axis=(0, 1))) * dz
        expected = -(float(c.theta_top) + float(c.nu * c.dTdz)) * n * dt
        assert abs((heat1 - heat0) - expected) < 5e-3 * abs(expected) + 1e-12

    def test_momentum_budget(self):
        """f=0, Cs=0: total u-momentum change == -Qu * t exactly.

        Flux-form advection on the periodic MAC grid conserves momentum;
        the projection's pressure gradient has zero horizontal mean; only
        the imposed surface stress changes the budget.
        """
        c = small_config(Qu=-3e-4, Qb=0.0, f=jnp.float64(0.0), Cs=jnp.float64(0.0))
        state = initial_state(c, jax.random.PRNGKey(5), noise=1e-3)
        n, dt = 15, 20.0
        out = state
        for _ in range(n):
            out = les_step(c, out, dt=dt)
        dz = float(c.dz)
        mom0 = float(jnp.mean(jnp.sum(state.u, axis=-1))) * dz
        mom1 = float(jnp.mean(jnp.sum(out.u, axis=-1))) * dz
        expected = -float(c.Qu) * n * dt
        np.testing.assert_allclose(mom1 - mom0, expected, rtol=1e-10)

    def test_convection_mixes_surface(self):
        """Surface cooling: a mixed layer forms (unstable near-surface gradient removed)."""
        c = small_config(Nz=16, Qu=0.0, Qb=2e-7, nu=1e-4)
        dt = stable_dt(c, u_max=0.05)
        ds = run_les(c, dt=dt, n_save=4, save_every=40, key=jax.random.PRNGKey(2))
        T0, T1 = np.asarray(ds.T[0]), np.asarray(ds.T[-1])
        assert np.all(np.isfinite(T1))
        # Cooling removed heat overall.
        assert T1.sum() < T0.sum()
        # The top of the column cooled the most.
        assert (T0 - T1)[-4:].mean() > (T0 - T1)[:4].mean()


class TestAdvectionDispatch:
    def test_unknown_scheme_raises(self):
        """A typo'd scheme must not silently run centered advection."""
        c = small_config(advection="weno")  # typo for "weno5"
        state = initial_state(c, noise=0.0)
        from climateparameterizations_jl_tpu.data.les import les_step

        with pytest.raises(ValueError, match="advection"):
            les_step(c, state, 1.0)

    def test_gyre_unknown_scheme_raises(self):
        from climateparameterizations_jl_tpu.embed.double_gyre import (
            DoubleGyreModel,
            DoubleGyreState,
            double_gyre_step,
        )

        model = DoubleGyreModel.default(Nx=8, Ny=8, Nz=4, advection="WENO5")  # case slip
        state = DoubleGyreState.rest(model)
        with pytest.raises(ValueError, match="advection"):
            double_gyre_step(model, state, 1800.0)


class TestMomentumAdvection:
    """WENO5 flux-form momentum vs the 2nd-order centered scheme."""

    def _smooth_state(self, c, amp=0.05):
        """Divergence-free smooth velocity field on the MAC grid (z-independent
        horizontal streamfunction flow, so w stays 0) + stratified T."""
        kx = 2 * np.pi / float(c.Lx)
        ky = 2 * np.pi / float(c.Ly)
        # u = d(psi)/dy, v = -d(psi)/dx with psi = (amp/k) sin(kx x) sin(ky y):
        # analytically divergence-free; on the MAC grid the discrete
        # divergence of the exact samples is O(h^2) which the projection in
        # les_step would remove — the tendencies here are evaluated raw.
        xf = np.arange(c.Nx) * float(c.dx)
        xc = xf + 0.5 * float(c.dx)
        yf = np.arange(c.Ny) * float(c.dy)
        yc = yf + 0.5 * float(c.dy)
        zc = (np.arange(c.Nz) + 0.5) * float(c.dz)
        u = amp * np.sin(kx * xf)[None, :, None] * np.cos(ky * yc)[:, None, None] * np.ones_like(zc)
        v = -amp * np.cos(kx * xc)[None, :, None] * np.sin(ky * yf)[:, None, None] * np.ones_like(zc)
        w = np.zeros((c.Ny, c.Nx, c.Nz + 1))
        T = np.asarray(19.0 + 0.01 * (zc - float(c.H)))[None, None, :] * np.ones((c.Ny, c.Nx, 1))
        dt = np.float64 if c.T_surface.dtype == jnp.float64 else np.float32
        return LESState(u=jnp.asarray(u, dt), v=jnp.asarray(v, dt), w=jnp.asarray(w, dt), T=jnp.asarray(T, dt))

    def _tendency_diff(self, N):
        from climateparameterizations_jl_tpu.data.les import _tendencies

        diffs = []
        for scheme in ("centered", "weno5"):
            c = small_config(Nx=N, Ny=N, Nz=8, momentum_advection=scheme)
            out = _tendencies(c, self._smooth_state(c), 0.0)
            diffs.append(out)
        du = np.asarray(diffs[0][0] - diffs[1][0])
        dv = np.asarray(diffs[0][1] - diffs[1][1])
        return max(np.abs(du).max(), np.abs(dv).max())

    def test_uniform_flow_identical_tendencies(self):
        """Advection of a uniform flow is exactly zero for both schemes, so
        the full tendencies must agree to roundoff (alignment guard: an
        off-by-one stencil shift would advect the uniform field)."""
        from climateparameterizations_jl_tpu.data.les import _tendencies

        outs = []
        for scheme in ("centered", "weno5"):
            c = small_config(momentum_advection=scheme)
            state = LESState(
                u=jnp.full((8, 8, 16), 0.05, jnp.float64),
                v=jnp.full((8, 8, 16), -0.03, jnp.float64),
                w=jnp.zeros((8, 8, 17), jnp.float64),
                T=jnp.broadcast_to(
                    19.0 + 0.01 * (jnp.arange(16, dtype=jnp.float64) + 0.5) * c.dz, (8, 8, 16)
                ),
            )
            outs.append(_tendencies(c, state, 0.0))
        for a, b in zip(outs[0][:3], outs[1][:3]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)

    def test_smooth_field_schemes_converge_together(self):
        """On a smooth flow the WENO5 and centered tendencies differ by the
        centered scheme's O(h^2) truncation: refining the grid 2x must
        shrink the difference ~4x. A misaligned WENO stencil (off-by-one
        face indexing) leaves an O(1)/O(h) difference and fails this."""
        d8 = self._tendency_diff(8)
        d16 = self._tendency_diff(16)
        assert d16 < d8 / 3.0, (d8, d16)

    def test_weno5_momentum_step_runs_finite(self):
        c = small_config(momentum_advection="weno5", Qu=-5e-4, Qb=3e-8)
        state = initial_state(c, key=jax.random.PRNGKey(0))
        dt = stable_dt(c)
        for _ in range(4):
            state = les_step(c, state, dt)
        assert bool(jnp.isfinite(state.T).all() and jnp.isfinite(state.u).all())

    def test_unknown_momentum_scheme_raises(self):
        c = small_config(momentum_advection="weno")
        with pytest.raises(ValueError, match="momentum advection"):
            les_step(c, initial_state(c, noise=0.0), 1.0)


class TestLESOutput:
    @pytest.fixture(scope="class")
    def dataset(self):
        c = small_config(Nz=32, Qu=-2e-4, Qb=1e-8, nu=1e-4)
        dt = stable_dt(c, u_max=0.05)
        return run_les(c, dt=dt, n_save=6, save_every=25, key=jax.random.PRNGKey(3))

    def test_column_time_series_contract(self, dataset):
        ds = dataset
        assert isinstance(ds, ColumnTimeSeries)
        assert ds.T.shape == (7, 32)
        assert ds.wT.shape == (7, 33)
        assert ds.t.shape == (7,)
        for name in ("u", "v", "T", "uw", "vw", "wT"):
            assert np.all(np.isfinite(np.asarray(getattr(ds, name)))), name

    def test_boundary_fluxes_imposed(self, dataset):
        ds = dataset
        np.testing.assert_allclose(np.asarray(ds.uw[:, -1]), float(ds.u_top), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ds.wT[:, -1]), float(ds.theta_top), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(ds.uw[:, 0]), 0.0, atol=1e-12)

    def test_wind_accelerates_surface_current(self, dataset):
        # Qu < 0: eastward surface current spins up.
        ds = dataset
        assert float(ds.u[-1, -1]) > 0.0

    def test_coarsens_into_pipeline(self, dataset):
        coarse = coarsen_dataset(dataset, 16)
        assert coarse.T.shape == (7, 16)
        assert coarse.wT.shape == (7, 17)
        # Coarse-graining preserves the column mean.
        np.testing.assert_allclose(
            np.asarray(coarse.T.mean(axis=-1)), np.asarray(dataset.T.mean(axis=-1)), rtol=1e-6
        )


class TestRegistryLESSource:
    def test_catalog_entry_generates_via_les3d(self):
        """source='les3d': a catalog name drives the 3-D LES generator."""
        from climateparameterizations_jl_tpu.data.registry import load_simulation

        ds = load_simulation("strong_wind", Nz_les=12, n_save=2, dt_save=60.0, source="les3d")
        assert ds.T.shape == (3, 12)
        assert np.all(np.isfinite(np.asarray(ds.T)))
        assert float(ds.u_top) < 0.0  # signed kinematic momentum flux


class TestLESAnimation:
    def test_slice_animation_writes_gif(self, tmp_path):
        import os

        from climateparameterizations_jl_tpu.eval.animations import animate_les_slices

        c = small_config(Nz=8)
        state = initial_state(c, jax.random.PRNGKey(7), noise=1e-2)
        frames_T, frames_w = [state.T], [state.w]
        out = state
        for _ in range(2):
            out = les_step(c, out, dt=20.0)
            frames_T.append(out.T)
            frames_w.append(out.w)
        p = animate_les_slices(jnp.stack(frames_T), jnp.stack(frames_w), float(c.H), str(tmp_path / "les.gif"))
        assert os.path.getsize(p) > 0

    def test_3d_isotherm_animation_writes_gif(self, tmp_path):
        import os

        from climateparameterizations_jl_tpu.eval.animations import animate_les_3d

        c = small_config(Nz=8)
        state = initial_state(c, jax.random.PRNGKey(7), noise=1e-2)
        frames_T = [state.T, les_step(c, state, dt=20.0).T]
        p = animate_les_3d(jnp.stack(frames_T), float(c.H), str(tmp_path / "les3d.gif"))
        assert os.path.getsize(p) > 0


class TestRK3:
    def test_rk3_divergence_free_and_consistent(self):
        """RK3 keeps the field divergence-free and converges to Euler as dt->0."""
        c = small_config()
        state = initial_state(c, jax.random.PRNGKey(9), noise=1e-2)
        out3 = les_step(c, state, dt=10.0, method="rk3")
        div = np.asarray(_divergence(c, out3.u, out3.v, out3.w))
        assert np.max(np.abs(div)) < 1e-10
        # Small-dt consistency: RK3 and Euler agree to O(dt^2).
        dt = 0.5
        e = les_step(c, state, dt=dt, method="euler")
        r = les_step(c, state, dt=dt, method="rk3")
        assert float(jnp.max(jnp.abs(e.T - r.T))) < 1e-6

    def test_rk3_stable_at_higher_cfl(self):
        """Convection run at CFL beyond Euler's comfort zone stays finite."""
        c = small_config(Nz=16, Qu=-5e-4, Qb=2e-7, nu=1e-5)
        dt = stable_dt(c, u_max=0.05, cfl=0.6)
        ds = run_les(c, dt=dt, n_save=3, save_every=30, key=jax.random.PRNGKey(10), method="rk3")
        assert np.all(np.isfinite(np.asarray(ds.T)))
        assert np.all(np.isfinite(np.asarray(ds.wT)))


class TestDiurnalLES:
    def test_diurnal_flux_cycles(self):
        from climateparameterizations_jl_tpu.data.les import surface_theta_flux

        c = small_config(Qb=5e-8, diurnal=True)
        q0 = float(surface_theta_flux(c, jnp.asarray(0.0)))
        q_quarter = float(surface_theta_flux(c, jnp.asarray(86400.0 / 4)))
        q_half = float(surface_theta_flux(c, jnp.asarray(86400.0 / 2)))
        assert abs(q0) < 1e-18
        np.testing.assert_allclose(q_quarter, float(c.theta_top), rtol=1e-6)
        assert abs(q_half) < 1e-12 * abs(q_quarter) + 1e-18

    def test_diurnal_catalog_entry_via_les3d(self):
        from climateparameterizations_jl_tpu.data.registry import load_simulation

        ds = load_simulation("wind_-5e-4_diurnal_5e-8", Nz_les=10, n_save=2, dt_save=60.0, source="les3d")
        assert np.all(np.isfinite(np.asarray(ds.T)))
        # The recorded surface wT follows the cycle, not a constant flux.
        wt_top = np.asarray(ds.wT[:, -1])
        assert abs(wt_top[0]) < 1e-12
        assert not np.allclose(wt_top[1:], wt_top[0])


class TestJLD2RoundTrip:
    def test_write_then_read(self, tmp_path):
        """write_les_profiles -> read_les_profiles round-trips the dataset."""
        import pytest as _pytest

        from climateparameterizations_jl_tpu.data.lesbrary import (
            HAVE_H5PY,
            read_les_profiles,
            write_les_profiles,
        )

        if not HAVE_H5PY:
            _pytest.skip("h5py not available")
        c = small_config(Nz=12)
        ds = run_les(c, dt=20.0, n_save=3, save_every=5, key=jax.random.PRNGKey(11))
        path = str(tmp_path / "gen.jld2")
        write_les_profiles(path, ds)
        back = read_les_profiles(path)
        np.testing.assert_allclose(np.asarray(back.T), np.asarray(ds.T), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(back.wT), np.asarray(ds.wT), rtol=1e-6, atol=1e-12)
        np.testing.assert_allclose(np.asarray(back.t), np.asarray(ds.t), rtol=1e-6)
        np.testing.assert_allclose(float(back.theta_top), float(ds.theta_top), rtol=1e-5)
        np.testing.assert_allclose(float(back.u_top), float(ds.u_top), rtol=1e-6)
        np.testing.assert_allclose(float(back.H), float(ds.H), rtol=1e-12)


class TestShardedLES:
    def test_matches_unsharded_step(self):
        """y-sharded jitted step == single-device step (GSPMD halos exact)."""
        from climateparameterizations_jl_tpu.parallel.les_sharding import (
            make_les_mesh,
            make_sharded_les_stepper,
            shard_les_state,
        )

        c = LESConfig.default(Nx=8, Ny=16, Nz=12, dtype=jnp.float32)
        state = initial_state(c, jax.random.PRNGKey(12), noise=1e-2)
        dt = 20.0

        ref = state
        for k in range(3):
            ref = les_step(c, ref, dt, "rk3", t=k * dt)

        mesh = make_les_mesh(8)
        step = make_sharded_les_stepper(c, mesh, dt, method="rk3", n_substeps=3)
        with mesh:
            out = step(shard_les_state(state, mesh), jnp.float32(0.0))
            jax.block_until_ready(out.T)

        np.testing.assert_allclose(np.asarray(out.T), np.asarray(ref.T), rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.u), np.asarray(ref.u), rtol=2e-5, atol=1e-7)
        # Output really is y-sharded across the 8 devices.
        assert len(out.T.sharding.device_set) == 8

    def test_rejects_indivisible_ny(self):
        from climateparameterizations_jl_tpu.parallel.les_sharding import (
            make_les_mesh,
            make_sharded_les_stepper,
        )

        c = LESConfig.default(Nx=8, Ny=12, Nz=8)
        with np.testing.assert_raises(ValueError):
            make_sharded_les_stepper(c, make_les_mesh(8), 10.0)


class TestDispatchStepCap:
    def test_step_capped_dispatch_matches_default(self):
        """Sub-frame dispatch (save interval split across device programs,
        for big grids whose frames each run seconds) must reproduce the
        one-shot trajectory to f32 ulp; frame-chunked dispatch exactly."""
        c = small_config(Nz=8, Qu=-1e-4, Qb=1e-7)
        dt = stable_dt(c, u_max=0.05)
        kw = dict(dt=dt, n_save=3, save_every=10, key=jax.random.PRNGKey(5))
        ref = run_les(c, **kw)
        a = run_les(c, max_frames_per_dispatch=1, **kw)
        b = run_les(c, max_steps_per_dispatch=3, **kw)
        for f in ("u", "v", "T", "uw", "vw", "wT"):
            np.testing.assert_array_equal(
                np.asarray(getattr(a, f)), np.asarray(getattr(ref, f)), err_msg=f"frames:{f}")
            np.testing.assert_allclose(
                np.asarray(getattr(b, f)), np.asarray(getattr(ref, f)),
                rtol=1e-5, atol=1e-7, err_msg=f"steps:{f}")


def test_dispatch_plan_arithmetic():
    from climateparameterizations_jl_tpu.utils.dispatch import dispatch_plan

    # Frames mode: cap in frames and in steps both bind.
    kind, chunk = dispatch_plan(100, 10, n_cells=1, max_frames_per_dispatch=256, max_steps_per_dispatch=35)
    assert kind == "frames" and chunk == 3  # 35 // 10
    # Sub-frame mode: one interval over the cap splits exactly.
    kind, subs = dispatch_plan(5, 10, n_cells=1, max_steps_per_dispatch=3)
    assert kind == "subframe" and sum(subs) == 10 and max(subs) <= 3, subs
    # Grid-derived default: bigger grids get shorter dispatches.
    k1, c1 = dispatch_plan(10, 100, n_cells=10**6)
    k2, c2 = dispatch_plan(10, 100, n_cells=10**8)
    assert k1 == "frames" and k2 == "frames" and c1 >= c2
