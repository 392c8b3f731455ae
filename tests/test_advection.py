"""WENO5 advection: accuracy order, monotonicity, and gyre/LES A/B.

Parity: the reference advects with Oceananigans WENO5 in the double gyre
(``free_convection/double_gyre.jl:60-196``) and the LES generator
(``wind_mixing/wind_mixing.jl``); VERDICT r1 item 8.
"""

import jax.numpy as jnp
import numpy as np

from climateparameterizations_jl_tpu.core.advection import (
    weno5_advective_flux,
    weno5_face_values,
)


def advect_periodic(q0, u, dx, dt, n_steps, scheme="weno5"):
    """1-D constant-velocity advection, RK3-SSP, periodic."""
    import jax

    def rhs(q):
        if scheme == "weno5":
            u_face = jnp.full(q.shape, u, q.dtype)
            F = weno5_advective_flux(u_face, q, axis=0, boundary="periodic")
        else:  # centered 2nd order; face k between cells k-1 and k
            F = u * 0.5 * (q + jnp.roll(q, 1))
        return -(jnp.roll(F, -1) - F) / dx

    @jax.jit
    def step(q):
        q1 = q + dt * rhs(q)
        q2 = 0.75 * q + 0.25 * (q1 + dt * rhs(q1))
        return q / 3.0 + 2.0 / 3.0 * (q2 + dt * rhs(q2))

    q = q0
    for _ in range(n_steps):
        q = step(q)
    return q


class TestWENO5Reconstruction:
    def test_exact_for_constant_and_linear(self):
        """Any consistent reconstruction reproduces constants exactly; the
        optimal-weight combination reproduces smooth linear data to f64
        roundoff away from the eps-regularized weights."""
        q = jnp.full(16, 3.5, jnp.float64)
        qL, qR = weno5_face_values(q, boundary="periodic")
        np.testing.assert_allclose(np.asarray(qL), 3.5, rtol=1e-14)
        np.testing.assert_allclose(np.asarray(qR), 3.5, rtol=1e-14)

        x = jnp.arange(16, dtype=jnp.float64)
        qL, _ = weno5_face_values(x, boundary="edge")
        # Interior faces exact; the two faces nearest each wall use
        # edge-clamped ghosts and legitimately degrade.
        np.testing.assert_allclose(np.asarray(qL)[2:-2], np.arange(15)[2:-2] + 0.5, atol=1e-10)

    @staticmethod
    def _cell_averages(n):
        """Exact cell averages of sin(2 pi x) on n cells of [0, 1] — the
        reconstruction's input contract is averages, not point samples."""
        edges = np.arange(n + 1) / n
        avg = (np.cos(2 * np.pi * edges[:-1]) - np.cos(2 * np.pi * edges[1:])) / (2 * np.pi / n)
        return jnp.asarray(avg, jnp.float64)

    def test_face_convention_periodic(self):
        """Periodic face k sits between cells k-1 and k (MAC u convention)."""
        n = 32
        qL, qR = weno5_face_values(self._cell_averages(n), boundary="periodic")
        truth = np.sin(2 * np.pi * np.arange(n) / n)
        np.testing.assert_allclose(np.asarray(qL), truth, atol=2e-5)
        np.testing.assert_allclose(np.asarray(qR), truth, atol=2e-5)

    def test_high_order_convergence(self):
        """Smooth cell-average reconstruction error drops ~2^5 per doubling
        (WENO-Z holds the formal order at the sine's critical points)."""
        errs = []
        for n in (32, 64, 128):
            qL, _ = weno5_face_values(self._cell_averages(n), boundary="periodic")
            truth = np.sin(2 * np.pi * np.arange(n) / n)
            errs.append(float(np.max(np.abs(np.asarray(qL) - truth))))
        r1, r2 = errs[0] / errs[1], errs[1] / errs[2]
        assert r1 > 16 and r2 > 16, errs  # >= ~4th order measured; 5th formal


class TestWENO5Advection:
    def test_advects_sine_accurately(self):
        n, u = 64, 1.0
        dx = 1.0 / n
        x = (np.arange(n) + 0.5) * dx
        q0 = jnp.asarray(np.sin(2 * np.pi * x), jnp.float64)
        dt = 0.2 * dx
        n_steps = int(round(1.0 / (u * dt)))  # one full period
        q = advect_periodic(q0, u, dx, dt, n_steps, "weno5")
        err = float(np.max(np.abs(np.asarray(q - q0))))
        assert err < 5e-4, err

    def test_monotone_at_front_where_centered_oscillates(self):
        """Square-wave advection: WENO5 stays essentially monotone while the
        centered scheme rings — the front-sharpness A/B of VERDICT item 8."""
        n, u = 128, 1.0
        dx = 1.0 / n
        x = (np.arange(n) + 0.5) * dx
        q0 = jnp.asarray(((x > 0.25) & (x < 0.75)).astype(np.float64))
        dt = 0.2 * dx
        steps = int(round(0.25 / (u * dt)))
        q_weno = np.asarray(advect_periodic(q0, u, dx, dt, steps, "weno5"))
        q_cent = np.asarray(advect_periodic(q0, u, dx, dt, steps, "centered"))
        over_weno = max(q_weno.max() - 1.0, -q_weno.min())
        over_cent = max(q_cent.max() - 1.0, -q_cent.min())
        assert over_weno < 1e-2, over_weno
        assert over_cent > 0.1, over_cent  # centered rings hard at the jump
        # And the WENO front is at least as sharp (10-90% width in cells).
        def width(q):
            inside = np.where((q > 0.1) & (q < 0.9))[0]
            return len(inside)

        assert width(q_weno) <= width(q_cent)


class TestGyreWithWENO:
    def test_default_is_weno_and_golden_budget_holds(self):
        """The gyre's heat budget / stream-function goldens must hold under
        the new default scheme; centered stays available for A/B."""
        import jax

        from climateparameterizations_jl_tpu.embed.double_gyre import (
            DoubleGyreModel,
            DoubleGyreState,
            double_gyre_step,
        )

        model = DoubleGyreModel.default(Nx=24, Ny=24, Nz=8)
        assert model.advection == "weno5"
        state = DoubleGyreState.rest(model)
        T0 = np.asarray(state.T)
        dt = 1800.0
        step = jax.jit(lambda s: double_gyre_step(model, s, dt))
        for _ in range(48):  # one day
            state = step(state)
        T = np.asarray(state.T)
        assert np.isfinite(T).all()
        # Essentially-non-oscillatory: no new extrema beyond the initial
        # range (restoring/diffusion only pull inward; measured: WENO holds
        # the minimum EXACTLY where centered undershoots it).
        assert T.max() <= T0.max() + 0.01 and T.min() >= T0.min() - 0.01

    def test_weno_vs_centered_same_largescale_circulation(self):
        import jax

        from climateparameterizations_jl_tpu.embed.double_gyre import (
            DoubleGyreModel,
            DoubleGyreState,
            double_gyre_step,
        )

        final = {}
        for scheme in ("weno5", "centered"):
            model = DoubleGyreModel.default(Nx=16, Ny=16, Nz=6, advection=scheme)
            state = DoubleGyreState.rest(model)
            step = jax.jit(lambda s, m=model: double_gyre_step(m, s, 1800.0))
            for _ in range(24):
                state = step(state)
            final[scheme] = np.asarray(state.T)
        # Same large-scale field this early in spin-up (schemes differ at
        # fronts, not in the basin mean).
        assert np.allclose(final["weno5"].mean(), final["centered"].mean(), rtol=1e-4)
        assert np.max(np.abs(final["weno5"] - final["centered"])) < 0.2


class TestLESWithWENO:
    def test_les_runs_and_conserves_heat_with_weno(self):
        import jax

        from climateparameterizations_jl_tpu.data.les import (
            LESConfig,
            initial_state,
            les_step,
        )

        c = LESConfig.default(Nx=8, Ny=8, Nz=12, Qu=-5e-4, Qb=0.0)
        assert c.advection == "weno5"
        state = initial_state(c, jax.random.PRNGKey(3), noise=1e-2)
        heat0 = float(jnp.sum(state.T))
        dt = 20.0
        for k in range(10):
            state = les_step(c, state, dt, "rk3", t=k * dt)
        T = np.asarray(state.T)
        assert np.isfinite(T).all()
        # Qb=0: advection+SGS conserve total heat up to the bottom
        # fixed-gradient BC's flux, which is -kappa*dTdz/dz per cell:
        # bound the drift loosely.
        drift = abs(float(jnp.sum(state.T)) - heat0) / abs(heat0)
        assert drift < 1e-3, drift
