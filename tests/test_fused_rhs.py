"""Parity test: fused Pallas multi-step kernel vs the XLA reference path.

Runs in Pallas interpret mode (CPU); on real TPU the same kernel compiles
natively (exercised by bench.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from climateparameterizations_jl_tpu.models.timestepper import rk4_step
from climateparameterizations_jl_tpu.models.wind_mixing import wind_mixing_rhs
from climateparameterizations_jl_tpu.ops.fused_rhs import (
    fused_wind_mixing_multistep,
    fused_wind_mixing_multistep_mxu,
    make_fast_rhs,
)


def _setup(n_columns=64, Nz=32):
    import __graft_entry__ as g

    return g._make_setup(Nz=Nz, n_columns=n_columns)


class TestFusedRHS:
    def test_matches_xla_path(self):
        model, nns, bcs, x0 = _setup()
        dt, n_steps = 1e-5, 8

        fused = fused_wind_mixing_multistep(model, nns, bcs, x0, dt, n_steps, interpret=True)

        def xla_run(x):
            rhs = lambda x, t: wind_mixing_rhs(model, nns, bcs, x, t)  # noqa: E731

            def body(x, i):
                return rk4_step(rhs, x, i * dt, jnp.float32(dt)), None

            x, _ = jax.lax.scan(body, x, jnp.arange(n_steps, dtype=jnp.float32))
            return x

        reference = jax.jit(xla_run)(x0)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(reference), rtol=2e-4, atol=2e-6)

    def test_column_blocking_invariant(self):
        model, nns, bcs, x0 = _setup(n_columns=96)
        a = fused_wind_mixing_multistep(model, nns, bcs, x0, 1e-5, 4, column_block=32, interpret=True)
        b = fused_wind_mixing_multistep(model, nns, bcs, x0, 1e-5, 4, column_block=96, interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_nontrivial_dynamics(self):
        model, nns, bcs, x0 = _setup(n_columns=16)
        out = fused_wind_mixing_multistep(model, nns, bcs, x0, 1e-5, 16, interpret=True)
        assert np.all(np.isfinite(np.asarray(out)))
        assert float(jnp.max(jnp.abs(out - x0))) > 1e-6


def _xla_rk4(model, nns, bcs, x0, dt, n_steps):
    def run(x):
        rhs = lambda x, t: wind_mixing_rhs(model, nns, bcs, x, t)  # noqa: E731

        def body(x, i):
            return rk4_step(rhs, x, i * dt, jnp.float32(dt)), None

        x, _ = jax.lax.scan(body, x, jnp.arange(n_steps, dtype=jnp.float32))
        return x

    return jax.jit(run)(x0)


class TestFusedRHSMXU:
    """The MXU-assembly variant: roll-based gradients + divergence matmul."""

    def test_fast_rhs_matches_reference_rhs(self):
        model, nns, bcs, x0 = _setup(n_columns=8)
        fast = make_fast_rhs(model, nns, bcs)
        want = wind_mixing_rhs(model, nns, bcs, x0, 0.0)
        got = fast(x0, 0.0)
        # f32 roundoff is amplified by the stiff tendency scaling
        # (r / dz ~ 9e4 for the flagship tau/H): a 1-ulp flux difference
        # between the packed-matmul and per-MLP paths lands at ~1e-5 abs.
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4)

    def test_fast_rhs_unbatched_shape(self):
        model, nns, bcs, x0 = _setup(n_columns=2)
        fast = make_fast_rhs(model, nns, bcs)
        got = fast(x0[0], 0.0)
        assert got.shape == (3 * model.Nz,)
        want = wind_mixing_rhs(model, nns, bcs, x0[0], 0.0)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4)

    def test_kernel_matches_xla_path(self):
        model, nns, bcs, x0 = _setup()
        dt, n_steps = 1e-5, 8
        fused = fused_wind_mixing_multistep_mxu(model, nns, bcs, x0, dt, n_steps, interpret=True)
        reference = _xla_rk4(model, nns, bcs, x0, dt, n_steps)
        np.testing.assert_allclose(np.asarray(fused), np.asarray(reference), rtol=2e-4, atol=2e-6)

    def test_column_blocking_invariant(self):
        model, nns, bcs, x0 = _setup(n_columns=96)
        a = fused_wind_mixing_multistep_mxu(model, nns, bcs, x0, 1e-5, 4, column_block=32, interpret=True)
        b = fused_wind_mixing_multistep_mxu(model, nns, bcs, x0, 1e-5, 4, column_block=96, interpret=True)
        # Interpret-mode matmuls accumulate in an M-dependent order on CPU,
        # so different column blocks differ at the last few f32 ulps.
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-8)

    def test_fast_rhs_other_Nz(self):
        # The packed block layout (seam junk lane per Nz-block zeroed by
        # Dr's rows, roll wraparound confined to the last seam) must hold
        # for any Nz, not just the flagship 32.
        for Nz in (16, 48):
            model, nns, bcs, x0 = _setup(n_columns=4, Nz=Nz)
            fast = make_fast_rhs(model, nns, bcs)
            want = wind_mixing_rhs(model, nns, bcs, x0, 0.0)
            np.testing.assert_allclose(np.asarray(fast(x0, 0.0)), np.asarray(want), rtol=1e-3, atol=1e-4)

    def test_fast_rhs_gradient_matches(self):
        # make_fast_rhs is advertised as jit/scan/grad-safe: the pullback
        # through the roll/matmul assembly must agree with the reference
        # RHS's (so it can drive rk4 training, not just forward benches).
        model, nns, bcs, x0 = _setup(n_columns=4)

        fast = make_fast_rhs(model, nns, bcs)
        g_fast = jax.grad(lambda x: jnp.sum(fast(x, 0.0) ** 2))(x0)
        g_ref = jax.grad(lambda x: jnp.sum(wind_mixing_rhs(model, nns, bcs, x, 0.0) ** 2))(x0)
        np.testing.assert_allclose(np.asarray(g_fast), np.asarray(g_ref), rtol=1e-3, atol=1e-2 * float(jnp.abs(g_ref).max()))

    def test_bf16_matmuls_close(self):
        model, nns, bcs, x0 = _setup(n_columns=16)
        fused = fused_wind_mixing_multistep_mxu(
            model, nns, bcs, x0, 1e-5, 4, matmul_dtype="bfloat16", interpret=True
        )
        reference = _xla_rk4(model, nns, bcs, x0, 1e-5, 4)
        # bf16 NN matmuls: ~3 decimal digits on the NN flux contribution.
        np.testing.assert_allclose(np.asarray(fused), np.asarray(reference), rtol=3e-2, atol=3e-3)


class TestFastSplit:
    """fast_assembly split stepper == the default pad/diff/concat path."""

    def _solve_pair(self, model, nns, bcs, x0, **kw):
        from climateparameterizations_jl_tpu.models.wind_mixing import solve_wind_mixing_split

        args = (model, nns, bcs, x0, 0.0, 1e-3, 3)
        a = solve_wind_mixing_split(*args, n_substeps=4, fast_assembly=False, **kw)
        b = solve_wind_mixing_split(*args, n_substeps=4, fast_assembly=True, **kw)
        return a, b

    def test_matches_default_path(self):
        model, nns, bcs, x0 = _setup(n_columns=6)
        a, b = self._solve_pair(model, nns, bcs, x0)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)

    def test_batched_per_sim_bcs(self):
        import dataclasses

        model, nns, bcs, x0 = _setup(n_columns=5)
        rng = np.random.default_rng(3)
        per_sim = dataclasses.replace(
            bcs,
            uw_top=jnp.asarray(rng.normal(size=5) * 0.3, x0.dtype),
            wT_top=jnp.asarray(rng.normal(size=5) * 0.2, x0.dtype),
            vw_bot=jnp.asarray(rng.normal(size=5) * 0.1, x0.dtype),
        )
        a, b = self._solve_pair(model, nns, per_sim, x0)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)

    def test_diurnal(self):
        import dataclasses

        model, nns, bcs, x0 = _setup(n_columns=4)
        model = dataclasses.replace(model, diurnal=True)
        bcs = dataclasses.replace(
            bcs, diurnal_amplitude=jnp.asarray(np.linspace(1e-5, 3e-5, 4), x0.dtype)
        )
        a, b = self._solve_pair(model, nns, bcs, x0)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)

    def test_non_zero_weights(self):
        import dataclasses

        model, nns, bcs, x0 = _setup(n_columns=4)
        model = dataclasses.replace(model, zero_weights=False)
        a, b = self._solve_pair(model, nns, bcs, x0)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)

    def test_conv_adj_base(self):
        import dataclasses

        model, nns, bcs, x0 = _setup(n_columns=4)
        model = dataclasses.replace(model, use_mpp=False, use_conv_adj=True)
        a, b = self._solve_pair(model, nns, bcs, x0)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)

    def test_gradients_match(self):
        from climateparameterizations_jl_tpu.models.wind_mixing import solve_wind_mixing_split

        model, nns, bcs, x0 = _setup(n_columns=4)

        def loss(nns, fast):
            traj = solve_wind_mixing_split(model, nns, bcs, x0, 0.0, 1e-3, 2, n_substeps=3, fast_assembly=fast)
            return jnp.sum(traj[-1] ** 2)

        g_fast = jax.grad(lambda p: loss(p, True))(nns)
        g_ref = jax.grad(lambda p: loss(p, False))(nns)
        for gf, gr in zip(jax.tree_util.tree_leaves(g_fast), jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-6 * max(1.0, float(jnp.abs(gr).max())))

    def test_fuzz_random_configurations(self):
        """Randomized sweep over Nz / batch shape / BC shape / flags: the
        packed block layout and BC-row broadcasting must agree with the
        default path everywhere, not just the flagship configuration."""
        import dataclasses

        from climateparameterizations_jl_tpu.models.wind_mixing import solve_wind_mixing_split

        rng = np.random.default_rng(42)
        for trial in range(6):
            Nz = int(rng.choice([16, 24, 32]))
            S = int(rng.integers(2, 5))
            two_d = bool(rng.integers(0, 2))
            model, nns, bcs, _ = _setup(n_columns=S, Nz=Nz)
            model = dataclasses.replace(
                model,
                zero_weights=bool(rng.integers(0, 2)),
                diurnal=bool(rng.integers(0, 2)),
            )
            batch = (S, 3) if two_d else (S,)
            x0 = jnp.asarray(rng.normal(size=batch + (3 * Nz,)) * 0.1, jnp.float32)
            import dataclasses as dc

            bcs = dc.replace(
                bcs,
                uw_top=jnp.asarray(rng.normal(size=S) * 0.3, jnp.float32),  # per-sim
                wT_top=jnp.asarray(rng.normal(size=S) * 0.2, jnp.float32),
                diurnal_amplitude=jnp.asarray(np.abs(rng.normal(size=S)) * 1e-5, jnp.float32),
            )
            args = (model, nns, bcs, x0, 0.0, 5e-4, 2)
            a = solve_wind_mixing_split(*args, n_substeps=3, fast_assembly=False)
            for fast in (True, "fold"):
                b = solve_wind_mixing_split(*args, n_substeps=3, fast_assembly=fast)
                np.testing.assert_allclose(
                    np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7,
                    err_msg=f"trial {trial}: fast={fast} Nz={Nz} batch={batch} zero_weights={model.zero_weights} diurnal={model.diurnal}",
                )

    def test_smooth_nn_rejected(self):
        import dataclasses

        import pytest

        from climateparameterizations_jl_tpu.models.wind_mixing import solve_wind_mixing_split

        model, nns, bcs, x0 = _setup(n_columns=2)
        model = dataclasses.replace(model, smooth_NN=True)
        with pytest.raises(ValueError, match="smoothing"):
            solve_wind_mixing_split(model, nns, bcs, x0, 0.0, 1e-3, 1, fast_assembly=True)


class TestFastRK4:
    """fast_assembly on the fully-explicit rk4 solver (traced batched BCs)."""

    def _solve_pair(self, model, nns, bcs, x0):
        from climateparameterizations_jl_tpu.models.wind_mixing import solve_wind_mixing_nde

        args = (model, nns, bcs, x0, 0.0, 1e-4, 3)
        a = solve_wind_mixing_nde(*args, n_substeps=4, fast_assembly=False)
        b = solve_wind_mixing_nde(*args, n_substeps=4, fast_assembly=True)
        return a, b

    def test_matches_default_path(self):
        model, nns, bcs, x0 = _setup(n_columns=6)
        a, b = self._solve_pair(model, nns, bcs, x0)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)

    def test_batched_bcs_and_diurnal(self):
        import dataclasses

        model, nns, bcs, x0 = _setup(n_columns=5)
        model = dataclasses.replace(model, diurnal=True)
        rng = np.random.default_rng(7)
        bcs = dataclasses.replace(
            bcs,
            uw_top=jnp.asarray(rng.normal(size=5) * 0.3, x0.dtype),
            wT_bot=jnp.asarray(rng.normal(size=5) * 0.1, x0.dtype),
            diurnal_amplitude=jnp.asarray(np.abs(rng.normal(size=5)) * 2e-5, x0.dtype),
        )
        a, b = self._solve_pair(model, nns, bcs, x0)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)

    def test_gradients_match(self):
        from climateparameterizations_jl_tpu.models.wind_mixing import solve_wind_mixing_nde

        model, nns, bcs, x0 = _setup(n_columns=4)

        def loss(nns, fast):
            traj = solve_wind_mixing_nde(model, nns, bcs, x0, 0.0, 1e-4, 2, n_substeps=3, fast_assembly=fast)
            return jnp.sum(traj[-1] ** 2)

        g_fast = jax.grad(lambda p: loss(p, True))(nns)
        g_ref = jax.grad(lambda p: loss(p, False))(nns)
        for gf, gr in zip(jax.tree_util.tree_leaves(g_fast), jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=1e-4, atol=1e-6 * max(1.0, float(jnp.abs(gr).max())))

    def test_non_rk4_methods_rejected(self):
        # euler/heun used to return from the forward-backward branch BEFORE
        # the fast_assembly validation, silently running the default path
        # under a fast_assembly=True label (benchmark-poisoning bug).
        import pytest

        from climateparameterizations_jl_tpu.models.wind_mixing import solve_wind_mixing_nde

        model, nns, bcs, x0 = _setup(n_columns=2)
        for method in ("euler", "heun"):
            with pytest.raises(ValueError, match="fast_assembly"):
                solve_wind_mixing_nde(model, nns, bcs, x0, 0.0, 1e-4, 1, method=method, fast_assembly=True)

    def test_wrong_depth_rejected(self):
        # pack_flux_nns packs any same-depth MLP triple, but the MXU RHS body
        # is the fixed 3-layer chain — reject with a message, not an unpack crash.
        import pytest

        from climateparameterizations_jl_tpu.closures.mlp import wind_mixing_mlp
        from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs, solve_wind_mixing_nde

        model, _, bcs, x0 = _setup(n_columns=2)
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        two_layer = FluxNNs(*(wind_mixing_mlp(k, Nz=model.Nz, hidden=(16,)) for k in keys))
        with pytest.raises(ValueError, match="3-layer"):
            solve_wind_mixing_nde(model, two_layer, bcs, x0, 0.0, 1e-4, 1, fast_assembly=True)

    def test_non_mpp_rejected(self):
        import dataclasses

        import pytest

        from climateparameterizations_jl_tpu.models.wind_mixing import solve_wind_mixing_nde

        model, nns, bcs, x0 = _setup(n_columns=2)
        model = dataclasses.replace(model, use_mpp=False, use_conv_adj=True)
        with pytest.raises(ValueError, match="mPP"):
            solve_wind_mixing_nde(model, nns, bcs, x0, 0.0, 1e-4, 1, fast_assembly=True)

    def test_f64_full_precision(self):
        # The MXU RHS body used to hardcode preferred_element_type=f32 in its
        # matmuls: f64 states silently accumulated at f32 precision, so the
        # "same math" contract vs the default path only held to ~1e-7. With
        # the dots following the state dtype, x64 trajectories must now agree
        # to near machine-f64.
        from climateparameterizations_jl_tpu.models.wind_mixing import solve_wind_mixing_nde

        model, nns, bcs, x0 = _setup(n_columns=4)
        # tree.map only touches array leaves; Nz is static metadata and survives.
        to64 = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), t)  # noqa: E731
        model64 = to64(model)
        nns64, bcs64, x64 = to64(nns), to64(bcs), jnp.asarray(x0, jnp.float64)
        args = (model64, nns64, bcs64, x64, 0.0, 1e-4, 3)
        a = solve_wind_mixing_nde(*args, n_substeps=4, fast_assembly=False)
        b = solve_wind_mixing_nde(*args, n_substeps=4, fast_assembly=True)
        assert a.dtype == jnp.float64 and b.dtype == jnp.float64
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-12, atol=1e-14)

    def test_fold_rejects_unknown_value(self):
        import pytest

        from climateparameterizations_jl_tpu.models.wind_mixing import (
            solve_wind_mixing_nde,
            solve_wind_mixing_split,
        )

        model, nns, bcs, x0 = _setup(n_columns=2)
        with pytest.raises(ValueError, match="fast_assembly"):
            solve_wind_mixing_nde(model, nns, bcs, x0, 0.0, 1e-4, 1, fast_assembly="folded")
        with pytest.raises(ValueError, match="fast_assembly"):
            solve_wind_mixing_split(model, nns, bcs, x0, 0.0, 1e-3, 1, fast_assembly="folded")

    def test_builds_inside_jit(self):
        # The training loop traces the whole solve under jit: the fast-path
        # builders must not run float() on values jnp ops have turned into
        # tracers (regression: _scalar_constants used scale(0.0), a jnp op).
        from climateparameterizations_jl_tpu.models.wind_mixing import solve_wind_mixing_nde

        model, nns, bcs, x0 = _setup(n_columns=3)

        @jax.jit
        def run(nns, x0):
            return solve_wind_mixing_nde(model, nns, bcs, x0, 0.0, 1e-4, 2, n_substeps=2, fast_assembly=True)

        out = run(nns, x0)
        ref = solve_wind_mixing_nde(model, nns, bcs, x0, 0.0, 1e-4, 2, n_substeps=2, fast_assembly=False)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-7)


class TestFoldDivergence:
    """fast_assembly="fold": the divergence matmul precomposed away.

    The NN side rides ``A3f = A3 @ Dr`` (folded once at closure-build time);
    the mPP side becomes the ``fold_divergence_constants`` roll-subtract.
    Must match the default path everywhere the plain fast path does.
    """

    def test_fast_rhs_fold_matches_reference(self):
        model, nns, bcs, x0 = _setup(n_columns=8)
        fast = make_fast_rhs(model, nns, bcs, fold_divergence=True)
        want = wind_mixing_rhs(model, nns, bcs, x0, 0.0)
        np.testing.assert_allclose(np.asarray(fast(x0, 0.0)), np.asarray(want), rtol=1e-3, atol=1e-4)
        # unbatched
        np.testing.assert_allclose(
            np.asarray(fast(x0[0], 0.0)),
            np.asarray(wind_mixing_rhs(model, nns, bcs, x0[0], 0.0)),
            rtol=1e-3, atol=1e-4,
        )

    def test_fast_rhs_fold_other_Nz(self):
        # Seam-lane masking via the C2a/C2b zeros (incl. the cross-block
        # leak of the previous block's seam under the packed roll) must
        # hold for any Nz.
        for Nz in (16, 48):
            model, nns, bcs, x0 = _setup(n_columns=4, Nz=Nz)
            fast = make_fast_rhs(model, nns, bcs, fold_divergence=True)
            want = wind_mixing_rhs(model, nns, bcs, x0, 0.0)
            np.testing.assert_allclose(np.asarray(fast(x0, 0.0)), np.asarray(want), rtol=1e-3, atol=1e-4)

    def test_rk4_fold_matches_default(self):
        from climateparameterizations_jl_tpu.models.wind_mixing import solve_wind_mixing_nde

        model, nns, bcs, x0 = _setup(n_columns=6)
        args = (model, nns, bcs, x0, 0.0, 1e-4, 3)
        a = solve_wind_mixing_nde(*args, n_substeps=4, fast_assembly=False)
        b = solve_wind_mixing_nde(*args, n_substeps=4, fast_assembly="fold")
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)

    def test_rk4_fold_batched_bcs_and_diurnal(self):
        import dataclasses

        from climateparameterizations_jl_tpu.models.wind_mixing import solve_wind_mixing_nde

        model, nns, bcs, x0 = _setup(n_columns=5)
        model = dataclasses.replace(model, diurnal=True)
        rng = np.random.default_rng(7)
        bcs = dataclasses.replace(
            bcs,
            uw_top=jnp.asarray(rng.normal(size=5) * 0.3, x0.dtype),
            wT_bot=jnp.asarray(rng.normal(size=5) * 0.1, x0.dtype),
            diurnal_amplitude=jnp.asarray(np.abs(rng.normal(size=5)) * 2e-5, x0.dtype),
        )
        args = (model, nns, bcs, x0, 0.0, 1e-4, 3)
        a = solve_wind_mixing_nde(*args, n_substeps=4, fast_assembly=False)
        b = solve_wind_mixing_nde(*args, n_substeps=4, fast_assembly="fold")
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7)

    def test_split_fold_matches_default(self):
        import dataclasses

        from climateparameterizations_jl_tpu.models.wind_mixing import solve_wind_mixing_split

        model, nns, bcs, x0 = _setup(n_columns=6)
        for variant in ("base", "non_zero_weights", "conv_adj"):
            m = model
            if variant == "non_zero_weights":
                m = dataclasses.replace(model, zero_weights=False)
            elif variant == "conv_adj":
                m = dataclasses.replace(model, use_mpp=False, use_conv_adj=True)
            args = (m, nns, bcs, x0, 0.0, 1e-3, 3)
            a = solve_wind_mixing_split(*args, n_substeps=4, fast_assembly=False)
            b = solve_wind_mixing_split(*args, n_substeps=4, fast_assembly="fold")
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-7, err_msg=variant
            )

    def test_gradients_match_both_solvers(self):
        from climateparameterizations_jl_tpu.models.wind_mixing import (
            solve_wind_mixing_nde,
            solve_wind_mixing_split,
        )

        model, nns, bcs, x0 = _setup(n_columns=4)

        def loss_rk4(nns, fast):
            traj = solve_wind_mixing_nde(model, nns, bcs, x0, 0.0, 1e-4, 2, n_substeps=3, fast_assembly=fast)
            return jnp.sum(traj[-1] ** 2)

        def loss_split(nns, fast):
            traj = solve_wind_mixing_split(model, nns, bcs, x0, 0.0, 1e-3, 2, n_substeps=3, fast_assembly=fast)
            return jnp.sum(traj[-1] ** 2)

        for loss in (loss_rk4, loss_split):
            g_fold = jax.grad(lambda p: loss(p, "fold"))(nns)
            g_ref = jax.grad(lambda p: loss(p, False))(nns)
            for gf, gr in zip(jax.tree_util.tree_leaves(g_fold), jax.tree_util.tree_leaves(g_ref)):
                np.testing.assert_allclose(
                    np.asarray(gf), np.asarray(gr), rtol=1e-4,
                    atol=1e-6 * max(1.0, float(jnp.abs(gr).max())),
                )

    def test_f64_full_precision(self):
        # In x64 the fold is exact linear algebra: trajectories must agree
        # with the default path to near machine-f64 (same contract as the
        # unfolded fast path).
        from climateparameterizations_jl_tpu.models.wind_mixing import solve_wind_mixing_nde

        model, nns, bcs, x0 = _setup(n_columns=4)
        to64 = lambda t: jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), t)  # noqa: E731
        args = (to64(model), to64(nns), to64(bcs), jnp.asarray(x0, jnp.float64), 0.0, 1e-4, 3)
        a = solve_wind_mixing_nde(*args, n_substeps=4, fast_assembly=False)
        b = solve_wind_mixing_nde(*args, n_substeps=4, fast_assembly="fold")
        assert b.dtype == jnp.float64
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-12, atol=1e-14)


class TestAutoFastAssembly:
    """fast_assembly="auto" resolution (the NDETrainConfig default)."""

    def test_resolves_to_fold_when_supported(self):
        from climateparameterizations_jl_tpu.models.wind_mixing import resolve_fast_assembly

        model, nns, bcs, x0 = _setup(n_columns=2)
        assert resolve_fast_assembly(model, nns, "split", "auto") == "fold"
        assert resolve_fast_assembly(model, nns, "rk4", "auto") == "fold"

    def test_falls_back_on_unsupported_configs(self):
        import dataclasses

        from climateparameterizations_jl_tpu.closures.mlp import wind_mixing_mlp
        from climateparameterizations_jl_tpu.models.wind_mixing import (
            FluxNNs,
            resolve_fast_assembly,
        )

        model, nns, bcs, x0 = _setup(n_columns=2)
        # NN smoothing: unsupported by the assembly everywhere.
        smooth = dataclasses.replace(model, smooth_NN=True)
        assert resolve_fast_assembly(smooth, nns, "split", "auto") is False
        # rk4 needs the mPP base and no Ri smoothing.
        conv_adj = dataclasses.replace(model, use_mpp=False, use_conv_adj=True)
        assert resolve_fast_assembly(conv_adj, nns, "rk4", "auto") is False
        assert resolve_fast_assembly(conv_adj, nns, "split", "auto") == "fold"
        smooth_ri = dataclasses.replace(model, smooth_Ri=True)
        assert resolve_fast_assembly(smooth_ri, nns, "rk4", "auto") is False
        assert resolve_fast_assembly(smooth_ri, nns, "split", "auto") == "fold"
        # euler/heun: no assembly path.
        assert resolve_fast_assembly(model, nns, "euler", "auto") is False
        # rk4's fused body is mish/relu-only: other activations must fall
        # back, not crash at the first jit trace; the split assembly is
        # activation-generic.
        keys = jax.random.split(jax.random.PRNGKey(1), 3)
        tanh_nns = FluxNNs(*(wind_mixing_mlp(k, Nz=model.Nz, activation="tanh") for k in keys))
        assert resolve_fast_assembly(model, tanh_nns, "rk4", "auto") is False
        assert resolve_fast_assembly(model, tanh_nns, "split", "auto") == "fold"
        # rk4's fused body is also 3-layer-only; the split assembly is
        # depth-generic (PackedFluxNNs + _pad_packed_chain), so 'auto' keeps
        # the fold there.
        keys = jax.random.split(jax.random.PRNGKey(0), 3)
        two_layer = FluxNNs(*(wind_mixing_mlp(k, Nz=model.Nz, hidden=(16,)) for k in keys))
        assert resolve_fast_assembly(model, two_layer, "rk4", "auto") is False
        assert resolve_fast_assembly(model, two_layer, "split", "auto") == "fold"

    def test_explicit_values_pass_through(self):
        from climateparameterizations_jl_tpu.models.wind_mixing import resolve_fast_assembly

        model, nns, _, _ = _setup(n_columns=2)
        for v in (False, True, "fold"):
            assert resolve_fast_assembly(model, nns, "split", v) == v

    def test_train_config_auto_runs_everywhere(self):
        # The NDETrainConfig default must train on configurations the
        # assembly does NOT support (graceful fallback, not an error).
        import dataclasses

        from climateparameterizations_jl_tpu.train.nde import NDETrainConfig, solve_with_config

        model, nns, bcs, x0 = _setup(n_columns=3)
        smooth = dataclasses.replace(model, smooth_NN=True)
        cfg = NDETrainConfig(method="split", n_substeps=2)
        assert cfg.fast_assembly == "auto"
        out_fold = solve_with_config(model, nns, bcs, x0, 0.0, 1e-3, 2, cfg)
        out_smooth = solve_with_config(smooth, nns, bcs, x0, 0.0, 1e-3, 2, cfg)
        assert np.all(np.isfinite(np.asarray(out_fold)))
        assert np.all(np.isfinite(np.asarray(out_smooth)))
        # and the fold path matches an explicit default-path solve
        ref = solve_with_config(model, nns, bcs, x0, 0.0, 1e-3, 2, dataclasses.replace(cfg, fast_assembly=False))
        np.testing.assert_allclose(np.asarray(out_fold), np.asarray(ref), rtol=1e-5, atol=1e-7)

    def test_auto_default_trains_unsupported_rk4_configs(self):
        # Regression (review find): the NDETrainConfig 'auto' default must
        # SOLVE (not crash) with a tanh closure under method='rk4' and with
        # a 2-layer closure under method='split' — both previously resolved
        # to 'fold' and hit hard errors / crashes at the first jit trace.
        from climateparameterizations_jl_tpu.closures.mlp import wind_mixing_mlp
        from climateparameterizations_jl_tpu.models.wind_mixing import FluxNNs
        from climateparameterizations_jl_tpu.train.nde import NDETrainConfig, solve_with_config

        model, _, bcs, x0 = _setup(n_columns=3)
        keys = jax.random.split(jax.random.PRNGKey(2), 3)
        tanh_nns = FluxNNs(*(wind_mixing_mlp(k, Nz=model.Nz, activation="tanh") for k in keys))
        out = solve_with_config(model, tanh_nns, bcs, x0, 0.0, 1e-4, 2,
                                NDETrainConfig(method="rk4", n_substeps=2))
        assert np.all(np.isfinite(np.asarray(out)))
        two_layer = FluxNNs(*(wind_mixing_mlp(k, Nz=model.Nz, hidden=(16,)) for k in keys))
        out = solve_with_config(model, two_layer, bcs, x0, 0.0, 1e-3, 2,
                                NDETrainConfig(method="split", n_substeps=2))
        assert np.all(np.isfinite(np.asarray(out)))
        # and the 2-layer split fold matches its default path
        ref = solve_with_config(model, two_layer, bcs, x0, 0.0, 1e-3, 2,
                                NDETrainConfig(method="split", n_substeps=2, fast_assembly=False))
        np.testing.assert_allclose(
            np.asarray(solve_with_config(model, two_layer, bcs, x0, 0.0, 1e-3, 2,
                                         NDETrainConfig(method="split", n_substeps=2))),
            np.asarray(ref), rtol=1e-5, atol=1e-7)
