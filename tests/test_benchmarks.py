"""Benchmark-path regression tests (tiny shapes, CPU).

The benchmark suite (``climateparameterizations_jl_tpu.benchmarks``) is the
measured-performance record of the framework — these tests pin the
*correctness* properties its knobs rely on, not the timings.
"""

import jax
import jax.numpy as jnp

from climateparameterizations_jl_tpu.benchmarks import bench_gp_ml2_step, bench_nde_forward


class TestChunkedForward:
    def test_chunked_equals_unchunked_exactly(self):
        """lax.map over column chunks is bit-exact vs the single scan.

        This is the property that makes ``chunk_columns`` (the VMEM-cliff
        mitigation past ~32k columns, PERFORMANCE.md) safe to use: columns
        are independent, so chunking only re-tiles the batch.
        """
        from __graft_entry__ import _make_setup

        from climateparameterizations_jl_tpu.models.timestepper import rk4_step
        from climateparameterizations_jl_tpu.models.wind_mixing import (
            pack_flux_nns, wind_mixing_rhs,
        )

        model, nns, bcs, x0 = _make_setup(Nz=32, n_columns=16)
        nns = pack_flux_nns(nns)
        dt = jnp.float32(1e-5)
        rhs = lambda x, t: wind_mixing_rhs(model, nns, bcs, x, t)  # noqa: E731

        def evolve(x):
            def body(x, i):
                return rk4_step(rhs, x, i * dt, dt), None

            return jax.lax.scan(body, x, jnp.arange(8, dtype=jnp.float32))[0]

        full = evolve(x0)
        chunked = jax.lax.map(evolve, x0.reshape(-1, 4, x0.shape[-1])).reshape(x0.shape)
        assert jnp.array_equal(full, chunked)

    def test_bench_knobs_run(self):
        s = bench_nde_forward(n_columns=8, n_steps=4, unroll=2, chunk_columns=4)
        assert s["median_s"] > 0 and s["column_timesteps_per_sec"] > 0

    def test_bench_rejects_nondividing_chunk(self):
        import pytest

        with pytest.raises(ValueError):
            bench_nde_forward(n_columns=10, n_steps=4, chunk_columns=4)


class TestML2Bench:
    def test_ml2_step_runs_on_both_backends(self):
        for backend in ("xla", "pallas"):
            s = bench_gp_ml2_step(n_train=16, n_features=6, backend=backend)
            assert s["median_s"] > 0
