"""Roofline-accounting unit tests (``utils/profiling.py``).

The MFU/bytes columns in PERFORMANCE.md are derived from XLA's cost
analysis; these tests pin the two accounting rules the columns depend on:

- ``loop_steps`` scaling: XLA counts a scan body once, so the body cost is
  multiplied by the trip count.
- the two-point ``probe`` calibration: an n-proportional ONE-TIME cost
  (e.g. the saved-trajectory concatenate) must be counted once, not
  multiplied by the trip count.
"""

import jax
import jax.numpy as jnp

from climateparameterizations_jl_tpu.utils import profiling


class TestProbeAlgebra:
    """Pin the slope/intercept math with a synthetic linear cost model."""

    def _fake_cost(self, kappa, beta):
        # XLA's whole-program cost for a trip count n is kappa + beta*n:
        # kappa = once-counted scan body + true constants, beta*n = the
        # n-proportional one-time part (trajectory concatenate).
        def fake(fn, *args, **kwargs):
            n = fn()  # sentinel callables return their trip count
            return {"flops": kappa + beta * n, "bytes": 2.0 * (kappa + beta * n)}

        return fake

    def test_probe_recovers_per_trip_cost(self, monkeypatch):
        kappa, beta, L, P = 1000.0, 7.0, 64, 16
        monkeypatch.setattr(profiling, "xla_cost", self._fake_cost(kappa, beta))
        stats = profiling.attach_roofline(
            {"median_s": 1.0}, lambda: L, loop_steps=L, probe=(lambda: P, (), P)
        )
        # Whole-run cost = L bodies + the one-time part at L = L*(kappa+beta).
        assert stats["xla_flops"] == L * (kappa + beta)
        assert stats["hbm_bytes"] == 2.0 * L * (kappa + beta)

    def test_without_probe_one_time_cost_is_inflated(self, monkeypatch):
        kappa, beta, L = 1000.0, 7.0, 64
        monkeypatch.setattr(profiling, "xla_cost", self._fake_cost(kappa, beta))
        stats = profiling.attach_roofline({"median_s": 1.0}, lambda: L, loop_steps=L)
        # The uncorrected path multiplies the beta*L one-time term by L too.
        assert stats["xla_flops"] == L * (kappa + beta * L)

    def test_probe_rejected_on_inconsistent_lowering(self, monkeypatch):
        # A cost that DECREASES with the trip count means the two lowerings
        # are not the same program scaled (XLA fused differently); the fit
        # must be rejected and the uncorrected estimate kept, flagged.
        L, P = 64, 16

        def fake(fn, *args, **kwargs):
            return {"flops": 1e6 - 100.0 * fn(), "bytes": 1e6 - 100.0 * fn()}

        monkeypatch.setattr(profiling, "xla_cost", fake)
        stats = profiling.attach_roofline(
            {"median_s": 1.0}, lambda: L, loop_steps=L, probe=(lambda: P, (), P)
        )
        assert stats["probe_rejected"] is True
        assert stats["xla_flops"] == L * (1e6 - 100.0 * L)

    def test_probe_at_same_trip_count_is_ignored(self, monkeypatch):
        kappa, beta, L = 1000.0, 7.0, 64
        monkeypatch.setattr(profiling, "xla_cost", self._fake_cost(kappa, beta))
        with_probe = profiling.attach_roofline(
            {"median_s": 1.0}, lambda: L, loop_steps=L, probe=(lambda: L, (), L)
        )
        without = profiling.attach_roofline({"median_s": 1.0}, lambda: L, loop_steps=L)
        assert with_probe["xla_flops"] == without["xla_flops"]


class TestProbeEndToEnd:
    def test_trajectory_scan_bytes_shrink_under_probe(self):
        """Real lowering: probe-corrected bytes <= naive trip-scaled bytes.

        The saved trajectory makes the program's operand bytes grow with the
        trip count; naive loop_steps scaling multiplies that by the trip
        count again, so the corrected estimate must come out strictly
        smaller (and stay positive).
        """

        def make(n):
            def run(x):
                def body(c, _):
                    c = c * 1.000001 + 0.5
                    return c, c  # saved trajectory -> n-proportional output

                return jax.lax.scan(body, x, None, length=n)[1]

            return jax.jit(run)

        x = jnp.ones((256,), jnp.float32)
        L, P = 512, 128
        if profiling.xla_cost(make(L), x)["flops"] <= 0:
            import pytest

            pytest.skip("backend exposes no cost analysis")
        naive = profiling.attach_roofline({"median_s": 1.0}, make(L), x, loop_steps=L)
        probed = profiling.attach_roofline(
            {"median_s": 1.0}, make(L), x, loop_steps=L, probe=(make(P), (x,), P)
        )
        assert 0 < probed["hbm_bytes"] < naive["hbm_bytes"]
        assert 0 < probed["xla_flops"] <= naive["xla_flops"]


class TestTimedRoofline:
    def test_compile_time_reported_from_aot_stage(self):
        f = jax.jit(lambda x: (x @ x.T).sum())
        x = jnp.ones((32, 32), jnp.float32)
        stats = profiling.timed_roofline(f, x, iters=2)
        assert stats["median_s"] > 0
        assert stats.get("compile_s", 0) > 0
