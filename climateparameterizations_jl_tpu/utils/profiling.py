"""Timing + profiling helpers (the framework's observability layer).

The reference has no tracer — only ad-hoc ``@btime`` scripts with results
pasted into comments (``wind_mixing/Benchmarking.jl:22-55``). Here timing is
a first-class utility: ``time_fn`` measures a jitted function with proper
compile/run separation and ``block_until_ready`` (async dispatch would
otherwise make TPU timings meaningless), and ``trace`` wraps the jax
profiler for XLA-level traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time

import jax


def _block(x):
    return jax.block_until_ready(x)


def time_fn(fn, *args, iters: int = 10, warmup: int = 2, pipelined: bool = False, **kwargs) -> dict:
    """Wall-clock a (jitted) function: returns compile + per-iteration stats.

    The first call is timed separately as ``compile_s``; then ``warmup``
    untimed calls, then ``iters`` timed calls (median / min / mean seconds).

    ``pipelined=True`` issues all ``iters`` calls back-to-back and blocks
    once at the end, reporting total/iters as every stat. Blocking per call
    adds a host->device dispatch round-trip to each measurement — through
    the remote-TPU tunnel that is ~10 ms, dwarfing millisecond-scale steps.
    Real training/forward loops issue steps without per-step blocking, so
    pipelined timing is the representative steady-state number; the device
    runs one program at a time, so total/iters is true throughput.
    """
    t0 = time.perf_counter()
    _block(fn(*args, **kwargs))
    compile_s = time.perf_counter() - t0

    for _ in range(warmup):
        _block(fn(*args, **kwargs))

    if pipelined:
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args, **kwargs)
        _block(out)
        per_iter = (time.perf_counter() - t0) / iters
        return {
            "compile_s": compile_s,
            "median_s": per_iter,
            "min_s": per_iter,
            "mean_s": per_iter,
            "iters": iters,
            "pipelined": True,
        }

    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _block(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    times.sort()
    n = len(times)
    return {
        "compile_s": compile_s,
        "median_s": times[n // 2],
        "min_s": times[0],
        "mean_s": sum(times) / n,
        "iters": n,
    }


# TPU v5e peaks for the MFU/roofline columns (one chip): the MXU runs f32
# at half its 197 TFLOP/s bf16 rate, and HBM moves 819 GB/s. MFU here is
# relative to the f32 MXU peak — the honest yardstick for an f32 framework
# (CLAUDE.md: measured Pallas matmul hits ~100 TFLOP/s f32 on this chip,
# confirming the ~98.5 figure is reachable).
PEAK_F32_FLOPS = 98.5e12
PEAK_HBM_BYTES = 819e9


def xla_cost(fn, *args, **kwargs) -> dict:
    """XLA cost-model FLOPs + HBM bytes for ONE call of ``fn``.

    Uses the compiler's own cost analysis (no estimation by hand). Returns
    zeros when the backend doesn't expose an analysis.
    """
    try:
        if hasattr(fn, "cost_analysis"):  # an AOT jax.stages.Compiled — free
            ca = fn.cost_analysis()
        else:
            lower = fn.lower if hasattr(fn, "lower") else jax.jit(fn).lower
            ca = lower(*args, **kwargs).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return {"flops": float(ca.get("flops", 0.0)), "bytes": float(ca.get("bytes accessed", 0.0))}
    except Exception:  # pragma: no cover - backend-dependent
        return {"flops": 0.0, "bytes": 0.0}


def attach_roofline(stats: dict, fn, *args, loop_steps: int = 1, probe=None, **kwargs) -> dict:
    """Add MFU + roofline columns to a ``time_fn`` stats dict, in place.

    ``mfu_pct`` = achieved FLOP rate / f32 MXU peak; ``hbm_util_pct`` =
    OPERAND-byte rate / HBM peak — XLA's "bytes accessed" counts logical
    operand bytes, so values over 100% mean the working set stays
    VMEM-resident across fusion (an upper bound on real HBM traffic, and a
    latency-bound tell); ``arithmetic_intensity`` (flops/byte)
    against the machine balance (~120 flops/byte at f32) says WHICH wall a
    kernel is near — most of this framework's workloads sit far below the
    balance point (latency/bandwidth regime), which these columns quantify
    instead of narrating (VERDICT r1 item 7).

    ``loop_steps``: XLA's cost analysis counts a while/scan BODY exactly
    once (verified empirically: a length-10 and a length-20 scan of the
    same matmul body report identical flops), so callers whose hot work
    sits inside a scan must pass the trip count (times unroll-adjusted
    bodies) to scale the body cost to the whole run.

    Known lower-bound caveat: scans NESTED inside the body (e.g. the
    per-level Thomas recurrence inside each implicit substep) are also
    counted once, and no outer trip count can restore them — solve-dominated
    rows under-report FLOPs by up to ~Nz on that share. All such rows here
    sit orders of magnitude below MXU-bound either way (see PERFORMANCE.md),
    so the regime verdicts are unaffected; treat their ``mfu_pct`` as a
    lower bound.

    ``probe``: optional ``(probe_fn, probe_args, probe_loop_steps)`` — the
    SAME benchmark lowered at a different trip count. Scaling the whole
    program cost by ``loop_steps`` multiplies ONE-TIME costs (e.g. the
    final trajectory concatenate, whose bytes are themselves proportional
    to the trip count) by the trip count — inflating bytes-derived columns
    several-fold for trajectory-saving benches. Two points give the
    per-trip slope ``beta`` of that n-proportional one-time part and the
    once-counted remainder ``kappa`` (body + any true constant), so the
    whole-run cost is ``loop_steps * (kappa + beta)`` (true-constant one-time
    work, typically negligible, is the only remaining approximation). The fit
    is sanity-gated: if the two lowerings are not consistent with a linear
    cost model (negative slope or negative remainder — XLA can fuse/unroll
    differently at a different trip count), the correction is skipped and
    ``stats["probe_rejected"]`` is set rather than publishing a clamped fit.
    Costs one extra compile per row, so it is opt-in per benchmark.
    """
    cost = xla_cost(fn, *args, **kwargs)
    if probe is not None:
        probe_fn, probe_args, probe_steps = probe
        if probe_steps != loop_steps:
            c2 = xla_cost(probe_fn, *probe_args)
            if cost["flops"] > 0 and c2["flops"] > 0:
                beta = {k: (cost[k] - c2[k]) / (loop_steps - probe_steps) for k in cost}
                kappa = {k: cost[k] - beta[k] * loop_steps for k in cost}
                # Sanity-gate the linear fit: XLA may lower the shorter probe
                # program differently (fusion/unroll decisions can change with
                # the trip count), producing a negative slope or a negative
                # once-counted remainder. Publishing a silently-clamped fit as
                # a "corrected" roofline number would be worse than the known
                # uncorrected overestimate — fall back and flag it instead.
                if all(beta[k] >= 0.0 and kappa[k] > 0.0 for k in cost):
                    cost = {k: kappa[k] + beta[k] for k in cost}
                else:
                    stats["probe_rejected"] = True
    cost = {k: v * loop_steps for k, v in cost.items()}
    t = stats.get("median_s", 0.0)
    if t > 0 and cost["flops"] > 0:
        stats["xla_flops"] = cost["flops"]
        stats["hbm_bytes"] = cost["bytes"]
        stats["achieved_tflops"] = cost["flops"] / t / 1e12
        stats["mfu_pct"] = 100.0 * cost["flops"] / t / PEAK_F32_FLOPS
        stats["hbm_gbps"] = cost["bytes"] / t / 1e9
        stats["hbm_util_pct"] = 100.0 * cost["bytes"] / t / PEAK_HBM_BYTES
        stats["arithmetic_intensity"] = cost["flops"] / max(cost["bytes"], 1.0)
    return stats


def timed_roofline(fn, *args, iters: int = 5, pipelined: bool = True, loop_steps: int = 1, probe=None, repeats: int = 1) -> dict:
    """``time_fn`` + ``attach_roofline`` with ONE XLA compilation.

    AOT-compiles ``fn`` once, times the compiled executable, and reads the
    cost analysis off the same executable — the separate
    ``time_fn(fn) ... attach_roofline(fn)`` pair compiles twice (the AOT
    stage does not share the jit dispatch cache), and a first TPU compile is
    20-40 s with the suite running serially on one chip. Falls back to the
    two-call path if AOT lowering fails. ``compile_s`` is the wall time of
    the AOT compile itself (time_fn's first call would otherwise mislabel a
    warm execution as the compile). ``probe``: see :func:`attach_roofline`.

    ``repeats > 1`` re-runs the timed block that many times on the SAME
    compiled executable and reports the per-repeat medians in
    ``repeat_median_s`` with ``median_s``/``min_s`` aggregated across
    repeats — the axon tunnel's run-to-run spread is +-15% (CLAUDE.md), so
    single-shot numbers under-specify the measurement.
    """
    jitted = fn if hasattr(fn, "lower") else jax.jit(fn)
    try:
        t0 = time.perf_counter()
        compiled = jitted.lower(*args).compile()
        compile_s = time.perf_counter() - t0
    except Exception:  # pragma: no cover - backend-dependent
        stats = time_fn(fn, *args, iters=iters, pipelined=pipelined)
        return attach_roofline(stats, fn, *args, loop_steps=loop_steps, probe=probe)
    stats = time_fn(compiled, *args, iters=iters, pipelined=pipelined)
    stats["compile_s"] = compile_s
    if repeats > 1:
        import numpy as _np

        vals = [stats["median_s"]]
        for _ in range(repeats - 1):
            vals.append(time_fn(compiled, *args, iters=iters, warmup=0, pipelined=pipelined)["median_s"])
        stats["repeat_median_s"] = vals
        stats["median_s"] = float(_np.median(vals))
        stats["min_s"] = float(min(vals))
        stats["max_s"] = float(max(vals))
    return attach_roofline(stats, compiled, *args, loop_steps=loop_steps, probe=probe)


class Timer:
    """Accumulating named-section wall timer for training loops.

    >>> timer = Timer()
    >>> with timer("data"):
    ...     batch = next(it)
    >>> timer.report()
    """

    def __init__(self):
        self.totals: dict[str, float] = {}
        self.counts: dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def report(self) -> dict:
        return {
            name: {"total_s": total, "count": self.counts[name], "mean_s": total / self.counts[name]}
            for name, total in self.totals.items()
        }


@contextlib.contextmanager
def trace(log_dir: str):
    """jax profiler trace context (open in TensorBoard / Perfetto)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
