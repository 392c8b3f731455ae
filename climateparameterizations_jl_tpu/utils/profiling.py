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
