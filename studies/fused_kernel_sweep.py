"""Forward-throughput sweep: XLA scan vs fused Pallas kernels at large batch.

The round-1 verdict's stretch goal is >2e8 column-timesteps/s at 16k columns
(the XLA scan saturates ~1.4e8 there; the v1 Pallas kernel measured 4.3e7 at
column_block=512 — op-issue latency-bound). This sweeps the three candidate
routes on the real chip:

1. XLA scan (PackedFluxNNs ``wind_mixing_rhs``) across unroll factors — the
   incumbent headline path.
2. XLA scan over the MXU-assembly twin ``ops.fused_rhs.make_fast_rhs``
   (roll-based gradients + divergence-as-matmul, ~13-deep dependent chain).
3. Pallas v1 (``make_fused_runner``) across column blocks — does amortizing
   op-issue latency over bigger tiles close its 3x gap?
4. Pallas MXU variant (``make_fused_runner_mxu``) across column blocks and
   matmul dtypes (f32 vs bf16 NN weights).

Writes one JSON line per configuration to ``studies/fused_sweep_results.jsonl``
and prints a ranked table. Run on TPU:

    PYTHONPATH=/root/repo:/root/.axon_site python studies/fused_kernel_sweep.py

Each timed program is kept under the tunnel's ~60 s device-program watchdog
by sizing n_steps per call; throughput is pipelined (time_fn pipelined=True).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root (script lives in studies/)

import jax
import jax.numpy as jnp


def _bench_xla(model, nns, bcs, x0, dt, n_steps, unroll, rhs=None):
    from climateparameterizations_jl_tpu.models.timestepper import rk4_step
    from climateparameterizations_jl_tpu.models.wind_mixing import wind_mixing_rhs
    from climateparameterizations_jl_tpu.utils.profiling import time_fn

    if rhs is None:
        rhs = lambda x, t: wind_mixing_rhs(model, nns, bcs, x, t)  # noqa: E731

    @jax.jit
    def run(x):
        def body(x, i):
            return rk4_step(rhs, x, i * dt, dt), None

        x, _ = jax.lax.scan(body, x, jnp.arange(n_steps, dtype=jnp.float32), unroll=unroll)
        return x

    return time_fn(run, x0, iters=5, pipelined=True)


def _bench_pallas(runner, x0):
    from climateparameterizations_jl_tpu.utils.profiling import time_fn

    return time_fn(runner, x0, iters=5, pipelined=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n-columns", type=int, default=16384)
    p.add_argument("--n-steps", type=int, default=512)
    p.add_argument("--out", default=os.path.join(os.path.dirname(os.path.abspath(__file__)), "fused_sweep_results.jsonl"))
    p.add_argument("--quick", action="store_true", help="tiny shapes for a smoke run")
    p.add_argument("--platform", default=None, help="force a jax platform (e.g. cpu); the container sitecustomize clobbers JAX_PLATFORMS, so this must be an in-process config update")
    args = p.parse_args()
    if args.quick:
        args.n_columns, args.n_steps = 256, 16
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    interpret = jax.devices()[0].platform != "tpu"  # CPU smoke runs use Pallas interpret mode

    from __graft_entry__ import _make_setup

    from climateparameterizations_jl_tpu.models.wind_mixing import pack_flux_nns
    from climateparameterizations_jl_tpu.ops.fused_rhs import (
        make_fast_rhs,
        make_fused_runner,
        make_fused_runner_mxu,
    )

    model, nns, bcs, x0 = _make_setup(Nz=32, n_columns=args.n_columns)
    dt = jnp.float32(1e-5)
    C, S = args.n_columns, args.n_steps
    platform = jax.devices()[0].platform
    rows = []

    def record(name, stats):
        rate = C * S / stats["median_s"]
        row = {
            "config": name, "n_columns": C, "n_steps": S,
            "median_s": stats["median_s"], "col_ts_per_sec": rate,
            "platform": platform,
        }
        rows.append(row)
        print(f"{name:44s} {rate:12.3e} col-ts/s  ({stats['median_s'] * 1e3:8.2f} ms)", flush=True)
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")

    packed = pack_flux_nns(nns)
    for unroll in (1, 4, 8):
        record(f"xla packed unroll={unroll}",
               _bench_xla(model, packed, bcs, x0, dt, S, unroll))

    fast = make_fast_rhs(model, nns, bcs)
    for unroll in (1, 4, 8):
        record(f"xla fast-rhs (mxu twin) unroll={unroll}",
               _bench_xla(model, None, bcs, x0, dt, S, unroll, rhs=fast))

    # Divergence matmul folded away (A3 @ Dr precomposed; mPP divergence as
    # the C2a/C2b roll-subtract): ~24% fewer matmul FLOPs per RHS.
    fold = make_fast_rhs(model, nns, bcs, fold_divergence=True)
    for unroll in (1, 4, 8):
        record(f"xla fast-rhs fold-divergence unroll={unroll}",
               _bench_xla(model, None, bcs, x0, dt, S, unroll, rhs=fold))

    cbs = sorted({min(cb, C) for cb in (512, 1024, 2048, 4096)})
    for cb in cbs:
        try:
            run = make_fused_runner(model, nns, bcs, float(dt), S, C, column_block=cb, interpret=interpret)
            record(f"pallas v1 cb={cb}", _bench_pallas(run, x0))
        except Exception as e:  # VMEM overflow at large cb is expected
            print(f"pallas v1 cb={cb}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)

    for mdt in ("float32", "bfloat16"):
        for cb in cbs:
            try:
                run = make_fused_runner_mxu(
                    model, nns, bcs, float(dt), S, C, column_block=cb, matmul_dtype=mdt,
                    interpret=interpret,
                )
                record(f"pallas mxu cb={cb} {mdt}", _bench_pallas(run, x0))
            except Exception as e:
                print(f"pallas mxu cb={cb} {mdt}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)

    for lu in (4,):  # time-loop unrolling on the best-guess block size
        cb = min(2048, C)
        try:
            run = make_fused_runner_mxu(
                model, nns, bcs, float(dt), S, C, column_block=cb,
                interpret=interpret, loop_unroll=lu,
            )
            record(f"pallas mxu cb={cb} f32 loop_unroll={lu}", _bench_pallas(run, x0))
        except Exception as e:
            print(f"pallas mxu loop_unroll={lu}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)

    # Hybrid: ONE fused RK4 step as a Pallas kernel, time loop as an XLA
    # scan — VMEM-fused RHS chain but XLA's cross-step pipelining, paying
    # one state round-trip through HBM per step (~24 MB at 16k columns vs
    # the pure-XLA path's ~100 MB of intermediates).
    for cb in ({min(2048, C), min(C, 8192)}):
        try:
            step1 = make_fused_runner_mxu(
                model, nns, bcs, float(dt), 1, C, column_block=cb, interpret=interpret,
            )

            @jax.jit
            def hybrid(x):
                def body(x, _):
                    return step1(x), None

                x, _ = jax.lax.scan(body, x, None, length=S)
                return x

            record(f"pallas mxu single-step x scan cb={cb}", _bench_pallas(hybrid, x0))
        except Exception as e:
            print(f"pallas hybrid cb={cb}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)

    best = max(rows, key=lambda r: r["col_ts_per_sec"])
    print("\nbest:", json.dumps(best))


if __name__ == "__main__":
    main()
