"""Forward-throughput scaling sweep on the real chip.

Measures the headline wind-mixing forward path (PackedFluxNNs + RK4 scan,
``benchmarks.bench_nde_forward``) across column batches and scan unrolls to
find where the latency-bound regime hands over to the MXU-bound one and how
far one chip scales (VERDICT r1 item 7's stretch: >2e8 col-ts/s).

Run (TPU): ``python -u studies/forward_scaling.py``; each config is one
pipelined measurement (5 iterations, one block). Prints one JSON line per
config and a summary table.
"""


from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))  # repo root (script lives in studies/)

import argparse
import json


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--columns", default="1024,4096,16384,32768,65536,131072")
    ap.add_argument("--unrolls", default="4")
    ap.add_argument("--n-steps", type=int, default=1024)
    ap.add_argument("--chunk-columns", type=int, default=None,
                    help="lax.map the scan over column chunks (VMEM-cliff mitigation)")
    ap.add_argument("--rhs-variant", default="packed", choices=["packed", "fast", "fold"],
                    help="packed = incumbent headline path; fast = MXU-assembly twin; "
                         "fold = fast with the divergence matmul precomposed away")
    ap.add_argument("--out", default=None, help="append JSON lines here")
    args = ap.parse_args(argv)

    from climateparameterizations_jl_tpu.benchmarks import bench_nde_forward

    rows = []
    for unroll in (int(u) for u in args.unrolls.split(",")):
        for n in (int(c) for c in args.columns.split(",")):
            # Effective chunking: only when it divides and actually splits
            # (a non-divisor chunk would abort the sweep mid-run; rows must
            # record the chunk actually used, not the CLI value).
            chunk = args.chunk_columns if args.chunk_columns and n > args.chunk_columns and n % args.chunk_columns == 0 else None
            try:
                stats = bench_nde_forward(
                    n_columns=n, n_steps=args.n_steps, unroll=unroll,
                    chunk_columns=chunk, rhs_variant=args.rhs_variant,
                )
            except Exception as e:  # one huge config OOMing must not eat the sweep
                print(json.dumps({"n_columns": n, "unroll": unroll, "chunk_columns": chunk,
                                  "error": f"{type(e).__name__}: {e}"}), flush=True)
                continue
            row = {
                "n_columns": n,
                "unroll": unroll,
                "n_steps": args.n_steps,
                "chunk_columns": chunk,
                "rhs_variant": args.rhs_variant,
                "median_s": stats["median_s"],
                "col_ts_per_s": stats["column_timesteps_per_sec"],
                "mfu_pct": stats.get("mfu_pct"),
                "achieved_tflops": stats.get("achieved_tflops"),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
            if args.out:
                with open(args.out, "a") as f:
                    f.write(json.dumps(row) + "\n")

    if rows:
        best = max(rows, key=lambda r: r["col_ts_per_s"])
        print(f"best: {best['col_ts_per_s']:.3e} col-ts/s at {best['n_columns']} cols, unroll={best['unroll']}")


if __name__ == "__main__":
    main()
