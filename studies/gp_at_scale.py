"""GP family at reference scale (VERDICT r2 item 5).

The reference's GP experiments live on the 8-day suites
(``wind_mixing/run_GP_DE.jl:103-213``: 3 exact flux GPs on all training
snapshots, kernel search, GP-closure DE integration; build timing in
``Benchmarking.jl:55``). Round 2 measured the TPU GP stack only to
n = 1,024-2,048; this study takes it to the flagship suite's full
n = 18 sims x 1,153 frames ~ 20.8k snapshot pairs:

1. kernel-family selection (ids 1-4 + rational-quadratic 5 + spectral-
   mixture 6) on SUBSAMPLED leave-out splits — the reference's own sweep
   subsamples too (``optimize_GP_kernels.jl:41-62``);
2. exact-GP build timings vs n, f32 (dtype-aware jitter) and f64 (the
   reference's precision; TPU f64 is emulated, so sizes are probed with an
   n^3 projection and stopped before the tunnel's ~60 s program killer);
3. f32-vs-f64 fidelity at a common n (justifies the f32 at-scale path);
4. Pallas MXU Gram vs XLA Gram forward at large n (chip only);
5. final 3-flux fit at FULL n + held-out flux MSE + posterior-variance
   band calibration (``eval/uq_calibration.band_report`` — the same schema
   the deep-ensemble bands report, so RESULTS puts both UQ families in one
   table);
6. GP-closure DE integration over the full 1,153-frame horizon on a
   held-out sim (``run_GP_DE.jl:181-192``), for the GP-DE vs NDE trajectory
   comparison at the reference's own horizon.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from studies import flagship_training as F


def _pairs(ds, scalings, flux, dtype):
    import jax.numpy as jnp

    from climateparameterizations_jl_tpu.data.containers import direct_regression_pairs

    x, y = direct_regression_pairs(ds, scalings, flux)
    return jnp.asarray(x, dtype), jnp.asarray(y, dtype)


def select_kernels(ds, scalings, z, kernel_ids=(1, 2, 3, 4, 5, 6), n_splits=6, stride=20):
    """Leakage-free family selection on subsampled leave-one-out splits."""
    import jax
    import jax.numpy as jnp

    from climateparameterizations_jl_tpu.closures.gp import error_per_gamma, select_best_kernel
    from climateparameterizations_jl_tpu.data.containers import (
        direct_regression_pairs,
        fit_wind_mixing_scalings,
    )

    S = ds.T.shape[0]
    log_gammas = np.linspace(-1.5, 1.5, 10)
    t0 = time.perf_counter()
    out = {}
    for flux in ("uw", "vw", "wT"):
        errors = {kid: np.zeros(len(log_gammas)) for kid in kernel_ids}
        for i in range(0, S, max(1, S // n_splits)):
            keep = np.array([j for j in range(S) if j != i])
            sub = jax.tree.map(lambda a, k=keep: a[k], ds)
            held = jax.tree.map(lambda a, idx=i: a[idx], ds)
            sub_scl = fit_wind_mixing_scalings(sub)
            xs, ys = direct_regression_pairs(sub, sub_scl, flux)
            xv, yv = direct_regression_pairs(held, sub_scl, flux)
            # f64 selection (the reference's precision): on LES data the f32
            # batched Cholesky went non-finite for EVERY non-SM family.
            xs, ys = jnp.asarray(xs[::stride], jnp.float64), jnp.asarray(ys[::stride], jnp.float64)
            xv, yv = jnp.asarray(xv, jnp.float64), jnp.asarray(yv, jnp.float64)
            z_arr = jnp.linspace(0.0, 1.0, xs.shape[-1])
            for kid in kernel_ids:
                errors[kid] += np.asarray(error_per_gamma(xs, ys, xv, yv, z_arr, kid, log_gammas))
        kernel, err = select_best_kernel(errors, log_gammas, "euclidean", 0.0, jnp.float64)
        fam = getattr(kernel, "family", "spectral_mixture")
        # Runner-up among the NON-spectral-mixture families: the f32
        # fallback when the SM winner's f32 Gram goes non-finite at scale
        # (measured on the chip: SM in f32 NaNs; its f64 path is fine).
        rest = {kid: errors[kid] for kid in errors if kid != 6}
        try:
            k2, err2 = select_best_kernel(rest, log_gammas, "euclidean", 0.0, jnp.float64)
        except ValueError:  # every non-SM point non-finite: no fallback exists
            k2, err2 = kernel, err
        out[flux] = (kernel, fam, float(err), k2, getattr(k2, "family", "?"), float(err2))
        print(f"select[{flux}]: {fam} (val mse {err:.4e}; runner-up {out[flux][4]} {err2:.4e})", flush=True)
    return out, time.perf_counter() - t0


def _subset(x, n):
    """Strided size-n subset: consecutive frames are near-duplicates, and a
    contiguous [:n] slice makes the Gram catastrophically ill-conditioned
    (measured: the f64 fit on such a slice predicts garbage while f32's
    larger dtype-aware jitter happens to regularize it). Striding spreads
    the subset over sims and times."""
    step = max(1, x.shape[0] // n)
    return x[::step][:n]


def _timed_fit(x, ys, kernels, z, n, repeats=3):
    """Build time for the fused 3-flux fit at size n (pipelined-ish: one
    block, jitted once)."""
    import jax

    from climateparameterizations_jl_tpu.closures.gp import gp_fit_multi

    x_n, ys_n = _subset(x, n), [_subset(y, n) for y in ys]

    @jax.jit
    def build(x, y1, y2, y3):
        models = gp_fit_multi(x, [y1, y2, y3], kernels, z)
        return tuple(m.alpha for m in models)

    t0 = time.perf_counter()
    out = build(x_n, *ys_n)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    vals = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = build(x_n, *ys_n)
        jax.block_until_ready(out)
        vals.append(time.perf_counter() - t0)
    return dict(n=int(n), compile_s=compile_s, median_s=float(np.median(vals)), min_s=float(min(vals)))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--out", default=None)
    ap.add_argument("--smoke", action="store_true", help="tiny sizes, CPU-friendly correctness flush")
    ap.add_argument("--max-program-s", type=float, default=45.0,
                    help="skip f64 sizes whose projected build exceeds this (tunnel kills ~60 s programs)")
    ap.add_argument("--skip-pallas", action="store_true")
    ap.add_argument("--selection-stride", type=int, default=20)
    ap.add_argument("--ladders-from", default=None,
                    help="splice the build_f32/build_f64 ladders from a prior partial "
                         "result json instead of re-measuring them (compile-heavy)")
    ap.add_argument("--gram-only", action="store_true",
                    help="run ONLY the Pallas-vs-XLA Gram A/B, with x64 OFF (the fused "
                         "Pallas kernel cannot trace i64 indices under x64 — Mosaic "
                         "legalization, measured), and dump it to --out. The main run "
                         "splices the resulting json via --gram-from.")
    ap.add_argument("--gram-from", default=None,
                    help="splice a prior --gram-only json into this result")
    ap.add_argument("--fidelity-from", default=None,
                    help="splice the f32-vs-f64 fidelity + jitter-sweep results from a "
                         "prior (possibly partial) result json")
    ap.add_argument("--selection-from", default=None,
                    help="splice the kernel-family selection from a prior (possibly "
                         "partial) result json instead of re-running the ~6-split f64 "
                         "grid search (tunnel-latency-dominated; kernels are rebuilt "
                         "from the recorded family + log_gamma)")
    ap.add_argument("--de-chunk", type=int, default=128,
                    help="GP-DE saves per device dispatch — the tunnel kills any single "
                         "program running longer than ~60-90 s (CLAUDE.md), and the "
                         "un-chunked 1,152-step f64 scan is exactly such a program")
    ap.add_argument("--seq-f64-n", type=int, default=16384,
                    help="per-flux sequential f64 fallback size: fitting flux-by-flux "
                         "holds ONE kernel+Cholesky (~32 n^2 bytes, vs the fused "
                         "3-flux fit's ~56 n^2), lifting the HBM wall from 8k to 16k")
    ap.add_argument("--blocked-above", type=int, default=16000,
                    help="per-flux f64 fits at n >= this use the BLOCKED fit "
                         "(ops/blocked_gp.py: tile-sized programs only) — the "
                         "single-program fit dies in the tunnel's remote-compile "
                         "service at n = 16,384 (HTTP 500, gp_at_scale_r4.json)")
    ap.add_argument("--blocked-block", type=int, default=4096,
                    help="tile size for the blocked f64 fit")
    ap.add_argument("--force-seq-f64", action="store_true",
                    help="skip the full-n f32 fit attempt and go straight to the "
                         "per-flux sequential f64 path (the honest at-scale config "
                         "on the LES data, where f32 is measured non-finite; also "
                         "how the CPU smoke exercises the seq/blocked/splice path)")
    ap.add_argument("--gp-full-from", default=None,
                    help="splice completed per-flux f64 fits from a prior result json "
                         "(+ its .alphas.npz side file): spliced fluxes skip their "
                         "~600-1000 s Cholesky AND their band eval; only missing fluxes "
                         "are fit. A retry must never re-pay a finished fit (VERDICT r4 "
                         "next-round #1a). Fresh fits dump alphas to --out's side file.")
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    if args.gram_only:
        # x64 stays OFF: this is the separate process the main run's
        # gram_note points at (VERDICT r3 missing #2 — the A/B was promised
        # and never recorded as an artifact).
        from climateparameterizations_jl_tpu.benchmarks import bench_gp

        # 8192 = the validated Mosaic ceiling; smoke = tiny (off-TPU the
        # Pallas kernel runs in interpret mode, which is minutes per tile).
        n_gram = 256 if args.smoke else 8192
        out = {"backend": jax.default_backend(), "gram_n": n_gram, "x64": False}
        for backend in ("xla", "pallas"):
            rows = bench_gp(n_train=n_gram, n_features=96, backend=backend)
            out[f"gram_{backend}"] = {k: v for k, v in rows.items() if isinstance(v, (int, float))}
            print(f"gram[{backend}] @ n={n_gram}: {out[f'gram_{backend}']}", flush=True)
        if args.out:
            with open(args.out, "w") as f:
                json.dump(out, f, indent=2)
        return out

    # The f64 arm is the point of the precision study — without x64 the
    # "f64" builds silently truncate to f32 and the comparison is vacuous.
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from climateparameterizations_jl_tpu.closures.gp import (
        GPModel,
        get_kernel,
        gp_fit_multi,
        gp_predict,
        gp_uncertainty,
    )
    from climateparameterizations_jl_tpu.eval.uq_calibration import band_report, fit_band_calibration

    F.DATA_DIR = args.data_dir
    wall0 = time.perf_counter()
    result = {"data_dir": args.data_dir, "backend": None}

    def dump():
        # Incremental: a crash in a later phase must not lose the earlier
        # measured rows (the first r3 chip attempt died after the builds).
        result["total_wall_s"] = time.perf_counter() - wall0
        if args.out:
            with open(args.out, "w") as f:
                json.dump(result, f, indent=2)

    ds, model, _ = F.build()
    result["backend"] = jax.default_backend()
    scalings = model.scalings
    d = 3 * model.Nz
    z = jnp.linspace(0.0, 1.0, d)

    # 1. kernel-family selection (subsampled; includes SM id 6).
    if args.selection_from:
        # Rebuild the (winner, runner-up) kernels from a prior dump's
        # (family, log_gamma) — the selection grid is deterministic given
        # the suite, and a wedged-tunnel rerun must not pay its ~10 f64
        # compiles again. An SM winner without a recorded scalar length
        # scale cannot be reconstructed; fall back to the runner-up.
        _ids = {"squared_exponential": 1, "matern12": 2, "matern32": 3,
                "matern52": 4, "rational_quadratic": 5, "spectral_mixture": 6}

        def _rebuild(fam, lg):
            if lg is None:
                return None
            return get_kernel(_ids[fam], lg, 0.0, "euclidean", dtype=jnp.float64)

        prior_sel = json.load(open(args.selection_from))["selection"]
        sel, rebuilt_from_runner_up = {}, set()
        for f, row in prior_sel.items():
            k2 = _rebuild(row["runner_up"], row["runner_up_log_gamma"])
            k = _rebuild(row["kernel"], row["log_gamma"]) or k2
            if k is None:
                raise SystemExit(f"--selection-from: cannot rebuild either kernel for {f}")
            if row["log_gamma"] is not None:
                fam, err = row["kernel"], row["val_mse"]
            else:
                # SM winner unreconstructable -> the runner-up IS the spliced
                # model; pair its name with ITS val mse (not the winner's) so
                # the re-dumped selection row stays self-consistent.
                fam, err = row["runner_up"], row["runner_up_mse"]
                rebuilt_from_runner_up.add(f)
            sel[f] = (k, fam, err, k2 or k, row["runner_up"], row["runner_up_mse"])
            print(f"select[{f}] spliced from {args.selection_from}: {fam}", flush=True)
        sel_s = 0.0
        result["selection_from"] = args.selection_from
    else:
        rebuilt_from_runner_up = set()
        sel, sel_s = select_kernels(
            ds, scalings, z,
            kernel_ids=(1, 2, 3, 4, 5, 6),
            n_splits=2 if args.smoke else 6,
            stride=200 if args.smoke else args.selection_stride,
        )
    import numpy as _np

    def _gamma(k):
        g = getattr(k, "gamma", None)
        return None if g is None else float(_np.log10(float(g)))

    result["selection"] = {
        f: dict(kernel=fam, val_mse=err, log_gamma=_gamma(k),
                runner_up=fam2, runner_up_mse=err2, runner_up_log_gamma=_gamma(k2),
                **({"rebuilt_from": "runner_up"} if f in rebuilt_from_runner_up else {}))
        for f, (k, fam, err, k2, fam2, err2) in sel.items()
    }
    result["selection_wall_s"] = sel_s
    dump()

    # Training pairs at full scale.
    x32, ys32 = None, []
    for flux in ("uw", "vw", "wT"):
        xf, yf = _pairs(ds, scalings, flux, jnp.float32)
        if x32 is None:
            x32 = xf
        ys32.append(yf)
    n_full = int(x32.shape[0])
    if args.smoke:
        n_full = min(n_full, 2048)
        x32, ys32 = _subset(x32, n_full), [_subset(y, n_full) for y in ys32]
    result["n_full"] = n_full
    to32 = lambda k: jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), k)  # noqa: E731
    kernels32 = [to32(sel[f][0]) for f in ("uw", "vw", "wT")]
    fallback32 = [to32(sel[f][3]) for f in ("uw", "vw", "wT")]

    # 2. build timings vs n: f32 to full scale; f64 probed with n^3 projection.
    # The splice is KEY-WISE: a prior PARTIAL dump (e.g. a timed-out attempt)
    # may hold only the f32 ladder — reuse what exists, re-measure the rest.
    have_f32 = have_f64 = False
    if args.ladders_from:
        prior = json.load(open(args.ladders_from))
        have_f32 = bool(prior.get("build_f32"))
        have_f64 = bool(prior.get("build_f64"))
        if have_f32:
            result["build_f32"] = prior["build_f32"]
        if have_f64:
            result["build_f64"] = prior["build_f64"]
        result["ladders_from"] = args.ladders_from
        print(f"build ladders spliced from {args.ladders_from} "
              f"(f32: {have_f32}, f64: {have_f64})", flush=True)
        dump()
    if not have_f32:
        sizes32 = [s for s in (4096, 8192, 16384, n_full) if s <= n_full] or [n_full]
        result["build_f32"] = []
        for n in sorted(set(sizes32)):
            row = _timed_fit(x32, ys32, kernels32, z, n)
            result["build_f32"].append(row)
            print(f"build f32 n={row['n']}: {row['median_s']*1e3:.1f} ms (compile {row['compile_s']:.1f} s)", flush=True)
            dump()  # per-row: a killed attempt keeps its measured rows

    x64 = jnp.asarray(x32, jnp.float64)
    ys64 = [jnp.asarray(y, jnp.float64) for y in ys32]
    kernels64 = [jax.tree.map(lambda a: jnp.asarray(a, jnp.float64), k) for k in kernels32]
    result.setdefault("build_f64", [])
    # Resume-aware: a spliced partial ladder contributes its measured rows
    # and the loop continues from the first MISSING size (seeding the
    # projection guard from the last measured row).
    measured64 = {r["n"] for r in result["build_f64"] if "n" in r}
    timed64 = [r for r in result["build_f64"] if "median_s" in r]
    projected = timed64[-1]["median_s"] * 8.0 if timed64 else 0.0
    # HBM guard: the fused 3-flux f64 fit holds ~(dist + 3 K + 3 chol) n^2
    # doubles ~ 56 n^2 bytes; the v5e chip has 16 GB (measured: n=16384
    # f64 OOM-killed the first r3 session arm).
    f64_hbm_cap = int((10e9 / 56) ** 0.5)
    # 4 sizes, not 6: each fused f64 build is a 1.5-5 min COMPILE on the
    # chip (r3 logs: 90 s at n=1k, 160 s at 2k), and the n>13.4k sizes only
    # ever record the HBM-guard skip row.
    for n in sorted({s for s in (1024, 4096, 8192, n_full) if s <= n_full}):
        if n in measured64:
            continue
        if jax.default_backend() == "tpu" and n > f64_hbm_cap:
            result["build_f64"].append(dict(n=int(n), skipped=f"~{56 * n * n / 1e9:.0f} GB f64 working set > HBM"))
            print(f"build f64 n={n}: SKIPPED (HBM)", flush=True)
            break
        if projected > args.max_program_s:
            result["build_f64"].append(dict(n=int(n), skipped=f"projected {projected:.0f} s > {args.max_program_s} s"))
            print(f"build f64 n={n}: SKIPPED (projected {projected:.0f} s)", flush=True)
            break
        row = _timed_fit(x64, ys64, kernels64, z, n, repeats=2)
        result["build_f64"].append(row)
        print(f"build f64 n={row['n']}: {row['median_s']*1e3:.1f} ms (compile {row['compile_s']:.1f} s)", flush=True)
        projected = row["median_s"] * 8.0  # next size doubles n -> ~8x cholesky
        dump()

    # 3. f32 vs f64 fidelity at a common n (spliceable: the fidelity +
    # jitter stages are several chip-minutes of f64 compiles a resumed
    # attempt must not pay twice).
    n_fid = min(4096, n_full)
    held = F.load_suite([F.TEST_FILES[0]])
    xh32, yh32 = _pairs(held, scalings, "wT", jnp.float32)
    yh = np.asarray(yh32)
    fid_prior = None
    if args.fidelity_from:
        fid_prior = json.load(open(args.fidelity_from))
        if "f32_vs_f64" not in fid_prior:
            fid_prior = None
    if fid_prior is not None:
        result["fidelity_n"] = fid_prior["fidelity_n"]
        result["f32_vs_f64"] = fid_prior["f32_vs_f64"]
        result["fidelity_from"] = args.fidelity_from
        f32_winner_finite = bool(np.isfinite(fid_prior["f32_vs_f64"]["mse_f32"]))
        if not f32_winner_finite:
            kernels32 = fallback32
            result["f32_at_scale_kernel"] = fid_prior.get(
                "f32_at_scale_kernel", "runner-up (winner non-finite in f32)")
        print(f"fidelity spliced from {args.fidelity_from} (f32 finite: {f32_winner_finite})", flush=True)
    else:
        m32 = gp_fit_multi(_subset(x32, n_fid), [_subset(ys32[2], n_fid)], [kernels32[2]], z)[0]
        m64 = gp_fit_multi(_subset(x64, n_fid), [_subset(ys64[2], n_fid)], [kernels64[2]], z)[0]
        p32 = np.asarray(gp_predict(m32, xh32))
        p64 = np.asarray(gp_predict(m64, jnp.asarray(xh32, jnp.float64)))
        result["fidelity_n"] = int(n_fid)
        result["f32_vs_f64"] = dict(
            max_abs_pred_diff=float(np.abs(p32 - p64).max()),
            rms_pred=float(np.sqrt(np.mean(p64**2))),
            mse_f32=float(np.mean((p32 - yh) ** 2)),
            mse_f64=float(np.mean((p64 - yh) ** 2)),
            winner_kernel=result["selection"]["wT"]["kernel"],
        )
        f32_winner_finite = bool(np.isfinite(p32).all())
        if not f32_winner_finite:
            # SM in f32 is non-finite at this n (its trig/exp mixture underflows
            # f32; f64 is fine) — the f32 AT-SCALE path falls back to the best
            # non-SM family, recorded as such.
            print("f32 winner non-finite -> falling back to runner-up families for the at-scale f32 fit", flush=True)
            kernels32 = fallback32
            result["f32_at_scale_kernel"] = "runner-up (winner non-finite in f32)"
        del m32, m64, p32, p64
        print(f"f32 vs f64 @ n={n_fid}: max|dpred| {result['f32_vs_f64']['max_abs_pred_diff']:.3e} "
              f"(rms {result['f32_vs_f64']['rms_pred']:.3e}); held-out mse {result['f32_vs_f64']['mse_f32']:.4e} "
              f"vs {result['f32_vs_f64']['mse_f64']:.4e}", flush=True)
    dump()

    # 4. Pallas MXU Gram vs XLA at large n: this process runs under x64
    # (the precision study's point), and the fused Pallas kernel cannot
    # trace under x64 (Mosaic i64 legalization, measured) — so the A/B runs
    # as a SEPARATE x64-off process (`--gram-only`) whose json is spliced
    # in here, making the committed artifact self-contained.
    if not args.skip_pallas:
        result["gram_note"] = ("measured by a separate x64-off process: "
                               "studies/gp_at_scale.py --gram-only (Mosaic cannot "
                               "legalize the i64 indices an x64 trace produces)")
        if args.gram_from and os.path.exists(args.gram_from):
            result["gram_ab"] = json.load(open(args.gram_from))
            result["gram_ab"]["source"] = args.gram_from
            g = result["gram_ab"]
            if "gram_xla" in g and "gram_pallas" in g:
                print(f"gram A/B spliced from {args.gram_from}: "
                      f"xla {g['gram_xla'].get('median_s', 0) * 1e3:.1f} ms vs "
                      f"pallas {g['gram_pallas'].get('median_s', 0) * 1e3:.1f} ms @ n={g.get('gram_n')}", flush=True)
        dump()

    # 4b. jitter (noise-floor) sweep at n_fid: the dtype-default jitter is a
    # numerical floor, not a noise model — with near-duplicate snapshot rows
    # the Gram is close to singular and the residuals carry real LES noise,
    # so validating the ridge level fixes both conditioning and (partly) the
    # overconfident posterior. The reference's robust Cholesky escalates
    # jitter until SPD (gaussian_process.jl:60-74); here the level is picked
    # on the VALIDATION sim by MSE.
    if fid_prior is not None and "jitter_sweep" in fid_prior:
        result["jitter_sweep"] = fid_prior["jitter_sweep"]
        result["jitter_used"] = fid_prior["jitter_used"]
        best_jitter = None if result["jitter_used"] == "dtype-default" else float(result["jitter_used"])
        print(f"jitter sweep spliced: using {result['jitter_used']}", flush=True)
    else:
        jitter_rows = []
        for js in (None, 1e-4, 1e-3, 1e-2):
            # f64: the slowly-decaying selected kernels (RQ at gamma ~ 0.07,
            # matern12) are numerically non-SPD beyond f32 on the near-duplicate
            # snapshot rows — measured: every f32 jitter level NaN'd. This is
            # the reference's own regime (f64 robust Cholesky).
            m = gp_fit_multi(_subset(x64, n_fid), [_subset(ys64[2], n_fid)], [kernels64[2]], z, jitter_scale=js)[0]
            mse = float(np.mean((np.asarray(gp_predict(m, jnp.asarray(xh32, jnp.float64))) - yh) ** 2))
            jitter_rows.append(dict(jitter_scale=js if js is not None else "dtype-default", val_mse=mse))
            del m
        finite_rows = [r for r in jitter_rows if np.isfinite(r["val_mse"])] or [{"jitter_scale": "dtype-default"}]
        best_jitter = min(finite_rows, key=lambda r: r.get("val_mse", np.inf))["jitter_scale"]
        best_jitter = None if best_jitter == "dtype-default" else best_jitter
        result["jitter_sweep"] = jitter_rows
        result["jitter_used"] = best_jitter if best_jitter is not None else "dtype-default"
        dump()
        print(f"jitter sweep @ n={n_fid}: " + ", ".join(f"{r['jitter_scale']}: {r['val_mse']:.4e}" for r in jitter_rows), flush=True)

    # 5. final at-scale fit: f32 at full n if it is finite (fast path),
    # else f64 at the largest HBM-feasible n — the selected kernels measured
    # non-finite in f32 here, so the honest at-scale configuration is the
    # reference's: f64, n = 8192 strided (plus the full-n f32 timing rows
    # above showing the 448 ms build the precision wall forecloses).
    import gc

    n_final, final_dtype = n_full, "f32"

    def _fit(x, ys_, ks_, js):
        # Under jit: planned memory (the eager path materializes every
        # intermediate and OOMs where the identical jitted build fits).
        return jax.jit(lambda a, b1, b2, b3: gp_fit_multi(a, [b1, b2, b3], ks_, z, jitter_scale=js))(x, *ys_)

    # Held-out band discipline, SAME as the deep-ensemble table (VERDICT r3
    # weak #5): the inflation is fit on the FIRST held-out sim (validation)
    # and coverage is REPORTED on the other two (test) sims, roles marked.
    test_sets = {name: (held if j == 0 else F.load_suite([name])) for j, name in enumerate(F.TEST_FILES)}
    gp_rows = {}
    result["gp_full"] = gp_rows  # filled + dumped per flux (crash insurance)

    def _eval_flux_bands(flux, m, n_final, final_dtype, tiles=None):
        from climateparameterizations_jl_tpu.ops.blocked_gp import gp_uncertainty_blocked

        fdt = jnp.float32 if final_dtype == "f32" else jnp.float64
        cal = None
        sims = {}
        for name in F.TEST_FILES:
            xh, yh_f = _pairs(test_sets[name], scalings, flux, fdt)
            pred = np.asarray(gp_predict(m, xh))
            # per-snapshot posterior variance (tiled factor for blocked fits)
            var = np.asarray(
                gp_uncertainty_blocked(m, tiles, xh, block=args.blocked_block)
                if tiles is not None else gp_uncertainty(m, xh)
            )
            std = np.sqrt(np.maximum(var, 0.0))[:, None] * np.ones_like(pred)
            truth = np.asarray(yh_f)
            row = dict(
                mse=float(np.mean((pred - truth) ** 2)),
                mean_posterior_std=float(std.mean()),
            )
            if cal is None:
                cal = fit_band_calibration(truth, pred, std)
                row["calibration_role"] = "validation (inflation fit here)"
            else:
                row["calibration_role"] = "test"
            row["band_raw"] = band_report(truth, pred, std)
            row["band_calibrated"] = band_report(truth, pred, std, lam=cal.lam)
            sims[name] = row
            print(f"gp[{flux}][{name}] @ n={n_final} {final_dtype}: mse {row['mse']:.4e}, "
                  f"2-sigma coverage {row['band_raw']['coverage']:.2f} -> "
                  f"{row['band_calibrated']['coverage']:.2f} calibrated "
                  f"({row['calibration_role'].split(' ')[0]}, lam {cal.lam:.2f})", flush=True)
        # lam is the APPLIED inflation (only-inflate floor, round 5 —
        # shrinking on one over-dispersed validation sim measured 0.49/0.51
        # held-out coverage in r4); the unfloored fit stays recorded.
        gp_rows[flux] = dict(n=int(n_final), dtype=final_dtype, lam=cal.lam,
                             lam_fit_unfloored=cal.lam_coverage, sims=sims)
        dump()

    def _strip_chol(m):
        # gp_predict and the GP-DE RHS only need (kernel, x_train, alpha);
        # chol is an n^2 buffer (1.2 GB at n=12k f64) that only the band
        # stage's gp_uncertainty touches. Retaining finished fluxes' chols
        # while fitting the next flux is what OOM'd the r4c first attempt
        # (12k uw ok -> vw ResourceExhausted -> every smaller size poisoned).
        import dataclasses as dc

        return dc.replace(m, chol=None)

    finite = False
    fit_mode = "fused 3-flux"
    if args.force_seq_f64:
        f32_winner_finite = False
        result["f32_full_fit_error"] = "skipped: --force-seq-f64"
    if f32_winner_finite:
        # Only attempt the full-n f32 fit when the n=4096 fidelity fit was
        # finite — a doomed 12 GB attempt exhausts HBM in a way the f64
        # fallback then cannot recover from (measured).
        try:
            models = _fit(x32, ys32, kernels32, best_jitter)
            finite = all(bool(jnp.isfinite(m.alpha).all()) for m in models)
        except Exception as e:
            result["f32_full_fit_error"] = repr(e)[:200]
            finite = False
    else:
        result.setdefault("f32_full_fit_error",
                          "skipped: n=4096 f32 fit already non-finite (see f32_vs_f64)")
    if finite:
        out_models = []
        for flux, m in zip(("uw", "vw", "wT"), models):
            _eval_flux_bands(flux, m, n_final, final_dtype)
            out_models.append(_strip_chol(m))
        models = out_models
        gc.collect()
    else:
        result["f32_full_fit"] = "non-finite/OOM (measured; see f32_vs_f64 + jitter_sweep)"
        models = None
        gc.collect()  # drop the failed f32 attempt's device buffers first
        # Honest-precision fallback, now PER-FLUX SEQUENTIAL (VERDICT r3
        # item 7): the fused 3-flux f64 fit holds ~56 n^2 bytes (measured
        # OOM at 16k), but one flux at a time holds only dist + K + chol
        # ~ 32 n^2. Each flux is fit -> band-scored -> chol-stripped before
        # the next starts, so only ONE n^2 factor is ever live.
        #
        # Self-healing size ladder: the axon tunnel's REMOTE-COMPILE service
        # 500s on the largest f64 programs (r4b, captured: "INTERNAL:
        # .../remote_compile: HTTP 500" from compile_and_load — THE crash
        # that killed both r3b attempts, then unexplained) — on failure,
        # drop to the next size and record the error instead of dying.
        final_dtype = "f64"
        fit_mode = "per-flux sequential"
        result["seq_f64_errors"] = {}

        # --gp-full-from: completed fits splice in as (band rows + alpha);
        # the rebuilt GPModel (kernel + deterministic strided x_train +
        # persisted alpha) is everything gp_predict and the GP-DE need.
        splice = {}
        if args.gp_full_from:
            try:
                pj = json.load(open(args.gp_full_from))
                side = np.load(args.gp_full_from + ".alphas.npz")
                for fl in ("uw", "vw", "wT"):
                    row = pj.get("gp_full", {}).get(fl)
                    if (row and row.get("dtype") == "f64" and f"alpha_{fl}" in side
                            and int(side[f"n_{fl}"]) == int(row["n"])):
                        splice[fl] = (int(row["n"]), np.asarray(side[f"alpha_{fl}"]), row)
                ns = {v[0] for v in splice.values()}
                if len(ns) > 1:  # mixed-size splices cannot share one ladder rung
                    keep = max(ns)
                    splice = {fl: v for fl, v in splice.items() if v[0] == keep}
                if splice:
                    print(f"gp_full splice from {args.gp_full_from}: "
                          f"{sorted(splice)} @ n={next(iter(splice.values()))[0]}", flush=True)
            except Exception as e:
                print(f"--gp-full-from: no usable splice ({e!r})"[:200], flush=True)
        alphas_out = {}

        def _dump_alphas():
            if args.out:
                np.savez(args.out + ".alphas.npz", **alphas_out)

        ladder = [n for n in dict.fromkeys((min(args.seq_f64_n, n_full), 16384, 12288, 10240, 8192))
                  if n <= min(n_full, args.seq_f64_n)]
        if splice:
            n_spl = next(iter(splice.values()))[0]
            ladder = [n_spl] + [n for n in ladder if n < n_spl]
        for n_try in ladder:
            trial = []
            try:
                seq_walls = []
                x_fit = _subset(x64, n_try)
                blocked = n_try >= args.blocked_above
                for i, flux in enumerate(("uw", "vw", "wT")):
                    if flux in splice and splice[flux][0] == n_try:
                        n_spl, alpha_spl, row_spl = splice[flux]
                        m = GPModel(kernel=kernels64[i], x_train=_subset(x64, n_try), z=z,
                                    alpha=jnp.asarray(alpha_spl, jnp.float64), chol=None)
                        gp_rows[flux] = dict(row_spl, spliced_from=args.gp_full_from)
                        alphas_out[f"alpha_{flux}"] = np.asarray(alpha_spl)
                        alphas_out[f"n_{flux}"] = n_try
                        seq_walls.append(0.0)
                        trial.append(m)
                        print(f"seq f64 fit[{flux}] @ n={n_try}: SPLICED "
                              f"(bands + alpha from {args.gp_full_from})", flush=True)
                        dump()
                        continue
                    t0 = time.perf_counter()
                    if blocked:
                        # Tile-sized programs only: the single-program fit's
                        # remote compile 500s at this n (r4, measured).
                        from climateparameterizations_jl_tpu.ops.blocked_gp import gp_fit_blocked

                        m, tiles = gp_fit_blocked(
                            x_fit, _subset(ys64[i], n_try), kernels64[i], z,
                            block=args.blocked_block, jitter_scale=best_jitter,
                        )
                    else:
                        m = jax.jit(
                            lambda a, b, k=kernels64[i]: gp_fit_multi(a, [b], [k], z, jitter_scale=best_jitter)[0]
                        )(x_fit, _subset(ys64[i], n_try))
                        tiles = None
                    jax.block_until_ready(m.alpha)
                    seq_walls.append(time.perf_counter() - t0)
                    result["seq_f64_fit_walls_s"] = [float(w) for w in seq_walls]
                    result["seq_f64_fit_mode"] = (
                        f"blocked (tile {args.blocked_block})" if blocked else "single-program")
                    print(f"seq f64 fit[{flux}] @ n={n_try}"
                          f"{' [blocked]' if blocked else ''}: {seq_walls[-1]:.1f} s (incl. compile)", flush=True)
                    _eval_flux_bands(flux, m, n_try, final_dtype, tiles=tiles)
                    trial.append(_strip_chol(m))
                    # Persist this flux's posterior weights: a retry splices
                    # them (--gp-full-from) instead of re-paying the fit.
                    alphas_out[f"alpha_{flux}"] = np.asarray(m.alpha)
                    alphas_out[f"n_{flux}"] = n_try
                    _dump_alphas()
                    del m, tiles
                    gc.collect()
                models, n_final = trial, n_try
                break
            except Exception as e:
                result["seq_f64_errors"][str(n_try)] = repr(e)[:300]
                print(f"seq f64 fit @ n={n_try} FAILED ({e!r:.200}); dropping a size", flush=True)
                del trial
                gc.collect()
                dump()
        if models is None:
            raise SystemExit("per-flux f64 fit failed at every ladder size (see seq_f64_errors)")
    result["final_fit"] = dict(n=int(n_final), dtype=final_dtype, mode=fit_mode,
                               jitter=best_jitter if best_jitter is not None else "dtype-default")
    print(f"final fit: {final_dtype} @ n={n_final} ({fit_mode})", flush=True)

    # 6. GP-closure DE over the full 8-day horizon on the held-out sim.
    from climateparameterizations_jl_tpu.data.containers import scaled_state_array
    from climateparameterizations_jl_tpu.models.gp_closure import (
        FluxGPs,
        _share_gram,
        share_train_inputs,
        solve_gp_closure,
    )

    x_true = scaled_state_array(held, scalings)
    x_true = x_true.reshape(-1, x_true.shape[-2], x_true.shape[-1])[0]
    # Integrate in the MODELS' dtype: an f32 carry with f64 GP predictions
    # is a scan carry-type mismatch (and silently downcasting the GP would
    # undo the precision the f64 fit paid for).
    x_true = jnp.asarray(x_true, jnp.float64 if final_dtype == "f64" else jnp.float32)
    n_frames = int(x_true.shape[0] - 1) if not args.smoke else min(48, x_true.shape[0] - 1)
    t_row = held.t.reshape(-1, held.t.shape[-1])[0] if held.t.ndim > 1 else held.t
    dt_hat = float((t_row[1] - t_row[0]) / model.tau)
    # Per-flux sequential fits leave x_train/z as distinct jit outputs, so
    # the fused-Gram fast path's identity checks can never fire; rebind
    # value-equal leaves to one object (no-op for the fused fit, whose
    # leaves already share). With MIXED selected kernels the three
    # cross-Grams per stage remain — recorded in the gp_de row.
    gps = share_train_inputs(FluxGPs(uw=models[0], vw=models[1], wT=models[2]))
    gram_shared = _share_gram(gps)
    # Host-chunked dispatch: one 1,152-save f64 scan is a single device
    # program well past the tunnel's ~60-90 s killer (the r3b crash that
    # destroyed this stage twice); equal-size chunks reuse one compile.
    chunk = max(1, args.de_chunk)

    @jax.jit
    def _de_chunk(x0, t0_hat):
        return solve_gp_closure(model, gps, x0, t0_hat, dt_hat, chunk, n_substeps=2)

    t0 = time.perf_counter()
    pieces = [x_true[:1]]
    x_cur, t_cur, done = x_true[0], 0.0, 0
    while done < n_frames:
        n = min(chunk, n_frames - done)
        if n == chunk:
            traj_c = _de_chunk(x_cur, t_cur)
        else:  # final partial chunk: one extra compile at its own shape
            traj_c = solve_gp_closure(model, gps, x_cur, t_cur, dt_hat, n, n_substeps=2)
        jax.block_until_ready(traj_c)
        pieces.append(traj_c[1:])
        x_cur, t_cur, done = traj_c[-1], t_cur + n * dt_hat, done + n
    traj = jnp.concatenate(pieces, axis=0)
    de_wall = time.perf_counter() - t0
    Nz = model.Nz
    mse_T = float(jnp.mean((traj[:, 2 * Nz :] - x_true[: n_frames + 1, 2 * Nz :]) ** 2))
    # Stride-9 sampling of the same trajectory: the NDE's held-out numbers
    # (flagship_run_les.json) are means over the 1:9:1153 saveat, so the
    # like-for-like GP-DE vs NDE comparison reads THIS key.
    idx9 = np.arange(0, n_frames + 1, 9)
    mse_T_9 = float(jnp.mean((traj[idx9, 2 * Nz :] - x_true[idx9, 2 * Nz :]) ** 2))
    nde_mse = None
    try:  # the NDE trajectory MSE on the same held-out sim, same metric
        flag = json.load(open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                           "docs", "flagship_run_les.json")))
        nde_mse = float(flag["held_out"][F.TEST_FILES[0]]["nde"])
    except Exception:
        pass
    result["gp_de"] = dict(
        frames=int(n_frames + 1), wall_s=de_wall, chunk=chunk,
        trajectory_mse=float(jnp.mean((traj - x_true[: n_frames + 1]) ** 2)),
        trajectory_mse_T=mse_T, trajectory_mse_T_stride9=mse_T_9,
        nde_mse_T_same_sim=nde_mse, held_out=F.TEST_FILES[0],
        fused_gram=bool(gram_shared),
        gram_cost_note=None if gram_shared else
        "mixed selected kernels: 3 cross-Grams per RK4 stage (no fused path)",
    )
    print(f"gp-de[{F.TEST_FILES[0]}]: {n_frames + 1} frames, T mse {mse_T:.4e} "
          f"(stride-9 {mse_T_9:.4e} vs NDE {nde_mse if nde_mse is None else format(nde_mse, '.4e')}; "
          f"{de_wall:.1f} s in {chunk}-save chunks)", flush=True)

    dump()
    return result


if __name__ == "__main__":
    main()
