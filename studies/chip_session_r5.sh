#!/usr/bin/env bash
# Round-5 chip session. Arms map 1:1 to VERDICT r4 "Next round" items:
#   bench_head + bench_r3commit -> item 4 (explain the 12% forward regression:
#     same-session A/B of HEAD vs the r3 bench commit isolates code vs drift)
#   ksweep                      -> item 5 (scan-vs-PCR crossover at K in
#     {0,4,16,64}; sets/validates PCR_MIN_INNER_STEPS and the auto default)
#   fold A/B                    -> item 6 (member axis: block-diagonal fold
#     into the solve's batch dim vs the outer vmap, M in {4,8} + mixed-33)
#   gp_scale                    -> item 8 stretch (blocked f64 fit at the
#     FULL n=20,754 -> 16,384 -> ... ladder; self-splicing retry via
#     --gp-full-from on its own --out)
#   composed_fold               -> item 6 quality guard (full composed
#     training run with --member-fold; compare flagship_run_les_composed)
set -u
cd "$(dirname "$0")/.."
TAG="${1:-r5}"
OUT="$(pwd)/studies/chip_session_${TAG}"  # absolute: one arm runs from a worktree cwd
D="runs/les3d_wm"
mkdir -p "$OUT"
. studies/_session_lib.sh

export JAX_TRACEBACK_FILTERING=off

FLAG="python -u studies/flagship_training.py --data-dir $D"
SB="python -u studies/flagship_training.py --mode step-bench --fast-assembly fold"

# --- item 4: forward-headline A/B, HEAD vs the r3 bench commit, one session.
run_retry 2 bench_head 1500 python -u bench.py
grep -h '^{"metric"' "$OUT"/bench_head*.log | tail -1 > docs/bench_head_r5.json || true
git worktree prune >>"$OUT/session.log" 2>&1 || true  # container resets wipe /tmp
if [ ! -d /tmp/r3bench ]; then
  git worktree add -f /tmp/r3bench 6d3331a >>"$OUT/session.log" 2>&1 || true
fi
if [ -d /tmp/r3bench ]; then
  ( cd /tmp/r3bench && run_retry 2 bench_r3commit 1500 python -u bench.py )
  grep -h '^{"metric"' "$OUT"/bench_r3commit*.log | tail -1 > docs/bench_r3commit_r5.json || true
fi

# --- item 5: scan-vs-PCR K sweep (same synthetic 18-sim config as the
# r3/r4 rows so the crossover is comparable).
for K in 0 4 16 64; do
  for B in scan pcr; do
    run_retry 2 "sb_k${K}_${B}" 1500 $SB --shooting "$K" --tridiag-backend "$B" \
        --bench-repeats 3 --out "docs/step_bench_r5_k${K}_${B}.json"
  done
done

# --- item 6: member-fold vs member-vmap A/B (tridiag auto -> scan at K=16).
for M in 4 8; do
  run_retry 2 "sb_k16_m${M}_vmap" 1800 $SB --shooting 16 --ensemble "$M" \
      --bench-repeats 3 --out "docs/step_bench_r5_k16_m${M}_vmap.json"
  run_retry 2 "sb_k16_m${M}_fold" 1800 $SB --shooting 16 --ensemble "$M" --member-fold \
      --bench-repeats 3 --out "docs/step_bench_r5_k16_m${M}_fold.json"
done
run_retry 2 sb_mixed_m4_fold 2400 $SB --suite mixed --shooting 16 --ensemble 4 --member-fold \
    --bench-repeats 3 --out docs/step_bench_r5_mixed_k16_m4_fold.json
run_retry 2 sb_mixed_m8_fold 2400 $SB --suite mixed --shooting 16 --ensemble 8 --member-fold \
    --bench-repeats 3 --out docs/step_bench_r5_mixed_k16_m8_fold.json

# --- prerequisite for the data-dependent arms: the LES suite is gitignored
# (regenerable) and container resets wipe it; the generator skips members
# that already exist, so this is a no-op when the suite is present.
bash studies/generate_wm_les.sh wm_les_r5 2>&1 | tail -3 | tee -a "$OUT/session.log"

# --- item 6 quality guard: full composed training run with the fold.
run_retry 2 composed_fold 3000 $FLAG --suite mixed --ensemble 4 --shooting 16 \
    --shooting-hybrid --member-fold \
    --save-nns runs/wm_les_composed_fold --out docs/flagship_run_les_composed_fold.json

# --- item 8 stretch: blocked f64 GP at full n (ladder 20754 -> 16384 -> ...).
# Self-splicing: attempt 2 reads attempt 1's completed per-flux fits from
# its own --out (+ .alphas.npz), so a mid-run death never re-pays a fit.
GP="python -u studies/gp_at_scale.py --data-dir $D"
run_retry 3 gp_scale 7200 $GP \
    --selection-from docs/gp_at_scale_r4.json \
    --ladders-from docs/gp_at_scale_r4.json \
    --fidelity-from docs/gp_at_scale_r4.json \
    --gram-from docs/gp_gram_ab_r4.json \
    --force-seq-f64 --seq-f64-n 20754 --blocked-above 16000 \
    --gp-full-from docs/gp_at_scale_r5.json \
    --out docs/gp_at_scale_r5.json

echo "=== r5 chip session complete; logs in $OUT" | tee -a "$OUT/session.log"

# --- r5 extra (appended mid-session): composed-throughput probes toward the
# 2e7 col-ts/s target. Bench rows only — the K=32 window-quality claim is
# NOT made (RESULTS' shooting-quality A/B stands).
run_retry 2 sb_mixed_m4_k32_fold 1800 $SB --suite mixed --shooting 32 --ensemble 4 --member-fold \
    --bench-repeats 3 --out docs/step_bench_r5_mixed_k32_m4_fold.json
run_retry 2 sb_mixed_m4_k32_fold_pcr 1800 $SB --suite mixed --shooting 32 --ensemble 4 --member-fold \
    --tridiag-backend pcr --bench-repeats 3 --out docs/step_bench_r5_mixed_k32_m4_fold_pcr.json
run_retry 2 sb_mixed_m4_k16_fold_pcr 1800 $SB --suite mixed --shooting 16 --ensemble 4 --member-fold \
    --tridiag-backend pcr --bench-repeats 3 --out docs/step_bench_r5_mixed_k16_m4_fold_pcr.json
echo "=== r5 extra arms complete" | tee -a "$OUT/session.log"
