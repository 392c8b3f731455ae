#!/usr/bin/env bash
# Round-4 follow-up session: the gp_scale arm's f64 selection compiles ate
# most of attempt 1's budget (~50 min before the first ladder row), so the
# rerun splices everything the timed-out attempt already measured
# (--selection-from / --ladders-from are key-wise) and the remaining r4 arms
# follow unchanged.
set -u
cd "$(dirname "$0")/.."
TAG="${1:-r4b}"
OUT="studies/chip_session_${TAG}"
D="runs/les3d_wm"
mkdir -p "$OUT"
. studies/_session_lib.sh

export JAX_TRACEBACK_FILTERING=off

FLAG="python -u studies/flagship_training.py --data-dir $D"
GP="python -u studies/gp_at_scale.py"

# Splice from a COPY: the rerun's incremental dump overwrites --out early,
# which would truncate the very file the later ladder splice reads.
cp docs/gp_at_scale_r4.json "$OUT/gp_partial_attempt1.json"
run_retry 2 gp_scale 5400 $GP --data-dir $D \
    --selection-from "$OUT/gp_partial_attempt1.json" \
    --ladders-from "$OUT/gp_partial_attempt1.json" \
    --fidelity-from "$OUT/gp_partial_attempt1.json" \
    --gram-from docs/gp_gram_ab_r4.json \
    --out docs/gp_at_scale_r4.json

run_retry 2 apost_s9 1200 $FLAG --mode embedded-eval --eval-checkpoint runs/wm_les_fold \
    --ft-substeps 9 --out docs/apost_ablation_substeps9.json

run_retry 2 hostmatch 2400 $FLAG --calibrate-mpp --host-matched-substeps \
    --save-nns runs/wm_les_hostmatch --out docs/flagship_run_les_hostmatch.json
run_retry 2 hostmatch_emb 1200 $FLAG --mode embedded-eval --eval-checkpoint runs/wm_les_hostmatch \
    --ft-substeps 10 --out docs/apost_ablation_hostmatch.json

run_retry 2 deploy 2400 $FLAG --calibrate-mpp --finish-aposteriori \
    --save-nns runs/wm_les_deploy --out docs/flagship_run_les_deploy.json

SB="python -u studies/flagship_training.py --mode step-bench --tridiag-backend pcr --fast-assembly fold"
run_retry 2 sb_shoot16 1800 $SB --shooting 16 --out docs/step_bench_r4_k16.json
run_retry 2 sb_k16_m4 1800 $SB --shooting 16 --ensemble 4 --out docs/step_bench_r4_k16_m4.json
run_retry 2 sb_k16_m8 1800 $SB --shooting 16 --ensemble 8 --out docs/step_bench_r4_k16_m8.json
run_retry 2 sb_mixed_k16_m4 2400 $SB --suite mixed --shooting 16 --ensemble 4 \
    --out docs/step_bench_r4_mixed_k16_m4.json

run_retry 2 composed 3000 $FLAG --suite mixed --ensemble 4 --shooting 16 --shooting-hybrid \
    --save-nns runs/wm_les_composed --out docs/flagship_run_les_composed.json

echo "=== r4b chip session complete; logs in $OUT" | tee -a "$OUT/session.log"
