#!/usr/bin/env bash
# Round-4 third session: the r4b run hit BOTH tunnel failure modes in one
# night — the remote-compile HTTP 500 on the 16k f64 fit (now self-healed by
# the study's size ladder) and a compile-path wedge that let device probes
# pass while every real arm hung (wait_tunnel now compile-probes). This
# session runs the remaining r4 arms, GP rerun last (it has the most
# machinery and everything it needs is spliceable).
set -u
cd "$(dirname "$0")/.."
TAG="${1:-r4c}"
OUT="studies/chip_session_${TAG}"
D="runs/les3d_wm"
mkdir -p "$OUT"
. studies/_session_lib.sh

export JAX_TRACEBACK_FILTERING=off

FLAG="python -u studies/flagship_training.py --data-dir $D"
GP="python -u studies/gp_at_scale.py"

run_retry 2 apost_s9 1800 $FLAG --mode embedded-eval --eval-checkpoint runs/wm_les_fold \
    --ft-substeps 9 --out docs/apost_ablation_substeps9.json

run_retry 2 hostmatch 2400 $FLAG --calibrate-mpp --host-matched-substeps \
    --save-nns runs/wm_les_hostmatch --out docs/flagship_run_les_hostmatch.json
run_retry 2 hostmatch_emb 1800 $FLAG --mode embedded-eval --eval-checkpoint runs/wm_les_hostmatch \
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

# GP rerun LAST, fully spliced (selection/ladders/fidelity from the r4b
# partial, gram from the x64-off artifact) + the self-healing f64 ladder.
cp studies/chip_session_r4b/gp_partial_attempt1.json "$OUT/gp_partial.json"
run_retry 2 gp_scale 5400 $GP --data-dir $D \
    --selection-from "$OUT/gp_partial.json" \
    --ladders-from "$OUT/gp_partial.json" \
    --fidelity-from "$OUT/gp_partial.json" \
    --gram-from docs/gp_gram_ab_r4.json \
    --out docs/gp_at_scale_r4.json

echo "=== r4c chip session complete; logs in $OUT" | tee -a "$OUT/session.log"
