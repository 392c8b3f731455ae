#!/usr/bin/env bash
# Round-4 chip session (VERDICT r3 items 1-5, 7):
# - gram:       the promised SEPARATE x64-off Pallas-vs-XLA Gram A/B artifact
# - gp_scale:   the GP-at-scale study to COMPLETION — per-flux sequential f64
#               at n=16k (above the r3 8k HBM wall), held-out GP band coverage
#               on the two test sims, and the GP-DE at the full 1,153-frame
#               horizon in tunnel-safe host chunks (the un-chunked scan is the
#               prime suspect for the r3b crash whose traceback the old
#               session lib overwrote — logs are now per-attempt, and
#               JAX_TRACEBACK_FILTERING=off keeps the full trace)
# - apost_s9:   ablation arm (a): the NDE-stage checkpoint scored in a host at
#               the NDE's OWN dt (substeps=9) — if the 0.3x persists, the gap
#               is solver formulation, not substep mismatch
# - hostmatch:  ablation arm (b): train the NDE at the HOST's dt (~540 s),
#               then score it embedded BEFORE any fine-tune
# - deploy:     the deployment-first flagship: pipeline ends with the
#               a-posteriori stage; the shipped checkpoint helps its host
# - composed:   batch-axis scaling: sims x shooting-K x ensemble-M in ONE
#               train step (step-bench rows), plus the quality-guarded
#               composed training run on the mixed 33-sim LES suite
#
# Usage: bash studies/chip_session_r4.sh [tag]   (from /root/repo, NO
# PYTHONPATH override.)
set -u
cd "$(dirname "$0")/.."
TAG="${1:-r4}"
OUT="studies/chip_session_${TAG}"
D="runs/les3d_wm"
mkdir -p "$OUT"
. studies/_session_lib.sh

export JAX_TRACEBACK_FILTERING=off

FLAG="python -u studies/flagship_training.py --data-dir $D"
GP="python -u studies/gp_at_scale.py"

# --- GP at scale, to completion -------------------------------------------
run_retry 2 gram 900 $GP --gram-only --out docs/gp_gram_ab_r4.json

# No --ladders-from: the committed r3 json's build_f32 is EMPTY (the splice
# was clobbered by a bug fixed this round, and its source was a /tmp file) —
# the ladders must be RE-MEASURED so the committed artifact backs the text.
run_retry 2 gp_scale 4500 $GP --data-dir $D \
    --gram-from docs/gp_gram_ab_r4.json \
    --out docs/gp_at_scale_r4.json

# --- a-posteriori root-cause ablation -------------------------------------
run_retry 2 apost_s9 1200 $FLAG --mode embedded-eval --eval-checkpoint runs/wm_les_fold \
    --ft-substeps 9 --out docs/apost_ablation_substeps9.json

run_retry 2 hostmatch 2400 $FLAG --calibrate-mpp --host-matched-substeps \
    --save-nns runs/wm_les_hostmatch --out docs/flagship_run_les_hostmatch.json
run_retry 2 hostmatch_emb 1200 $FLAG --mode embedded-eval --eval-checkpoint runs/wm_les_hostmatch \
    --ft-substeps 10 --out docs/apost_ablation_hostmatch.json

# --- deployment-first flagship --------------------------------------------
run_retry 2 deploy 2400 $FLAG --calibrate-mpp --finish-aposteriori \
    --save-nns runs/wm_les_deploy --out docs/flagship_run_les_deploy.json

# --- composed batch-axis scaling (step-bench rows on the deterministic
# synthetic fixtures, same provenance as the r3 k-rows) --------------------
SB="python -u studies/flagship_training.py --mode step-bench --tridiag-backend pcr --fast-assembly fold"
run_retry 2 sb_shoot16 1800 $SB --shooting 16 --out docs/step_bench_r4_k16.json
run_retry 2 sb_k16_m4 1800 $SB --shooting 16 --ensemble 4 --out docs/step_bench_r4_k16_m4.json
run_retry 2 sb_k16_m8 1800 $SB --shooting 16 --ensemble 8 --out docs/step_bench_r4_k16_m8.json
run_retry 2 sb_mixed_k16_m4 2400 $SB --suite mixed --shooting 16 --ensemble 4 \
    --out docs/step_bench_r4_mixed_k16_m4.json

# --- composed quality run on the LES suite --------------------------------
run_retry 2 composed 3000 $FLAG --suite mixed --ensemble 4 --shooting 16 --shooting-hybrid \
    --save-nns runs/wm_les_composed --out docs/flagship_run_les_composed.json

echo "=== r4 chip session complete; logs in $OUT" | tee -a "$OUT/session.log"
