#!/usr/bin/env bash
# Round-3 follow-up chip session:
# - re-run the fold + shoot16 A/B under the PIPELINED train loops (the
#   first pass was tunnel-latency-bound: ~93 ms/iter regardless of the 16x
#   shorter shooting scan — the wall numbers measured the round-trip, not
#   the device);
# - the hybrid arm (shooting bulk stage + sequential burn-in);
# - re-run the a-posteriori fold arms with the mPP-provenance fix (the
#   first pass evaluated the calibrated-base checkpoint over the rebuilt
#   DEFAULT base — wrong closure, garbage "before" numbers).
#
# Usage: bash studies/chip_session_r3b.sh [tag]   (from /root/repo, NO
# PYTHONPATH override.)
set -u
cd "$(dirname "$0")/.."
TAG="${1:-r3b}"
OUT="studies/chip_session_${TAG}"
D="runs/les3d_wm"
mkdir -p "$OUT"
. studies/_session_lib.sh

FLAG="python -u studies/flagship_training.py --data-dir $D"

run_retry 2 fold2 2400 $FLAG --calibrate-mpp --save-nns runs/wm_les_fold \
    --out docs/flagship_run_les.json
run_retry 2 shoot16b 2400 $FLAG --calibrate-mpp --shooting 16 --save-nns runs/wm_les_shoot16 \
    --out docs/flagship_run_les_shoot16.json
run_retry 2 hybrid 2400 $FLAG --calibrate-mpp --shooting 16 --shooting-hybrid \
    --save-nns runs/wm_les_hybrid --out docs/flagship_run_les_hybrid.json

run_retry 2 apost_fold2 2400 $FLAG --mode aposteriori --eval-checkpoint runs/wm_les_fold \
    --save-nns runs/wm_les_apost --out docs/flagship_run_les_apost.json
run_retry 2 apost_lr2 2400 $FLAG --mode aposteriori --eval-checkpoint runs/wm_les_fold \
    --ft-lr 1e-4 --ft-maxiters 120 --out docs/flagship_run_les_apost_lr1e-4.json

# GP at scale re-run (the first pass OOM'd the f64 16384 3-flux fit; the
# study now has an HBM guard).
run_retry 2 gp_scale2 2400 python -u studies/gp_at_scale.py --data-dir $D \
    --out docs/gp_at_scale_r3.json

echo "=== r3b chip session complete; logs in $OUT" | tee -a "$OUT/session.log"
