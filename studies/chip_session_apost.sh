#!/usr/bin/env bash
# A-posteriori (deployment-model-in-the-loop) fine-tune of the flagship
# closures on the chip — the RESULTS.md "a-posteriori" evidence run.
#
# Arm 1: fine-tune runs/wm_flagship_fold THROUGH the embedded host column
#        (full 8-day window, substeps=10 -> dt=540 s, same discretization
#        evaluate --embedded scores) and re-evaluate the held-out embedded
#        losses before/after.
# Arm 2: same for the diurnal flagship (time-varying surface flux through
#        the host stepper).
#
# Usage: bash studies/chip_session_apost.sh [tag]   (from /root/repo, NO
# PYTHONPATH override — the axon plugin must register via /root/.axon_site.)
set -u
cd "$(dirname "$0")/.."
TAG="${1:-apost}"
OUT="studies/chip_session_${TAG}"
mkdir -p "$OUT"

run() { # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name: $* (timeout ${t}s)" | tee -a "$OUT/session.log"
  local start=$SECONDS
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name: rc=$rc elapsed=$((SECONDS - start))s" | tee -a "$OUT/session.log"
  tail -5 "$OUT/$name.log" | tee -a "$OUT/session.log"
  return $rc
}

run apost_fold 2700 python studies/flagship_training.py --mode aposteriori \
    --eval-checkpoint runs/wm_flagship_fold --ft-maxiters 60 \
    --save-nns runs/wm_flagship_apost --out docs/flagship_run_apost.json

run apost_diurnal 2700 python studies/flagship_training.py --mode aposteriori \
    --suite diurnal --eval-checkpoint runs/wm_flagship_diurnal --ft-maxiters 60 \
    --save-nns runs/wm_flagship_diurnal_apost --out docs/flagship_run_diurnal_apost.json

echo "=== apost chip session complete; logs in $OUT" | tee -a "$OUT/session.log"
