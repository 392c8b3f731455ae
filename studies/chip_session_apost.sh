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

wait_tunnel() { # block until the TPU tunnel answers a probe (wedges are transient)
  local i
  for i in $(seq 1 20); do
    if timeout 120 python -c "import jax; print(jax.devices()[0].platform)" 2>/dev/null | grep -q .; then
      echo "tunnel OK (probe $i)" | tee -a "$OUT/session.log"; return 0
    fi
    echo "tunnel probe $i failed; retrying in 60s" | tee -a "$OUT/session.log"
    sleep 60
  done
  echo "tunnel unreachable after 20 probes" | tee -a "$OUT/session.log"; return 1
}

run_retry() { # run_retry <attempts> <name> <timeout_s> <cmd...> — tunnel can wedge MID-run
  local tries="$1"; shift
  local name="$1" t="$2" i
  for i in $(seq 1 "$tries"); do
    wait_tunnel || return 1
    if run "$@"; then return 0; fi
    echo "=== $name: attempt $i failed" | tee -a "$OUT/session.log"
  done
  return 1
}

run_retry 2 apost_fold 1500 python studies/flagship_training.py --mode aposteriori \
    --eval-checkpoint runs/wm_flagship_fold --ft-maxiters 60 \
    --save-nns runs/wm_flagship_apost --out docs/flagship_run_apost.json

run_retry 2 apost_diurnal 1500 python studies/flagship_training.py --mode aposteriori \
    --suite diurnal --eval-checkpoint runs/wm_flagship_diurnal --ft-maxiters 60 \
    --save-nns runs/wm_flagship_diurnal_apost --out docs/flagship_run_diurnal_apost.json

echo "=== apost chip session complete; logs in $OUT" | tee -a "$OUT/session.log"
