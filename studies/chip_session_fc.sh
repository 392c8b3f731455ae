#!/usr/bin/env bash
# FC flagship retrain after the per-sim surface-flux fix: multi-sim
# train-fc-nde used to bake sim 0's surface flux (Qb = 1e-8, the suite's
# weakest) into EVERY member's model, so sims 2-7 trained against forcing
# up to 10x off. Regenerates the RESULTS.md section-5 free-convection
# tables (dense + conv-3 arms, the 96-frame-curriculum ablation, and the
# held-out sims 8/9 evaluations) under the fixed per-sim (S,) fluxes.
#
# Usage: bash studies/chip_session_fc.sh [tag]   (from /root/repo, NO
# PYTHONPATH override — the axon plugin must register via /root/.axon_site.)
set -u
cd "$(dirname "$0")/.."
TAG="${1:-fcfix}"
OUT="studies/chip_session_${TAG}"
mkdir -p "$OUT"

run() { # run <name> <timeout_s> <cmd...>
  local name="$1" t="$2"; shift 2
  echo "=== $name: $* (timeout ${t}s)" | tee -a "$OUT/session.log"
  local start=$SECONDS
  timeout "$t" "$@" >"$OUT/$name.log" 2>&1
  local rc=$?
  echo "=== $name: rc=$rc elapsed=$((SECONDS - start))s" | tee -a "$OUT/session.log"
  tail -3 "$OUT/$name.log" | tee -a "$OUT/session.log"
  return $rc
}

CACHE=runs/les3d_cache
CLI="python -m climateparameterizations_jl_tpu.cli"
TRAIN="--sim-ids 1,2,3,4,5,6,7 --source les3d --les-cache-dir $CACHE --nz 32
       --n-save 1152 --dt-save 600 --pretrain-epochs 200 --maxiters 150
       --burn-in-lr-decay 0.5 --method split --n-substeps 2"
CURR="--curriculum 20:1,101:5,201:10,401:20,801:40,1153:9,1153:9"
EVAL="--source les3d --les-cache-dir $CACHE --nz 32 --n-save 1152
      --dt-save 600 --sim-ids 8,9 --n-eval-steps 1153"

# 1. Full-curriculum arms (RESULTS.md: "Free-convection flagship").
run fc_train_dense 2700 $CLI train-fc-nde $TRAIN $CURR --output runs/fc_les3d || exit 1
run fc_train_conv 2700 $CLI train-fc-nde $TRAIN $CURR --conv 3 --output runs/fc_les3d_conv

# 2. Held-out evaluations (sims 8, 9; stride-8 = 4800 s frames).
run fc_eval_dense 1800 $CLI evaluate-fc --checkpoint runs/fc_les3d $EVAL \
    --eval-stride 8 --output runs/fc_les3d_eval
run fc_eval_conv 1800 $CLI evaluate-fc --checkpoint runs/fc_les3d_conv $EVAL \
    --eval-stride 8 --output runs/fc_les3d_conv_eval

# 3. Short-curriculum ablation arm (96-frame windows, same training suite).
run fc_train_short 2700 $CLI train-fc-nde $TRAIN --n-train-steps 96 --output runs/fc_flagship
run fc_eval_short 1800 $CLI evaluate-fc --checkpoint runs/fc_flagship $EVAL \
    --eval-stride 16 --output runs/fc_flagship_eval

echo "=== fc chip session complete; logs in $OUT" | tee -a "$OUT/session.log"
for f in runs/fc_les3d_eval runs/fc_les3d_conv_eval runs/fc_flagship_eval; do
  echo "$f: $(cat $f/summary.json 2>/dev/null)" | tee -a "$OUT/session.log"
done
