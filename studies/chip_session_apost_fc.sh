#!/usr/bin/env bash
# FC a-posteriori arm: fine-tune the free-convection flagship closure
# (runs/fc_les3d, trained by chip_session_fc.sh on les3d data) THROUGH the
# embedded conv-adj host column, with held-out embedded evals before/after
# (sims 8, 9). Mirrors the wind-mixing arm's discretization: stride-9
# saveat over the full 1,153-frame window, substeps=10 -> dt=540 s — and
# the EVALs score at that same stride/substepping (cross-arm like-for-like).
#
# Usage: bash studies/chip_session_apost_fc.sh [tag]   (from /root/repo, NO
# PYTHONPATH override — the axon plugin must register via /root/.axon_site.)
set -u
cd "$(dirname "$0")/.."
TAG="${1:-apost_fc}"
OUT="studies/chip_session_${TAG}"
mkdir -p "$OUT"
. studies/_session_lib.sh

CACHE=runs/les3d_cache
CLI="python -m climateparameterizations_jl_tpu.cli"
DATA="--source les3d --les-cache-dir $CACHE --nz 32 --n-save 1152 --dt-save 600"
EVAL="$DATA --sim-ids 8,9 --n-eval-steps 1153 --eval-stride 9 --n-substeps 10 --embedded"

run_retry 2 fc_emb_before 1800 $CLI evaluate-fc --checkpoint runs/fc_les3d $EVAL \
    --output runs/fc_les3d_emb_eval
run_retry 2 fc_apost 2700 $CLI train-embedded-fc --init-from runs/fc_les3d $DATA \
    --curriculum 1153:9 --substeps 10 --maxiters 60 --lr 3e-4 \
    --output runs/fc_les3d_apost
run_retry 2 fc_emb_after 1800 $CLI evaluate-fc --checkpoint runs/fc_les3d_apost $EVAL \
    --output runs/fc_les3d_apost_eval

echo "=== fc apost session complete; logs in $OUT" | tee -a "$OUT/session.log"
for f in runs/fc_les3d_emb_eval runs/fc_les3d_apost_eval; do
  echo "$f: $(cat $f/summary.json 2>/dev/null)" | tee -a "$OUT/session.log"
done
