#!/usr/bin/env bash
# Round-3 chip session: the wind-mixing flagship retrained END-TO-END on
# 3-D-LES-generated data (VERDICT r2 item 1) + the window-parallel
# multiple-shooting A/B (item 2), a-posteriori arms (item 3), calibrated
# ensemble UQ (item 4), GP at reference scale (item 5), step-bench rows
# (item 6) and the gyre WENO5-momentum A/B (item 7).
#
# Prereq: the 39-sim suite under runs/les3d_wm (studies/generate_wm_les.sh).
# Usage: bash studies/chip_session_r3.sh [tag]   (from /root/repo, NO
# PYTHONPATH override — the axon plugin must register via /root/.axon_site.)
set -u
cd "$(dirname "$0")/.."
TAG="${1:-r3}"
OUT="studies/chip_session_${TAG}"
D="runs/les3d_wm"
mkdir -p "$OUT"
. studies/_session_lib.sh

N_FILES=$(ls "$D/Data" 2>/dev/null | wc -l)
if [ "$N_FILES" -lt 39 ]; then
  echo "=== ABORT: only $N_FILES/39 suite members in $D" | tee -a "$OUT/session.log"
  exit 1
fi

FLAG="python -u studies/flagship_training.py --data-dir $D"
CLI="python -m climateparameterizations_jl_tpu.cli"

# --- item 1 + 2: flagship on LES physics, sequential vs multiple shooting.
run_retry 2 fold 2700 $FLAG --calibrate-mpp --save-nns runs/wm_les_fold \
    --out docs/flagship_run_les.json
run_retry 2 shoot16 2400 $FLAG --calibrate-mpp --shooting 16 --save-nns runs/wm_les_shoot16 \
    --out docs/flagship_run_les_shoot16.json

# --- item 1: diurnal + mixed arms on LES data.
run_retry 2 diurnal 2700 $FLAG --suite diurnal --save-nns runs/wm_les_diurnal \
    --out docs/flagship_run_les_diurnal.json
run_retry 2 mixed 3000 $FLAG --suite mixed --out docs/flagship_run_les_mixed.json

# --- item 3: a-posteriori fine-tune from the LES-trained checkpoints.
run_retry 2 apost_fold 2400 $FLAG --mode aposteriori --eval-checkpoint runs/wm_les_fold \
    --save-nns runs/wm_les_apost --out docs/flagship_run_les_apost.json
run_retry 2 apost_diurnal 2400 $FLAG --suite diurnal --mode aposteriori \
    --eval-checkpoint runs/wm_les_diurnal --save-nns runs/wm_les_diurnal_apost \
    --out docs/flagship_run_les_diurnal_apost.json
# Root-cause arm: lower lr / more iters on the constant-flux fine-tune.
run_retry 2 apost_lr 2400 $FLAG --mode aposteriori --eval-checkpoint runs/wm_les_fold \
    --ft-lr 1e-4 --ft-maxiters 120 --out docs/flagship_run_les_apost_lr1e-4.json

# --- item 4: deep ensemble at flagship scale on LES data (calibrated UQ
# is computed inside evaluate_ensemble: first held-out sim = validation).
run_retry 2 ens4 3000 $FLAG --ensemble 4 --save-nns runs/wm_les_ens4 \
    --out docs/flagship_run_les_ens4.json

# --- item 5: GP family at reference scale (n ~ 20.8k).
run_retry 2 gp_scale 2400 python -u studies/gp_at_scale.py --data-dir $D \
    --out docs/gp_at_scale_r3.json

# --- item 6: train-step rows (sequential vs shooting K sweep).
for K in 0 4 16 64; do
  run_retry 2 "stepbench_k$K" 1200 $FLAG --mode step-bench --shooting $K \
      --out "docs/step_bench_r3_k$K.json"
done

# --- item 7: gyre WENO5-momentum A/B (1 year, 96x96x32).
run_retry 2 gyre_centered 1800 $CLI double-gyre --days 365 --n-frames 12 \
    --momentum-advection centered --tridiag-backend pcr --output runs/gyre96_r3_centered
run_retry 2 gyre_weno 1800 $CLI double-gyre --days 365 --n-frames 12 \
    --momentum-advection weno5 --tridiag-backend pcr --output runs/gyre96_r3_weno
python - <<'EOF' | tee -a "$OUT/session.log"
import numpy as np, json
rows = {}
for arm in ("centered", "weno"):
    d = np.load(f"runs/gyre96_r3_{arm}/double_gyre.npz")
    sst = d["T"][-1, :, :, -1]
    gx = np.abs(np.diff(sst, axis=1)).max(); gy = np.abs(np.diff(sst, axis=0)).max()
    rows[arm] = dict(front_max_grad_K_per_cell=float(max(gx, gy)),
                     sst_range=[float(sst.min()), float(sst.max())],
                     psi_Sv=[float(d["psi"].min()), float(d["psi"].max())],
                     finite=bool(np.isfinite(d["T"]).all()))
print("GYRE A/B:", json.dumps(rows))
json.dump(rows, open("docs/gyre_momentum_ab_r3.json", "w"), indent=2)
EOF

# --- bench sanity (the driver runs bench.py itself at round end).
run_retry 2 bench 2700 python bench.py

echo "=== r3 chip session complete; logs in $OUT" | tee -a "$OUT/session.log"
