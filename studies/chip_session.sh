#!/usr/bin/env bash
# Serialized TPU measurement session (round-2 runbook steps 1-4 + 6).
#
# The axon tunnel serializes clients (ONE TPU process at a time) and kills
# single device programs >60-90 s, so this script runs each measurement as
# its own bounded subprocess, back to back, and logs everything under
# studies/chip_session_<tag>/. Analysis/decisions (flipping defaults,
# updating PERFORMANCE.md) stay manual — this only collects the numbers.
#
# Usage: bash studies/chip_session.sh [tag]   (from /root/repo, NO PYTHONPATH
# override — /root/.axon_site must stay on the default path for the TPU
# plugin to register; cwd covers the package import.)
set -u
cd "$(dirname "$0")/.."
TAG="${1:-r2}"
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

# 1. Sanity headline (expect ~7.5e7 col-ts/s, platform axon). The timeout
#    must outlast bench.py's own tunnel-wedge retry loop (~1380 s worst case:
#    5 probes x 180 s + 4 sleeps x 120 s) plus the compile and run.
run bench_sanity 2700 python bench.py || exit 1
grep -qE '"platform": "(axon|tpu)"' "$OUT/bench_sanity.log" || {
  echo "!!! headline did not run on the TPU — aborting session" | tee -a "$OUT/session.log"
  exit 1
}

# 2. Perf stretch at 16k columns (VERDICT r1 item 7 stretch >2e8).
run sweep_16k 1800 python studies/fused_kernel_sweep.py

# 3. Headline-config A/B at 1024 columns.
run sweep_1k 1800 python studies/fused_kernel_sweep.py --n-columns 1024 --n-steps 1024

# 4. Flagship train-step A/B (IFT tridiagonal grads are now the default).
run step_noift 1800 python studies/flagship_training.py --mode step-bench --tridiag-backend pcr --no-ift
run step_ift 1800 python studies/flagship_training.py --mode step-bench --tridiag-backend pcr
run step_fast 1800 python studies/flagship_training.py --mode step-bench --tridiag-backend pcr --fast-assembly
run step_fold 1800 python studies/flagship_training.py --mode step-bench --tridiag-backend pcr --fast-assembly fold
run step_scan 1800 python studies/flagship_training.py --mode step-bench --tridiag-backend scan

# 5. Forward-scaling spot checks of the fold RHS at the MXU-bound sizes
#    (expected a wash vs packed: serving bakes weights as constants and XLA
#    constant-folds the chain; the fold pays on the traced training path).
run fwd_fold 1200 python studies/forward_scaling.py --columns 16384,32768 --rhs-variant fold

# 5b. Reference-scale flagship trainings on the deterministic fixtures
#     (both ablation arms + the diurnal suite; RESULTS.md section 5).
run flagship_default 1700 python studies/flagship_training.py --mode train --tridiag-backend pcr \
    --out docs/flagship_run_fold.json --save-nns runs/wm_flagship_fold
run flagship_calibrated 1800 python studies/flagship_training.py --mode train --calibrate-mpp \
    --tridiag-backend pcr --out docs/flagship_run_calibrated_fold.json
run flagship_diurnal 1700 python studies/flagship_training.py --mode train --suite diurnal \
    --tridiag-backend pcr --out docs/flagship_run_diurnal.json --save-nns runs/wm_flagship_diurnal
run flagship_diurnal_nopre 1700 python studies/flagship_training.py --mode train --suite diurnal \
    --pretrain-epochs 0 --tridiag-backend pcr --out docs/flagship_run_diurnal_nopre.json

# 6. Full suite so the roofline columns regenerate with the corrected
#    one-time-cost accounting (KPP/TKE bytes were inflated pre-probe).
run suite 3600 python -m climateparameterizations_jl_tpu.cli benchmark --suite

echo "=== chip session complete; logs in $OUT" | tee -a "$OUT/session.log"

# 7. Grid-augmentation repair of the extrapolation corner (RESULTS.md §5
#    "Extrapolation limits"): two marginal-coverage members repair the
#    weak-wind/strong-heating corner (0.6x -> 15.0x) without training on it.
run flagship_aug 1700 python studies/flagship_training.py --mode train --tridiag-backend pcr \
    --extra-train wind_-1.5e-4_heating_-2e-8,wind_-2e-4_heating_-3.5e-8 \
    --out docs/flagship_run_aug.json --save-nns runs/wm_flagship_aug
run flagship_aug_extrap 1700 python -m climateparameterizations_jl_tpu.cli evaluate \
    --checkpoint runs/wm_flagship_aug \
    --test-sims "wind_-5.5e-4_cooling_3.5e-8,wind_-1.5e-4_cooling_3.5e-8,wind_-5.5e-4_heating_-3.5e-8,wind_-1.5e-4_heating_-3.5e-8" \
    --nz 32 --n-save 1152 --dt-save 600 --n-train-steps 1153 --eval-stride 9 \
    --method split --n-substeps 9 --output runs/wm_flagship_aug_extrap
# (the scaling context resolves from the checkpoint's recorded 20-sim suite)

# 8. Multi-decade gyre drift guard A/B (RESULTS.md gyre section): the
#    stability-gated +NN 20-year run vs the ungated runs/gyre96_20yr_nn.
run gyre_2yr_gated 1700 python -m climateparameterizations_jl_tpu.cli double-gyre \
    --nx 96 --ny 96 --nz-gyre 32 --days 730 --dt 1800 --n-frames 48 \
    --checkpoint runs/fc_les3d_conv --nn-stability-gate auto --tridiag-backend pcr \
    --output runs/gyre96_2yr_nn_gated
run gyre_20yr_gated 3000 python -m climateparameterizations_jl_tpu.cli double-gyre \
    --nx 96 --ny 96 --nz-gyre 32 --days 7300 --dt 1800 --n-frames 60 \
    --checkpoint runs/fc_les3d_conv --nn-stability-gate auto --tridiag-backend pcr \
    --output runs/gyre96_20yr_nn_gated
