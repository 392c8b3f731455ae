#!/usr/bin/env bash
# Generate the wind-mixing flagship suites with the in-repo 3-D LES
# (VERDICT r2 item 1): every train + held-out member of the standard 18-sim
# "_new" suite and the 15-sim diurnal grid, 8 days x 1,153 frames at 600 s
# saves, 64x64x64 (512x512x256 m box), WENO5, RK3 — the reference generates
# these with wind_mixing/wind_mixing.jl:1-143 on a GPU over hours each; one
# sim here is ~2-3 min on the chip.
#
# Idempotent: a sim whose reference-layout .jld2 already exists under
# $DATA_DIR is skipped, so the script can be re-run after tunnel wedges.
#
# Usage: bash studies/generate_wm_les.sh [tag]   (from /root/repo, NO
# PYTHONPATH override — the axon plugin must register via /root/.axon_site.)
set -u
cd "$(dirname "$0")/.."
TAG="${1:-wm_les}"
OUT="studies/chip_session_${TAG}"
DATA_DIR="runs/les3d_wm"
mkdir -p "$OUT" "$DATA_DIR"
. studies/_session_lib.sh

CLI="python -m climateparameterizations_jl_tpu.cli"
GEN="generate-les --n-horizontal 64 --nz-les 64 --n-save 1152 --dt-save 600 --les-method rk3 --u-max 0.4"

# name<TAB>relative-jld2-path for every suite member (train + held-out).
NAMES=$(python - <<'EOF'
import sys
sys.path.insert(0, ".")
from climateparameterizations_jl_tpu.data.registry import lesbrary_relative_path
import studies.flagship_training as F
names = list(F.TRAIN_FILES_STANDARD) + list(F.TEST_FILES_STANDARD) \
      + list(F.TRAIN_FILES_DIURNAL) + list(F.TEST_FILES_DIURNAL)
for n in names:
    print(f"{n}\t{lesbrary_relative_path(n)}")
EOF
)

total=0; done_n=0; skipped=0; failed=0
while IFS=$'\t' read -r name rel; do
  [ -z "$name" ] && continue
  total=$((total + 1))
  if [ -f "$DATA_DIR/$rel" ]; then
    echo "=== $name: exists, skip" | tee -a "$OUT/session.log"
    skipped=$((skipped + 1))
    continue
  fi
  if run_retry 3 "gen_$name" 900 $CLI $GEN --jld2-name "$name" --output "$DATA_DIR"; then
    done_n=$((done_n + 1))
  else
    failed=$((failed + 1))
  fi
done <<< "$NAMES"

echo "=== wm les generation complete: $done_n generated, $skipped skipped, $failed failed of $total" \
  | tee -a "$OUT/session.log"
[ "$failed" -eq 0 ]
