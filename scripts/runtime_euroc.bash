#!/usr/bin/env bash
# Runtime (FPS) benchmark with preset=runtime (reference
# scripts/runtime_euroc.bash; the FPS is printed in the TANDEM TIMING block
# at the end of out.txt).
set -euo pipefail
EUROC_ROOT=${1:?euroc root}
MVSNET=${2:?exported mvsnet dir}
OUT=${3:-results/runtime_euroc}
mkdir -p "$OUT"
python -m tandem_tpu.cli.tandem_dataset preset=runtime \
  files="$EUROC_ROOT/V1_01_easy/mav0/cam0/data" \
  calib="$EUROC_ROOT/V1_01_easy/camera.txt" \
  mvsnet_folder="$MVSNET" dr_timing=1 \
  result_folder="$OUT" | tee "$OUT/out.txt"
tail -3 "$OUT/out.txt"
