#!/usr/bin/env bash
# EuRoC tracking evaluation runs — the reference scripts/tracking_euroc.bash
# equivalent: 4 sequences x 5 runs with preset=dataset, results per run.
# Usage: tracking_euroc.bash EUROC_ROOT MVSNET_EXPORT_DIR OUT_ROOT
set -euo pipefail
EUROC_ROOT=${1:?euroc root}
MVSNET=${2:?exported mvsnet dir}
OUT=${3:-results/tracking_euroc}
SEQS=(V1_01_easy V1_02_medium V2_01_easy V2_02_medium)
RUNS=5

for seq in "${SEQS[@]}"; do
  for run in $(seq 0 $((RUNS-1))); do
    dest="$OUT/$seq/run$run"
    mkdir -p "$dest"
    python -m tandem_tpu.cli.tandem_dataset preset=dataset \
      files="$EUROC_ROOT/$seq/mav0/cam0/data" \
      calib="$EUROC_ROOT/$seq/camera.txt" \
      mvsnet_folder="$MVSNET" \
      result_folder="$dest" | tee "$dest/out.txt"
  done
done
