#!/usr/bin/env bash
# ATE evaluation over the runs produced by tracking_euroc.bash
# (reference scripts/tracking_euroc_eval.bash: Sim3/scale alignment via
# align_se3 then Horn ATE).
set -euo pipefail
OUT=${1:-results/tracking_euroc}
GT_ROOT=${2:?ground-truth root with <seq>/gt_tum.txt}

for d in "$OUT"/*/run*; do
  seq=$(basename "$(dirname "$d")")
  python -m tandem_tpu.cli.tandem_ate \
    --est "$d/result.txt" --gt "$GT_ROOT/$seq/gt_tum.txt" --scale \
    | tee "$d/ate.txt"
done
