#!/usr/bin/env bash
# Re-evaluate ablation checkpoints on Replica val and refresh the committed
# metric tables (reference cva_mvsnet/eval.sh semantics).
# Usage: eval_ablations.bash DATA_ROOT CKPT_DIR
set -euo pipefail
DATA_ROOT=${1:?replica root}
CKPT_DIR=${2:?directory with abl0*.{ckpt,pkl} checkpoints}
for ckpt in "$CKPT_DIR"/abl0*.ckpt "$CKPT_DIR"/abl0*.pkl; do
  [ -e "$ckpt" ] || continue
  python -m tandem_tpu.cli.tandem_eval --ckpt "$ckpt" --data-root "$DATA_ROOT"
done
