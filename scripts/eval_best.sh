#!/usr/bin/env bash
# Evaluate the best checkpoint in a ckpt dir on valid+test (+ optional
# extra splits). Usage:
#   scripts/eval_best.sh <task> <data_path> <ckpt_dir> [extra cli args...]
set -eu
TASK=$1; DATA=$2; CKPT=$3; shift 3
BEST=$(python - "$CKPT" <<'PY'
import sys
from redgnn_tpu.utils.checkpoint import best_checkpoint
p = best_checkpoint(sys.argv[1])
print(p or "")
PY
)
[ -n "$BEST" ] || { echo "no checkpoint in $CKPT" >&2; exit 1; }
echo "best checkpoint: $BEST" >&2
exec python -m redgnn_tpu.cli.train --task "$TASK" --data_path "$DATA" \
  --load_checkpoint "$BEST" --eval_only "$@"
