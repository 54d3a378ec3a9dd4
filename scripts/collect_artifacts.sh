#!/usr/bin/env bash
# Collect a finished run's evidence into artifacts/: best checkpoint
# (+host sidecar), metrics JSONL, perf lines, and the supervisor log —
# so every RESULTS.md number cites a committed file.
#
# Usage: scripts/collect_artifacts.sh <tag> <ckpt_dir> <results_dir> [log]
# e.g.:  scripts/collect_artifacts.sh r3_icews14_interp /tmp/ckpt_r3i /tmp/results_r3i /tmp/r3_interp.log
set -eu
TAG=$1; CKPT=$2; RESULTS=$3; LOG=${4:-}
cd "$(dirname "$0")/.."
DEST="artifacts/$TAG"
mkdir -p "$DEST"
BEST=$(python - "$CKPT" <<'PY'
import sys
from redgnn_tpu.utils.checkpoint import best_checkpoint
p = best_checkpoint(sys.argv[1])
print(p or "")
PY
)
if [ -n "$BEST" ]; then
  cp -v "$BEST" "$DEST/best.msgpack"
  [ -e "$BEST.host.json" ] && cp -v "$BEST.host.json" "$DEST/best.msgpack.host.json"
else
  echo "warning: no best checkpoint in $CKPT" >&2
fi
for f in "$RESULTS"/*_metrics.jsonl "$RESULTS"/*_perf.txt; do
  [ -e "$f" ] && cp -v "$f" "$DEST/"
done
if [ -n "$LOG" ] && [ -e "$LOG" ]; then
  # keep logs lean: config echo + epoch/eval/BEST lines, plus the LAST
  # intra-epoch progress line per epoch (it carries the epoch's
  # cumulative q/s — the committed evidence for throughput claims)
  awk '
    /^  epoch [0-9]+: [0-9]+\// { last[$2] = $0; next }
    { for (k in last) { print last[k]; delete last[k] }; print }
    END { for (k in last) print last[k] }
  ' "$LOG" > "$DEST/run.log" || cp "$LOG" "$DEST/run.log"
fi
# caps certificates document the exact shapes the run compiled with
for f in "$CKPT"/caps_*.json; do
  [ -e "$f" ] && cp -v "$f" "$DEST/"
done
echo "collected into $DEST:"
ls -la "$DEST"
