#!/usr/bin/env bash
# Bank a RUNNING run's recovery state into the repo so progress survives a
# machine recycle (/tmp died with the machine in both prior round-3
# sessions). Copies the intra-epoch anchor, best checkpoint, caps
# certificates and metrics JSONL into artifacts/<tag>/ and commits.
#
# Usage: scripts/bank_anchor.sh <tag> <ckpt_dir> [results_dir]
set -eu
TAG=$1; CKPT=$2; RESULTS=${3:-}
cd "$(dirname "$0")/.."
DEST="artifacts/$TAG"
mkdir -p "$DEST"
for f in latest.msgpack latest.msgpack.host.json; do
  [ -e "$CKPT/$f" ] && cp "$CKPT/$f" "$DEST/$f"
done
# newest metric-named checkpoint, if any (best-by-valid naming)
BEST=$(ls -t "$CKPT"/*.msgpack 2>/dev/null | grep -v latest | head -1 || true)
if [ -n "$BEST" ]; then
  cp "$BEST" "$DEST/best.msgpack"
  [ -e "$BEST.host.json" ] && cp "$BEST.host.json" "$DEST/best.msgpack.host.json"
fi
for f in "$CKPT"/caps_*.json; do [ -e "$f" ] && cp "$f" "$DEST/"; done
if [ -n "$RESULTS" ]; then
  for f in "$RESULTS"/*_metrics.jsonl "$RESULTS"/*_perf.txt; do
    [ -e "$f" ] && cp "$f" "$DEST/"
  done
fi
git add "$DEST"
git commit -q -m "Bank $TAG run state (anchor + best checkpoint + caps)" || true
echo "banked $TAG:"; ls -la "$DEST"
