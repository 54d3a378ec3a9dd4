#!/usr/bin/env bash
# TPU filler for the inductive sweep: the big v3/v4 splits are hours on
# CPU but minutes on the chip. Run whenever a TPU window opens between
# queue legs. Shares /tmp/r4_induct tags with the CPU sweep; claims a
# split by touching its .done marker up front (removed again on
# failure), and skips splits whose CPU log is actively growing.
#
# Usage: bash scripts/round4_inductive_tpu_filler.sh <deadline_unix> [splits...]
set -u
T=$1; shift
SPLITS=${@:-"fb237_v4 WN18RR_v4 WN18RR_v3 fb237_v3 nell_v4 nell_v3 WN18RR_v2 nell_v2 fb237_v2"}
cd "$(dirname "$0")/.."
OUT=/tmp/r4_induct
mkdir -p "$OUT"
note() { echo "[tpufill] $(date -u +%H:%M:%S) $*"; }
for split in $SPLITS; do
  # "name" or "name:seed" (default seed 1234)
  seed=${split#*:}; [ "$seed" = "$split" ] && seed=1234
  split=${split%%:*}
  tag="${split}_s${seed}"
  LEFT=$(( T - $(date +%s) ))
  [ "$LEFT" -le 300 ] && { note "deadline; stop"; break; }
  [ -f "$OUT/$tag.done" ] && { note "$tag done/claimed; skip"; continue; }
  if [ -f "$OUT/$tag.log" ] && [ -n "$(find "$OUT/$tag.log" -mmin -5)" ]; then
    note "$tag active on CPU; skip"; continue
  fi
  touch "$OUT/$tag.done"   # claim before starting so the CPU sweep skips
  mkdir -p "$OUT/$tag"
  note "start $tag on TPU (${LEFT}s left)"
  timeout "$LEFT" python -m redgnn_tpu.cli.train \
      --task inductive \
      --data_path "/root/reference/Static/inductive/data/$split" \
      --results_dir "$OUT/$tag" --sqlite /tmp/experiments.sqlite \
      --set seed="$seed" \
      > "$OUT/$tag.log" 2>&1
  rc=$?
  note "done $tag rc=$rc"
  [ $rc -ne 0 ] && rm -f "$OUT/$tag.done"
done
note "filler finished"
