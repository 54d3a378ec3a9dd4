#!/usr/bin/env bash
# Short TPU ablation runs (VERDICT #4): bounded ICEWS14_TeMP
# interpolation with each ablated model variant, logged to RESULTS.md.
# ~4-6 min each at ~180 q/s (fresh jits for each variant).
#
# Usage: bash scripts/round4_ablation_runs.sh [max_train_batches] [epochs]
set -u
MB=${1:-200}; EP=${2:-1}
cd "$(dirname "$0")/.."
DATA=/root/reference/Temporal/interpolation/data/ICEWS14_TeMP
for abl in "control:" \
           "wo_tau:use_time=false" \
           "wo_attn:use_attention=false"; do
  name=${abl%%:*}; flag=${abl#*:}
  out=/tmp/r4_abl/$name
  mkdir -p "$out"
  echo "[abl] $(date -u +%H:%M:%S) $name start"
  set -- --task interpolation --data_path "$DATA" \
      --results_dir "$out" --sqlite /tmp/experiments.sqlite \
      --set max_train_batches="$MB" max_eval_batches=60 epochs="$EP"
  if [ -n "$flag" ]; then
    timeout 900 python -m redgnn_tpu.cli.train "$@" "$flag" \
      > "$out/run.log" 2>&1
  else
    timeout 900 python -m redgnn_tpu.cli.train "$@" \
      > "$out/run.log" 2>&1
  fi
  echo "[abl] $(date -u +%H:%M:%S) $name rc=$? $(tail -1 "$out"/*_perf.txt 2>/dev/null | cut -c1-120)"
done
echo "[abl] done"
