#!/usr/bin/env bash
# nell_v4 order-sensitivity A/B (round-5 investigation): score and grad
# parity vs the reference are exact (scripts/parity_*_inductive.py), so
# the only training-loop differences left are batch ORDER (the reference
# trains inductive queries in file order — shuffle_train is never called
# — keeping each query adjacent to its inverse) and RNG. This leg runs:
#   1. shuffle_train=false seed 1234   (reference order parity)
#   2. shuffle_train=false seed 42     (order-parity variance probe)
#   3. default shuffle    seed 7       (third shuffled seed for variance)
# Each ~6 min on the v5e (nell_v4 50 ep pace, CLAUDE.md round-4).
#
# Usage: bash scripts/round5_nellv4_ab.sh <deadline_unix>
set -u
T=$1
cd "$(dirname "$0")/.."
OUT=/tmp/r5_induct
mkdir -p "$OUT"
run_one() {
  local tag=$1; shift
  local left=$(( T - $(date +%s) ))
  [ "$left" -le 120 ] && { echo "[ab] $tag skipped"; return; }
  mkdir -p "$OUT/$tag"
  echo "[ab] $tag start ($(date -u +%H:%M:%S), ${left}s left)"
  timeout "$left" python -m redgnn_tpu.cli.train \
      --task inductive \
      --data_path /root/reference/Static/inductive/data/nell_v4 \
      --results_dir "$OUT/$tag" --sqlite /tmp/experiments.sqlite \
      --set "$@" \
      > "$OUT/$tag.log" 2>&1
  echo "[ab] $tag rc=$?"
}
run_one nellv4_noshuf_s1234 shuffle_train=false seed=1234
run_one nellv4_noshuf_s42   shuffle_train=false seed=42
run_one nellv4_shuf_s7      seed=7
echo "[ab] done"
