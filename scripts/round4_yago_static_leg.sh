#!/usr/bin/env bash
# YAGO static transductive trial (VERDICT #5): the largest committed
# static KG (123,188 entities / 269k train triples) — the real scale
# test of exact caps + bitmap dedup + the dense-switch heuristic.
# Reference recipe (train.py:101-111): lr 3e-4, L=3, D=48, n_batch=3.
# n_tbatch raised 1 -> 25 (eval batching is metric-neutral — per-query
# ranking math — the reference's 1 was a GPU-memory constraint).
#
# Usage: bash scripts/round4_yago_static_leg.sh <deadline_unix>
set -u
T=$1
cd "$(dirname "$0")/.."
LEFT=$(( T - $(date +%s) ))
[ "$LEFT" -le 300 ] && { echo "no time"; exit 0; }
mkdir -p /tmp/ckpt_r4y /tmp/results_r4y
rm -f /tmp/ckpt_r4y/STOP
bash scripts/run_resilient.sh /tmp/r4_yago.log /tmp/ckpt_r4y "$LEFT" -- \
  --task transductive \
  --data_path /root/reference/Static/transductive/data/YAGO \
  --results_dir /tmp/results_r4y --sqlite /tmp/experiments.sqlite \
  --set n_tbatch=25
echo "yago leg done"
