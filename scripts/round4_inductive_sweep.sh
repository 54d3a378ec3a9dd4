#!/usr/bin/env bash
# Round-4 CPU sweep of all 12 inductive splits (VERDICT #7): the chip is
# busy with the temporal queue, these are CPU-feasible (10-40 min each).
# fb237_v1 and nell_v1 lag the paper since round 1 — run those with 3
# seeds to separate recipe error from run variance.
#
# Usage: nohup bash scripts/round4_inductive_sweep.sh >/tmp/r4_induct.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r4_induct
mkdir -p "$OUT"
note() { echo "[sweep] $(date -u +%H:%M:%S) $*"; }

run_split() {
  local split=$1 seed=$2
  local tag="${split}_s${seed}"
  [ -f "$OUT/$tag.done" ] && { note "$tag already done"; return; }
  note "start $tag"
  mkdir -p "$OUT/$tag"
  # --platform cpu (NOT the env var: the axon plugin overrides
  # JAX_PLATFORMS and would block on the busy chip)
  nice -n 10 timeout 7200 \
    python -m redgnn_tpu.cli.train --platform cpu \
      --task inductive \
      --data_path "/root/reference/Static/inductive/data/$split" \
      --results_dir "$OUT/$tag" --sqlite /tmp/experiments.sqlite \
      --set seed="$seed" \
      > "$OUT/$tag.log" 2>&1
  local rc=$?
  note "done $tag rc=$rc"
  [ $rc -eq 0 ] && touch "$OUT/$tag.done"
}

# laggards first, 3 seeds each (the most important evidence)
for seed in 1234 2345 3456; do
  run_split fb237_v1 "$seed"
  run_split nell_v1 "$seed"
done
# the other ten, reference seed
for split in WN18RR_v1 WN18RR_v2 WN18RR_v3 WN18RR_v4 \
             fb237_v2 fb237_v3 fb237_v4 \
             nell_v2 nell_v3 nell_v4; do
  run_split "$split" 1234
done
note "sweep finished"
