#!/usr/bin/env bash
# Round-4 inductive sweep, v2: COVERAGE-FIRST ordering. v1 front-loaded
# 6 laggard-seed runs before touching 10 of the 12 splits; the v3/v4
# splits are several times bigger than v1, so a sequential sweep risks
# running out of wall clock with whole splits missing. Order here:
# all 12 splits at the reference seed (roughly ascending size), then
# extra seeds for the two round-1 laggards if time remains.
#
# $1 (optional): PID of an orphaned in-flight run to wait for; its tag
#                is marked .done on successful exit.
#
# Usage: nohup bash scripts/round4_inductive_sweep2.sh [pid] >/tmp/r4_induct2.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/r4_induct
mkdir -p "$OUT"
note() { echo "[sweep2] $(date -u +%H:%M:%S) $*"; }

if [ $# -ge 1 ] && [ -n "$1" ]; then
  note "waiting for orphan run pid $1 (fb237_v1_s1234)"
  while kill -0 "$1" 2>/dev/null; do sleep 20; done
  if grep -q "^BEST " "$OUT/fb237_v1_s1234.log" 2>/dev/null; then
    touch "$OUT/fb237_v1_s1234.done"
    note "orphan finished ok"
  else
    note "orphan did not finish cleanly; will rerun later"
  fi
fi

run_split() {
  local split=$1 seed=$2
  local tag="${split}_s${seed}"
  [ -f "$OUT/$tag.done" ] && { note "$tag already done"; return; }
  note "start $tag"
  mkdir -p "$OUT/$tag"
  nice -n 10 timeout 9000 \
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

# pass 1: every split once (reference seed), ascending size
for split in fb237_v1 nell_v1 WN18RR_v1 \
             fb237_v2 nell_v2 WN18RR_v2 \
             nell_v3 fb237_v3 WN18RR_v3 \
             nell_v4 WN18RR_v4 fb237_v4; do
  run_split "$split" 1234
done
# pass 2: extra seeds for the round-1 laggards
for seed in 2345 3456; do
  run_split fb237_v1 "$seed"
  run_split nell_v1 "$seed"
done
note "sweep2 finished"
