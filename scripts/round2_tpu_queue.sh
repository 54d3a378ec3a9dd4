#!/usr/bin/env bash
# Round-2 TPU plan, ready to launch at round start (single v5e — one
# process at a time; see CLAUDE.md).
#
#   1. Retrain ICEWS14_forecasting with the corrected recipe
#      (bs16 x accum1, Adam wd 1e-3 — the reference README trains at
#      bs2/Adam; round-1's effective-128 run plateaued 0.09 MRR low).
#      ~10.5 min/epoch -> 20 epochs ≈ 3.5 h.
#   2. Resume ICEWS14_TeMP interpolation from the epoch-0 anchor in
#      artifacts/ (~2 h/epoch at bs8 — budget gets whatever is left).
#
# Usage: nohup bash scripts/round2_tpu_queue.sh <total_budget_s> &
set -u
cd "$(dirname "$0")/.."
BUDGET=${1:-25200}
START=$(date +%s)
QLOG=/tmp/round2_queue.log
echo "[r2queue] start $(date -u), budget ${BUDGET}s" >>"$QLOG"

left() { echo $(( BUDGET - ($(date +%s) - START) )); }

# Leg 1: extrapolation retrain (fresh — recipe changed, don't resume).
L=$(( $(left) * 6 / 10 ))
if [ "$L" -gt 600 ]; then
  mkdir -p /tmp/ckpt_r2x
  bash scripts/run_resilient.sh /tmp/r2_icews14x.log /tmp/ckpt_r2x "$L" -- \
    --task extrapolation \
    --data_path /root/reference/Temporal/extrapolation/data/ICEWS14_forecasting \
    --results_dir /tmp/results_r2x --sqlite /tmp/experiments.sqlite
  echo "[r2queue] extrapolation leg done $(date -u)" >>"$QLOG"
fi

# Leg 2: interpolation resume from the committed anchor.
L=$(left)
if [ "$L" -gt 600 ]; then
  mkdir -p /tmp/ckpt_r2i
  [ -e /tmp/ckpt_r2i/latest.msgpack ] || {
    cp artifacts/icews14_temp_interp_ep1.msgpack /tmp/ckpt_r2i/latest.msgpack
    cp artifacts/icews14_temp_interp_ep1.msgpack.host.json \
       /tmp/ckpt_r2i/latest.msgpack.host.json
  }
  bash scripts/run_resilient.sh /tmp/r2_icews14i.log /tmp/ckpt_r2i "$L" -- \
    --task interpolation \
    --data_path /root/reference/Temporal/interpolation/data/ICEWS14_TeMP \
    --results_dir /tmp/results_r2i --sqlite /tmp/experiments.sqlite
  echo "[r2queue] interpolation leg done $(date -u)" >>"$QLOG"
fi
echo "[r2queue] ALL DONE $(date -u)" >>"$QLOG"
