#!/usr/bin/env bash
# Round-3 queue, revision b: adds the WN18RR full-size static leg after
# the temporal legs (WN18RR measured cheap: exact per-query walk says
# 0.28G propagated edges/epoch ≈ ~35 s/epoch on the v5e; 50 epochs fits
# in <1 h). Waits for the ALREADY-RUNNING interpolation supervisor
# (started by round3_tpu_queue.sh) instead of launching its own.
#
#   leg 1  (external) ICEWS14_TeMP interpolation — waited on via PID
#   leg 2  ICEWS14_forecasting extrapolation until T2
#   leg 3  seen/unseen --eval_splits on leg 2's best checkpoint until T3
#   leg 4  WN18RR static transductive (L=5, 40,943 ents) until T4
#
# Usage: nohup bash scripts/round3b_queue.sh <interp_pid> T2 T3 T4 &
set -u
WAIT_PID=$1; T2=$2; T3=$3; T4=$4
cd "$(dirname "$0")/.."
note() { echo "[queue-b] $(date -u +%H:%M:%S) $*"; }
note "waiting on interpolation supervisor pid $WAIT_PID; deadlines: extrap $(date -u -d @$T2 +%H:%M) evalsplits $(date -u -d @$T3 +%H:%M) wn18rr $(date -u -d @$T4 +%H:%M)"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
note "interpolation leg finished"
sleep 30

LEFT=$(( T2 - $(date +%s) ))
if [ "$LEFT" -gt 900 ]; then
  mkdir -p /tmp/ckpt_r3x /tmp/results_r3x
  note "leg 2: extrapolation, ${LEFT}s budget"
  bash scripts/run_resilient.sh /tmp/r3_extrap.log /tmp/ckpt_r3x "$LEFT" -- \
    --task extrapolation \
    --data_path /root/reference/Temporal/extrapolation/data/ICEWS14_forecasting \
    --results_dir /tmp/results_r3x --sqlite /tmp/experiments.sqlite
  note "leg 2 done"
else
  note "leg 2 skipped (no time)"
fi
sleep 30

LEFT=$(( T3 - $(date +%s) ))
if [ "$LEFT" -gt 300 ]; then
  note "leg 3: eval_splits, ${LEFT}s budget"
  timeout "$LEFT" bash scripts/eval_best.sh extrapolation \
    /root/reference/Temporal/extrapolation/data/ICEWS14_forecasting \
    /tmp/ckpt_r3x \
    --eval_splits valid_seen,valid_unseen,test_seen,test_unseen \
    --results_dir /tmp/results_r3x >>/tmp/r3_extrap.log 2>&1
  note "leg 3 done rc=$?"
else
  note "leg 3 skipped (no time)"
fi
sleep 30

LEFT=$(( T4 - $(date +%s) ))
if [ "$LEFT" -gt 600 ]; then
  mkdir -p /tmp/ckpt_r3w /tmp/results_r3w
  note "leg 4: WN18RR transductive, ${LEFT}s budget"
  bash scripts/run_resilient.sh /tmp/r3_wn18rr.log /tmp/ckpt_r3w "$LEFT" -- \
    --task transductive \
    --data_path /root/reference/Static/transductive/data/WN18RR \
    --results_dir /tmp/results_r3w --sqlite /tmp/experiments.sqlite
  note "leg 4 done"
else
  note "leg 4 skipped (no time)"
fi
note "queue finished; chip free"
