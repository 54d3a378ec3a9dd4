#!/usr/bin/env bash
# Third night leg: WN18RR transductive at full size (VERDICT #4), after
# the interpolation leg's queue exits. Usage:
#   nohup bash scripts/round2_wn18rr_leg.sh <deadline_ts> <wait_pid> &
set -u
DEADLINE=$1
WAIT_PID=$2
QLOG=/tmp/round2_night.log
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
echo "[wn18rr] queue ahead done $(date -u)" >>"$QLOG"
sleep 30
LEFT=$(( DEADLINE - $(date +%s) ))
if [ "$LEFT" -le 900 ]; then echo "[wn18rr] no time left" >>"$QLOG"; exit 0; fi
mkdir -p /tmp/ckpt_wn18rr
cd "$(dirname "$0")/.."
bash scripts/run_resilient.sh /tmp/r2_wn18rr.log /tmp/ckpt_wn18rr "$LEFT" -- \
  --task transductive \
  --data_path /root/reference/Static/transductive/data/WN18RR \
  --results_dir /tmp/results_wn18rr --sqlite /tmp/experiments.sqlite
echo "[wn18rr] leg done $(date -u)" >>"$QLOG"
