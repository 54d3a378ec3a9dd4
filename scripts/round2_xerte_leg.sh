#!/usr/bin/env bash
# Fourth night leg: xERTE baseline on ICEWS14_forecasting (VERDICT #6),
# in whatever TPU window remains after the WN18RR leg.
set -u
DEADLINE=$1
WAIT_PID=$2
QLOG=/tmp/round2_night.log
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
echo "[xerte] queue ahead done $(date -u)" >>"$QLOG"
sleep 30
LEFT=$(( DEADLINE - $(date +%s) ))
if [ "$LEFT" -le 600 ]; then echo "[xerte] no time left" >>"$QLOG"; exit 0; fi
mkdir -p /tmp/ckpt_xerte
cd "$(dirname "$0")/.."
bash scripts/run_resilient.sh /tmp/r2_xerte.log /tmp/ckpt_xerte "$LEFT" -- \
  --task extrapolation --model xerte \
  --data_path /root/reference/Temporal/extrapolation/data/ICEWS14_forecasting \
  --results_dir /tmp/results_xerte --sqlite /tmp/experiments.sqlite
echo "[xerte] leg done $(date -u)" >>"$QLOG"
