#!/usr/bin/env bash
# Round-2 unattended TPU queue: when the running extrapolation supervisor
# exits, start the ICEWS14_TeMP interpolation training (fresh, bs32 dense
# recipe) and let it run until DEADLINE (absolute unix ts). The deadline
# leaves the chip free for the driver's end-of-round bench.
#
# Usage: nohup bash scripts/round2_night_queue.sh <deadline_ts> <wait_pid> &
set -u
DEADLINE=$1
WAIT_PID=$2
QLOG=/tmp/round2_night.log
echo "[night] start $(date -u), deadline $(date -u -d @$DEADLINE)" >>"$QLOG"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 60; done
echo "[night] extrapolation supervisor gone $(date -u)" >>"$QLOG"
sleep 30
LEFT=$(( DEADLINE - $(date +%s) ))
if [ "$LEFT" -le 900 ]; then echo "[night] no time left" >>"$QLOG"; exit 0; fi
mkdir -p /tmp/ckpt_r2i_dense
cd "$(dirname "$0")/.."
bash scripts/run_resilient.sh /tmp/r2_icews14i_dense.log /tmp/ckpt_r2i_dense "$LEFT" -- \
  --task interpolation \
  --data_path /root/reference/Temporal/interpolation/data/ICEWS14_TeMP \
  --results_dir /tmp/results_r2i --sqlite /tmp/experiments.sqlite
echo "[night] interpolation leg done $(date -u)" >>"$QLOG"
