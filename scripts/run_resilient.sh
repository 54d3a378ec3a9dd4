#!/usr/bin/env bash
# Elastic supervisor for TPU training runs behind the axon tunnel.
#
# The tunneled v5e worker dies sporadically (long executions, transient
# faults); the trainer writes `latest.msgpack` anchors intra-epoch, so the
# cheapest recovery is: restart the CLI with --resume_latest until it
# prints BEST (finished) or the wall budget is exhausted.
#
# Usage:
#   scripts/run_resilient.sh <log> <ckpt_dir> <max_wall_s> -- <cli args...>
# Stop early:  touch <ckpt_dir>/STOP
set -u
LOG=$1; CKPT=$2; BUDGET=$3; shift 3
[ "$1" = "--" ] && shift
mkdir -p "$CKPT" "$(dirname "$LOG")"
START=$(date +%s)
ATTEMPT=0
while :; do
  NOW=$(date +%s); ELAPSED=$((NOW - START)); LEFT=$((BUDGET - ELAPSED))
  if [ -e "$CKPT/STOP" ]; then echo "[supervisor] STOP file" >>"$LOG"; break; fi
  if [ "$LEFT" -le 60 ]; then echo "[supervisor] budget out" >>"$LOG"; break; fi
  ATTEMPT=$((ATTEMPT + 1))
  echo "[supervisor] attempt $ATTEMPT (${LEFT}s left)" >>"$LOG"
  timeout "$LEFT" python -m redgnn_tpu.cli.train \
    --ckpt_dir "$CKPT" --resume_latest "$@" >>"$LOG" 2>&1
  RC=$?
  if [ $RC -eq 0 ]; then echo "[supervisor] finished rc=0" >>"$LOG"; break; fi
  if [ $RC -eq 124 ]; then echo "[supervisor] budget timeout" >>"$LOG"; break; fi
  echo "[supervisor] crashed rc=$RC; restarting in 20s" >>"$LOG"
  sleep 20
done
echo "[supervisor] done after $ATTEMPT attempts" >>"$LOG"
