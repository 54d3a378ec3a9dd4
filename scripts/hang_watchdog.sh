#!/usr/bin/env bash
# Tunnel-hang watchdog: the axon worker sometimes HANGS (no crash) mid
# epoch — run_resilient only restarts on process exit. Kill the trainer
# when its log stops advancing, so the supervisor's resume machinery
# takes over. Usage: hang_watchdog.sh <log> <stale_s> [match]
#   match: a substring (e.g. the leg's --results_dir or --ckpt_dir) that
#   must appear in the trainer's command line. REQUIRED in practice:
#   without it a watchdog left running after its leg ends will kill
#   WHATEVER trainer runs next (round-5 incident: a stale leg-1 watchdog
#   pattern-killed the leg-2 resume attempts and a follow-up probe).
#   Defaults to the log's basename stem, which matches the queue
#   convention <tag>.log + --results_dir .../<tag>.
# Stop with: touch <log>.nowatch
set -u
LOG=$1; STALE=${2:-360}
MATCH=${3:-$(basename "$LOG" .log)}
while :; do
  sleep 60
  [ -e "$LOG.nowatch" ] && exit 0
  [ -e "$LOG" ] || continue
  age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
  if [ "$age" -gt "$STALE" ]; then
    # ONLY a trainer whose args mention this leg (results/ckpt dir)
    PID=$(ps -eo pid,args | grep "redgnn_tpu.cli.train" | grep -v grep \
          | grep -v "platform cpu" | grep -v timeout \
          | grep -F -- "$MATCH" | awk '{print $1}' | head -1)
    if [ -n "$PID" ]; then
      echo "[watchdog] $(date -u +%H:%M:%S) log stale ${age}s; kill $PID"
      kill "$PID"
      sleep 120   # let the supervisor restart before re-checking
    else
      # leg over (no matching trainer) and log stale: nothing left to
      # guard — exit instead of lurking as a pattern-kill hazard
      echo "[watchdog] $(date -u +%H:%M:%S) stale with no matching trainer; exiting"
      exit 0
    fi
  fi
done
