#!/usr/bin/env bash
# Tunnel-hang watchdog: the axon worker sometimes HANGS (no crash) mid
# epoch — run_resilient only restarts on process exit. Kill the trainer
# when its log stops advancing, so the supervisor's resume machinery
# takes over. Usage: hang_watchdog.sh <log> <stale_s> ; stop with
# touch <log>.nowatch
set -u
LOG=$1; STALE=${2:-360}
while :; do
  sleep 60
  [ -e "$LOG.nowatch" ] && exit 0
  [ -e "$LOG" ] || continue
  age=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
  if [ "$age" -gt "$STALE" ]; then
    # newest trainer matching the supervisor's ckpt dir in the log name
    PID=$(ps -eo pid,args | grep "redgnn_tpu.cli.train" | grep -v grep \
          | grep -v "platform cpu" | grep -v timeout | awk '{print $1}' | head -1)
    if [ -n "$PID" ]; then
      echo "[watchdog] $(date -u +%H:%M:%S) log stale ${age}s; kill $PID"
      kill "$PID"
      sleep 120   # let the supervisor restart before re-checking
    fi
  fi
done
