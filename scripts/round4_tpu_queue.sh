#!/usr/bin/env bash
# Round-4 TPU delivery queue. Round 3 delivered WN18RR (test MRR 0.5226,
# ep 13), extrapolation (test fil-MRR 0.5199, beats ref 0.449) +
# eval_splits, and interpolation epochs 0-1 (test MRR 0.5761, anchor in
# artifacts/r4seed_interp). Left: interpolation epochs 2-19 (~20
# min/epoch cycle -> ~6 h worst case, less if the curve converges) and
# the xERTE baseline. Legs bounded by ABSOLUTE unix deadlines.
#
#   leg 1  ICEWS14_TeMP interpolation (seeds /tmp/ckpt_r4i from
#          artifacts/r4seed_interp/ if a banked anchor is committed)
#   leg 2  xERTE on ICEWS14_forecasting
#
# Remember (CLAUDE.md): fresh-machine cold start ~20 min of silence;
# bank anchors into artifacts/ with scripts/bank_anchor.sh every ~30 min.
#
# Usage: nohup bash scripts/round4_tpu_queue.sh T1 T2 >/tmp/r4_queue.log 2>&1 &
set -u
T1=$1; T2=$2
cd "$(dirname "$0")/.."
note() { echo "[queue] $(date -u +%H:%M:%S) $*"; }
note "start; deadlines: interp $(date -u -d @$T1 +%H:%M) xerte $(date -u -d @$T2 +%H:%M)"

LEFT=$(( T1 - $(date +%s) ))
if [ "$LEFT" -gt 900 ]; then
  mkdir -p /tmp/ckpt_r4i /tmp/results_r4i
  if [ -d artifacts/r4seed_interp ]; then
    for f in latest.msgpack latest.msgpack.host.json; do
      [ -e "artifacts/r4seed_interp/$f" ] && \
        cp -v "artifacts/r4seed_interp/$f" /tmp/ckpt_r4i/
    done
    cp -v artifacts/r4seed_interp/caps_*.json /tmp/ckpt_r4i/ 2>/dev/null
  fi
  note "leg 1: interpolation, ${LEFT}s budget"
  bash scripts/run_resilient.sh /tmp/r4_interp.log /tmp/ckpt_r4i "$LEFT" -- \
    --task interpolation \
    --data_path /root/reference/Temporal/interpolation/data/ICEWS14_TeMP \
    --results_dir /tmp/results_r4i --sqlite /tmp/experiments.sqlite
  note "leg 1 done"
else
  note "leg 1 skipped (no time)"
fi
sleep 20

LEFT=$(( T2 - $(date +%s) ))
if [ "$LEFT" -gt 900 ]; then
  mkdir -p /tmp/ckpt_r4xe /tmp/results_r4xe
  note "leg 2: xERTE, ${LEFT}s budget"
  bash scripts/run_resilient.sh /tmp/r4_xerte.log /tmp/ckpt_r4xe "$LEFT" -- \
    --task extrapolation --model xerte \
    --data_path /root/reference/Temporal/extrapolation/data/ICEWS14_forecasting \
    --results_dir /tmp/results_r4xe --sqlite /tmp/experiments.sqlite
  note "leg 2 done"
else
  note "leg 2 skipped (no time)"
fi
note "queue finished; chip free"
