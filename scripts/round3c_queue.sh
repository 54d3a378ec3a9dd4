#!/usr/bin/env bash
# Round-3 session-2 TPU delivery queue (the first round-3 session's /tmp —
# anchors, caps, compile cache — was lost with the machine; every leg here
# starts fresh and artifacts are collected into the repo between legs).
# Legs, each bounded by an ABSOLUTE unix deadline so the driver's
# end-of-round bench always gets the chip back:
#   leg 1  WN18RR transductive, full size (L=5, 40,943 ents, 50 epochs;
#          exact walk says ~35 s/epoch -> fits well inside its window)
#   leg 2  ICEWS14_forecasting extrapolation, corrected recipe (bs16,
#          coupled-Adam wd 1e-3) - run until deadline or convergence
#   leg 3  seen/unseen --eval_splits on leg 2's best checkpoint
#   leg 4  ICEWS14_TeMP interpolation tail: start the run fresh and bank
#          an intra-epoch anchor + caps certificates for round 4
# A leg can be cut early with `touch <ckpt>/STOP`.
#
# Usage: nohup bash scripts/round3c_queue.sh T1 T2 T3 T4 >/tmp/r3c_queue.log 2>&1 &
set -u
T1=$1; T2=$2; T3=$3; T4=$4
cd "$(dirname "$0")/.."
note() { echo "[queue] $(date -u +%H:%M:%S) $*"; }
note "start; deadlines: wn18rr $(date -u -d @$T1 +%H:%M) extrap $(date -u -d @$T2 +%H:%M) splits $(date -u -d @$T3 +%H:%M) interp $(date -u -d @$T4 +%H:%M)"

# ---- leg 1: WN18RR full-size transductive --------------------------------
LEFT=$(( T1 - $(date +%s) ))
if [ "$LEFT" -gt 600 ]; then
  mkdir -p /tmp/ckpt_r3w /tmp/results_r3w
  note "leg 1: WN18RR, ${LEFT}s budget"
  bash scripts/run_resilient.sh /tmp/r3_wn18rr.log /tmp/ckpt_r3w "$LEFT" -- \
    --task transductive \
    --data_path /root/reference/Static/transductive/data/WN18RR \
    --results_dir /tmp/results_r3w --sqlite /tmp/experiments.sqlite
  note "leg 1 done"
else
  note "leg 1 skipped (no time)"
fi
sleep 20

# ---- leg 2: extrapolation, corrected recipe ------------------------------
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
sleep 20

# ---- leg 3: seen/unseen protocol on the best extrapolation checkpoint ----
LEFT=$(( T3 - $(date +%s) ))
if [ "$LEFT" -gt 300 ] && ls /tmp/ckpt_r3x/*.msgpack >/dev/null 2>&1; then
  note "leg 3: eval_splits, ${LEFT}s budget"
  timeout "$LEFT" bash scripts/eval_best.sh extrapolation \
    /root/reference/Temporal/extrapolation/data/ICEWS14_forecasting \
    /tmp/ckpt_r3x \
    --eval_splits valid_seen,valid_unseen,test_seen,test_unseen \
    --results_dir /tmp/results_r3x >>/tmp/r3_extrap.log 2>&1
  note "leg 3 done rc=$?"
else
  note "leg 3 skipped"
fi
sleep 20

# ---- leg 4: interpolation tail (bank an anchor for round 4) --------------
LEFT=$(( T4 - $(date +%s) ))
if [ "$LEFT" -gt 600 ]; then
  mkdir -p /tmp/ckpt_r3i /tmp/results_r3i
  note "leg 4: interpolation tail, ${LEFT}s budget"
  bash scripts/run_resilient.sh /tmp/r3_interp.log /tmp/ckpt_r3i "$LEFT" -- \
    --task interpolation \
    --data_path /root/reference/Temporal/interpolation/data/ICEWS14_TeMP \
    --results_dir /tmp/results_r3i --sqlite /tmp/experiments.sqlite
  note "leg 4 done"
else
  note "leg 4 skipped (no time)"
fi
note "queue finished; chip free"
