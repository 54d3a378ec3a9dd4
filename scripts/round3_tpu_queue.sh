#!/usr/bin/env bash
# Round-3 TPU delivery queue: the chip is handed through three legs, each
# bounded by an ABSOLUTE unix deadline so the driver's end-of-round bench
# always gets the chip back:
#   leg 1  ICEWS14_TeMP interpolation (resumes the round-2 intra-epoch
#          anchor; exact per-query caps make overflow replay impossible)
#   leg 2  ICEWS14_forecasting extrapolation, corrected recipe (bs16,
#          coupled-Adam wd 1e-3), fresh run
#   leg 3  seen/unseen --eval_splits on leg 2's best checkpoint
# A leg can be cut early by `touch <ckpt>/STOP` (run_resilient exits on
# the flag); the queue then moves to the next leg immediately.
#
# Usage: nohup bash scripts/round3_tpu_queue.sh T1 T2 T3 >/tmp/r3_queue.log 2>&1 &
set -u
T1=$1; T2=$2; T3=$3
cd "$(dirname "$0")/.."
QLOG=/tmp/r3_queue.log
note() { echo "[queue] $(date -u +%H:%M:%S) $*"; }

note "start; deadlines: leg1 $(date -u -d @$T1 +%H:%M) leg2 $(date -u -d @$T2 +%H:%M) leg3 $(date -u -d @$T3 +%H:%M)"

# ---- leg 1: interpolation ------------------------------------------------
LEFT=$(( T1 - $(date +%s) ))
if [ "$LEFT" -gt 900 ]; then
  mkdir -p /tmp/ckpt_r3i /tmp/results_r3i
  # seed with the round-2 intra-epoch anchor (epoch 0, step ~3072) and its
  # caps floor so the XLA persistent cache stays warm
  for f in latest.msgpack latest.msgpack.host.json caps_train_b32_h1.2_L4.json; do
    [ -e "/tmp/ckpt_r3i/$f" ] || cp -v "/tmp/ckpt_r2i_dense/$f" /tmp/ckpt_r3i/ 2>/dev/null
  done
  note "leg 1: interpolation, ${LEFT}s budget"
  bash scripts/run_resilient.sh /tmp/r3_interp.log /tmp/ckpt_r3i "$LEFT" -- \
    --task interpolation \
    --data_path /root/reference/Temporal/interpolation/data/ICEWS14_TeMP \
    --results_dir /tmp/results_r3i --sqlite /tmp/experiments.sqlite
  note "leg 1 done"
else
  note "leg 1 skipped (no time)"
fi
sleep 30

# ---- leg 2: extrapolation ------------------------------------------------
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

# ---- leg 3: seen/unseen protocol on the best extrapolation checkpoint ----
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
note "queue finished; chip free"
