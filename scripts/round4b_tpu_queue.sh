#!/usr/bin/env bash
# Round-4 TPU delivery queue (session version — supersedes
# round4_tpu_queue.sh, which assumed a fresh machine; this machine kept
# round 3's /tmp, so legs resume the live checkpoint dirs directly).
#
#   leg 1  ICEWS14_TeMP interpolation: resume /tmp/ckpt_r3i (epoch 2 in
#          progress, valid MRR 0.5857 @ ep1) to 20 epochs. VERDICT #1.
#   leg 2  xERTE on ICEWS14_forecasting (fresh). VERDICT #3.
#   leg 3  WN18RR transductive: resume /tmp/ckpt_r3w (epoch 13, test MRR
#          0.5226) toward 50 epochs. VERDICT #6.
#   leg 4  YAGO extrapolation (granularity-1 regime). VERDICT #8.
#
# Each leg is bounded by an ABSOLUTE unix deadline; a leg can be cut
# early with `touch <ckpt>/STOP` (the next leg then starts immediately,
# inheriting the saved time). Bank anchors into artifacts/ with
# scripts/bank_anchor.sh every ~30 min while legs run.
#
# Usage: nohup bash scripts/round4b_tpu_queue.sh T1 T2 T3 T4 >/tmp/r4b_queue.log 2>&1 &
set -u
T1=$1; T2=$2; T3=$3; T4=$4
cd "$(dirname "$0")/.."
note() { echo "[queue] $(date -u +%H:%M:%S) $*"; }
note "start; deadlines: interp $(date -u -d @$T1 +%H:%M) xerte $(date -u -d @$T2 +%H:%M) wn18rr $(date -u -d @$T3 +%H:%M) yago-x $(date -u -d @$T4 +%H:%M)"

# ---- leg 1: interpolation flagship, resume round-3's live dir ------------
LEFT=$(( T1 - $(date +%s) ))
if [ "$LEFT" -gt 900 ]; then
  mkdir -p /tmp/ckpt_r3i /tmp/results_r4i
  rm -f /tmp/ckpt_r3i/STOP
  note "leg 1: interpolation resume, ${LEFT}s budget"
  bash scripts/run_resilient.sh /tmp/r4_interp.log /tmp/ckpt_r3i "$LEFT" -- \
    --task interpolation \
    --data_path /root/reference/Temporal/interpolation/data/ICEWS14_TeMP \
    --results_dir /tmp/results_r4i --sqlite /tmp/experiments.sqlite
  note "leg 1 done"
else
  note "leg 1 skipped (no time)"
fi
sleep 20

# ---- leg 2: xERTE --------------------------------------------------------
LEFT=$(( T2 - $(date +%s) ))
if [ "$LEFT" -gt 900 ]; then
  mkdir -p /tmp/ckpt_r4xe /tmp/results_r4xe
  rm -f /tmp/ckpt_r4xe/STOP
  note "leg 2: xERTE, ${LEFT}s budget"
  bash scripts/run_resilient.sh /tmp/r4_xerte.log /tmp/ckpt_r4xe "$LEFT" -- \
    --task extrapolation --model xerte \
    --data_path /root/reference/Temporal/extrapolation/data/ICEWS14_forecasting \
    --results_dir /tmp/results_r4xe --sqlite /tmp/experiments.sqlite
  note "leg 2 done"
else
  note "leg 2 skipped (no time)"
fi
sleep 20

# ---- leg 3: WN18RR to 50 epochs, resume round-3's live dir ---------------
LEFT=$(( T3 - $(date +%s) ))
if [ "$LEFT" -gt 600 ]; then
  mkdir -p /tmp/ckpt_r3w /tmp/results_r4w
  rm -f /tmp/ckpt_r3w/STOP
  note "leg 3: WN18RR resume, ${LEFT}s budget"
  bash scripts/run_resilient.sh /tmp/r4_wn18rr.log /tmp/ckpt_r3w "$LEFT" -- \
    --task transductive \
    --data_path /root/reference/Static/transductive/data/WN18RR \
    --results_dir /tmp/results_r4w --sqlite /tmp/experiments.sqlite
  note "leg 3 done"
else
  note "leg 3 skipped (no time)"
fi
sleep 20

# ---- leg 4: YAGO extrapolation ------------------------------------------
LEFT=$(( T4 - $(date +%s) ))
if [ "$LEFT" -gt 900 ]; then
  mkdir -p /tmp/ckpt_r4yx /tmp/results_r4yx
  rm -f /tmp/ckpt_r4yx/STOP
  note "leg 4: YAGO extrapolation, ${LEFT}s budget"
  bash scripts/run_resilient.sh /tmp/r4_yagox.log /tmp/ckpt_r4yx "$LEFT" -- \
    --task extrapolation \
    --data_path /root/reference/Temporal/extrapolation/data/YAGO \
    --results_dir /tmp/results_r4yx --sqlite /tmp/experiments.sqlite
  note "leg 4 done"
else
  note "leg 4 skipped (no time)"
fi
note "queue finished; chip free"
