#!/usr/bin/env bash
# Round-5 TPU session queue (fresh machine: /tmp wiped, first process
# pays the ~20-min cold start — see CLAUDE.md round-3 facts).
#
#   leg 1  WN18RR_v3 inductive, full 50 epochs from scratch (~12 s/epoch
#          warm; completes the round-4 partial row at ep14).
#   leg 2  WN18RR transductive: resume artifacts/r3_wn18rr (epoch 13,
#          test MRR 0.5226) toward 50 epochs with whatever time is left.
#          Progress banks via latest.msgpack anchors + bank_anchor.sh.
#
# Usage: nohup bash scripts/round5_tpu_queue.sh T1 T2 >/tmp/r5_queue.log 2>&1 &
set -u
T1=$1; T2=$2
cd "$(dirname "$0")/.."
note() { echo "[queue] $(date -u +%H:%M:%S) $*"; }
note "start; deadlines: v3 $(date -u -d @$T1 +%H:%M) wn18rr $(date -u -d @$T2 +%H:%M)"

# ---- leg 1: WN18RR_v3 inductive, bounded, direct (no resume machinery:
# inductive runs are minutes on-chip and restart cheaply) ----------------
LEFT=$(( T1 - $(date +%s) ))
OUT=/tmp/r5_induct
mkdir -p "$OUT/WN18RR_v3_s1234"
if [ "$LEFT" -gt 300 ]; then
  note "leg 1: WN18RR_v3, ${LEFT}s budget"
  timeout "$LEFT" python -m redgnn_tpu.cli.train \
      --task inductive \
      --data_path /root/reference/Static/inductive/data/WN18RR_v3 \
      --results_dir "$OUT/WN18RR_v3_s1234" --sqlite /tmp/experiments.sqlite \
      --set seed=1234 \
      > "$OUT/WN18RR_v3_s1234.log" 2>&1
  note "leg 1 done rc=$?"
else
  note "leg 1 skipped (no time)"
fi
sleep 10

# ---- leg 2: WN18RR transductive resume ---------------------------------
LEFT=$(( T2 - $(date +%s) ))
if [ "$LEFT" -gt 300 ]; then
  mkdir -p /tmp/ckpt_r5w /tmp/results_r5w
  rm -f /tmp/ckpt_r5w/STOP
  # seed the resume state from the banked round-3 artifact (machine fresh)
  for f in latest.msgpack latest.msgpack.host.json; do
    [ -e "/tmp/ckpt_r5w/$f" ] || cp "artifacts/r3_wn18rr/$f" "/tmp/ckpt_r5w/$f"
  done
  note "leg 2: WN18RR resume, ${LEFT}s budget"
  bash scripts/run_resilient.sh /tmp/r5_wn18rr.log /tmp/ckpt_r5w "$LEFT" -- \
    --task transductive \
    --data_path /root/reference/Static/transductive/data/WN18RR \
    --results_dir /tmp/results_r5w --sqlite /tmp/experiments.sqlite
  note "leg 2 done"
else
  note "leg 2 skipped (no time)"
fi
note "queue finished; chip free"
