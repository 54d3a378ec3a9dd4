#!/usr/bin/env bash
# Round-5 follow-up chip work, priority order per VERDICT r4, for the
# window after round5b_tpu_queue.sh (leg C YAGO-static was cut: the
# jitted train scan hangs the tunneled worker at those shapes — see
# scripts/probe_yago_tpu.py docstring).
#
#   0. YAGO-static hang probe (bounded, ~15 min worst case).
#   1. YAGO static retry at the reference recipe b=3 IF the probe's
#      b=3 scan dispatch returned (VERDICT #1).
#   2. xERTE sampling=first A/B (VERDICT #2 isolator; the grad clip
#      alone left test fil-MRR at 0.4138 vs band 0.416-0.419).
#   3. fb237_v4 full 50 epochs under run_resilient (VERDICT #5).
#   4. nell_v4 order-sensitivity A/B (VERDICT #6 / parity follow-up).
#   5. Bounded interpolation ablations with whatever remains (#7).
#
# Usage: nohup bash scripts/round5c_followup.sh T_END >/tmp/r5c.log 2>&1 &
set -u
T=$1
cd "$(dirname "$0")/.."
note() { echo "[r5c] $(date -u +%H:%M:%S) $*"; }
rm -f /tmp/QUEUE_ABORT
gate() {  # gate <min_seconds_needed> — false if too late or bench wants the chip
  [ -e /tmp/QUEUE_ABORT ] && { note "QUEUE_ABORT set; stopping"; return 1; }
  [ $(( T - $(date +%s) )) -gt "$1" ]
}
EXT=/root/reference/Temporal/extrapolation/data

# ---- -1. wait for the tunneled worker to heal (leg E ended in a
# crash-loop; post-recycle cold start can be ~7-20 min) ------------------
if gate 600; then
  note "waiting for device"
  timeout 2400 python - <<'PY'
import time, jax, jax.numpy as jnp
deadline = time.time() + 2300
while True:
    try:
        jnp.ones(2).sum().block_until_ready()
        print("device up", flush=True)
        break
    except Exception as e:
        if time.time() > deadline:
            raise
        time.sleep(20)
PY
  note "device wait rc=$?"
fi

# ---- 0. probe ----------------------------------------------------------
LEFT=$(( T - $(date +%s) ))
if gate 600; then
  note "yago probe"
  timeout 2100 python scripts/probe_yago_tpu.py > /tmp/r5c_probe.log 2>&1
  note "probe rc=$? (see /tmp/r5c_probe.log)"
fi

# ---- 1. YAGO static retry at b=3 (only if the probe cleared it) -------
LEFT=$(( T - $(date +%s) ))
if grep -q "epoch-scan nb=1 b=3: ok" /tmp/r5c_probe.log 2>/dev/null \
   && gate 1200; then
  B=$(( LEFT > 4200 ? 4200 : LEFT ))
  mkdir -p /tmp/r5c_yago_ckpt /tmp/r5c_yago_results
  rm -f /tmp/r5c_yago_ckpt/STOP
  note "YAGO static retry b=3 (${B}s)"
  nohup bash scripts/hang_watchdog.sh /tmp/r5c_yago.log 900 r5c_yago_ \
      > /tmp/r5c_yago_watchdog.log 2>&1 &
  WD=$!
  ( while [ ! -e /tmp/r5c_yago_ckpt/BANK_DONE ]; do
      sleep 600
      [ -e /tmp/r5c_yago_ckpt/latest.msgpack ] && \
        bash scripts/bank_anchor.sh r5_yago /tmp/r5c_yago_ckpt \
          /tmp/r5c_yago_results >> /tmp/r5c_yago_bank.log 2>&1
    done ) &
  BK=$!
  bash scripts/run_resilient.sh /tmp/r5c_yago.log /tmp/r5c_yago_ckpt "$B" -- \
    --task transductive \
    --data_path /root/reference/Static/transductive/data/YAGO \
    --results_dir /tmp/r5c_yago_results --sqlite /tmp/experiments.sqlite
  touch /tmp/r5c_yago.log.nowatch /tmp/r5c_yago_ckpt/BANK_DONE
  kill "$WD" "$BK" 2>/dev/null
  bash scripts/bank_anchor.sh r5_yago /tmp/r5c_yago_ckpt /tmp/r5c_yago_results || true
  note "YAGO retry done"
else
  note "YAGO retry skipped (probe did not clear b=3)"
fi

# ---- 2. xERTE sampling=first A/B --------------------------------------
LEFT=$(( T - $(date +%s) ))
if gate 900; then
  B=$(( LEFT > 2400 ? 2400 : LEFT ))
  mkdir -p /tmp/r5c_xfirst_ckpt /tmp/r5c_xfirst_results
  rm -f /tmp/r5c_xfirst_ckpt/STOP
  note "xERTE sampling=first A/B (${B}s)"
  bash scripts/run_resilient.sh /tmp/r5c_xfirst.log /tmp/r5c_xfirst_ckpt "$B" -- \
    --task extrapolation --model xerte \
    --data_path "$EXT/ICEWS14_forecasting" \
    --results_dir /tmp/r5c_xfirst_results --sqlite /tmp/experiments.sqlite \
    --set sampling=first
  note "xERTE A/B done"
fi

# ---- 2c. WN18RR completion (ep37 -> 50; ep36 already beats paper on all
# three metrics, this closes the 50-epoch protocol) ----------------------
LEFT=$(( T - $(date +%s) ))
if gate 900; then
  B=$(( LEFT > 2700 ? 2700 : LEFT ))
  mkdir -p /tmp/r5c_wn_ckpt /tmp/r5c_wn_results
  rm -f /tmp/r5c_wn_ckpt/STOP
  for f in latest.msgpack latest.msgpack.host.json; do
    [ -e "/tmp/r5c_wn_ckpt/$f" ] || cp "/tmp/r5b_wn18rr_ckpt/$f" /tmp/r5c_wn_ckpt/
  done
  cp /tmp/r5b_wn18rr_ckpt/caps_*.json /tmp/r5c_wn_ckpt/ 2>/dev/null
  note "WN18RR completion (${B}s)"
  nohup bash scripts/hang_watchdog.sh /tmp/r5c_wn.log 600 r5c_wn_ \
      > /tmp/r5c_wn_watchdog.log 2>&1 &
  WD2=$!
  bash scripts/run_resilient.sh /tmp/r5c_wn.log /tmp/r5c_wn_ckpt "$B" -- \
    --task transductive \
    --data_path /root/reference/Static/transductive/data/WN18RR \
    --results_dir /tmp/r5c_wn_results --sqlite /tmp/experiments.sqlite
  touch /tmp/r5c_wn.log.nowatch; kill "$WD2" 2>/dev/null
  bash scripts/bank_anchor.sh r5_wn18rr_final /tmp/r5c_wn_ckpt /tmp/r5c_wn_results || true
  note "WN18RR completion done"
fi

# ---- 3. fb237_v4 to 50 epochs -----------------------------------------
LEFT=$(( T - $(date +%s) ))
if gate 900; then
  B=$(( LEFT > 3000 ? 3000 : LEFT ))
  mkdir -p /tmp/r5c_fb4_ckpt /tmp/r5c_fb4_results
  rm -f /tmp/r5c_fb4_ckpt/STOP
  note "fb237_v4 full run (${B}s)"
  bash scripts/run_resilient.sh /tmp/r5c_fb4.log /tmp/r5c_fb4_ckpt "$B" -- \
    --task inductive \
    --data_path /root/reference/Static/inductive/data/fb237_v4 \
    --results_dir /tmp/r5c_fb4_results --sqlite /tmp/experiments.sqlite \
    --set seed=1234
  note "fb237_v4 done"
fi

# ---- 4. nell_v4 A/B ----------------------------------------------------
LEFT=$(( T - $(date +%s) ))
if gate 600; then
  AB=$(( $(date +%s) + (LEFT > 1500 ? 1500 : LEFT) ))
  bash scripts/round5_nellv4_ab.sh "$AB"
fi

# ---- 4b. nell_v1 / fb237_v2 seed sweep (VERDICT #8: the two lagging
# splits, -0.034/-0.028 MRR vs paper; umls showed a 0.011 seed spread on
# this stack, so extra seeds are the cheapest first probe) --------------
if gate 900; then
  OUT=/tmp/r5_induct
  run_seed() {
    local tag=$1 ds=$2 seed=$3 t=$4
    local left=$(( T - $(date +%s) ))
    { [ -e /tmp/QUEUE_ABORT ] || [ "$left" -le 300 ]; } && { note "seed/$tag skipped"; return; }
    [ "$t" -gt "$left" ] && t=$left
    mkdir -p "$OUT/$tag"
    note "seed/$tag start (${t}s)"
    timeout "$t" python -m redgnn_tpu.cli.train \
        --task inductive \
        --data_path /root/reference/Static/inductive/data/$ds \
        --results_dir "$OUT/$tag" --sqlite /tmp/experiments.sqlite \
        --set seed=$seed \
        > "$OUT/$tag.log" 2>&1
    note "seed/$tag rc=$?"
  }
  run_seed nell_v1_s42   nell_v1  42 1200
  run_seed nell_v1_s7    nell_v1   7 1200
  run_seed fb237_v2_s42  fb237_v2 42 1200
  run_seed fb237_v2_s7   fb237_v2  7 1200
fi

# ---- 5. bounded ablations ---------------------------------------------
LEFT=$(( T - $(date +%s) ))
if gate 900; then
  PER=$(( (LEFT - 120) / 3 ))
  OUT=/tmp/r5c_abl
  mkdir -p "$OUT"
  run_abl() {
    local tag=$1; shift
    local left=$(( T - $(date +%s) ))
    { [ -e /tmp/QUEUE_ABORT ] || [ "$left" -le 300 ]; } && { note "abl/$tag skipped"; return; }
    local t=$(( PER < left ? PER : left ))
    mkdir -p "$OUT/$tag"
    note "abl/$tag start (${t}s)"
    timeout "$t" python -m redgnn_tpu.cli.train \
        --task interpolation \
        --data_path /root/reference/Temporal/interpolation/data/ICEWS14_TeMP \
        --results_dir "$OUT/$tag" --sqlite /tmp/experiments.sqlite \
        --set "$@" \
        > "$OUT/$tag.log" 2>&1
    note "abl/$tag rc=$?"
  }
  run_abl control   seed=1234
  run_abl wo_tau    seed=1234 use_time=false
  run_abl wo_attn   seed=1234 use_attention=false
fi
note "follow-up finished; chip free"
