#!/usr/bin/env bash
# Round-5 follow-up chip work, in priority order, for whatever window
# remains after round5b_tpu_queue.sh:
#   1. fb237_v4 FULL 50 epochs under run_resilient (same-seed reruns
#      deterministically replay the first ~15 epochs; a checkpointed
#      resume finishes the matrix row properly). ~45 min.
#   2. nell_v4 order-sensitivity A/B (round5_nellv4_ab.sh). ~20 min.
#   3. Bounded interpolation ablations (control / wo_tau / wo_attn),
#      equal wall-clock each, with whatever is left (VERDICT r4 #7 asks
#      for interpretable ordering; full 10-epoch convergence does not
#      fit a single-chip round).
#
# Usage: nohup bash scripts/round5c_followup.sh T_END >/tmp/r5c.log 2>&1 &
set -u
T=$1
cd "$(dirname "$0")/.."
note() { echo "[r5c] $(date -u +%H:%M:%S) $*"; }

# ---- 1. fb237_v4 to 50 epochs -----------------------------------------
LEFT=$(( T - $(date +%s) ))
if [ "$LEFT" -gt 600 ]; then
  B=$(( LEFT > 3000 ? 3000 : LEFT ))
  mkdir -p /tmp/r5c_fb4_ckpt /tmp/r5c_fb4_results
  rm -f /tmp/r5c_fb4_ckpt/STOP
  note "fb237_v4 full run (${B}s)"
  nohup bash scripts/hang_watchdog.sh /tmp/r5c_fb4.log 480 r5c_fb4_ \
      > /tmp/r5c_fb4_watchdog.log 2>&1 &
  WD=$!
  bash scripts/run_resilient.sh /tmp/r5c_fb4.log /tmp/r5c_fb4_ckpt "$B" -- \
    --task inductive \
    --data_path /root/reference/Static/inductive/data/fb237_v4 \
    --results_dir /tmp/r5c_fb4_results --sqlite /tmp/experiments.sqlite \
    --set seed=1234
  touch /tmp/r5c_fb4.log.nowatch; kill "$WD" 2>/dev/null
  note "fb237_v4 done"
fi

# ---- 2. nell_v4 A/B ----------------------------------------------------
LEFT=$(( T - $(date +%s) ))
if [ "$LEFT" -gt 600 ]; then
  AB=$(( $(date +%s) + (LEFT > 1500 ? 1500 : LEFT) ))
  bash scripts/round5_nellv4_ab.sh "$AB"
fi

# ---- 2b. xERTE sampling A/B -------------------------------------------
# Round-5 leg B showed the post-peak divergence SURVIVES the grad clip
# (valid fil-MRR 0.412 @ ep4 -> 0.228 @ ep6), so the next isolator from
# VERDICT #2 is the sampling strategy: 'first' (deterministic oldest-K)
# vs the reference-default 'weighted'.
LEFT=$(( T - $(date +%s) ))
if [ "$LEFT" -gt 900 ]; then
  B=$(( LEFT > 2100 ? 2100 : LEFT ))
  mkdir -p /tmp/r5c_xfirst_ckpt /tmp/r5c_xfirst_results
  rm -f /tmp/r5c_xfirst_ckpt/STOP
  note "xERTE sampling=first A/B (${B}s)"
  bash scripts/run_resilient.sh /tmp/r5c_xfirst.log /tmp/r5c_xfirst_ckpt "$B" -- \
    --task extrapolation --model xerte \
    --data_path /root/reference/Temporal/extrapolation/data/ICEWS14_forecasting \
    --results_dir /tmp/r5c_xfirst_results --sqlite /tmp/experiments.sqlite \
    --set sampling=first
  note "xERTE A/B done"
fi

# test-eval the best checkpoints of both xERTE runs (leg B trained under
# the main queue; budget timeouts kill mid-training so the test metric
# for the BEST epoch has to come from an explicit eval pass)
EXT=/root/reference/Temporal/extrapolation/data
for pair in "r5c_xfirst:--set sampling=first"; do
  tag=${pair%%:*}; extra=${pair#*:}
  LEFT=$(( T - $(date +%s) ))
  [ "$LEFT" -le 600 ] && break
  # a COMPLETED run logs test-on-best itself (BEST line); eval only
  # when the budget killed it mid-training
  grep -q "^BEST" "/tmp/${tag}.log" 2>/dev/null && continue
  if [ -d "/tmp/${tag}_ckpt" ]; then
    note "eval-best $tag"
    timeout $(( LEFT > 1500 ? 1500 : LEFT )) \
      bash scripts/eval_best.sh extrapolation "$EXT/ICEWS14_forecasting" \
        "/tmp/${tag}_ckpt" --model xerte \
        --results_dir "/tmp/${tag}_results" $extra \
        > "/tmp/${tag}_evalbest.log" 2>&1
    note "eval-best $tag rc=$?"
  fi
done

# ---- 3. bounded ablations ---------------------------------------------
LEFT=$(( T - $(date +%s) ))
if [ "$LEFT" -gt 900 ]; then
  PER=$(( (LEFT - 120) / 3 ))
  OUT=/tmp/r5c_abl
  mkdir -p "$OUT"
  run_abl() {
    local tag=$1; shift
    local left=$(( T - $(date +%s) ))
    [ "$left" -le 300 ] && { note "abl/$tag skipped"; return; }
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
