#!/usr/bin/env bash
# Round-5 main delivery queue (session 2) — VERDICT r4 priorities in
# ranked order, every long leg bankable (anchors -> artifacts/) so a
# machine recycle or driver cutoff loses at most ~15 min.
#
#   leg A  inductive fillers: fb237_v3 (50 ep, the only split with NO
#          number), fb237_v4 completion, umls rerun x3 seeds (weak #2).
#   leg B  xERTE retrain WITH the grad global-norm clip (VERDICT #2).
#   leg C  YAGO static transductive 123k ents (VERDICT #1) — b=20 +
#          n_tbatch=25 for TPU step-latency (reference recipe is b=3;
#          lr kept at the reference 3e-4, noted in RESULTS).
#   leg D  YAGO temporal extrapolation, granularity 1 (VERDICT #4).
#   leg E  WN18RR transductive resume ep14 -> 50 (VERDICT #3).
#
# Watchdogs: per-leg, explicit match arg (ADVICE r4: naming must let the
# watchdog find the trainer), stopped via <log>.nowatch when the leg ends.
# Banking: background loop calls bank_anchor.sh during legs C and E.
#
# Usage: nohup bash scripts/round5b_tpu_queue.sh TA TB TC TD TE \
#            >/tmp/r5b_queue.log 2>&1 &
set -u
TA=$1; TB=$2; TC=$3; TD=$4; TE=$5
cd "$(dirname "$0")/.."
note() { echo "[queue] $(date -u +%H:%M:%S) $*"; }
note "deadlines: A $(date -u -d @$TA +%H:%M) B $(date -u -d @$TB +%H:%M) C $(date -u -d @$TC +%H:%M) D $(date -u -d @$TD +%H:%M) E $(date -u -d @$TE +%H:%M)"

IND=/root/reference/Static/inductive/data
TRANS=/root/reference/Static/transductive/data
EXT=/root/reference/Temporal/extrapolation/data

# ---- leg A: inductive + umls fillers (direct timeouts, no watchdog) ----
OUT=/tmp/r5_induct
mkdir -p "$OUT"
run_a() {  # run_a <subdir> <timeout> <cli args...>
  local tag=$1 t=$2; shift 2
  local left=$(( TA - $(date +%s) ))
  [ "$left" -le 120 ] && { note "A/$tag skipped (deadline)"; return; }
  [ "$t" -gt "$left" ] && t=$left
  mkdir -p "$OUT/$tag"
  note "A/$tag start (timeout ${t}s)"
  timeout "$t" python -m redgnn_tpu.cli.train "$@" \
      --results_dir "$OUT/$tag" --sqlite /tmp/experiments.sqlite \
      > "$OUT/$tag.log" 2>&1
  note "A/$tag rc=$?"
}
run_a fb237_v3_s1234 1500 --task inductive --data_path "$IND/fb237_v3" --set seed=1234
run_a fb237_v4_s1234 1300 --task inductive --data_path "$IND/fb237_v4" --set seed=1234
run_a umls_s1234 420 --task transductive --data_path "$TRANS/umls" --set seed=1234
run_a umls_s42   420 --task transductive --data_path "$TRANS/umls" --set seed=42
run_a umls_s7    420 --task transductive --data_path "$TRANS/umls" --set seed=7
# ---- generic resilient leg with watchdog + optional banking ------------
run_leg() {  # run_leg <tag> <deadline> <bank:0|1> <cli args...>
  local tag=$1 T=$2 bank=$3; shift 3
  local left=$(( T - $(date +%s) ))
  if [ "$left" -le 300 ]; then note "$tag skipped (no time)"; return; fi
  local log=/tmp/$tag.log ckpt=/tmp/${tag}_ckpt results=/tmp/${tag}_results
  mkdir -p "$ckpt" "$results"
  rm -f "$ckpt/STOP" "$log.nowatch"
  note "$tag start (${left}s budget)"
  nohup bash scripts/hang_watchdog.sh "$log" 600 "${tag}_" \
      > /tmp/${tag}_watchdog.log 2>&1 &
  local wd=$!
  if [ "$bank" = 1 ]; then
    ( while [ -z "$(ls /tmp/${tag}_ckpt/BANK_DONE 2>/dev/null)" ]; do
        sleep 900
        [ -e "/tmp/${tag}_ckpt/latest.msgpack" ] && \
          bash scripts/bank_anchor.sh "r5_$tag" "$ckpt" "$results" \
            >> /tmp/${tag}_bank.log 2>&1
      done ) &
    BANKPID=$!
  fi
  bash scripts/run_resilient.sh "$log" "$ckpt" "$left" -- \
      --results_dir "$results" --sqlite /tmp/experiments.sqlite "$@"
  touch "$log.nowatch" "$ckpt/BANK_DONE"
  [ "$bank" = 1 ] && { kill "$BANKPID" 2>/dev/null; \
    bash scripts/bank_anchor.sh "r5_$tag" "$ckpt" "$results" \
      >> /tmp/${tag}_bank.log 2>&1 || true; }
  kill "$wd" 2>/dev/null
  note "$tag done"
  sleep 10
}

# ---- leg B: xERTE retrain with grad clip -------------------------------
run_leg r5b_xerte "$TB" 0 \
  --task extrapolation --model xerte \
  --data_path "$EXT/ICEWS14_forecasting"

# ---- leg C: YAGO static ------------------------------------------------
run_leg r5b_yago "$TC" 1 \
  --task transductive --data_path "$TRANS/YAGO" \
  --set n_batch=20 n_tbatch=25

# ---- leg D: YAGO extrapolation ----------------------------------------
run_leg r5b_yagox "$TD" 1 \
  --task extrapolation --data_path "$EXT/YAGO"

# ---- leg E: WN18RR transductive resume --------------------------------
mkdir -p /tmp/r5b_wn18rr_ckpt
for f in latest.msgpack latest.msgpack.host.json; do
  if [ ! -e "/tmp/r5b_wn18rr_ckpt/$f" ]; then
    if [ -e "/tmp/ckpt_r5w/$f" ]; then cp "/tmp/ckpt_r5w/$f" /tmp/r5b_wn18rr_ckpt/
    elif [ -e "artifacts/r3_wn18rr/$f" ]; then cp "artifacts/r3_wn18rr/$f" /tmp/r5b_wn18rr_ckpt/
    fi
  fi
done
cp /tmp/ckpt_r5w/caps_*.json /tmp/r5b_wn18rr_ckpt/ 2>/dev/null
run_leg r5b_wn18rr "$TE" 1 \
  --task transductive --data_path "$TRANS/WN18RR"

note "queue finished; chip free"
