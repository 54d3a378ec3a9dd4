"""Benchmark: RED-GNN training throughput on real TPU hardware.

Prints TWO JSON lines:
  {"metric": "train_edges_per_sec_family_single_chip", ...}   static path
  {"metric": "train_queries_per_sec_icews14_interp_single_chip", ...}
                                                            temporal path

Line 1: true propagated edges/second through the full production static
train path — a lax.scan over pre-staged batches running the L-hop
expansion, attention, aggregation, backward and Adam for each — on the
family KG with the reference's tuned config
(`Static/transductive/train.py:46-55`: B=20, L=3, D=48).

Line 2: training queries/second of the flagship TEMPORAL interpolation
path (T-RED-GNN on ICEWS14_TeMP, bs32 L=4 dense-mode hops) — the round-2
perf lever (sparse 20.7 -> dense 125 q/s) that the static line cannot
see (family never saturates into dense mode).

The reference repo commits no throughput numbers (BASELINE.md), so the
pinned first single-chip measurements below are the vs_baseline
denominators.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

# Pinned round-1 measurement (edges/s) on TPU v5e: per-step dispatch path,
# XLA segment sum. Later rounds report progress against this.
PINNED_BASELINE_EDGES_PER_S = 2.893e6

# Pinned round-2 measurement (train q/s) of the ICEWS14_TeMP dense-hop
# interpolation step on the v5e (docs/PERF.md:166-181).
PINNED_BASELINE_INTERP_QPS = 125.0

DATA_DIR = "/root/reference/Static/transductive/data/family"
TEMPORAL_DATA_DIR = \
    "/root/reference/Temporal/interpolation/data/ICEWS14_TeMP"


# Global wall budget. Round 3's driver bench timed out (BENCH_r03 rc=124)
# because the temporal line's compiles + a post-kill tunnel warm-up
# exceeded the driver's window; everything below is budgeted against
# T_START so the static line (the driver's parsed metric) always comes
# out first and the temporal line is best-effort.
T_START = time.time()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", 1500.0))


def _left() -> float:
    return BUDGET_S - (time.time() - T_START)


def _live_trainers() -> list:
    import subprocess

    out = subprocess.run(["ps", "-eo", "pid,args"], capture_output=True,
                         text=True).stdout
    trainers = []
    for ln in out.splitlines():
        cols = ln.split(None, 1)
        if len(cols) < 2:
            continue
        args = cols[1]
        # only ACTUAL trainer processes: argv starts with (timeout N)
        # python -m redgnn_tpu.cli.train. A shell wrapper whose -c string
        # merely CONTAINS the trainer command (backgrounded launches)
        # must not count — it made release_chip wait 6 min for nothing.
        if args.startswith("timeout "):
            args = args.split(None, 2)[2] if len(args.split(None, 2)) > 2 else ""
        if not args.startswith("python"):
            continue
        if "redgnn_tpu.cli.train" in args and "--platform cpu" not in args:
            trainers.append(ln)
    return trainers


def release_chip(max_wait_s: float = 360.0) -> None:
    """Only one process can hold the tunneled v5e. If a queue leg from
    this repo is still training (scripts/round4b_tpu_queue.sh etc.),
    politely stop it via its supervisor's STOP-file contract and wait
    for the trainer process to exit before touching the device."""
    import glob

    trainers = _live_trainers
    if not trainers():
        return
    # both ckpt-dir naming conventions: round<=4 /tmp/ckpt_<tag>/ and
    # round-5 /tmp/<tag>_ckpt/ (the latter keys the hang-watchdog match)
    for d in glob.glob("/tmp/ckpt_*/") + glob.glob("/tmp/*_ckpt/"):
        try:
            open(os.path.join(d, "STOP"), "w").close()
        except OSError:
            pass
    # abort flag for follow-up queue scripts so they don't launch their
    # NEXT leg after the STOPped trainer exits (scripts/round5c_followup.sh
    # gates every leg on this file's absence)
    try:
        open("/tmp/QUEUE_ABORT", "w").close()
    except OSError:
        pass
    print("bench: live trainer holds the chip; STOP files touched, "
          "waiting for exit", file=sys.stderr, flush=True)
    deadline = time.time() + min(max_wait_s, max(_left() - 300, 60))
    while trainers() and time.time() < deadline:
        time.sleep(10)
    if trainers():
        print("bench: trainer still alive; proceeding anyway (may block)",
              file=sys.stderr, flush=True)


def wait_for_device(max_wait_s: float = 900.0) -> None:
    """The tunneled TPU worker takes ~15-20 min to heal after a crash;
    poll with a trivial computation before committing to the benchmark.
    (On a cold machine the first probe BLOCKS ~20 min inside the runtime
    upload rather than raising — that time is unavoidable; the budget
    checks below simply skip the temporal line afterwards.)"""
    deadline = time.time() + min(max_wait_s, max(_left() - 240, 60))
    while True:
        try:
            jnp.ones(2).sum().block_until_ready()
            return
        except Exception:
            if time.time() > deadline:
                raise
            time.sleep(15)


def bench_static(overrides):
    from redgnn_tpu.graph.calibrate import simulate_hops
    from redgnn_tpu.graph.kg import StaticKG
    from redgnn_tpu.train.loop import StaticTrainer
    from redgnn_tpu.utils.config import dataset_config

    kg = StaticKG.load(DATA_DIR)
    cfg = dataset_config("static_transductive", "family",
                         cap_headroom=1.35, **overrides)
    trainer = StaticTrainer(kg, cfg)

    # one-time tunnel warm-up (first d2h is slow on axon)
    _ = jax.device_get(jnp.zeros(()))

    data = kg.train_data
    b = cfg.n_batch
    nb = 64
    rowptr, _, tail = kg.graph_np
    total_edges = 0
    batches = np.zeros((nb, b, 3), np.int64)
    from redgnn_tpu.graph.calibrate import FrontierCaps, _round_up

    node_caps = list(trainer.train_caps.node_caps)
    edge_caps = list(trainer.train_caps.edge_caps)
    for i in range(nb):
        start = (i * b) % (len(data) - b)
        batch = data[start:start + b]
        nc, ec = simulate_hops(rowptr, tail, kg.n_ent, batch[:, 0],
                               cfg.n_layer)
        total_edges += sum(ec)
        batches[i] = batch
        # exact capacity cover for the benched batches (no overflow replay
        # during timing)
        for j in range(cfg.n_layer):
            node_caps[j + 1] = max(node_caps[j + 1], _round_up(nc[j + 1] + 8))
            edge_caps[j] = max(edge_caps[j], _round_up(ec[j] + 8))
    trainer.train_caps = FrontierCaps(tuple(node_caps), tuple(edge_caps))

    subs = jnp.asarray(batches[:, :, 0], jnp.int32)
    rels = jnp.asarray(batches[:, :, 1], jnp.int32)
    objs = jnp.asarray(batches[:, :, 2], jnp.int32)
    qmask = jnp.ones((nb, b), bool)

    params, opt_state = trainer.params, trainer.opt_state
    rng = jax.random.PRNGKey(0)

    def run():
        return trainer._train_epoch_scan(
            params, opt_state, kg.graph, subs, rels, objs, qmask, rng,
            trainer.train_caps,
        )

    # compile + warmup
    p, o, loss_sum, overflow = run()
    jax.block_until_ready(loss_sum)
    assert not bool(overflow), "frontier caps overflowed during warmup"

    reps = 3
    t0 = time.time()
    for _ in range(reps):
        p, o, loss_sum, overflow = run()
    jax.block_until_ready(loss_sum)
    elapsed = time.time() - t0

    edges_per_s = total_edges * reps / elapsed
    # Roofline context: dominant per-edge model FLOPs are the two edgewise
    # attention projections Ws(h_src), Wr(rela) (2*2*D*A fwd) x ~3 for
    # fwd+bwd, plus the w_alpha head. The number is honest and tiny —
    # message passing over padded frontiers is gather/scatter LATENCY
    # bound on TPU (docs/PERF.md), not FLOP bound; MFU is reported so
    # nobody mistakes edges/s for a compute-bound figure.
    flops_per_edge = 3 * (4 * cfg.hidden_dim * cfg.attn_dim
                          + 4 * cfg.attn_dim)
    achieved_tflops = edges_per_s * flops_per_edge / 1e12
    v5e_bf16_peak_tflops = 197.0
    # Achievable ceiling for THIS workload: the step is gather/scatter
    # latency bound, not FLOP bound, so the honest roofline is the
    # latency model, not MFU. Census of unavoidable per-padded-edge-slot
    # latency ops in the bitmap-mode hop (docs/PERF.md "Remaining latency
    # ops"): presence scatter, uid gather, eattr row gather, forward
    # segment-sum scatter, backward gather = 5 ops, each measured at
    # ~7 ns/elem best case on this v5e (scalar-gather microbench,
    # docs/PERF.md table). Floor = 35 ns per padded slot; the reported
    # pct is measured-vs-floor on the SAME padded-slot denominator, so
    # it is meaningful even though edges/s counts true edges only.
    padded_slots = reps * nb * sum(trainer.train_caps.edge_caps)
    ns_per_slot = elapsed * 1e9 / padded_slots
    latency_floor_ns = 5 * 7.0
    print(json.dumps({
        "metric": "train_edges_per_sec_family_single_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / PINNED_BASELINE_EDGES_PER_S, 4),
        "est_model_tflops": round(achieved_tflops, 3),
        "est_mfu_pct_of_v5e_bf16": round(
            100 * achieved_tflops / v5e_bf16_peak_tflops, 3),
        "ns_per_padded_edge_slot": round(ns_per_slot, 1),
        "latency_model_floor_ns_per_slot": latency_floor_ns,
        "pct_of_latency_ceiling": round(100 * latency_floor_ns / ns_per_slot, 1),
        "wall_s": round(time.time() - T_START, 1),
    }), flush=True)


def bench_temporal(overrides):
    """q/s of the production ICEWS14_TeMP interpolation train step
    (dense-mode hops, leave-one-out exclusion, AdamW) via the same
    whole-chunk lax.scan the trainer dispatches."""
    from redgnn_tpu.graph.temporal import TemporalKG
    from redgnn_tpu.train.temporal_loop import TemporalTrainer
    from redgnn_tpu.utils.config import dataset_config

    nb = int(overrides.pop("bench_nb", 32))  # benched steps per repetition
    cfg = dataset_config("temporal", "ICEWS14_TeMP", **overrides)
    kg = TemporalKG.load_id_dir(
        TEMPORAL_DATA_DIR, add_inverse=True,
        time_granularity=cfg.time_granularity)
    trainer = TemporalTrainer(kg, cfg)

    b = cfg.batch_size
    data = kg.splits["train"][: nb * b]
    order = np.arange(nb * b)
    caps = trainer._get_caps("train", data, b, order=order)
    rows = kg.exclusion_slots(order)
    cols = [jnp.asarray(data[:, j].reshape(nb, b), jnp.int32)
            for j in range(4)]
    qm = jnp.ones((nb, b), bool)
    excl = jnp.asarray(rows.reshape(nb, b), jnp.int32)
    rng = jax.random.PRNGKey(0)

    def run():
        return trainer._train_epoch_scan(
            trainer.params, trainer.opt_state, trainer._kgarrs,
            cols[0], cols[1], cols[2], cols[3], qm, excl, rng, caps)

    p, o, loss_sum, overflow, _ = run()
    jax.block_until_ready(loss_sum)
    assert not bool(overflow), "frontier caps overflowed during warmup"

    reps = 2
    t0 = time.time()
    for _ in range(reps):
        p, o, loss_sum, overflow, _ = run()
    jax.block_until_ready(loss_sum)
    elapsed = time.time() - t0

    qps = nb * b * reps / elapsed
    print(json.dumps({
        "metric": "train_queries_per_sec_icews14_interp_single_chip",
        "value": round(qps, 2),
        "unit": "queries/s",
        "vs_baseline": round(qps / PINNED_BASELINE_INTERP_QPS, 4),
        "wall_s": round(time.time() - T_START, 1),
    }), flush=True)


def _fields_of(cls):
    import dataclasses

    return {f.name for f in dataclasses.fields(cls)}


def main():
    # optional config overrides for A/B runs: bench.py field=value ...
    # (keys are routed to whichever config dataclass actually has them)
    from redgnn_tpu.utils.config import TemporalTrainConfig, TrainConfig

    overrides = {}
    for pair in sys.argv[1:]:
        key, _, raw = pair.partition("=")
        try:
            overrides[key] = json.loads(raw)
        except ValueError:
            overrides[key] = raw
    bench_nb = overrides.pop("bench_nb", 32)
    static_ov = {k: v for k, v in overrides.items()
                 if k in _fields_of(TrainConfig)}
    temporal_ov = {k: v for k, v in overrides.items()
                   if k in _fields_of(TemporalTrainConfig)}
    unknown = set(overrides) - set(static_ov) - set(temporal_ov)
    if unknown:
        print(f"warning: ignoring unknown override keys {sorted(unknown)}",
              file=sys.stderr)
    # persistent compile cache: the CLI always sets this (cli/train.py:131)
    # but round <=3 bench runs recompiled from scratch every time — on this
    # chip the two epoch-scan jits alone are minutes of remote compile.
    cache_dir = os.environ.get("REDGNN_COMPILE_CACHE", "/tmp/redgnn_jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"warning: compile cache unavailable: {e}", file=sys.stderr)
    release_chip()
    wait_for_device()
    # one-time tunnel warm-up (first d2h is slow on axon)
    _ = jax.device_get(jnp.zeros(()))
    bench_static(static_ov)
    # the static line above is the driver's parsed metric; only spend on
    # the temporal line if the budget clearly allows its compiles
    if _left() > float(os.environ.get("BENCH_TEMPORAL_MIN_S", 300.0)):
        bench_temporal(dict(temporal_ov, bench_nb=bench_nb))
    else:
        print(f"bench: skipping temporal line ({_left():.0f}s left "
              f"< BENCH_TEMPORAL_MIN_S)", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
