"""Benchmark: RED-GNN training-step throughput on real TPU hardware.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "edges/s", "vs_baseline": N}

Metric: true propagated edges/second through the full train step (forward
L-hop expansion + attention + aggregation + backward + Adam) on the family
KG with the reference's tuned config (`Static/transductive/train.py:46-55`:
B=20, L=3, D=48). The reference repo commits no throughput numbers
(BASELINE.md), so this single-chip TPU number is the canonical baseline;
vs_baseline therefore reports the ratio to a pinned first-measurement
constant so later rounds show relative progress.

Host-sync discipline: the tunnel's first d2h transfer costs ~150s (one-time
session setup), so we pay it once before timing; the timed loop enqueues
steps without any host fetch and blocks once at the end.
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

# Pinned first single-chip measurement (edges/s) — the denominator for
# vs_baseline in later rounds. Measured 2026-08-17 on TPU v5e (round 1,
# XLA segment path, per-step host batch staging).
PINNED_BASELINE_EDGES_PER_S = 2.893e6

DATA_DIR = "/root/reference/Static/transductive/data/family"


def main():
    from redgnn_tpu.graph.calibrate import calibrate_caps, simulate_hops
    from redgnn_tpu.graph.kg import StaticKG
    from redgnn_tpu.train.loop import StaticTrainer
    from redgnn_tpu.utils.config import dataset_config

    kg = StaticKG.load(DATA_DIR)
    cfg = dataset_config("static_transductive", "family",
                        cap_headroom=1.35)
    trainer = StaticTrainer(kg, cfg)

    # one-time tunnel warm-up (first d2h is slow on axon)
    _ = jax.device_get(jnp.zeros(()))

    data = kg.train_data
    b = cfg.n_batch
    n_steps = 30
    batches = []
    rowptr, _, tail = kg.graph_np
    total_edges = 0
    for i in range(n_steps):
        start = (i * b) % (len(data) - b)
        batch = data[start:start + b]
        _, ec = simulate_hops(rowptr, tail, kg.n_ent, batch[:, 0],
                              cfg.n_layer)
        total_edges += sum(ec)
        batches.append(batch)

    def run_step(batch, params, opt_state, rng):
        subs = jnp.asarray(batch[:, 0], jnp.int32)
        rels = jnp.asarray(batch[:, 1], jnp.int32)
        objs = jnp.asarray(batch[:, 2], jnp.int32)
        qm = jnp.ones(b, bool)
        rng, step_rng = jax.random.split(rng)
        params, opt_state, loss, overflow, _ = trainer._train_step(
            params, opt_state, kg.graph, subs, rels, objs, qm, step_rng,
            trainer.train_caps,
        )
        return params, opt_state, rng, loss, overflow

    params, opt_state = trainer.params, trainer.opt_state
    rng = jax.random.PRNGKey(0)

    # warmup: compile + 2 steady-state steps
    for i in range(3):
        params, opt_state, rng, loss, overflow = run_step(
            batches[i % len(batches)], params, opt_state, rng
        )
    jax.block_until_ready(loss)
    assert not bool(overflow), "frontier caps overflowed during warmup"

    t0 = time.time()
    for batch in batches:
        params, opt_state, rng, loss, overflow = run_step(
            batch, params, opt_state, rng
        )
    jax.block_until_ready(loss)
    elapsed = time.time() - t0

    edges_per_s = total_edges / elapsed
    print(json.dumps({
        "metric": "train_edges_per_sec_family_single_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / PINNED_BASELINE_EDGES_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
