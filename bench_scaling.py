"""Data-parallel scaling harness: edges/s at widths 1..N over a device mesh.

The reference is single-GPU (SURVEY.md §2.6) — this harness is the
framework's scaling-efficiency deliverable (SURVEY.md §7.8). On a real TPU
pod slice it measures true multi-chip throughput over ICI; on a CPU host
it runs the SAME program over a virtual device mesh
(``--virtual N`` sets ``xla_force_host_platform_device_count``) to
validate the scaling path end-to-end.

Prints one JSON line per mesh width:
  {"devices": d, "edges_per_s": ..., "efficiency_vs_1": ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_path",
                    default="/root/reference/Static/transductive/data/family")
    ap.add_argument("--virtual", type=int, default=0,
                    help="force N virtual CPU devices (0 = real devices)")
    ap.add_argument("--per_device_batch", type=int, default=20)
    ap.add_argument("--steps", type=int, default=32)
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh

    from redgnn_tpu.graph.calibrate import calibrate_caps
    from redgnn_tpu.graph.kg import StaticKG
    from redgnn_tpu.models.redgnn import ModelConfig, RedGNN
    from redgnn_tpu.parallel.shard import make_dp_train_step
    from redgnn_tpu.train.loop import make_optimizer
    from redgnn_tpu.utils.config import dataset_config

    kg = StaticKG.load(args.data_path)
    cfg = dataset_config("static_transductive",
                         os.path.basename(args.data_path.rstrip("/")))
    devices = jax.devices()
    widths = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devices)]
    rowptr, _, tail = kg.graph_np
    base = None

    for d in widths:
        b_local = args.per_device_batch
        b_global = b_local * d
        caps = calibrate_caps(rowptr, tail, kg.n_ent,
                              kg.train_data[:, 0], b_local, cfg.n_layer,
                              headroom=1.6)
        mesh = Mesh(np.asarray(devices[:d]).reshape(d, 1), ("data", "edge"))
        model_cfg = ModelConfig(
            n_ent=kg.n_ent, n_rel=kg.n_rel, hidden_dim=cfg.hidden_dim,
            attn_dim=cfg.attn_dim, n_layer=cfg.n_layer, dropout=cfg.dropout,
            act=cfg.act)
        model = RedGNN(model_cfg)
        rng = jax.random.PRNGKey(0)
        data = kg.train_data
        subs = jnp.asarray(data[:b_global, 0], jnp.int32)
        rels = jnp.asarray(data[:b_global, 1], jnp.int32)
        objs = jnp.asarray(data[:b_global, 2], jnp.int32)
        qmask = jnp.ones(b_global, bool)
        params = model.init({"params": rng, "dropout": rng}, kg.graph,
                            subs[:b_local], rels[:b_local],
                            qmask[:b_local], caps, False)["params"]
        tx = make_optimizer(cfg, 100)
        opt_state = tx.init(params)
        step = make_dp_train_step(model_cfg, tx, mesh, caps)

        p, o, loss, overflow = step(params, opt_state, kg.graph, subs,
                                    rels, objs, qmask, rng)
        jax.block_until_ready(loss)
        from redgnn_tpu.graph.calibrate import simulate_hops
        _, ec = simulate_hops(rowptr, tail, kg.n_ent,
                              data[:b_global, 0], cfg.n_layer)
        edges_per_step = sum(ec)

        t0 = time.time()
        for _ in range(args.steps):
            p, o, loss, overflow = step(p, o, kg.graph, subs, rels, objs,
                                        qmask, rng)
        jax.block_until_ready(loss)
        dt = time.time() - t0
        eps = edges_per_step * args.steps / dt
        if base is None:
            base = eps
        print(json.dumps({
            "devices": d,
            "edges_per_s": round(eps, 1),
            "efficiency_vs_1": round(eps / (base * d), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
