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
    ap.add_argument("--task", default="static",
                    choices=["static", "temporal"],
                    help="temporal: TemporalTrainer sharded step (q/s)")
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

    if args.task == "temporal":
        return temporal_scaling(args)

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


def temporal_scaling(args):
    """q/s of the sharded TRedGNN train step at widths 1..N (data axis).

    Default data path still points at the static dir; pass a temporal
    dir, e.g. /root/reference/Temporal/interpolation/data/ICEWS14_TeMP."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from redgnn_tpu.graph.temporal import TemporalKG
    from redgnn_tpu.parallel.mesh import make_mesh
    from redgnn_tpu.train.temporal_loop import TemporalTrainer
    from redgnn_tpu.utils.config import dataset_config
    import os, time, json

    dataset = os.path.basename(args.data_path.rstrip("/"))
    cfg = dataset_config("temporal", dataset)
    if os.path.exists(os.path.join(args.data_path, "entity2id.txt")):
        kg = TemporalKG.load_id_dir(
            args.data_path, add_inverse=True,
            time_granularity=cfg.time_granularity,
            graph_from_all_splits=(cfg.mode == "extrapolation"))
    else:
        kg = TemporalKG.load_vocab_dir(args.data_path)
    devices = jax.devices()
    widths = [d for d in (1, 2, 4, 8, 16, 32) if d <= len(devices)]
    base = None
    import dataclasses
    for d in widths:
        b = args.per_device_batch * d
        tcfg = dataclasses.replace(cfg, batch_size=b, eval_batch_size=b)
        # mesh at EVERY width (incl. 1) so efficiency compares the same
        # code path: inside shard_map the custom-VJP gathers are off, and
        # their scatter-add fallback is pathologically slow on the CPU
        # emulation backend (fine on TPU at ~7ns/row)
        mesh = make_mesh(d, 1, devices=devices[:d])
        tr = TemporalTrainer(kg, tcfg, mesh=mesh)
        data = kg.splits["train"][: b * args.steps]
        caps = tr._get_caps("train", data, tr._cap_b(b))
        rows = (kg.exclusion_slots(np.arange(len(data)))
                if cfg.mode == "interpolation" else None)
        step = jax.jit(tr._train_step_impl, static_argnames=("caps",))
        k = jax.random.PRNGKey(0)
        p_, o_ = tr.params, tr.opt_state
        nsteps = len(data) // b
        def batch_args(i):
            sl = slice(i * b, (i + 1) * b)
            excl = (jnp.asarray(rows[sl], jnp.int32)
                    if rows is not None else None)
            return (jnp.asarray(data[sl, 0], jnp.int32),
                    jnp.asarray(data[sl, 1], jnp.int32),
                    jnp.asarray(data[sl, 2], jnp.int32),
                    jnp.asarray(data[sl, 3], jnp.int32),
                    jnp.ones(b, bool), excl)
        p_, o_, loss, ov, _ = step(p_, o_, tr._kgarrs, *batch_args(0), k, caps)
        jax.block_until_ready(loss)
        t0 = time.time()
        for i in range(nsteps):
            p_, o_, loss, ov, _ = step(p_, o_, tr._kgarrs, *batch_args(i),
                                       k, caps)
        jax.block_until_ready(loss)
        qps = nsteps * b / (time.time() - t0)
        if base is None:
            base = qps
        print(json.dumps({
            "devices": d, "queries_per_s": round(qps, 2),
            "efficiency_vs_1": round(qps / (base * d), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
