"""On-chip bisection probe for the YAGO-static worker hang (round 5).

Observed: the jitted train-epoch scan at YAGO shapes (123,188 entities,
b=20, exact caps ~[14k, 93k, 516k] edge slots) compiles fine (cache
entries written) but the FIRST execution never returns through the axon
tunnel — at scan_chunk 48 and 8 alike — while the identical program runs
a step in 4.3 s on a 2-core CPU.  Worker crashes (rc=1 kernel fault)
appeared with dense-mode hops ON; with dense OFF the execution just
hangs.

This probe isolates the wedge op bottom-up, each stage under its own
wall timeout so a hang is observed but bounded:
  1. raw primitives at YAGO scale: scatter into b*n_ent keys, cumsum,
     sort of edge_cap keys, take_rows — the dedup/aggregation building
     blocks;
  2. model forward only (no grad) on one b=20 batch;
  3. value_and_grad (the full train step body, no scan);
  4. one _train_epoch_scan dispatch with nb=1;
  5. the same at the reference recipe b=3.

Run ONLY when the chip is free: python scripts/probe_yago_tpu.py
"""

import sys
import threading
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def timed(name, fn, timeout_s=180.0):
    """Run fn in a thread; report wall time or HANG after timeout."""
    t0 = time.time()
    out, err = [], []

    def run():
        try:
            out.append(fn())
        except Exception as e:  # noqa: BLE001
            err.append(e)

    th = threading.Thread(target=run, daemon=True)
    th.start()
    th.join(timeout_s)
    dt = time.time() - t0
    if th.is_alive():
        print(f"[probe] {name}: HANG (> {timeout_s:.0f}s)", flush=True)
        return False
    if err:
        print(f"[probe] {name}: ERROR after {dt:.1f}s: {err[0]!r}", flush=True)
        return False
    print(f"[probe] {name}: ok {dt:.1f}s", flush=True)
    return True


def main():
    import jax
    import jax.numpy as jnp

    from redgnn_tpu.graph.kg import StaticKG
    from redgnn_tpu.train.loop import StaticTrainer, softmax_ce_loss
    from redgnn_tpu.utils.config import dataset_config

    print("[probe] devices:", jax.devices(), flush=True)
    # tunnel warm-up
    timed("warmup d2h", lambda: jax.device_get(jnp.zeros(())), 1500)

    b, n_ent = 20, 123188
    key_space = b * n_ent
    e3 = 515840

    def prim_scatter():
        x = jnp.zeros(key_space, jnp.int32)
        idx = jnp.arange(e3, dtype=jnp.int32) * 4 % key_space
        y = jax.jit(lambda x, i: x.at[i].max(1))(x, idx)
        return jax.device_get(y.sum())

    def prim_cumsum():
        x = jnp.ones(key_space, jnp.int32)
        y = jax.jit(jnp.cumsum)(x)
        return jax.device_get(y[-1])

    def prim_sort():
        k = (jnp.arange(e3, dtype=jnp.int32) * 2654435761) % key_space
        y = jax.jit(jnp.sort)(k)
        return jax.device_get(y[0])

    def prim_gather():
        tbl = jnp.ones((key_space,), jnp.float32)
        idx = (jnp.arange(e3, dtype=jnp.int32) * 7) % key_space
        y = jax.jit(lambda t, i: t[i].sum())(tbl, idx)
        return jax.device_get(y)

    timed("scatter-max E->B*N", prim_scatter)
    timed("cumsum B*N", prim_cumsum)
    timed("sort E keys", prim_sort)
    timed("gather E from B*N", prim_gather)

    cfg = dataset_config("static_transductive", "YAGO",
                         n_batch=b, n_tbatch=25)
    kg = StaticKG.load("/root/reference/Static/transductive/data/YAGO")
    trainer = StaticTrainer(kg, cfg)
    data = kg.train_data[:b]
    trainer.train_caps = trainer._recalibrate_exact(
        trainer.train_caps, kg.graph_np, kg.train_data[:400], b)
    print("[probe] caps:", trainer.train_caps, flush=True)
    subs = jnp.asarray(data[:, 0], jnp.int32)
    rels = jnp.asarray(data[:, 1], jnp.int32)
    objs = jnp.asarray(data[:, 2], jnp.int64)
    qm = jnp.ones(b, bool)

    def fwd():
        scores, aux = trainer.model.apply(
            {"params": trainer.params}, kg.graph, subs, rels, qm,
            trainer.train_caps, False)
        return float(jax.device_get(scores.sum()))

    def fwd_jit():
        f = jax.jit(lambda p: trainer.model.apply(
            {"params": p}, kg.graph, subs, rels, qm,
            trainer.train_caps, False)[0].sum())
        return float(jax.device_get(f(trainer.params)))

    def grad_jit():
        def loss_fn(p):
            scores, aux = trainer.model.apply(
                {"params": p}, kg.graph, subs, rels, qm,
                trainer.train_caps, True,
                rngs={"dropout": jax.random.PRNGKey(0)})
            return softmax_ce_loss(scores, objs, qm)
        g = jax.jit(jax.grad(loss_fn))(trainer.params)
        return float(jax.device_get(
            jax.tree_util.tree_reduce(lambda a, x: a + x.sum(), g, 0.0)))

    ok = timed("forward jit b=20", fwd_jit, 420)
    if ok:
        timed("grad jit b=20", grad_jit, 420)
    else:
        # bitmap-vs-sort discrimination: same forward with the sort dedup
        import dataclasses as _dc

        from redgnn_tpu.models.redgnn import RedGNN as _RedGNN

        m_sort = _RedGNN(_dc.replace(trainer.model_cfg, dedup_impl="sort"))

        def fwd_sort():
            f = jax.jit(lambda p: m_sort.apply(
                {"params": p}, kg.graph, subs, rels, qm,
                trainer.train_caps, False)[0].sum())
            return float(jax.device_get(f(trainer.params)))

        timed("forward jit b=20 dedup=sort", fwd_sort, 420)
    if ok:

        def scan1():
            rng = jax.random.PRNGKey(0)
            out = trainer._train_epoch_scan(
                trainer.params, trainer.opt_state, kg.graph,
                subs[None], rels[None], jnp.asarray(objs, jnp.int32)[None],
                qm[None], rng, trainer.train_caps)
            return float(jax.device_get(out[2]))

        timed("epoch-scan nb=1 b=20", scan1, 420)

    # reference recipe b=3
    cfg3 = dataset_config("static_transductive", "YAGO")
    tr3 = StaticTrainer(kg, cfg3)
    d3 = kg.train_data[:3]
    tr3.train_caps = tr3._recalibrate_exact(
        tr3.train_caps, kg.graph_np, kg.train_data[:300], 3)
    print("[probe] b=3 caps:", tr3.train_caps, flush=True)

    def scan_b3():
        rng = jax.random.PRNGKey(0)
        out = tr3._train_epoch_scan(
            tr3.params, tr3.opt_state, kg.graph,
            jnp.asarray(d3[:, 0], jnp.int32)[None],
            jnp.asarray(d3[:, 1], jnp.int32)[None],
            jnp.asarray(d3[:, 2], jnp.int32)[None],
            jnp.ones((1, 3), bool), rng, tr3.train_caps)
        return float(jax.device_get(out[2]))

    timed("epoch-scan nb=1 b=3", scan_b3, 420)
    print("[probe] done", flush=True)


if __name__ == "__main__":
    main()
