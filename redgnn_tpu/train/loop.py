"""Jitted train/eval steps and the epoch driver for static KGC.

Capability parity with `Static/transductive/base_model.py`:
  * Adam with coupled weight decay + per-epoch exponential LR decay
    (`base_model.py:27-28`),
  * max-stabilized softmax cross-entropy over all entities
    (`base_model.py:58-60`),
  * the NaN parameter scrub (`base_model.py:64-69`) — here a cheap fused
    `where(isnan)` instead of a host round-trip per tensor,
  * filtered evaluation on valid+test every epoch (`base_model.py:85-151`),
  * the per-epoch facts/train graph re-split (`base_model.py:82`).

TPU architecture notes: the whole batch step — L-hop expansion, attention,
aggregation, loss, backward, Adam — is ONE compiled XLA program. The graph
arrays are donated-in by shape, so per-epoch re-splits never recompile.
Overflowing frontier capacity buckets are detected on device, grown
geometrically on the host, and the step recompiles at most O(log V) times.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from redgnn_tpu.graph.calibrate import FrontierCaps, calibrate_caps
from redgnn_tpu.graph.kg import StaticKG
from redgnn_tpu.models.redgnn import ModelConfig, RedGNN
from redgnn_tpu.ops.ranking import rank_metric_sums
from redgnn_tpu.utils.config import TrainConfig
from redgnn_tpu.utils.metrics import combine_metric_sums


def softmax_ce_loss(scores: jnp.ndarray, objs: jnp.ndarray,
                    qmask: jnp.ndarray) -> jnp.ndarray:
    """sum(-pos + max + log(sum(exp(s - max)))) — `base_model.py:58-60`."""
    pos = scores[jnp.arange(scores.shape[0]), objs]
    max_n = jnp.max(scores, axis=1)
    lse = jnp.log(jnp.sum(jnp.exp(scores - max_n[:, None]), axis=1))
    per_row = -pos + max_n + lse
    return jnp.sum(jnp.where(qmask, per_row, 0.0))


def nan_scrub(params, key):
    """Replace NaN parameters with uniform randoms (`base_model.py:64-69`)."""
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    out = [
        jnp.where(jnp.isnan(p), jax.random.uniform(k, (), p.dtype), p)
        for p, k in zip(leaves, keys)
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int):
    """torch.optim.Adam(weight_decay=lamb) + ExponentialLR per epoch."""
    schedule = optax.exponential_decay(
        init_value=cfg.lr,
        transition_steps=max(steps_per_epoch, 1),
        decay_rate=cfg.decay_rate,
        staircase=True,
    )
    return optax.chain(
        optax.add_decayed_weights(cfg.lamb),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )


class StaticTrainer:
    """Epoch driver for static transductive / inductive KGC."""

    def __init__(self, kg, cfg: TrainConfig, mesh=None):
        """``kg`` is a StaticKG or InductiveKG (anything with train_data,
        graph/graph_np, n_ent/n_rel, eval_spec(split), resplit(rng)).

        ``mesh`` (axes 'data'[, 'edge']) runs the train step through
        `parallel/shard.py.make_dp_loss_fn`: queries shard over 'data',
        the per-hop edge math optionally slices over 'edge', loss psums
        over ICI. Eval shards the same way (per-batch shard_map inside the
        eval scan, metric sums psum'd) — at WN18RR/YAGO scale with L=5
        eval is a large fraction of epoch time, so it must scale with the
        mesh too."""
        self.kg = kg
        self.cfg = cfg
        self.mesh = mesh
        self.n_data = int(mesh.shape["data"]) if mesh is not None else 1
        if cfg.n_batch % self.n_data:
            raise ValueError(f"n_batch ({cfg.n_batch}) must divide the "
                             f"mesh data axis ({self.n_data})")
        # eval batches are qmask-padded anyway, so n_tbatch can simply be
        # rounded up to a mesh multiple (reference configs like WN18RR's
        # n_tbatch=50 or YAGO's n_tbatch=1 stay mesh-compatible)
        self.n_tbatch = -(-cfg.n_tbatch // self.n_data) * self.n_data
        self.model_cfg = ModelConfig(
            n_ent=kg.n_ent, n_rel=kg.n_rel, hidden_dim=cfg.hidden_dim,
            attn_dim=cfg.attn_dim, n_layer=cfg.n_layer, dropout=cfg.dropout,
            act=cfg.act, segment_impl=cfg.segment_impl,
            compute_dtype=cfg.compute_dtype, dedup_impl=cfg.dedup_impl,
            scan_src_backward=cfg.scan_src_backward,
            dense_hops=cfg.dense_hops, dense_switch=cfg.dense_switch,
        )
        self.model = RedGNN(self.model_cfg)

        rng = jax.random.PRNGKey(cfg.seed)
        self.rng, init_rng = jax.random.split(rng)
        # init with tiny caps — parameter shapes don't depend on caps
        dummy_caps = FrontierCaps(
            tuple([cfg.n_batch] + [16] * cfg.n_layer), tuple([16] * cfg.n_layer)
        )
        self.params = self.model.init(
            {"params": init_rng, "dropout": init_rng},
            kg.graph,
            jnp.zeros(cfg.n_batch, jnp.int32),
            jnp.zeros(cfg.n_batch, jnp.int32),
            jnp.ones(cfg.n_batch, bool),
            dummy_caps,
            False,
        )["params"]

        self.steps_per_epoch = max(
            1, -(-len(kg.train_data) // cfg.n_batch)
        )
        self.tx = make_optimizer(cfg, self.steps_per_epoch)
        self.opt_state = self.tx.init(self.params)

        # --- frontier capacity calibration (train graph, train batch) ---
        rowptr, _, tail = kg.graph_np
        # per-shard caps under a mesh: each chip expands b/n_data queries
        self.train_caps = calibrate_caps(
            rowptr, tail, kg.n_ent, kg.train_data[:, 0],
            cfg.n_batch // self.n_data,
            cfg.n_layer, headroom=cfg.cap_headroom,
        )
        # per-split eval caps + jitted eval steps, built lazily (the eval
        # graph / entity count differ per split in the inductive task)
        self.eval_caps: Dict[str, FrontierCaps] = {}
        self._eval_steps: Dict[int, Any] = {}
        self.t_train = 0.0
        self._np_rng = np.random.default_rng(cfg.seed)
        self.history: List[Dict[str, Any]] = []
        from redgnn_tpu.utils.timers import PhaseTimer

        # --timer phase buckets (`extrapolation/main.py:39-52`)
        self.timer = PhaseTimer(enabled=False)

        # NOTE: no buffer donation — the overflow-replay path restores the
        # epoch-start params, which donation would have invalidated.
        self._train_epoch_scan = jax.jit(
            self._train_epoch_scan_impl, static_argnames=("caps",),
        )

    def _eval_step_for(self, n_ent: int):
        """Jitted eval scan for a graph with ``n_ent`` entities (params are
        shared — no model parameter depends on the entity count). Labels
        and filters arrive as padded index lists and are expanded to
        one-hot rows on device inside the scan, so the whole split is one
        dispatch. Under a mesh, each scanned batch runs through shard_map:
        queries shard over 'data' (and the hop math over 'edge'), metric
        sums psum back to replicated globals — the eval mirror of
        `parallel/shard.py.make_dp_loss_fn`."""
        if n_ent not in self._eval_steps:
            import dataclasses

            if self.mesh is not None:
                n_edge = int(self.mesh.shape.get("edge", 1))
                model = RedGNN(dataclasses.replace(
                    self.model_cfg, n_ent=n_ent,
                    edge_axis="edge" if n_edge > 1 else None,
                    edge_shards=n_edge,
                    # custom-VJP replication can't be vma-inferred inside
                    # shard_map (same constraint as make_dp_loss_fn)
                    mxu_gather_backward=False,
                    scan_src_backward=False,
                ))
            else:
                n_edge = 1
                model = RedGNN(
                    dataclasses.replace(self.model_cfg, n_ent=n_ent))

            def batch_sums(params, graph, subs, rels, ans, fil, qmask,
                           caps: FrontierCaps):
                b = subs.shape[0]
                rows = jnp.arange(b)

                def one_hot_from(idx):  # (b, M) padded with n_ent
                    out = jnp.zeros((b, n_ent))
                    return out.at[
                        rows[:, None], jnp.minimum(idx, n_ent)
                    ].set(jnp.where(idx < n_ent, 1.0, 0.0), mode="drop")

                labels = one_hot_from(ans) * qmask[:, None]
                filters = one_hot_from(fil)
                scores, aux = model.apply(
                    {"params": params}, graph, subs, rels, qmask,
                    caps, False,
                )
                sums = rank_metric_sums(scores, labels, filters)
                overflow = (jnp.any(aux["edge_overflow"])
                            | jnp.any(aux["node_overflow"]))
                if self.mesh is not None:
                    sums = {k: jax.lax.psum(v, "data")
                            for k, v in sums.items()}
                    overflow = jax.lax.pmax(
                        overflow.astype(jnp.int32), "data")
                    if n_edge > 1:
                        # replicated across 'edge': collapse the identical
                        # copies so replication is provable
                        sums = {k: jax.lax.pmean(v, "edge")
                                for k, v in sums.items()}
                        overflow = jax.lax.pmax(overflow, "edge")
                    overflow = overflow > 0
                return sums, overflow

            def eval_scan(params, graph, subs_all, rels_all, ans_all,
                          fil_all, qmask_all, caps: FrontierCaps):
                if self.mesh is not None:
                    from jax import shard_map
                    from jax.sharding import PartitionSpec as P

                    d = P("data")
                    fn = shard_map(
                        lambda p, g, s, r, a, f, q: batch_sums(
                            p, g, s, r, a, f, q, caps),
                        mesh=self.mesh,
                        in_specs=(P(), P(), d, d, d, d, d),
                        out_specs=(P(), P()))
                else:
                    fn = lambda p, g, s, r, a, f, q: batch_sums(
                        p, g, s, r, a, f, q, caps)

                def body(carry, batch):
                    sums_acc, overflow_any = carry
                    sums, overflow = fn(params, graph, *batch)
                    sums_acc = {k: sums_acc[k] + v for k, v in sums.items()}
                    return (sums_acc, overflow_any | overflow), None

                init_sums = {k: jnp.zeros(()) for k in
                             ("rr_sum", "h1_sum", "h3_sum", "h10_sum",
                              "count")}
                (sums, overflow), _ = jax.lax.scan(
                    body, (init_sums, jnp.zeros((), bool)),
                    (subs_all, rels_all, ans_all, fil_all, qmask_all))
                return sums, overflow

            self._eval_steps[n_ent] = jax.jit(
                eval_scan, static_argnames=("caps",)
            )
        return self._eval_steps[n_ent]

    # ------------------------------------------------------------------
    def _train_step_impl(self, params, opt_state, graph, subs, rels, objs,
                         qmask, rng, caps: FrontierCaps):
        drop_rng, scrub_rng = jax.random.split(rng)

        if self.mesh is not None:
            from redgnn_tpu.parallel.shard import make_dp_loss_fn

            dp_loss = make_dp_loss_fn(self.model_cfg, self.mesh, caps)
            (loss, overflow), grads = jax.value_and_grad(
                dp_loss, has_aux=True)(params, graph, subs, rels, objs,
                                       qmask, drop_rng)
            num_edges = jnp.zeros(self.cfg.n_layer, jnp.int32)
            overflow = overflow > 0
        else:
            def loss_fn(p):
                scores, aux = self.model.apply(
                    {"params": p}, graph, subs, rels, qmask, caps, True,
                    rngs={"dropout": drop_rng},
                )
                return softmax_ce_loss(scores, objs, qmask), aux

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            overflow = (jnp.any(aux["edge_overflow"])
                        | jnp.any(aux["node_overflow"]))
            num_edges = aux["num_edges"]
        # Reject the whole update when the loss, any gradient, or any
        # resulting update/optimizer leaf is non-finite — same contract as
        # TemporalTrainer._train_step_impl. Without this, one bad batch
        # NaNs params AND Adam moments and the reference-parity scrub
        # below then replaces entries with RANDOM values
        # (`Static/transductive/train.py` nan-scrub) — silently corrupting
        # long static runs. Checking updates too catches finite-but-huge
        # grads that square to inf inside scale_by_adam.
        finite = jnp.isfinite(loss)
        for leaf in jax.tree_util.tree_leaves(grads):
            finite &= jnp.all(jnp.isfinite(leaf))
        updates, new_opt_state = self.tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        for leaf in jax.tree_util.tree_leaves((updates, new_opt_state)):
            if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.inexact):
                finite &= jnp.all(jnp.isfinite(leaf))
        keep = lambda n, o: jnp.where(finite, n, o)
        params = jax.tree_util.tree_map(keep, new_params, params)
        opt_state = jax.tree_util.tree_map(keep, new_opt_state, opt_state)
        loss = jnp.where(finite, loss, 0.0)
        params = nan_scrub(params, scrub_rng)
        return params, opt_state, loss, overflow, num_edges

    def _train_epoch_scan_impl(self, params, opt_state, graph, subs_all,
                               rels_all, objs_all, qmask_all, rng,
                               caps: FrontierCaps):
        """Whole epoch as ONE compiled program: lax.scan over pre-staged
        batches. One device dispatch per epoch instead of one per step —
        essential on the tunneled TPU where every dispatch pays RPC
        latency, and good hygiene anywhere (no per-step h2d)."""

        def body(carry, batch):
            params, opt_state, rng, loss_sum, overflow_any = carry
            subs, rels, objs, qmask = batch
            rng, step_rng = jax.random.split(rng)
            params, opt_state, loss, overflow, _ = self._train_step_impl(
                params, opt_state, graph, subs, rels, objs, qmask,
                step_rng, caps)
            return (params, opt_state, rng, loss_sum + loss,
                    overflow_any | overflow), None

        init = (params, opt_state, rng, jnp.zeros(()), jnp.zeros((), bool))
        (params, opt_state, rng, loss_sum, overflow_any), _ = jax.lax.scan(
            body, init, (subs_all, rels_all, objs_all, qmask_all))
        return params, opt_state, loss_sum, overflow_any

    # ------------------------------------------------------------------
    def _iter_batches(self, data: np.ndarray, b: int):
        for start in range(0, len(data), b):
            batch = data[start:start + b]
            pad = b - len(batch)
            qmask = np.concatenate([np.ones(len(batch), bool),
                                    np.zeros(pad, bool)])
            if pad:
                batch = np.concatenate([batch, np.zeros((pad, batch.shape[1]),
                                                        np.int64)])
            yield batch, qmask

    def _recalibrate_exact(self, caps: FrontierCaps, graph_np, data, b,
                           n_ent=None) -> FrontierCaps:
        """Grow caps to exactly cover every batch of this epoch.

        ONE batched host walk over the unique query heads (native
        `per_query_hop_counts`, seconds even at YAGO's 123k-entity /
        44.6k-head scale) + a vectorized max over per-batch sums
        (`caps_for_batches`) — replaces the per-batch Python loop of
        `simulate_hops` calls that burned the round-4 YAGO TPU window
        (22,480 sequential walks at n_batch=3). Per-query counts sum
        exactly to batch counts because frontier keys are composited as
        b*n_ent+ent (see calibrate.per_query_counts); batch layout here
        (contiguous chunks of b, zero-padded tail) matches
        `_iter_batches` / `train_epoch`'s reshape.
        """
        from redgnn_tpu.graph.calibrate import (caps_for_batches,
                                                per_query_counts)

        n_ent = n_ent or self.kg.n_ent
        rowptr, _, tail = graph_np
        nc, ec = per_query_counts(rowptr, tail, n_ent,
                                  np.asarray(data[:, 0], np.int64),
                                  self.cfg.n_layer)
        need = caps_for_batches(nc, ec, b)
        return caps.union(need)

    def train_epoch(self, epoch: int) -> float:
        """One pass over the (doubled) training triples.

        Host-sync discipline for the TPU tunnel: the loop enqueues every
        batch without fetching anything; losses and overflow flags are
        device scalars collected asynchronously and materialized once per
        chunk. If a frontier bucket overflows, only the failing CHUNK is
        rolled back and replayed with exactly recalibrated capacities —
        completed steps keep their parameter progress (the temporal
        trainer's round-3 overflow economics).
        """
        kg, cfg = self.kg, self.cfg
        t0 = time.time()
        data = kg.train_data
        b = cfg.n_batch
        nb = -(-len(data) // b)
        pad = nb * b - len(data)
        padded = np.concatenate([data, np.zeros((pad, 3), np.int64)])
        qmask_all = np.ones(nb * b, bool)
        if pad:
            qmask_all[-pad:] = False
        subs_all = padded[:, 0].reshape(nb, b)
        rels_all = padded[:, 1].reshape(nb, b)
        objs_all = padded[:, 2].reshape(nb, b)
        qm_all = qmask_all.reshape(nb, b)

        # exact caps UPFRONT (temporal-trainer design): one batched host
        # walk per epoch makes frontier overflow structurally impossible
        # for this split/order; grow-only union, so a recompile happens
        # only when a fresh resplit genuinely exceeds every prior epoch.
        # The overflow chunk-retry below stays as a safety net only.
        self.train_caps = self._recalibrate_exact(
            self.train_caps, kg.graph_np, data, b // self.n_data)

        total_loss = 0.0
        # bounded-duration dispatches: one giant scan would run minutes
        # on-device in a single execution, which the TPU worker (and
        # the axon tunnel watchdog in particular) does not survive
        c = cfg.scan_chunk
        device_phase = self.timer.phase("train", "device")
        device_phase.__enter__()
        start, retries = 0, 0
        while start < nb:
            sl = slice(start, min(start + c, nb))
            chunk_snap = (self.params, self.opt_state, self.rng)
            self.rng, epoch_rng = jax.random.split(self.rng)
            params, opt_state, loss_sum, overflow = (
                self._train_epoch_scan(
                    self.params, self.opt_state, kg.graph,
                    jnp.asarray(subs_all[sl], jnp.int32),
                    jnp.asarray(rels_all[sl], jnp.int32),
                    jnp.asarray(objs_all[sl], jnp.int32),
                    jnp.asarray(qm_all[sl]), epoch_rng,
                    self.train_caps,
                )
            )
            if bool(overflow):
                if retries >= 3:
                    raise RuntimeError("frontier caps failed to stabilize")
                retries += 1
                # roll back and retry JUST this chunk with caps that
                # exactly cover the rest of the epoch
                self.params, self.opt_state, self.rng = chunk_snap
                self.train_caps = self._recalibrate_exact(
                    self.train_caps, kg.graph_np, data[sl.start * b:],
                    cfg.n_batch // self.n_data
                )
                continue
            retries = 0
            self.params, self.opt_state = params, opt_state
            total_loss += float(loss_sum)
            start += c
        device_phase.__exit__(None, None, None)
        self.t_train += time.time() - t0
        return total_loss

    def evaluate(self, split: str) -> Dict[str, float]:
        cfg = self.cfg
        spec = self.kg.eval_spec(split)
        b = self.n_tbatch
        eval_step = self._eval_step_for(spec.n_ent)
        if split not in self.eval_caps:
            rowptr, _, tail = spec.graph_np
            heads = (spec.queries[:, 0] if len(spec.queries)
                     else np.zeros(1, np.int64))
            # per-shard caps under a mesh (each chip expands b/n_data)
            self.eval_caps[split] = calibrate_caps(
                rowptr, tail, spec.n_ent, heads, b // self.n_data,
                cfg.n_layer, headroom=cfg.cap_headroom,
            )
        queries, answers = spec.queries, spec.answers
        nq = len(queries)
        nb = -(-nq // b)
        pad = nb * b - nq
        padded_q = np.concatenate([queries, np.zeros((pad, 2), np.int64)])
        qmask = np.ones(nb * b, bool)
        if pad:
            qmask[-pad:] = False
        # stage answers/filters as padded index lists (pad id = n_ent)
        filt_rows = [spec.filter_row(h, r) for h, r in padded_q]
        max_a = max((len(a) for a in answers), default=1) or 1
        max_f = max((len(f) for f in filt_rows), default=1) or 1
        ans_idx = np.full((nb * b, max_a), spec.n_ent, np.int64)
        fil_idx = np.full((nb * b, max_f), spec.n_ent, np.int64)
        for i, a in enumerate(answers):
            ans_idx[i, :len(a)] = a
        for i, f in enumerate(filt_rows):
            fil_idx[i, :len(f)] = f

        subs_a = padded_q[:, 0].reshape(nb, b)
        rels_a = padded_q[:, 1].reshape(nb, b)
        ans_a = ans_idx.reshape(nb, b, max_a)
        fil_a = fil_idx.reshape(nb, b, max_f)
        qm_a = qmask.reshape(nb, b)
        c = self.cfg.scan_chunk
        for attempt in range(3):
            partials, overflow_seen = [], False
            for start in range(0, nb, c):
                sl = slice(start, min(start + c, nb))
                sums, overflow = eval_step(
                    self.params, spec.graph,
                    jnp.asarray(subs_a[sl], jnp.int32),
                    jnp.asarray(rels_a[sl], jnp.int32),
                    jnp.asarray(ans_a[sl], jnp.int32),
                    jnp.asarray(fil_a[sl], jnp.int32),
                    jnp.asarray(qm_a[sl]),
                    self.eval_caps[split],
                )
                if bool(overflow):
                    overflow_seen = True
                    break
                partials.append(jax.device_get(sums))
            if not overflow_seen:
                return combine_metric_sums(partials)
            self.eval_caps[split] = self._recalibrate_exact(
                self.eval_caps[split], spec.graph_np, queries,
                b // self.n_data, n_ent=spec.n_ent,
            )
        raise RuntimeError("eval frontier caps failed to stabilize")

    # ------------------------------------------------------------------
    def state(self) -> Dict[str, Any]:
        return {"params": self.params, "opt_state": self.opt_state}

    def host_state(self) -> Dict[str, Any]:
        # the numpy rng drives the per-epoch 3:1 graph re-split; carrying
        # it across elastic restarts keeps the split sequence identical
        return {"np_rng": self._np_rng.bit_generator.state}

    def restore_host(self, ckpt_path: str) -> None:
        from redgnn_tpu.utils.checkpoint import load_host

        host = load_host(ckpt_path)
        if host is None:
            return
        try:
            self._np_rng.bit_generator.state = host["np_rng"]
        except (KeyError, ValueError):
            pass

    def save(self, ckpt_dir: str, epoch: int, metric: float) -> str:
        from redgnn_tpu.utils.checkpoint import save_checkpoint

        return save_checkpoint(ckpt_dir, self.state(), epoch, metric,
                               host=self.host_state())

    def restore(self, path: str) -> int:
        from redgnn_tpu.utils.checkpoint import load_checkpoint

        state, epoch, _ = load_checkpoint(path, self.state())
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.restore_host(path)
        return epoch

    def fit(self, epochs: Optional[int] = None, log=print,
            eval_every: int = 1, logger=None,
            ckpt_dir: Optional[str] = None,
            start_epoch: int = 0) -> Dict[str, Any]:
        """Full driver: train, eval valid+test, keep best-valid epoch,
        re-split the graph — `train.py:119-131` + `base_model.py:81-82`."""
        from redgnn_tpu.utils.checkpoint import save_latest

        epochs = epochs or self.cfg.epochs
        best = {"valid_mrr": -1.0}
        if start_epoch > 0:
            # the sidecar rng was saved BEFORE the resplit that produced
            # start_epoch's split; replay that one resplit so the resumed
            # run trains on the exact same facts/train partition sequence
            if self.cfg.shuffle_train:
                self.kg.resplit(self._np_rng)
        for epoch in range(start_epoch, epochs):
            loss = self.train_epoch(epoch)
            row: Dict[str, Any] = {"epoch": epoch, "loss": loss}
            if (epoch + 1) % eval_every == 0:
                t0 = time.time()
                vm = self.evaluate("valid")
                tm = self.evaluate("test")
                row.update(
                    valid_mrr=vm["mrr"], valid_h1=vm["h1"], valid_h10=vm["h10"],
                    test_mrr=tm["mrr"], test_h1=tm["h1"], test_h10=tm["h10"],
                    infer_time=time.time() - t0, train_time=self.t_train,
                )
                if logger is not None:
                    logger.epoch_line(epoch, vm, tm, self.t_train,
                                      row["infer_time"])
                if vm["mrr"] > best["valid_mrr"]:
                    best = dict(row, valid_mrr=vm["mrr"])
                    if ckpt_dir:
                        self.save(ckpt_dir, epoch, vm["mrr"])
                log(
                    f"epoch {epoch} loss {loss:.2f} "
                    f"[VALID] MRR:{vm['mrr']:.4f} H@1:{vm['h1']:.4f} "
                    f"H@10:{vm['h10']:.4f} [TEST] MRR:{tm['mrr']:.4f} "
                    f"H@1:{tm['h1']:.4f} H@10:{tm['h10']:.4f}"
                )
            if self.timer.enabled:
                log(f"  timer: {self.timer}")
                self.timer.reset()
            self.history.append(row)
            if ckpt_dir:
                # BEFORE the resplit: fit() replays one resplit on resume,
                # so the restored rng regenerates the exact split the
                # original run used for epoch+1
                save_latest(ckpt_dir, self.state(), epoch + 1,
                            row.get("valid_mrr", -1.0),
                            host=self.host_state())
            if self.cfg.shuffle_train:
                self.kg.resplit(self._np_rng)
        return best
