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

import functools
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

    def __init__(self, kg: StaticKG, cfg: TrainConfig,
                 eval_kg_overrides: Optional[dict] = None):
        self.kg = kg
        self.cfg = cfg
        self.model_cfg = ModelConfig(
            n_ent=kg.n_ent, n_rel=kg.n_rel, hidden_dim=cfg.hidden_dim,
            attn_dim=cfg.attn_dim, n_layer=cfg.n_layer, dropout=cfg.dropout,
            act=cfg.act, segment_impl=cfg.segment_impl,
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
        self.train_caps = calibrate_caps(
            rowptr, tail, kg.n_ent, kg.train_data[:, 0], cfg.n_batch,
            cfg.n_layer, headroom=cfg.cap_headroom,
        )
        erowptr, _, etail = kg.eval_graph_np
        vq, _ = kg.eval_queries("valid")
        heads = vq[:, 0] if len(vq) else kg.train_data[:, 0]
        self.eval_caps = calibrate_caps(
            erowptr, etail, kg.n_ent, heads, cfg.n_tbatch,
            cfg.n_layer, headroom=cfg.cap_headroom,
        )
        self.t_train = 0.0
        self._np_rng = np.random.default_rng(cfg.seed)
        self.history: List[Dict[str, Any]] = []

        self._train_step = jax.jit(
            self._train_step_impl, static_argnames=("caps",)
        )
        self._eval_step = jax.jit(
            self._eval_step_impl, static_argnames=("caps",)
        )

    # ------------------------------------------------------------------
    def _train_step_impl(self, params, opt_state, graph, subs, rels, objs,
                         qmask, rng, caps: FrontierCaps):
        drop_rng, scrub_rng = jax.random.split(rng)

        def loss_fn(p):
            scores, aux = self.model.apply(
                {"params": p}, graph, subs, rels, qmask, caps, True,
                rngs={"dropout": drop_rng},
            )
            return softmax_ce_loss(scores, objs, qmask), aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        params = nan_scrub(params, scrub_rng)
        overflow = jnp.any(aux["edge_overflow"]) | jnp.any(aux["node_overflow"])
        return params, opt_state, loss, overflow, aux["num_edges"]

    def _eval_step_impl(self, params, graph, subs, rels, labels, filters,
                        qmask, caps: FrontierCaps):
        scores, aux = self.model.apply(
            {"params": params}, graph, subs, rels, qmask, caps, False,
        )
        sums = rank_metric_sums(scores, labels, filters)
        overflow = jnp.any(aux["edge_overflow"]) | jnp.any(aux["node_overflow"])
        return sums, overflow

    # ------------------------------------------------------------------
    def _grow_caps_from_batch(self, caps: FrontierCaps, graph_np, subs,
                              which: str) -> FrontierCaps:
        """Recompute caps exactly for an overflowing batch (host-side)."""
        from redgnn_tpu.graph.calibrate import simulate_hops, _round_up

        rowptr, _, tail = graph_np
        nc, ec = simulate_hops(rowptr, tail, self.kg.n_ent, subs,
                               self.cfg.n_layer)
        node_caps = list(caps.node_caps)
        edge_caps = list(caps.edge_caps)
        for i in range(self.cfg.n_layer):
            node_caps[i + 1] = max(node_caps[i + 1],
                                   _round_up(int(nc[i + 1] * 1.2) + 8))
            edge_caps[i] = max(edge_caps[i], _round_up(int(ec[i] * 1.2) + 8))
        return FrontierCaps(tuple(node_caps), tuple(edge_caps))

    def train_epoch(self, epoch: int) -> float:
        kg, cfg = self.kg, self.cfg
        t0 = time.time()
        data = kg.train_data
        n = len(data)
        total_loss = 0.0
        b = cfg.n_batch
        for start in range(0, n, b):
            batch = data[start:start + b]
            pad = b - len(batch)
            qmask = np.concatenate([np.ones(len(batch), bool),
                                    np.zeros(pad, bool)])
            if pad:
                batch = np.concatenate([batch, np.zeros((pad, 3), np.int64)])
            subs = jnp.asarray(batch[:, 0], jnp.int32)
            rels = jnp.asarray(batch[:, 1], jnp.int32)
            objs = jnp.asarray(batch[:, 2], jnp.int32)
            qm = jnp.asarray(qmask)

            while True:
                self.rng, step_rng = jax.random.split(self.rng)
                params, opt_state, loss, overflow, _ = self._train_step(
                    self.params, self.opt_state, kg.graph, subs, rels, objs,
                    qm, step_rng, self.train_caps,
                )
                if bool(overflow):
                    # discard this step's update and re-run with grown caps
                    self.train_caps = self._grow_caps_from_batch(
                        self.train_caps, kg.graph_np, batch[:, 0][qmask],
                        "train",
                    )
                    continue
                self.params, self.opt_state = params, opt_state
                break
            total_loss += float(loss)
        self.t_train += time.time() - t0
        return total_loss

    def evaluate(self, split: str) -> Dict[str, float]:
        kg, cfg = self.kg, self.cfg
        queries, answers = kg.eval_queries(split)
        b = cfg.n_tbatch
        partials = []
        for start in range(0, len(queries), b):
            q = queries[start:start + b]
            a = answers[start:start + b]
            pad = b - len(q)
            qmask = np.concatenate([np.ones(len(q), bool), np.zeros(pad, bool)])
            if pad:
                q = np.concatenate([q, np.zeros((pad, 2), np.int64)])
            labels = np.zeros((b, kg.n_ent), np.float32)
            filters = np.zeros((b, kg.n_ent), np.float32)
            for i, ans in enumerate(a):
                labels[i, ans] = 1.0
                filters[i, kg.filter_row(q[i, 0], q[i, 1])] = 1.0

            while True:
                sums, overflow = self._eval_step(
                    self.params, kg.eval_graph,
                    jnp.asarray(q[:, 0], jnp.int32),
                    jnp.asarray(q[:, 1], jnp.int32),
                    jnp.asarray(labels), jnp.asarray(filters),
                    jnp.asarray(qmask), self.eval_caps,
                )
                if bool(overflow):
                    self.eval_caps = self._grow_caps_from_batch(
                        self.eval_caps, kg.eval_graph_np, q[:, 0][qmask],
                        "eval",
                    )
                    continue
                break
            partials.append(jax.device_get(sums))
        return combine_metric_sums(partials)

    # ------------------------------------------------------------------
    def fit(self, epochs: Optional[int] = None, log=print,
            eval_every: int = 1) -> Dict[str, Any]:
        """Full driver: train, eval valid+test, keep best-valid epoch,
        re-split the graph — `train.py:119-131` + `base_model.py:81-82`."""
        epochs = epochs or self.cfg.epochs
        best = {"valid_mrr": -1.0}
        for epoch in range(epochs):
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
                if vm["mrr"] > best["valid_mrr"]:
                    best = dict(row, valid_mrr=vm["mrr"])
                log(
                    f"epoch {epoch} loss {loss:.2f} "
                    f"[VALID] MRR:{vm['mrr']:.4f} H@1:{vm['h1']:.4f} "
                    f"H@10:{vm['h10']:.4f} [TEST] MRR:{tm['mrr']:.4f} "
                    f"H@1:{tm['h1']:.4f} H@10:{tm['h10']:.4f}"
                )
            self.history.append(row)
            self.kg.resplit(self._np_rng)
        return best
