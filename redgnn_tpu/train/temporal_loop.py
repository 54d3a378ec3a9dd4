"""Train/eval drivers for the temporal workloads.

Capability parity:
  * interpolation (`Temporal/interpolation/main.py:56-253`): shuffled
    quadruple batches, per-example leave-one-out, softmax + NLL mean loss
    (`:71-75`), AdamW + ReduceLROnPlateau on valid loss (`:212-213,243`),
    NaN scrub (`:87-93`), raw hits@k / MRR eval (`:154-164`), best
    checkpoint by valid hits@1 (`:247-249`);
  * extrapolation (`Temporal/extrapolation/main.py:286-481`): windowed
    propagation, NLL on dense scores (`:386-391`), raw / (s,p)-filtered /
    (s,p,t)-filtered segment ranking over the final frontier
    (`:404-411` -> `segment.py:346-387`).

Same host-sync discipline as the static trainer: device scalars are
collected per epoch and materialized once (the TPU tunnel's d2h latency
makes per-batch fetches the dominant cost otherwise).
"""

from __future__ import annotations

import os
import time
from collections import defaultdict
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from redgnn_tpu.graph.calibrate import (
    FrontierCaps,
    _round_up,
    caps_for_batches,
    per_query_counts,
    per_query_counts_windowed,
    simulate_hops,
    simulate_hops_windowed,
)
from redgnn_tpu.graph.temporal import TemporalKG
from redgnn_tpu.models.temporal import TemporalModelConfig, TRedGNN
from redgnn_tpu.ops.ranking import (
    frontier_rank_metric_sums,
    raw_rank_metric_sums,
)
from redgnn_tpu.utils.config import TemporalTrainConfig
from redgnn_tpu.utils.timers import PhaseTimer


def nll_softmax_loss(scores, targets, qmask):
    """mean over batch of -log(softmax(s)[target] + 1e-12)
    (`Temporal/interpolation/main.py:71-75`)."""
    logp = jax.nn.log_softmax(scores, axis=1)
    # replicate the +1e-12 smoothing inside the log
    p = jnp.exp(logp[jnp.arange(scores.shape[0]), targets])
    per_row = -jnp.log(p + 1e-12)
    denom = jnp.maximum(jnp.sum(qmask), 1)
    return jnp.sum(jnp.where(qmask, per_row, 0.0)) / denom


def stage_filter_indices(sp2o, spt2o, data, b: int, n_ent: int):
    """Padded known-answer index lists per eval query, staged once per
    split (pattern of the static eval scan, `loop.py:340-349`).

    Returns (fil_idx, filt_idx) of shape (nb, b, max_k) with pad id
    ``n_ent``: entities to EXCLUDE from ranking under the (s,p)-filtered
    and (s,p,t)-filtered protocols respectively
    (`Temporal/extrapolation/segment.py:346-387`), target kept in."""
    fil_rows, filt_rows = [], []
    for s, p, o, t in data:
        fil_rows.append([e for e in sp2o.get((s, p), ()) if e != o])
        filt_rows.append([e for e in spt2o.get((s, p, t), ()) if e != o])
    nb = -(-len(data) // b)

    def pack(rows_list):
        m = max((len(r) for r in rows_list), default=1) or 1
        m = -(-m // 32) * 32  # round up: stable compile keys across splits
        out = np.full((nb * b, m), n_ent, np.int64)
        for i, r in enumerate(rows_list):
            out[i, :len(r)] = r
        return out.reshape(nb, b, m)

    return pack(fil_rows), pack(filt_rows)


def _nan_scrub(params, key):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(key, len(leaves))
    out = [jnp.where(jnp.isnan(p), jax.random.uniform(k, (), p.dtype), p)
           for p, k in zip(leaves, keys)]
    return jax.tree_util.tree_unflatten(treedef, out)


class TemporalTrainer:
    def __init__(self, kg: TemporalKG, cfg: TemporalTrainConfig,
                 mesh: Optional[jax.sharding.Mesh] = None):
        """``mesh`` (axes 'data'[, 'edge']) runs every train/eval step
        data-parallel via shard_map: queries shard over 'data', graph
        arrays and params replicate, loss/metric sums psum over ICI.
        The reference has no distributed path (SURVEY §2.6); this is the
        temporal counterpart of `parallel/shard.py.make_dp_loss_fn`."""
        self.kg = kg
        self.cfg = cfg
        self.mesh = mesh
        self.n_data = int(mesh.shape["data"]) if mesh is not None else 1
        if cfg.batch_size % self.n_data or cfg.eval_batch_size % self.n_data:
            raise ValueError(
                f"batch sizes ({cfg.batch_size}/{cfg.eval_batch_size}) must "
                f"divide the mesh data axis ({self.n_data})")
        self.model_cfg = TemporalModelConfig(
            n_ent=kg.n_ent,
            n_rel_vocab=kg.n_rel + 1,
            idd_rel=kg.idd_rel,
            hidden_dim=cfg.hidden_dim, attn_dim=cfg.attn_dim,
            n_layer=cfg.n_layer, dropout=cfg.dropout, act=cfg.act,
            mode=cfg.mode, window=cfg.window,
            time_key_base=kg.time_key_base,
            n_frequencies=cfg.n_frequencies,
            segment_impl=cfg.segment_impl,
            scan_src_backward=cfg.scan_src_backward,
            dense_hops=cfg.dense_hops, dense_switch=cfg.dense_switch,
            use_time=cfg.use_time, use_attention=cfg.use_attention,
            direction_transform=cfg.direction_transform,
            time_embedding=cfg.time_embedding,
            n_time=kg.n_time if cfg.time_embedding == "absolute" else None,
            edge_dropout=cfg.edge_dropout,
        )
        self.model = TRedGNN(self.model_cfg)
        if mesh is not None:
            import dataclasses as _dc

            # custom-VJP replication can't be vma-inferred inside
            # shard_map (same constraint as parallel/shard.py)
            self._shard_model = TRedGNN(_dc.replace(
                self.model_cfg, mxu_gather_backward=False,
                scan_src_backward=False))

        rng = jax.random.PRNGKey(cfg.seed)
        self.rng, init_rng = jax.random.split(rng)
        b = cfg.batch_size
        dummy_caps = FrontierCaps((b,) + (16,) * cfg.n_layer,
                                  (64,) * cfg.n_layer)
        self.params = self.model.init(
            {"params": init_rng, "dropout": init_rng},
            kg.graph, kg.etime,
            jnp.zeros(b, jnp.int32), jnp.zeros(b, jnp.int32),
            jnp.zeros(b, jnp.int32), jnp.ones(b, bool), dummy_caps,
            None, False, kg.ekey, kg.selfloop_slot,
        )["params"]

        def make_opt(learning_rate):
            if cfg.optimizer == "adamw":
                core = optax.adamw(learning_rate,
                                   weight_decay=cfg.weight_decay)
            else:
                # torch.optim.Adam(..., weight_decay=wd) is coupled L2:
                # wd*p is added to the GRADIENT before the moment updates
                # (`Temporal/extrapolation/main.py:217`) — distinct from
                # AdamW's decoupled decay.
                core = optax.chain(
                    optax.add_decayed_weights(cfg.weight_decay),
                    optax.scale_by_adam(),
                    optax.scale_by_learning_rate(learning_rate),
                )
            if (cfg.grad_clip is not None and np.isfinite(cfg.grad_clip)
                    and cfg.grad_clip > 0):
                return optax.chain(
                    optax.clip_by_global_norm(cfg.grad_clip), core)
            return core

        # inject_hyperparams lets the plateau scheduler rewrite the lr in
        # the optimizer state without resetting Adam moments
        self.tx = optax.inject_hyperparams(make_opt)(learning_rate=cfg.lr)
        if cfg.grad_accum_steps > 1:
            # gradient accumulation (`extrapolation/main.py:140`,
            # applied `train.py:249-251`)
            self.tx = optax.MultiSteps(self.tx, cfg.grad_accum_steps)
        self.opt_state = self.tx.init(self.params)

        # ReduceLROnPlateau state (torch semantics: factor, patience)
        self._lr = cfg.lr
        self._plateau_best = np.inf
        self._plateau_bad = 0

        self.caps: Dict[str, FrontierCaps] = {}
        self.ckpt_dir: Optional[str] = None  # set by fit() for mid-epoch saves
        self._kgarrs = (kg.graph, kg.etime, kg.ekey, kg.selfloop_slot,
                        kg.time_rowptr, kg.dense)
        self.t_train = 0.0
        self._np_rng = np.random.default_rng(cfg.seed)
        self.history: List[Dict[str, Any]] = []
        # --timer phase buckets (`extrapolation/main.py:39-52`)
        self.timer = PhaseTimer(enabled=False)

        if cfg.mode == "extrapolation":
            self._eval_scan_ex = jax.jit(self._eval_scan_ex_impl,
                                         static_argnames=("caps",))
            self._fil_cache: Dict[str, tuple] = {}
        self._train_epoch_scan = jax.jit(self._train_epoch_scan_impl,
                                         static_argnames=("caps",))
        self._eval_scan = jax.jit(self._eval_scan_impl,
                                  static_argnames=("caps",))

    def _train_epoch_scan_impl(self, params, opt_state, kgarrs, subs_a,
                               rels_a, objs_a, times_a, qmask_a, excl_a,
                               rng, caps: FrontierCaps):
        """Whole epoch as one lax.scan (see loop.py) — one dispatch/epoch."""
        use_excl = excl_a is not None

        def body(carry, batch):
            params, opt_state, rng, loss_sum, ov, n_bad = carry
            if use_excl:
                subs, rels, objs, times, qmask, excl = batch
            else:
                subs, rels, objs, times, qmask = batch
                excl = None
            rng, step_rng = jax.random.split(rng)
            params, opt_state, loss, overflow, bad = self._train_step_impl(
                params, opt_state, kgarrs, subs, rels, objs, times, qmask,
                excl, step_rng, caps)
            return (params, opt_state, rng, loss_sum + loss,
                    ov | overflow, n_bad + bad), None

        xs = (subs_a, rels_a, objs_a, times_a, qmask_a)
        if use_excl:
            xs = xs + (excl_a,)
        init = (params, opt_state, rng, jnp.zeros(()), jnp.zeros((), bool),
                jnp.zeros((), jnp.int32))
        (params, opt_state, rng, loss_sum, ov, n_bad), _ = jax.lax.scan(
            body, init, xs)
        return params, opt_state, loss_sum, ov, n_bad

    def _eval_scan_impl(self, params, kgarrs, subs_a, rels_a, objs_a,
                        times_a, qmask_a, caps: FrontierCaps):
        """Interpolation-style raw eval over all batches in one dispatch."""

        def body(carry, batch):
            sums_acc, ov = carry
            sums, overflow = self._eval_step_impl(params, kgarrs, *batch,
                                                  caps)
            return ({k: sums_acc[k] + v for k, v in sums.items()},
                    ov | overflow), None

        init_sums = {k: jnp.zeros(()) for k in
                     ("rr_sum", "h1_sum", "h3_sum", "h10_sum", "count",
                      "loss_sum")}
        (sums, ov), _ = jax.lax.scan(
            body, (init_sums, jnp.zeros((), bool)),
            (subs_a, rels_a, objs_a, times_a, qmask_a))
        return sums, ov

    # ------------------------------------------------------------------
    def _apply(self, params, kgarrs, subs, rels, times, qmask, caps,
               exclude, train, rng=None, model=None):
        # NOTE: graph arrays are threaded as jit ARGUMENTS, never read from
        # self inside traced code — closure capture would embed them as
        # compile-time constants in the HLO, which the remote-compile
        # tunnel cannot digest (observed as a wedged first transfer).
        graph, etime, ekey, selfloop_slot, time_rowptr, dense = kgarrs
        kwargs = {"rngs": {"dropout": rng}} if rng is not None else {}
        return (model or self.model).apply(
            {"params": params}, graph, etime,
            subs, rels, times, qmask, caps, exclude, train,
            ekey, selfloop_slot, time_rowptr, dense, **kwargs,
        )

    def _cap_b(self, b: int) -> int:
        """Frontier caps are per-shard under a mesh (each chip expands its
        own b/n_data sub-batch)."""
        return b // self.n_data

    def _make_sharded_loss(self, caps: FrontierCaps):
        """Data-parallel global-mean NLL through shard_map (differentiable;
        jax transposes the psums). exclude stays REPLICATED so every shard
        drops the whole global batch's quadruples — bit-exact with the
        single-device leave-one-out semantics (`interpolation/...:110`)."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def fwd(params, kgarrs, subs, rels, objs, times, qmask, excl, rng):
            rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
            scores, aux = self._apply(params, kgarrs, subs, rels, times,
                                      qmask, caps, excl, True, rng,
                                      model=self._shard_model)
            logp = jax.nn.log_softmax(scores, axis=1)
            p = jnp.exp(logp[jnp.arange(scores.shape[0]), objs])
            per_row = -jnp.log(p + 1e-12)
            loss_sum = jax.lax.psum(
                jnp.sum(jnp.where(qmask, per_row, 0.0)), "data")
            count = jax.lax.psum(jnp.sum(qmask), "data")
            ov = jnp.any(aux["edge_overflow"]) | jnp.any(aux["node_overflow"])
            ov = jax.lax.pmax(ov.astype(jnp.int32), "data") > 0
            return loss_sum / jnp.maximum(count, 1), ov

        d = P("data")
        return shard_map(fwd, mesh=self.mesh,
                         in_specs=(P(), P(), d, d, d, d, d, P(), P()),
                         out_specs=(P(), P()))

    def _train_step_impl(self, params, opt_state, kgarrs, subs, rels,
                         objs, times, qmask, exclude, rng,
                         caps: FrontierCaps):
        drop_rng, scrub_rng = jax.random.split(rng)

        if self.mesh is not None:
            sharded = self._make_sharded_loss(caps)
            (loss, overflow), grads = jax.value_and_grad(
                sharded, has_aux=True)(params, kgarrs, subs, rels, objs,
                                       times, qmask, exclude, drop_rng)
        else:
            def loss_fn(p):
                scores, aux = self._apply(p, kgarrs, subs, rels, times,
                                          qmask, caps, exclude, True,
                                          drop_rng)
                return nll_softmax_loss(scores, objs, qmask), aux

            (loss, aux), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            overflow = (jnp.any(aux["edge_overflow"])
                        | jnp.any(aux["node_overflow"]))
        # Reject the whole update when the loss or any gradient is
        # non-finite: one bad batch at lr 1e-2 otherwise writes NaN into
        # params/Adam moments, and the reference-parity scrub below then
        # replaces those entries with RANDOM values (`train.py:87-93`) —
        # which is how round 3's first interpolation run lost ~0.2 MRR
        # mid-epoch. Skipping the step keeps params, moments and the
        # MultiSteps accumulator exactly as they were (no optax chain
        # change, so existing checkpoints stay loadable).
        finite = jnp.isfinite(loss)
        for leaf in jax.tree_util.tree_leaves(grads):
            finite &= jnp.all(jnp.isfinite(leaf))
        updates, new_opt_state = self.tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        # Guard the *results* too: a finite-but-huge grad (|g| >~ 2e19 in
        # fp32) squares to inf inside scale_by_adam and would poison the
        # second-moment EMA forever without ever tripping the grad check.
        for leaf in jax.tree_util.tree_leaves((updates, new_opt_state)):
            if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.inexact):
                finite &= jnp.all(jnp.isfinite(leaf))
        keep = lambda n, o: jnp.where(finite, n, o)
        params = jax.tree_util.tree_map(keep, new_params, params)
        opt_state = jax.tree_util.tree_map(keep, new_opt_state, opt_state)
        loss = jnp.where(finite, loss, 0.0)
        params = _nan_scrub(params, scrub_rng)
        return params, opt_state, loss, overflow, ~finite

    def _shard_eval(self, local_fn, n_batch_args: int):
        """Wrap a local eval step: batch args shard over 'data', metric
        sums psum back to globals."""
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        def fwd(params, kgarrs, *batch):
            sums, ov = local_fn(params, kgarrs, *batch)
            sums = {k: jax.lax.psum(v, "data") for k, v in sums.items()}
            ov = jax.lax.pmax(ov.astype(jnp.int32), "data") > 0
            return sums, ov

        d = P("data")
        return shard_map(fwd, mesh=self.mesh,
                         in_specs=(P(), P()) + (d,) * n_batch_args,
                         out_specs=(P(), P()))

    def _eval_step_impl(self, params, kgarrs, subs, rels, objs, times,
                        qmask, caps: FrontierCaps):
        if self.mesh is not None:
            local = lambda p, k, *b: self._eval_step_local(
                p, k, *b, caps, model=self._shard_model)
            return self._shard_eval(local, 5)(params, kgarrs, subs, rels,
                                              objs, times, qmask)
        return self._eval_step_local(params, kgarrs, subs, rels, objs,
                                     times, qmask, caps)

    def _eval_step_local(self, params, kgarrs, subs, rels, objs, times,
                         qmask, caps: FrontierCaps, model=None):
        scores, aux = self._apply(params, kgarrs, subs, rels, times, qmask,
                                  caps, None, False, model=model)
        sums = raw_rank_metric_sums(scores, objs, qmask)
        sums["loss_sum"] = nll_softmax_loss(scores, objs, qmask) * jnp.sum(
            qmask)
        overflow = jnp.any(aux["edge_overflow"]) | jnp.any(aux["node_overflow"])
        return sums, overflow

    def _eval_step_ex_impl(self, params, kgarrs, subs, rels, objs, times,
                           qmask, fil_idx, filt_idx, caps: FrontierCaps):
        if self.mesh is not None:
            local = lambda p, k, *b: self._eval_step_ex_local(
                p, k, *b, caps, model=self._shard_model)
            return self._shard_eval(local, 7)(params, kgarrs, subs, rels,
                                              objs, times, qmask, fil_idx,
                                              filt_idx)
        return self._eval_step_ex_local(params, kgarrs, subs, rels, objs,
                                        times, qmask, fil_idx, filt_idx,
                                        caps)

    def _eval_step_ex_local(self, params, kgarrs, subs, rels, objs, times,
                            qmask, fil_idx, filt_idx, caps: FrontierCaps,
                            model=None):
        scores, aux = self._apply(params, kgarrs, subs, rels, times, qmask,
                                  caps, None, False, model=model)
        b = subs.shape[0]
        n_ent = self.model_cfg.n_ent
        keys = aux["frontier_keys"]
        from redgnn_tpu.ops.frontier import SENTINEL

        valid = keys != SENTINEL
        bidx = jnp.where(valid, keys // n_ent, b)
        eidx = jnp.where(valid, keys % n_ent, 0)
        prob = jnp.zeros((b, n_ent)).at[bidx, eidx].set(
            jnp.where(valid, aux["frontier_softmax"], 0.0), mode="drop")
        visited = jnp.zeros((b, n_ent), bool).at[
            bidx, eidx].set(valid, mode="drop")
        # keep-masks scattered from padded known-answer index lists
        # (pad id = n_ent -> dropped). Built on device: the round-1 host
        # loop over dense (B, n_ent) one-hots per batch (the literal port
        # of `extrapolation/main.py:404-411`) cost ~12 min per eval.
        rows = jnp.arange(b)[:, None]
        fil = jnp.ones((b, n_ent), bool).at[rows, fil_idx].set(
            False, mode="drop")
        fil_t = jnp.ones((b, n_ent), bool).at[rows, filt_idx].set(
            False, mode="drop")
        sums = frontier_rank_metric_sums(prob, visited, objs, qmask, fil,
                                         fil_t)
        sums["loss_sum"] = nll_softmax_loss(scores, objs, qmask) * jnp.sum(
            qmask)
        overflow = jnp.any(aux["edge_overflow"]) | jnp.any(aux["node_overflow"])
        return sums, overflow

    _EX_SUM_KEYS = tuple(
        [f"{pre}_{s}_sum" for pre in ("raw", "fil", "fil_t")
         for s in ("rr", "h1", "h3", "h10", "mr")]
        + ["count", "found_sum", "loss_sum"])

    def _eval_scan_ex_impl(self, params, kgarrs, subs_a, rels_a, objs_a,
                           times_a, qmask_a, fil_a, filt_a,
                           caps: FrontierCaps):
        """Extrapolation raw/fil/fil_t eval over staged batches in one
        dispatch (mirrors `_eval_scan_impl`)."""

        def body(carry, batch):
            sums_acc, ov = carry
            sums, overflow = self._eval_step_ex_impl(params, kgarrs, *batch,
                                                     caps)
            return ({k: sums_acc[k] + v for k, v in sums.items()},
                    ov | overflow), None

        init_sums = {k: jnp.zeros(()) for k in self._EX_SUM_KEYS}
        (sums, ov), _ = jax.lax.scan(
            body, (init_sums, jnp.zeros((), bool)),
            (subs_a, rels_a, objs_a, times_a, qmask_a, fil_a, filt_a))
        return sums, ov

    # ------------------------------------------------------------------
    def _caps_cache_path(self, split: str, b: int) -> Optional[str]:
        if not self.ckpt_dir:
            return None
        cfg = self.cfg
        return os.path.join(
            self.ckpt_dir,
            f"caps_{split}_b{b}_h{cfg.cap_headroom}_L{cfg.n_layer}.json")

    def _pq_entity_table(self):
        """Per-ENTITY exact hop counts (all n_ent heads), computed once.

        Interpolation frontiers depend only on the query head, so one
        table serves every split and every epoch permutation. Persisted
        next to the checkpoints: elastic restarts skip the ~15 s walk."""
        if getattr(self, "_pq_table", None) is not None:
            return self._pq_table
        cfg, kg = self.cfg, self.kg
        path = None
        if self.ckpt_dir:
            path = os.path.join(self.ckpt_dir,
                                f"pq_ent_L{cfg.n_layer}.npz")
            if os.path.exists(path):
                z = np.load(path)
                if len(z["nodes"]) == kg.n_ent:
                    self._pq_table = (z["nodes"], z["edges"])
                    return self._pq_table
        nc, ec = per_query_counts(
            kg.graph_np[0], kg.graph_np[2], kg.n_ent,
            np.arange(kg.n_ent, dtype=np.int64), cfg.n_layer)
        self._pq_table = (nc, ec)
        if path:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            np.savez(path, nodes=nc, edges=ec)
        return self._pq_table

    def _split_pq_windowed(self, split: str):
        """Windowed per-query counts aligned with kg.splits[split] rows."""
        cache = getattr(self, "_pq_split", None)
        if cache is None:
            cache = self._pq_split = {}
        if split in cache:
            return cache[split]
        cfg, kg = self.cfg, self.kg
        data = kg.splits[split]
        path = None
        if self.ckpt_dir:
            path = os.path.join(
                self.ckpt_dir,
                f"pq_{split}_L{cfg.n_layer}_w{cfg.window}.npz")
            if os.path.exists(path):
                z = np.load(path)
                if len(z["nodes"]) == len(data):
                    cache[split] = (z["nodes"], z["edges"])
                    return cache[split]
        nc, ec = per_query_counts_windowed(
            kg.ekey_np, kg.graph_np[2], kg.n_ent, kg.time_key_base,
            data[:, 0], data[:, 3], cfg.window, cfg.n_layer)
        cache[split] = (nc, ec)
        if path:
            os.makedirs(os.path.dirname(path), exist_ok=True)
            np.savez(path, nodes=nc, edges=ec)
        return cache[split]

    def _pq_for(self, data: np.ndarray, base_split: str,
                order: Optional[np.ndarray] = None):
        """Per-query count rows aligned with ``data`` (the actual batch
        order: permuted for train, split order for eval)."""
        cfg = self.cfg
        if cfg.mode == "extrapolation" and cfg.window is not None:
            nc, ec = self._split_pq_windowed(base_split)
            if order is not None:
                return nc[order], ec[order]
            return nc[: len(data)], ec[: len(data)]
        nc_t, ec_t = self._pq_entity_table()
        heads = np.asarray(data[:, 0], np.int64)
        return nc_t[heads], ec_t[heads]

    def _get_caps(self, split: str, data: np.ndarray, b: int,
                  order: Optional[np.ndarray] = None) -> FrontierCaps:
        """EXACT caps for the given batch order (grow-only across calls).

        Round 2's sampled calibration (6 random batches + 1.2x headroom)
        under-covered the ICEWS14_TeMP tail; the resulting mid-epoch
        overflow + whole-epoch replay ate the round's TPU window. Per-query
        exact counts (`graph/calibrate.py:per_query_counts`) make the caps
        a certificate: overflow is structurally impossible for the batches
        they were computed over. Caps only ever grow (union), so compile
        keys stay stable across epochs/restarts; persisted JSON seeds the
        floor (keeping round-2 programs warm in the XLA compile cache)."""
        cur = self.caps.get(split)
        if cur is None:
            path = self._caps_cache_path(split, b)
            if path and os.path.exists(path):
                import json as _json

                with open(path) as f:
                    d = _json.load(f)
                cur = FrontierCaps(tuple(d["node_caps"]),
                                   tuple(d["edge_caps"]))
        base = split.split("_", 1)[1] if split.startswith(
            ("eval_", "attn_")) else split
        nc, ec = self._pq_for(data, base, order)
        needed = caps_for_batches(nc, ec, b)
        if cur is None:
            self.caps[split] = needed
            self._persist_caps(split, b)
        elif not cur.covers(needed):
            self.caps[split] = cur.union(needed)
            self._persist_caps(split, b)
        else:
            self.caps[split] = cur
        return self.caps[split]

    def _persist_caps(self, split: str, b: int) -> None:
        path = self._caps_cache_path(split, b)
        if not path:
            return
        import json as _json

        os.makedirs(os.path.dirname(path), exist_ok=True)
        c = self.caps[split]
        with open(path, "w") as f:
            _json.dump({"node_caps": list(c.node_caps),
                        "edge_caps": list(c.edge_caps)}, f)

    def _recalibrate_exact(self, split: str, data: np.ndarray, b: int):
        cfg, kg = self.cfg, self.kg
        caps = self.caps[split]
        node_caps = list(caps.node_caps)
        edge_caps = list(caps.edge_caps)
        for start in range(0, len(data), b):
            batch = data[start:start + b]
            if cfg.mode == "extrapolation" and cfg.window is not None:
                nc, ec = simulate_hops_windowed(
                    kg.ekey_np, kg.graph_np[2], kg.n_ent, kg.time_key_base,
                    batch[:, 0], batch[:, 3], cfg.window, cfg.n_layer)
            else:
                nc, ec = simulate_hops(kg.graph_np[0], kg.graph_np[2],
                                       kg.n_ent, batch[:, 0], cfg.n_layer)
            for i in range(cfg.n_layer):
                node_caps[i + 1] = max(node_caps[i + 1], _round_up(nc[i + 1] + 8))
                edge_caps[i] = max(edge_caps[i], _round_up(ec[i] + 8))
        self.caps[split] = FrontierCaps(tuple(node_caps), tuple(edge_caps))
        self._persist_caps(split, b)

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> float:
        cfg, kg = self.cfg, self.kg
        t0 = time.time()
        stage_phase = self.timer.phase("train", "stage")
        stage_phase.__enter__()
        train = kg.splits["train"]
        order = self._np_rng.permutation(len(train))
        if cfg.max_train_batches is not None:
            order = order[: cfg.max_train_batches * cfg.batch_size]
        data = train[order]
        # graph row = train-file row for interpolation-style graphs
        rows = kg.exclusion_slots(order) if cfg.mode == "interpolation" \
            else None
        caps = self._get_caps("train", data, self._cap_b(cfg.batch_size),
                              order=order)
        b = cfg.batch_size
        nb = -(-len(data) // b)
        pad = nb * b - len(data)
        padded = np.concatenate([data, np.zeros((pad, 4), np.int64)])
        qmask = np.ones(nb * b, bool)
        if pad:
            qmask[-pad:] = False
        excl_np = None
        if rows is not None:
            # pad with an out-of-range slot so padded queries exclude nothing
            excl_np = np.concatenate(
                [rows, np.full(pad, len(self.kg.graph_quads), np.int64)]
            ).reshape(nb, b)
        cols = [padded[:, j].reshape(nb, b) for j in range(4)]
        qm = qmask.reshape(nb, b)

        stage_phase.__exit__(None, None, None)
        total = 0.0
        # bounded-duration dispatches (axon watchdog; see loop.py)
        device_phase = self.timer.phase("train", "device")
        device_phase.__enter__()
        start, retries = 0, 0
        while start < nb:
            sl = slice(start, min(start + cfg.scan_chunk, nb))
            # chunk snapshot: if the overflow safety net fires, roll back
            # and retry JUST this chunk — completed steps stay (round 2's
            # whole-epoch replay discarded 3072 valid steps; with exact
            # caps this path should never trigger at all)
            chunk_snap = (self.params, self.opt_state, self.rng)
            xs = tuple(jnp.asarray(c[sl], jnp.int32) for c in cols[:3]) \
                + (jnp.asarray(cols[3][sl], jnp.int32),
                   jnp.asarray(qm[sl]))
            excl_a = (jnp.asarray(excl_np[sl], jnp.int32)
                      if excl_np is not None else None)
            self.rng, epoch_rng = jax.random.split(self.rng)
            params, opt_state, loss_sum, overflow, n_bad = (
                self._train_epoch_scan(self.params, self.opt_state,
                                       self._kgarrs, *xs, excl_a,
                                       epoch_rng, caps))
            if bool(overflow):
                if retries >= 3:
                    raise RuntimeError(
                        "temporal train caps failed to stabilize")
                retries += 1
                self.params, self.opt_state, self.rng = chunk_snap
                self._recalibrate_exact(
                    "train", data[sl.start * b: sl.stop * b],
                    self._cap_b(b))
                caps = self.caps["train"]
                print(f"  epoch {epoch}: overflow in chunk at step {start}"
                      f" — grew caps, retrying chunk (kept {start} steps)",
                      flush=True)
                continue
            retries = 0
            # print only for chunks that actually stuck (not ones the
            # overflow safety net rolled back and retried)
            if int(n_bad):
                print(f"  epoch {epoch}: {int(n_bad)} non-finite step(s) "
                      f"rejected in chunk at {start}", flush=True)
            self.params, self.opt_state = params, opt_state
            total += float(loss_sum)
            # intra-epoch progress anchor: the tunneled worker can die
            # mid-epoch; resuming replays this epoch with the already-
            # progressed weights rather than losing them
            if self.ckpt_dir and (start // cfg.scan_chunk) % 8 == 7:
                from redgnn_tpu.utils.checkpoint import save_latest

                save_latest(self.ckpt_dir, self.state(), epoch, -1.0,
                            host=self.host_state())
                done = min(start + cfg.scan_chunk, nb)
                rate = done * cfg.batch_size / max(
                    time.time() - t0, 1e-9)
                print(f"  epoch {epoch}: {done}/{nb} steps, "
                      f"loss_sum {total:.2f}, {rate:.1f} q/s",
                      flush=True)
            start += cfg.scan_chunk
        device_phase.__exit__(None, None, None)
        self.t_train += time.time() - t0
        return total

    def evaluate(self, split: str) -> Dict[str, float]:
        cfg, kg = self.cfg, self.kg
        data = kg.splits[split]
        if cfg.max_eval_batches is not None:
            data = data[: cfg.max_eval_batches * cfg.eval_batch_size]
        b = cfg.eval_batch_size
        caps = self._get_caps(f"eval_{split}", data, self._cap_b(b))
        if cfg.mode == "extrapolation":
            with self.timer.phase("eval", "stage"):
                nb = -(-len(data) // b)
                pad = nb * b - len(data)
                padded = np.concatenate([data,
                                         np.zeros((pad, 4), np.int64)])
                qmask = np.ones(nb * b, bool)
                if pad:
                    qmask[-pad:] = False
                cols = [padded[:, j].reshape(nb, b) for j in range(4)]
                qm = qmask.reshape(nb, b)
                fil3, filt3 = self._staged_filters(split, data, b)
            for attempt in range(3):
                partials, overflow_seen = [], False
                for start in range(0, nb, cfg.scan_chunk):
                    sl = slice(start, min(start + cfg.scan_chunk, nb))
                    xs = tuple(jnp.asarray(c[sl], jnp.int32)
                               for c in cols) + (
                        jnp.asarray(qm[sl]),
                        jnp.asarray(fil3[sl], jnp.int32),
                        jnp.asarray(filt3[sl], jnp.int32))
                    sums, overflow = self._eval_scan_ex(
                        self.params, self._kgarrs, *xs, caps)
                    if bool(overflow):
                        overflow_seen = True
                        break
                    partials.append(jax.device_get(sums))
                if not overflow_seen:
                    return self._combine(partials)
                self._recalibrate_exact(f"eval_{split}", data, self._cap_b(b))
                caps = self.caps[f"eval_{split}"]
            raise RuntimeError("temporal eval caps failed to stabilize")

        # interpolation: scan dispatches over staged batches, chunked to
        # bound single-execution time
        nb = -(-len(data) // b)
        pad = nb * b - len(data)
        padded = np.concatenate([data, np.zeros((pad, 4), np.int64)])
        qmask = np.ones(nb * b, bool)
        if pad:
            qmask[-pad:] = False
        cols = [padded[:, j].reshape(nb, b) for j in range(4)]
        qm = qmask.reshape(nb, b)
        for attempt in range(3):
            partials, overflow_seen = [], False
            for start in range(0, nb, cfg.scan_chunk):
                sl = slice(start, min(start + cfg.scan_chunk, nb))
                xs = tuple(jnp.asarray(c[sl], jnp.int32) for c in cols) + (
                    jnp.asarray(qm[sl]),)
                sums, overflow = self._eval_scan(self.params, self._kgarrs,
                                                 *xs, caps)
                if bool(overflow):
                    overflow_seen = True
                    break
                partials.append(jax.device_get(sums))
            if not overflow_seen:
                return self._combine(partials)
            self._recalibrate_exact(f"eval_{split}", data, self._cap_b(b))
            caps = self.caps[f"eval_{split}"]
        raise RuntimeError("temporal eval caps failed to stabilize")

    def _combine(self, partials) -> Dict[str, float]:
        tot = defaultdict(float)
        for p in partials:
            for k, v in p.items():
                tot[k] += float(v)
        n = max(tot["count"], 1.0)
        out = {"n": tot["count"], "loss": tot["loss_sum"] / n}
        prefixes = [""] if "rr_sum" in tot else ["raw_", "fil_", "fil_t_"]
        for pre in prefixes:
            key = lambda s: f"{pre}{s}" if pre else s
            out[key("mrr")] = tot[key("rr_sum")] / n
            out[key("h1")] = tot[key("h1_sum")] / n
            out[key("h3")] = tot[key("h3_sum")] / n
            out[key("h10")] = tot[key("h10_sum")] / n
        if "found_sum" in tot:
            out["found_rate"] = tot["found_sum"] / n
        # convenience aliases for the extrapolation naming
        if "raw_mrr" in out:
            out["mrr"], out["h1"], out["h3"], out["h10"] = (
                out["fil_mrr"], out["fil_h1"], out["fil_h3"], out["fil_h10"])
        return out

    def _staged_filters(self, split: str, data: np.ndarray, b: int):
        key = (split, len(data), b)
        cached = self._fil_cache.get(key)
        if cached is None:
            sp2o, spt2o = self._filters()
            cached = stage_filter_indices(sp2o, spt2o, data, b,
                                          self.kg.n_ent)
            self._fil_cache[key] = cached
        return cached

    def _filters(self):
        if not hasattr(self, "_sp2o"):
            sp2o: Dict[tuple, set] = defaultdict(set)
            spt2o: Dict[tuple, set] = defaultdict(set)
            for split in ("train", "valid", "test"):
                for s, p, o, t in self.kg.splits[split]:
                    sp2o[(s, p)].add(o)
                    spt2o[(s, p, t)].add(o)
            self._sp2o = {k: np.array(sorted(v)) for k, v in sp2o.items()}
            self._spt2o = {k: np.array(sorted(v)) for k, v in spt2o.items()}
        return self._sp2o, self._spt2o

    # ------------------------------------------------------------------
    def collect_attention(self, split: str = "valid",
                          max_batches: int = 8) -> np.ndarray:
        """(n_rel, n_rel, 2) [attention sum, count] keyed by (query rel,
        edge rel) — the reference's attention_vis bookkeeping
        (`model_cuda_new_embdding.py:117-125,169-172`), produced by a few
        forward passes with the debug `collect_alpha` model."""
        import dataclasses as _dc

        from redgnn_tpu.utils.viz import collect_attention_stats

        model = TRedGNN(_dc.replace(self.model_cfg, collect_alpha=True,
                                    dense_hops=False))
        data = self.kg.splits[split][: max_batches
                                     * self.cfg.eval_batch_size]
        b = self.cfg.eval_batch_size
        # dedicated FULL-batch caps: this forward runs replicated (plain
        # jit, even under a mesh), so per-shard eval caps would clamp
        caps = self._get_caps(f"attn_{split}", data, b)
        n_rel = self.model_cfg.n_rel_vocab
        for attempt in range(3):
            acc = np.zeros((n_rel, n_rel, 2))
            apply = jax.jit(
                lambda p, kgarrs, s, r, t, q, caps=caps: self._apply(
                    p, kgarrs, s, r, t, q, caps, None, False, model=model))
            overflow_seen = False
            for start in range(0, len(data), b):
                batch = data[start:start + b]
                pad = b - len(batch)
                qmask = np.concatenate([np.ones(len(batch), bool),
                                        np.zeros(pad, bool)])
                if pad:
                    batch = np.concatenate(
                        [batch, np.zeros((pad, 4), np.int64)])
                _, aux = apply(self.params, self._kgarrs,
                               jnp.asarray(batch[:, 0], jnp.int32),
                               jnp.asarray(batch[:, 1], jnp.int32),
                               jnp.asarray(batch[:, 3], jnp.int32),
                               jnp.asarray(qmask))
                if bool(jnp.any(aux["edge_overflow"])
                        | jnp.any(aux["node_overflow"])):
                    overflow_seen = True
                    break
                for a, er, qr, va in zip(*(jax.device_get(aux[k]) for k in
                                           ("alpha", "alpha_rel",
                                            "alpha_qrel", "alpha_valid"))):
                    acc += collect_attention_stats(a, er, qr, va, n_rel)
            if not overflow_seen:
                return acc
            self._recalibrate_exact(f"attn_{split}", data, b)
            caps = self.caps[f"attn_{split}"]
        raise RuntimeError("attention-stats caps failed to stabilize")

    # ------------------------------------------------------------------
    def plateau_step(self, valid_loss: float) -> None:
        """torch ReduceLROnPlateau(mode=min) semantics."""
        if valid_loss < self._plateau_best - 1e-8:
            self._plateau_best = valid_loss
            self._plateau_bad = 0
            return
        self._plateau_bad += 1
        if self._plateau_bad > self.cfg.patience:
            self._lr *= self.cfg.plateau_factor
            self._plateau_bad = 0
            state = self.opt_state
            if hasattr(state, "inner_opt_state"):  # MultiSteps wrapper
                state = state.inner_opt_state
            state.hyperparams["learning_rate"] = jnp.asarray(self._lr)

    def state(self) -> Dict[str, Any]:
        """Device state (msgpack). Host-side training state — plateau
        counters, rng — travels in the checkpoint's JSON sidecar
        (host_state / restore_host)."""
        return {"params": self.params, "opt_state": self.opt_state}

    def host_state(self) -> Dict[str, Any]:
        return {
            "lr": float(self._lr),
            "plateau_best": float(self._plateau_best),
            "plateau_bad": int(self._plateau_bad),
            "np_rng": self._np_rng.bit_generator.state,
            "jax_rng": np.asarray(jax.device_get(self.rng)).tolist(),
        }

    def restore_host(self, ckpt_path: str) -> None:
        """Re-apply host-side training state after ``restore``.

        Falls back to deriving the live learning rate from the restored
        optimizer hyperparams (checkpoints written before the sidecar
        existed) — without this, the next plateau event would multiply
        the CONFIG lr, jumping the rate back UP mid-training."""
        from redgnn_tpu.utils.checkpoint import load_host

        host = load_host(ckpt_path)
        if host is None:
            self._sync_lr_from_opt()
            return
        self._lr = float(host["lr"])
        # The sidecar is AUTHORITATIVE for the live lr: write it through
        # to the device optimizer's inject_hyperparams state. The
        # restored opt_state carries its own lr copy; normally the two
        # match, but an operator-edited sidecar (the supported manual
        # recovery path — see CLAUDE.md round-4 notes) or a
        # checkpoint/sidecar pairing mismatch would otherwise train at
        # the OPT-STATE lr while logging the sidecar's (round 4: three
        # epochs silently ran at 1e-2 while printing lr 1.00e-03).
        self.force_lr(self._lr)
        self._plateau_best = float(host["plateau_best"])
        self._plateau_bad = int(host["plateau_bad"])
        try:
            self._np_rng.bit_generator.state = host["np_rng"]
        except (KeyError, ValueError):
            pass
        if "jax_rng" in host:
            self.rng = jnp.asarray(np.asarray(host["jax_rng"],
                                              np.uint32))

    def force_lr(self, lr: float) -> None:
        """Override the live learning rate after a restore.

        A checkpoint carries its lr twice (optimizer hyperparams + host
        sidecar), so an explicit `--set lr=...` on a resumed run would
        otherwise be silently ignored; this writes the override through
        both (same mechanism as plateau_step, Adam moments preserved)."""
        self._lr = float(lr)
        state = self.opt_state
        if hasattr(state, "inner_opt_state"):  # MultiSteps wrapper
            state = state.inner_opt_state
        state.hyperparams["learning_rate"] = jnp.asarray(self._lr)

    def _sync_lr_from_opt(self) -> None:
        state = self.opt_state
        if hasattr(state, "inner_opt_state"):  # MultiSteps wrapper
            state = state.inner_opt_state
        try:
            self._lr = float(
                jax.device_get(state.hyperparams["learning_rate"]))
        except (AttributeError, KeyError, TypeError):
            pass

    def save(self, ckpt_dir: str, epoch: int, metric: float) -> str:
        from redgnn_tpu.utils.checkpoint import save_checkpoint

        return save_checkpoint(ckpt_dir, self.state(), epoch, metric,
                               host=self.host_state())

    def restore(self, path: str) -> int:
        from redgnn_tpu.utils.checkpoint import load_checkpoint

        try:
            state, epoch, _ = load_checkpoint(path, self.state())
        except Exception as e:
            raise RuntimeError(
                f"checkpoint {path} does not match this trainer's state "
                "structure. Note: optimizer='adam' checkpoints written "
                "before the coupled-weight-decay fix (round 2) have a "
                "different optax chain and cannot be restored; retrain "
                f"or use --resume_latest (fresh-start fallback). ({e})"
            ) from e
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.restore_host(path)
        return epoch

    def fit(self, epochs: Optional[int] = None, log=print, logger=None,
            ckpt_dir: Optional[str] = None,
            start_epoch: int = 0) -> Dict[str, Any]:
        from redgnn_tpu.utils.checkpoint import save_latest

        epochs = epochs or self.cfg.epochs
        self.ckpt_dir = ckpt_dir
        best: Dict[str, Any] = {"valid_h1": -1.0}
        for epoch in range(start_epoch, epochs):
            loss = self.train_epoch(epoch)
            vm = self.evaluate("valid")
            self.plateau_step(vm["loss"])
            row = {"epoch": epoch, "loss": loss, "lr": self._lr,
                   **{f"valid_{k}": v for k, v in vm.items()}}
            if vm["h1"] > best["valid_h1"]:
                tm = self.evaluate("test")
                row.update({f"test_{k}": v for k, v in tm.items()})
                best = dict(row, valid_h1=vm["h1"])
                if ckpt_dir:
                    self.save(ckpt_dir, epoch, vm["h1"])
            if logger is not None:
                # after the best-update so test metrics reach the JSONL
                logger.log_scalars(epoch, {k: v for k, v in row.items()
                                           if isinstance(v, (int, float))},
                                   tag="eval")
            self.history.append(row)
            if ckpt_dir:
                save_latest(ckpt_dir, self.state(), epoch + 1, vm["h1"],
                            host=self.host_state())
            log(f"epoch {epoch} loss {loss:.3f} valid MRR {vm['mrr']:.4f} "
                f"H@1 {vm['h1']:.4f} H@10 {vm['h10']:.4f} lr {self._lr:.2e}")
            if self.timer.enabled:
                log(f"  timer: {self.timer}")
                self.timer.reset()
        return best
