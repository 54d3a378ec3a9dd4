"""T-RED-GNN: time-aware relational digraph propagation (one XLA program).

Covers both temporal workloads of the reference with one core:

  * interpolation (`Temporal/interpolation/model_cuda_new_embdding.py`):
    whole-timeline propagation, signed relative time Δ = τ_edge − τ_query,
    direction-specific past/now/future transforms (`:160-163`), per-example
    leave-one-out during training (`:110`) realized as an edge mask;
  * extrapolation (`Temporal/extrapolation/model_cuda_new_embedding.py`):
    per-query time window [τ_q − W, τ_q) (`:166-177`), Δ = τ_query − τ_edge,
    single past transform (`:211`), and a scatter-softmax distribution over
    the final frontier for segment ranking (`:248-257`).

Shared math (both files):
    msg_e  = h_src + R_i[rel] + PeriodicTimeEmbed(Δ)
    t(msg) = direction-selected linear transform
    α_e    = σ(A2_i · ReLU(A1_i · [h_src ‖ R_i[rel] ‖ R_i[q_rel]]))
    h'_v   = act(Σ_{dst(e)=v} α_e · t(msg_e))      (+ dropout, interpolation)
    score  = w·h + b over reached entities, 0 elsewhere.

Unlike the static model there is no GRU gate and no W_h; relation
embeddings are per-layer.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from redgnn_tpu.graph.calibrate import FrontierCaps
from redgnn_tpu.graph.kg import DeviceGraph
from redgnn_tpu.models.layers import _uniform_init
from redgnn_tpu.ops.gather import take_rows
from redgnn_tpu.ops.frontier import (
    SENTINEL,
    expand_frontier,
    expand_frontier_ranges,
)
from redgnn_tpu.ops.segment import segment_softmax, segment_sum

TEMPORAL_ACTS = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "idd": lambda x: x,
    "softplus": jax.nn.softplus,
    "leakyrelu": lambda x: jax.nn.leaky_relu(x, 0.01),
}


class PeriodicTimeEmbedding(nn.Module):
    """rtdl-style PLR embedding of a scalar time offset.

    Re-derivation of `PeriodicEmbeddings(1, d, n_frequencies=48, lite=False)`
    (`Temporal/interpolation/rtdl_num_embeddings.py:126-215`):
      z = 2π·c·x (learned frequencies c ~ N(0, σ), σ=0.01), features
      [cos z ‖ sin z] -> per-feature linear -> ReLU.
    """

    d_embedding: int
    n_frequencies: int = 48
    sigma: float = 0.01

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # (E,) -> (E, d)
        freq = self.param(
            "frequencies",
            lambda key, shape: self.sigma * jax.random.truncated_normal(
                key, -3.0, 3.0, shape),
            (self.n_frequencies,),
        )
        k2 = 2 * self.n_frequencies
        w = self.param("w", _uniform_init(), (k2, self.d_embedding))
        b = self.param("b", _uniform_init(k2), (self.d_embedding,))
        z = 2.0 * jnp.pi * x[:, None] * freq[None, :]
        feats = jnp.concatenate([jnp.cos(z), jnp.sin(z)], axis=-1)
        return jax.nn.relu(feats @ w + b)


@dataclass(frozen=True)
class TemporalModelConfig:
    n_ent: int
    n_rel_vocab: int      # rows in the relation embedding tables
    idd_rel: int          # self-loop relation id
    hidden_dim: int = 20
    attn_dim: int = 30
    n_layer: int = 4
    dropout: float = 0.1
    act: str = "leakyrelu"
    mode: str = "interpolation"   # or "extrapolation"
    window: Optional[int] = None  # time units; extrapolation uses 120
    time_key_base: Optional[int] = None  # composite (head,time) key stride
    n_frequencies: int = 48
    segment_impl: str = "xla"
    remat: bool = False  # recompute per-edge math in backward (HBM
    # savings); OFF by default — jax.checkpoint programs correlate with
    # axon worker faults (static model without remat runs for hours)
    dedup_impl: str = "bitmap"  # bitmap avoids multi-M-row device sorts
    # prefix-sum backward for hidden[src] in bitmap hops (src is
    # non-decreasing in expansion order; ops/gather.take_rows_sorted)
    scan_src_backward: bool = True
    mxu_gather_backward: bool = True  # take_rows custom VJP (off inside
    # shard_map: replication of custom-VJP residuals can't be vma-inferred)
    edge_dropout: float = 0.0  # random per-hop edge drop during training
    # (the interpolation prototype's 50% drop, `RED-GNN/model.py:188-189`)
    # DENSE-mode hops (interpolation): once a hop's sparse edge cap
    # approaches b x |edges| the frontier has saturated and per-frontier
    # expansion gathers are pure overhead — switch to a batch-shared
    # (n_ent, b, d) node layout over the static tail-sorted edge table
    # (measured: the sparse path costs ~75-80ns per padded edge slot on
    # v5e, ~10 latency-bound E-wide ops; dense needs 2).
    dense_hops: bool = True
    dense_switch: float = 0.25  # dense when edge_cap > switch * b * E
    dense_agg: str = "sorted_scatter"  # or "cumsum" (range-diff of prefix)
    # ablations (`Temporal/interpolation/model_cuda_aba.py:14,189,353`)
    use_time: bool = True               # False => T_RED_GNN_wo_tau
    use_attention: bool = True          # False => T_RED_GNN_wo_Attn
    collect_alpha: bool = False  # expose per-edge attention in aux (the
    # attention_vis instrumentation, `model_cuda_new_embdding.py:117-125`);
    # debug-only: disables remat for the hop and ships E-wide arrays
    direction_transform: str = "linear"  # "bias" => T_RED_GNN_W
    time_embedding: str = "periodic"     # "absolute" => nn.Embedding-style
    n_time: Optional[int] = None         # rows for absolute time table


class TRedGNN(nn.Module):
    cfg: TemporalModelConfig

    @nn.compact
    def __call__(
        self,
        graph: DeviceGraph,
        etime: jnp.ndarray,           # (n_edges,) time per CSR slot
        subs: jnp.ndarray,            # (B,)
        rels: jnp.ndarray,            # (B,)
        times: jnp.ndarray,           # (B,) query time ids
        qmask: jnp.ndarray,           # (B,) bool
        caps: FrontierCaps,
        exclude_slots: Optional[jnp.ndarray] = None,  # (B,) CSR slots or None
        train: bool = False,
        ekey: Optional[jnp.ndarray] = None,          # (n_edges,) head*K+time
        selfloop_slot: Optional[jnp.ndarray] = None,  # (n_ent,)
        time_rowptr: Optional[jnp.ndarray] = None,   # (n_ent, K+1) offsets
        dense_arrs: Optional[tuple] = None,  # (src, rel, time, slot, tail,
        # tail_rowptr) tail-sorted — enables dense-mode hops
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        cfg = self.cfg
        b = subs.shape[0]
        d = cfg.hidden_dim

        keys0 = subs.astype(jnp.int32) + jnp.arange(b, dtype=jnp.int32) * cfg.n_ent
        node_keys = jnp.where(qmask, keys0, SENTINEL)
        hidden = jnp.zeros((b, d))

        # ---- shared parameters, declared explicitly so the per-hop math
        # can be a PURE function under jax.checkpoint (rematerialization:
        # per-edge gathers/messages are recomputed in the backward pass
        # instead of stored — essential for whole-timeline interpolation
        # frontiers with millions of edge slots per hop) ----------------
        if cfg.time_embedding == "periodic":
            k = cfg.n_frequencies
            t_freq = self.param(
                "time_freq",
                lambda key, shape: 0.01 * jax.random.truncated_normal(
                    key, -3.0, 3.0, shape),
                (k,))
            t_w = self.param("time_w", _uniform_init(), (2 * k, d))
            t_b = self.param("time_b", _uniform_init(2 * k), (d,))

            def time_embed(x):
                z = 2.0 * jnp.pi * x[:, None] * t_freq[None, :]
                feats = jnp.concatenate([jnp.cos(z), jnp.sin(z)], -1)
                return jax.nn.relu(feats @ t_w + t_b)
        else:
            # absolute per-timestamp table (`model_cuda_aba.py`, the
            # T_RED_GNN_W variant and `model_cuda.py:44,152`)
            abs_table = self.param(
                "time_embed_abs", nn.initializers.xavier_uniform(),
                (cfg.n_time or 1, d))
        if cfg.direction_transform == "linear":
            past_w = self.param("past_linear", _uniform_init(), (d, d))
            now_w = self.param("now_linear", _uniform_init(), (d, d))
            future_w = self.param("future_linear", _uniform_init(), (d, d))
            past = lambda x: x @ past_w
            now = lambda x: x @ now_w
            future = lambda x: x @ future_w
        else:  # learned additive biases (T_RED_GNN_W)
            past_b = self.param("past_bias", nn.initializers.zeros, (d,))
            now_b = self.param("now_bias", nn.initializers.zeros, (d,))
            future_b = self.param("future_bias", nn.initializers.zeros, (d,))
            past = lambda x: x + past_b
            now = lambda x: x + now_b
            future = lambda x: x + future_b

        # leave-one-out edge mask: drop the batch's own training quadruples
        # for ALL queries in the batch (np.delete semantics, `:110`)
        if exclude_slots is not None:
            def edge_mask_fn(edge_id, batch_e, rel_e):
                hit = jnp.any(
                    edge_id[:, None] == exclude_slots[None, :], axis=1
                )
                return ~hit
        else:
            edge_mask_fn = None

        aux: Dict[str, Any] = {"edge_overflow": [], "node_overflow": [],
                               "num_nodes": [], "num_edges": []}

        from redgnn_tpu.models.redgnn import _resolve_dedup

        # dense-mode plan: first hop whose sparse edge cap approaches the
        # batch-shared whole-table cost switches to dense (trace-time
        # decision — caps and shapes are static)
        dense_from = None
        if (cfg.mode == "interpolation" and cfg.dense_hops
                and dense_arrs is not None):
            n_all_edges = int(graph.tail.shape[0])
            for i in range(cfg.n_layer):
                if caps.edge_caps[i] >= cfg.dense_switch * b * n_all_edges:
                    dense_from = i
                    break
        if dense_from is not None:
            tsrc, trel, ttime, tslot, ttail, tail_rowptr = dense_arrs
            if exclude_slots is not None:
                # leave-one-out in dense order: one (E,) keep mask shared
                # by the whole batch (np.delete semantics, `:110`)
                excl_keep = ~jnp.any(
                    tslot[:, None] == exclude_slots[None, :], axis=1)
            else:
                excl_keep = None
        dense_state = None  # (hidden_dense (N,b,d), visited (N,b))

        windowed = cfg.mode == "extrapolation" and cfg.window is not None
        for i in range(cfg.n_layer):
            if dense_from is not None and i >= dense_from:
                rela = self.param(
                    f"rela_embed_{i}", nn.initializers.xavier_uniform(),
                    (cfg.n_rel_vocab, d),
                )
                a1_k = self.param(f"attn1_{i}", _uniform_init(),
                                  (3 * d, cfg.attn_dim))
                a2_k = self.param(f"attn2_{i}", _uniform_init(),
                                  (cfg.attn_dim, 1))
                if dense_state is None:
                    dense_state = self._to_dense(node_keys, hidden, b)
                use_dropout = train and cfg.dropout > 0
                drop_rng = self.make_rng("dropout") if use_dropout else None
                edrop_rng = (self.make_rng("dropout")
                             if train and cfg.edge_dropout > 0 else None)
                dense_state, n_nodes, n_edges = self._dense_hop(
                    dense_state, rela, a1_k, a2_k, rels, times,
                    tsrc, trel, ttime, ttail, tail_rowptr, excl_keep,
                    ((t_freq, t_w, t_b)
                     if cfg.time_embedding == "periodic" else None),
                    None if cfg.time_embedding == "periodic" else abs_table,
                    past, now, future, drop_rng, edrop_rng)
                aux["edge_overflow"].append(jnp.zeros((), bool))
                aux["node_overflow"].append(jnp.zeros((), bool))
                aux["num_nodes"].append(n_nodes)
                aux["num_edges"].append(n_edges)
                continue
            dedup = _resolve_dedup(cfg.dedup_impl, b * cfg.n_ent,
                                   caps.edge_caps[i], cfg.segment_impl)
            if windowed:
                # time-windowed expansion: each frontier node's in-window
                # edges are a contiguous CSR sub-row (rows sorted by
                # (head, time)); the self-loop is re-added as an extra slot
                valid_node = node_keys != SENTINEL
                ent = jnp.where(valid_node, node_keys % cfg.n_ent, 0)
                t_q = times[jnp.where(valid_node, node_keys // cfg.n_ent, 0)]
                lo = jnp.maximum(t_q - cfg.window, 0)
                if time_rowptr is not None:
                    # two gathers beat two vectorized binary searches by an
                    # order of magnitude on TPU (see CLAUDE.md perf notes)
                    w_start = time_rowptr[ent, lo]
                    w_end = time_rowptr[ent, t_q]
                else:
                    base = ent * cfg.time_key_base
                    w_start = jnp.searchsorted(
                        ekey, base + lo).astype(jnp.int32)
                    w_end = jnp.searchsorted(
                        ekey, base + t_q).astype(jnp.int32)
                deg = jnp.where(valid_node, w_end - w_start, 0)
                fr = expand_frontier_ranges(
                    graph.rel, graph.tail, cfg.n_ent, node_keys,
                    w_start, deg,
                    edge_cap=caps.edge_caps[i],
                    node_cap=caps.node_caps[i + 1],
                    extra_edge_slot=selfloop_slot[ent],
                    edge_mask_fn=edge_mask_fn,
                    dedup_impl=dedup,
                    key_space=b * cfg.n_ent,
                    etime=etime,
                    node_values=(hidden if dedup == "bitmap"
                                 and cfg.scan_src_backward else None),
                )
            else:
                fr = expand_frontier(
                    graph.rowptr, graph.rel, graph.tail, cfg.n_ent, node_keys,
                    edge_cap=caps.edge_caps[i],
                    node_cap=caps.node_caps[i + 1],
                    edge_mask_fn=edge_mask_fn,
                    dedup_impl=dedup,
                    key_space=b * cfg.n_ent,
                    etime=etime,
                    node_values=(hidden if dedup == "bitmap"
                                 and cfg.scan_src_backward else None),
                )
            rela = self.param(
                f"rela_embed_{i}", nn.initializers.xavier_uniform(),
                (cfg.n_rel_vocab, d),
            )
            a1_k = self.param(f"attn1_{i}", _uniform_init(),
                              (3 * d, cfg.attn_dim))
            a2_k = self.param(f"attn2_{i}", _uniform_init(),
                              (cfg.attn_dim, 1))
            use_dropout = cfg.mode == "interpolation" and train \
                and cfg.dropout > 0
            drop_rng = self.make_rng("dropout") if use_dropout else None
            node_cap_i = caps.node_caps[i + 1]

            def hop_fn(hidden, rela, a1_k, a2_k, src, dst, rel, batch,
                       edge_id, edge_valid, e_time, src_vals):
                if src_vals is not None:
                    # h_src came fused with the frontier's metadata gather
                    # (scatter-free range-difference backward)
                    hs = src_vals
                else:
                    hs = hidden[src]
                # take_rows: MXU one-hot backward for the relation table
                # and the per-query (B-row) lookup instead of per-edge
                # scatter-adds (falls back to scatter for huge E*R)
                if cfg.mxu_gather_backward:
                    hr = take_rows(rela, rel)
                    h_qr = take_rows(take_rows(rela, rels), batch)
                else:
                    hr = rela[rel]
                    h_qr = rela[rels][batch]

                t_e = e_time.astype(jnp.float32)
                t_q = times[batch].astype(jnp.float32)
                if cfg.mode == "interpolation":
                    delta = t_e - t_q
                else:
                    # Δ = τ_q − τ_edge ≥ 0; self-loops sit at the window
                    # floor (`model_cuda_new_embedding.py:170`)
                    delta = t_q - t_e
                    if cfg.window is not None:
                        floor_delta = jnp.minimum(t_q, float(cfg.window))
                        delta = jnp.where(rel == cfg.idd_rel, floor_delta,
                                          delta)

                msg = hs + hr
                if cfg.use_time:
                    if cfg.time_embedding == "periodic":
                        msg = msg + time_embed(delta)
                    else:
                        t_idx = jnp.clip(e_time, 0, (cfg.n_time or 1) - 1)
                        msg = msg + abs_table[t_idx]
                if cfg.mode == "interpolation":
                    transformed = jnp.where(
                        (delta > 0)[:, None], future(msg),
                        jnp.where((delta < 0)[:, None], past(msg), now(msg)),
                    )
                else:
                    transformed = past(msg)

                if cfg.use_attention:
                    pre = jnp.concatenate([hs, hr, h_qr], -1)
                    alpha = jax.nn.sigmoid(
                        jax.nn.relu(pre @ a1_k) @ a2_k)
                    message = transformed * alpha
                else:
                    alpha = jnp.ones((hs.shape[0], 1))
                    message = transformed
                message = jnp.where(edge_valid[:, None], message, 0.0)

                agg = segment_sum(message, dst, node_cap_i,
                                  indices_are_sorted=dedup == "sort",
                                  impl=cfg.segment_impl)
                if use_dropout:
                    keep = jax.random.bernoulli(
                        drop_rng, 1.0 - cfg.dropout, agg.shape)
                    agg = jnp.where(keep, agg / (1.0 - cfg.dropout), 0.0)
                out = TEMPORAL_ACTS[cfg.act](agg)
                if cfg.collect_alpha:
                    return out, alpha[:, 0]
                return out

            if cfg.remat:
                hop_fn = jax.checkpoint(hop_fn)
            edge_valid = fr.edge_valid
            if train and cfg.edge_dropout > 0:
                keep = jax.random.bernoulli(
                    self.make_rng("dropout"), 1.0 - cfg.edge_dropout,
                    edge_valid.shape)
                edge_valid = edge_valid & keep
            hidden = hop_fn(hidden, rela, a1_k, a2_k, fr.src, fr.dst,
                            fr.rel, fr.batch, fr.edge_id, edge_valid,
                            fr.time, fr.src_values)
            if cfg.collect_alpha:
                hidden, alpha_i = hidden
                aux.setdefault("alpha", []).append(alpha_i)
                aux.setdefault("alpha_rel", []).append(fr.rel)
                aux.setdefault("alpha_qrel", []).append(rels[fr.batch])
                aux.setdefault("alpha_valid", []).append(edge_valid)
            node_keys = fr.node_keys

            aux["edge_overflow"].append(fr.edge_overflow)
            aux["node_overflow"].append(fr.node_overflow)
            aux["num_nodes"].append(fr.num_nodes)
            aux["num_edges"].append(fr.num_edges)

        cls_w = self.param("classifier_w", _uniform_init(), (d, 1))
        cls_b = self.param("classifier_b", _uniform_init(d), (1,))
        if dense_state is not None:
            hidden_dense, visited = dense_state
            scores_all = (hidden_dense @ cls_w)[:, :, 0].T + cls_b[0]
            scores_all = jnp.where(visited.T, scores_all, 0.0)
        else:
            scores = (hidden @ cls_w + cls_b)[:, 0]

            valid = node_keys != SENTINEL
            batch_idx = jnp.where(valid, node_keys // cfg.n_ent, b)
            ent_idx = jnp.where(valid, node_keys % cfg.n_ent, 0)
            scores_all = jnp.zeros((b, cfg.n_ent)).at[batch_idx, ent_idx].set(
                jnp.where(valid, scores, 0.0), mode="drop"
            )

        if cfg.mode == "extrapolation":
            # normalized per-query distribution over the final frontier
            # (`model_cuda_new_embedding.py:248`), used by segment ranking
            seg_scores = segment_softmax(
                scores, jnp.minimum(batch_idx, b - 1), b, valid=valid
            )
            aux["frontier_softmax"] = seg_scores
            aux["frontier_keys"] = node_keys

        for k in ("edge_overflow", "node_overflow", "num_nodes", "num_edges"):
            aux[k] = jnp.stack(aux[k])
        return scores_all, aux

    # -- dense-mode hops ---------------------------------------------------
    def _to_dense(self, node_keys, hidden, b):
        """Sparse padded frontier -> batch-shared dense node state
        (n_ent, b, d) + visited mask (n_ent, b)."""
        cfg = self.cfg
        valid = node_keys != SENTINEL
        bidx = jnp.where(valid, node_keys // cfg.n_ent, b)  # b = dropped
        eidx = jnp.where(valid, node_keys % cfg.n_ent, 0)
        hidden_dense = jnp.zeros((cfg.n_ent, b, cfg.hidden_dim)).at[
            eidx, bidx].set(hidden, mode="drop")
        visited = jnp.zeros((cfg.n_ent, b), bool).at[eidx, bidx].set(
            valid, mode="drop")
        return hidden_dense, visited

    def _dense_hop(self, state, rela, a1_k, a2_k, rels, times, tsrc, trel,
                   ttime, ttail, tail_rowptr, excl_keep, time_embed,
                   abs_table, past, now, future, drop_rng, edrop_rng):
        """One propagation hop over the ENTIRE tail-sorted edge table,
        shared across the batch (saturated-frontier regime).

        Exactly the sparse hop's math (`model_cuda_new_embdding.py:147-202`)
        with three structural changes that remove the per-edge latency ops:
        edge metadata is read sequentially (no expansion gathers / dedup),
        per-edge work amortizes over b (ONE row gather of width b(d+1) per
        edge instead of b scalar-row gathers), and aggregation uses the
        STATIC per-tail ranges (sorted scatter / prefix range-diff, no
        dynamic segment discovery)."""
        cfg = self.cfg
        hidden_dense, visited = state
        d = cfg.hidden_dim
        b = hidden_dense.shape[1]
        e_all = tsrc.shape[0]

        # pack the visited bit as an extra channel: ONE gather serves both
        packed = jnp.concatenate(
            [hidden_dense, visited[:, :, None].astype(hidden_dense.dtype)],
            -1)                                      # (N, b, d+1)
        g = packed[tsrc]                             # (E, b, d+1)
        hs = g[..., :d]
        live = g[..., d] > 0.5                       # (E, b)

        if cfg.mxu_gather_backward:
            hr = take_rows(rela, trel)               # (E, d)
            h_qr = take_rows(rela, rels)             # (b, d)
        else:
            hr = rela[trel]
            h_qr = rela[rels]

        t_e = ttime.astype(jnp.float32)
        t_q = times.astype(jnp.float32)
        delta = t_e[:, None] - t_q[None, :]          # (E, b)

        msg = hs + hr[:, None, :]
        if cfg.use_time:
            if time_embed is not None:
                # Trig factorization: z = 2πf(t_e − t_q) = z_e − z_q, so
                #   cosΔ = cos_e·cos_q + sin_e·sin_q
                #   sinΔ = sin_e·cos_q − cos_e·sin_q
                # and relu-pre = cosΔ@W_c + sinΔ@W_s collapses to two
                # (E,K)x(b,K,d) einsums with tiny per-query factors — the
                # (E·b, 2K) feature tensor of the naive form (≈0.5 GB at
                # ICEWS14 scale) never materializes.
                k = cfg.n_frequencies
                freq, t_w, t_b = time_embed  # raw params in dense mode
                z_e = 2.0 * jnp.pi * t_e[:, None] * freq[None, :]
                z_q = 2.0 * jnp.pi * t_q[:, None] * freq[None, :]
                ce, se = jnp.cos(z_e), jnp.sin(z_e)      # (E, K)
                cq, sq = jnp.cos(z_q), jnp.sin(z_q)      # (b, K)
                w_c, w_s = t_w[:k], t_w[k:]              # (K, d) each
                p = cq[:, :, None] * w_c[None] - sq[:, :, None] * w_s[None]
                q = sq[:, :, None] * w_c[None] + cq[:, :, None] * w_s[None]
                h_pre = (jnp.einsum("ek,bkd->ebd", ce, p)
                         + jnp.einsum("ek,bkd->ebd", se, q))
                msg = msg + jax.nn.relu(h_pre + t_b)
            else:
                t_idx = jnp.clip(ttime, 0, (cfg.n_time or 1) - 1)
                msg = msg + abs_table[t_idx][:, None, :]
        transformed = jnp.where(
            (delta > 0)[..., None], future(msg),
            jnp.where((delta < 0)[..., None], past(msg), now(msg)))
        if cfg.use_attention:
            # split [hs ‖ hr ‖ h_qr] @ A1: the hr/h_qr terms amortize over
            # batch/edges; the (E,b,3d) concat never materializes
            pre = (hs @ a1_k[:d]
                   + (hr @ a1_k[d:2 * d])[:, None, :]
                   + (h_qr @ a1_k[2 * d:])[None, :, :])
            alpha = jax.nn.sigmoid(jax.nn.relu(pre) @ a2_k)
            message = transformed * alpha
        else:
            message = transformed
        keep = live
        if excl_keep is not None:
            keep = keep & excl_keep[:, None]
        if edrop_rng is not None:
            keep = keep & jax.random.bernoulli(
                edrop_rng, 1.0 - cfg.edge_dropout, keep.shape)
        message = jnp.where(keep[..., None], message, 0.0)

        if cfg.dense_agg == "cumsum":
            # range-diff of the prefix sum over static [start, end) spans
            pref = jnp.cumsum(message, axis=0)
            pref = jnp.concatenate(
                [jnp.zeros((1, b, d), pref.dtype), pref], 0)
            agg = pref[tail_rowptr[1:]] - pref[tail_rowptr[:-1]]
            cnt = jnp.cumsum(keep.astype(jnp.int32), axis=0)
            cnt = jnp.concatenate(
                [jnp.zeros((1, b), jnp.int32), cnt], 0)
            new_visited = (cnt[tail_rowptr[1:]]
                           - cnt[tail_rowptr[:-1]]) > 0
        else:
            # tail ids ascend -> XLA sorted scatter-add
            agg = segment_sum(message.reshape(e_all, b * d), ttail,
                              cfg.n_ent, indices_are_sorted=True,
                              impl="xla").reshape(cfg.n_ent, b, d)
            new_visited = segment_sum(
                keep.astype(jnp.float32), ttail, cfg.n_ent,
                indices_are_sorted=True, impl="xla") > 0
        if drop_rng is not None:
            keep_n = jax.random.bernoulli(drop_rng, 1.0 - cfg.dropout,
                                          agg.shape)
            agg = jnp.where(keep_n, agg / (1.0 - cfg.dropout), 0.0)
        h = TEMPORAL_ACTS[cfg.act](agg)
        h = jnp.where(new_visited[..., None], h, 0.0)
        n_nodes = jnp.sum(new_visited.astype(jnp.int32))
        n_edges = jnp.sum(keep.astype(jnp.int32))
        return (h, new_visited), n_nodes, n_edges
