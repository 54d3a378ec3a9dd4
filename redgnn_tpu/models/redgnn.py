"""RED-GNN: query-dependent relational digraph propagation, one XLA program.

Capability parity with `RED_GNN_trans` (`Static/transductive/models.py:45-89`)
and `RED_GNN_induc` (`Static/inductive/models.py:45-89`), re-architected for
TPU: the reference calls back into the host data loader once per hop
(`models.py:78`); here the L-hop loop — expansion, attention, aggregation,
gating, scoring — is traced once with static per-hop capacities and runs
entirely on device.

Entities never reached within L hops score 0 (`models.py:86-88`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from redgnn_tpu.graph.calibrate import FrontierCaps
from redgnn_tpu.graph.kg import DeviceGraph
from redgnn_tpu.models.layers import GRUGate, RelAttnLayer, _uniform_init
from redgnn_tpu.ops.frontier import (
    SENTINEL,
    align_old_to_new,
    expand_frontier,
)


@dataclass(frozen=True)
class ModelConfig:
    n_ent: int
    n_rel: int
    hidden_dim: int = 48
    attn_dim: int = 5
    n_layer: int = 3
    dropout: float = 0.29
    act: str = "relu"
    segment_impl: str = "xla"
    compute_dtype: str = "float32"
    # node-dedup scheme per hop: 'sort' (argsort over edge keys; edges come
    # out dst-sorted), 'bitmap' (presence bitmap + prefix sum over B*n_ent;
    # no device sort), or 'auto' — bitmap whenever the key space is small
    # relative to the edge sort volume (see _resolve_dedup).
    dedup_impl: str = "auto"
    # edge-parallel propagation (set inside shard_map; SURVEY.md §5)
    edge_axis: str | None = None
    edge_shards: int = 1
    # MXU one-hot backward for small-table gathers (ops/gather.take_rows).
    # Must be OFF inside ANY shard_map: the vma checker cannot statically
    # infer the custom VJP's replication (parallel/shard.py clears it).
    mxu_gather_backward: bool = True
    # Fuse the hidden[src] gather into the frontier's metadata row gather
    # (one packed gather instead of two) and differentiate it as a
    # scatter-free range difference of the gradient prefix sum
    # (ops/gather.gather_rows_packed). Bitmap-dedup hops only; same
    # shard_map restriction as above. Grad noise O(total*eps) — set False
    # for strict grad-parity checks.
    scan_src_backward: bool = True
    # DENSE-mode hops: once a hop's sparse edge cap approaches b x |edges|
    # the frontier has saturated — switch to a batch-shared (n_ent, b, d)
    # node layout over the static tail-sorted table (no expansion gathers,
    # no dedup, static aggregation ranges). Same design as the temporal
    # model's dense hops (measured there: ~10 latency-bound E-wide ops per
    # sparse hop -> 2). Requires graph.tsrc (DeviceGraph.from_csr).
    dense_hops: bool = True
    dense_switch: float = 0.25
    dense_agg: str = "sorted_scatter"


def _resolve_dedup(dedup_impl: str, key_space: int, edge_cap: int,
                   segment_impl: str = "xla") -> str:
    """Pick the cheaper dedup scheme for one hop.

    The bitmap costs O(key_space) sequential cumsum work; the sort costs
    O(E log E) with ~5x larger per-element constants (multi-pass radix over
    int32 keys plus the payload permutation gathers). Crossover measured on
    v5e: bitmap wins until key_space exceeds ~16x the edge capacity.

    The 'scan' and 'pallas' segment implementations require dst-sorted
    edges, which only the sort dedup provides — they force 'sort'
    (explicitly requesting bitmap with them is a config error).
    """
    needs_sorted = segment_impl in ("scan", "pallas")
    if dedup_impl == "auto":
        if needs_sorted:
            return "sort"
        return "bitmap" if key_space <= 16 * edge_cap else "sort"
    if dedup_impl not in ("sort", "bitmap"):
        raise ValueError(
            f"dedup_impl must be 'sort', 'bitmap' or 'auto', got "
            f"{dedup_impl!r}")
    if needs_sorted and dedup_impl == "bitmap":
        raise ValueError(
            f"segment_impl={segment_impl!r} requires dst-sorted edges; "
            "use dedup_impl='sort' (or 'auto')")
    return dedup_impl


class RedGNN(nn.Module):
    """L-hop frontier propagation scoring every reached entity."""

    cfg: ModelConfig

    @nn.compact
    def __call__(
        self,
        graph: DeviceGraph,
        subs: jnp.ndarray,     # (B,) query head entities
        rels: jnp.ndarray,     # (B,) query relations
        qmask: jnp.ndarray,    # (B,) bool — false for padded queries
        caps: FrontierCaps,
        train: bool = False,
    ) -> Tuple[jnp.ndarray, Dict[str, Any]]:
        cfg = self.cfg
        b = subs.shape[0]
        d = cfg.hidden_dim

        # initial frontier: one node per query, key = b * n_ent + head
        keys0 = subs.astype(jnp.int32) + jnp.arange(b, dtype=jnp.int32) * cfg.n_ent
        node_keys = jnp.where(qmask, keys0, SENTINEL)
        hidden = jnp.zeros((b, d))
        h0 = jnp.zeros((b, d))

        gate = GRUGate(cfg.hidden_dim, name="gate")
        aux: Dict[str, Any] = {"edge_overflow": [], "node_overflow": [],
                               "num_nodes": [], "num_edges": []}

        # dense-mode plan (trace-time; see ModelConfig.dense_hops)
        dense_from = None
        if (cfg.dense_hops and graph.has_dense
                and cfg.edge_axis is None):
            n_all_edges = int(graph.tail.shape[0])
            for i in range(cfg.n_layer):
                if caps.edge_caps[i] >= cfg.dense_switch * b * n_all_edges:
                    dense_from = i
                    break
        dense_state = None  # (hidden (N,b,d), visited (N,b))

        for i in range(cfg.n_layer):
            layer_i = RelAttnLayer(
                hidden_dim=cfg.hidden_dim,
                attn_dim=cfg.attn_dim,
                n_rel=cfg.n_rel,
                act=cfg.act,
                segment_impl=cfg.segment_impl,
                compute_dtype=cfg.compute_dtype,
                edge_axis=cfg.edge_axis,
                edge_shards=cfg.edge_shards,
                mxu_gather_backward=cfg.mxu_gather_backward,
                name=f"layer_{i}",
            ) if dense_from is not None and i >= dense_from else None
            if layer_i is not None:
                if dense_state is None:
                    valid = node_keys != SENTINEL
                    bidx = jnp.where(valid, node_keys // cfg.n_ent, b)
                    eidx = jnp.where(valid, node_keys % cfg.n_ent, 0)
                    hd = jnp.zeros((cfg.n_ent, b, d)).at[eidx, bidx].set(
                        hidden, mode="drop")
                    vis = jnp.zeros((cfg.n_ent, b), bool).at[
                        eidx, bidx].set(valid, mode="drop")
                    dense_state = (hd, vis)
                hd, vis = dense_state
                new_hidden, new_vis, n_live = layer_i.dense(
                    hd, vis, rels, graph.tsrc, graph.trel, graph.ttail,
                    graph.tail_rowptr, cfg.dense_agg)
                new_hidden = nn.Dropout(
                    cfg.dropout, deterministic=not train)(new_hidden)
                # GRU carry: hd is zero at never-visited nodes, exactly
                # the align_old_to_new semantics (new nodes start at 0)
                hdn = gate(new_hidden, hd)
                hdn = jnp.where(new_vis[..., None], hdn, 0.0)
                dense_state = (hdn, new_vis)
                aux["edge_overflow"].append(jnp.zeros((), bool))
                aux["node_overflow"].append(jnp.zeros((), bool))
                aux["num_nodes"].append(jnp.sum(new_vis.astype(jnp.int32)))
                aux["num_edges"].append(n_live)
                continue
            dedup = _resolve_dedup(cfg.dedup_impl, b * cfg.n_ent,
                                   caps.edge_caps[i], cfg.segment_impl)
            fr = expand_frontier(
                graph.rowptr, graph.rel, graph.tail,
                cfg.n_ent, node_keys,
                edge_cap=caps.edge_caps[i],
                node_cap=caps.node_caps[i + 1],
                dedup_impl=dedup,
                key_space=b * cfg.n_ent,
                # fetch h_src inside the expansion's metadata row gather
                # (one fused gather instead of two; prefix-sum backward)
                node_values=(hidden if dedup == "bitmap"
                             and cfg.scan_src_backward else None),
            )
            layer = RelAttnLayer(
                hidden_dim=cfg.hidden_dim,
                attn_dim=cfg.attn_dim,
                n_rel=cfg.n_rel,
                act=cfg.act,
                segment_impl=cfg.segment_impl,
                compute_dtype=cfg.compute_dtype,
                edge_axis=cfg.edge_axis,
                edge_shards=cfg.edge_shards,
                edges_sorted=(dedup == "sort"),
                mxu_gather_backward=cfg.mxu_gather_backward,
                name=f"layer_{i}",
            )
            new_hidden = layer(hidden, rels, fr, caps.node_caps[i + 1])
            # carry GRU state: previous nodes keep h0, new nodes start at 0
            h0 = align_old_to_new(node_keys, fr.node_keys, h0,
                                  caps.node_caps[i + 1],
                                  key_prefix=fr.key_prefix)
            new_hidden = nn.Dropout(cfg.dropout, deterministic=not train)(
                new_hidden
            )
            hidden = gate(new_hidden, h0)
            h0 = hidden
            node_keys = fr.node_keys

            aux["edge_overflow"].append(fr.edge_overflow)
            aux["node_overflow"].append(fr.node_overflow)
            aux["num_nodes"].append(fr.num_nodes)
            aux["num_edges"].append(fr.num_edges)

        w_final = nn.Dense(1, use_bias=False, kernel_init=_uniform_init(),
                           name="W_final")
        if dense_state is not None:
            hd, vis = dense_state
            scores_all = w_final(hd)[:, :, 0].T    # (b, n_ent)
            scores_all = jnp.where(vis.T, scores_all, 0.0)
        else:
            scores = w_final(hidden)[:, 0]  # (node_cap_L,)

            valid = node_keys != SENTINEL
            batch_idx = jnp.where(valid, node_keys // cfg.n_ent, b)
            ent_idx = jnp.where(valid, node_keys % cfg.n_ent, 0)
            scores_all = jnp.zeros((b, cfg.n_ent)).at[
                batch_idx, ent_idx].set(
                jnp.where(valid, scores, 0.0), mode="drop"
            )

        for k in ("edge_overflow", "node_overflow"):
            aux[k] = jnp.stack(aux[k])
        for k in ("num_nodes", "num_edges"):
            aux[k] = jnp.stack(aux[k])
        return scores_all, aux
