"""Propagation building blocks: relation-conditioned attention + GRU gate.

Math parity targets (re-derived, not translated):
  * `GNNLayer.forward` (`Static/transductive/models.py:23-42`):
        message  m_e = h_src + h_rel
        alpha_e  = sigmoid(w_a . ReLU(W_s h_src + W_r h_rel + W_q h_qrel + b_q) + b_a)
        agg_v    = sum over edges e with dst(e)=v of alpha_e * m_e
        h'_v     = act(W_h agg_v)
  * the inter-hop GRU gate (`Static/transductive/models.py:63,81-84`), a
    1-step cuDNN GRU in the reference — here an explicit GRU cell (the
    hidden dims are 16-64; this is VPU work, not MXU work).

All edge arrays are padded/sorted by the frontier op; invalid edges carry
zero messages so the sorted segment-sum stays exact.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from flax import linen as nn

from redgnn_tpu.ops.frontier import Frontier
from redgnn_tpu.ops.gather import take_rows
from redgnn_tpu.ops.segment import segment_sum

ACTIVATIONS: dict[str, Callable] = {
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "idd": lambda x: x,
}


def _uniform_init(fan_in: int | None = None):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — the torch nn.Linear/GRU default,
    kept so hyperparameters tuned against the reference transfer.

    For 2-D kernels the fan-in is ``shape[0]`` (flax kernels are
    (in, out)). For 1-D biases torch scales by the WEIGHT's in_features,
    which a bias shape cannot reveal — pass ``fan_in`` explicitly."""

    def init(key, shape, dtype=jnp.float32):
        f = fan_in if fan_in is not None else shape[0]
        bound = 1.0 / jnp.sqrt(jnp.asarray(f, jnp.float32))
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class RelAttnLayer(nn.Module):
    """One hop of query-conditioned relational attention propagation.

    When ``edge_axis`` is set (inside a shard_map over a device mesh), the
    padded edge list is sliced across that mesh axis: each chip computes
    attention + messages for ``edge_cap / edge_shards`` edges and a partial
    segment-sum; a psum over ``edge_axis`` reassembles the per-node
    aggregates. This is the edge-parallel propagation of SURVEY.md §5.
    """

    hidden_dim: int
    attn_dim: int
    n_rel: int  # raw relation count; table holds 2*n_rel+1 (inverse + idd)
    act: str = "relu"
    segment_impl: str = "xla"
    edge_axis: str | None = None
    edge_shards: int = 1
    compute_dtype: str = "float32"  # "bfloat16" halves gather/VPU traffic
    edges_sorted: bool = True  # frontier emitted dst-sorted (dedup='sort')
    mxu_gather_backward: bool = True  # take_rows (off inside shard_map)

    def setup(self):
        # setup-style (not @nn.compact) so the sparse __call__ and the
        # dense() hop share one parameter set with unchanged names
        self.rela_embed = self.param(
            "rela_embed",
            nn.initializers.normal(1.0),
            (2 * self.n_rel + 1, self.hidden_dim),
        )
        self.ws = nn.Dense(self.attn_dim, use_bias=False,
                           kernel_init=_uniform_init(), name="Ws_attn")
        self.wr = nn.Dense(self.attn_dim, use_bias=False,
                           kernel_init=_uniform_init(), name="Wr_attn")
        self.wqr = nn.Dense(self.attn_dim, use_bias=True,
                            kernel_init=_uniform_init(),
                            bias_init=_uniform_init(self.hidden_dim),
                            name="Wqr_attn")
        self.w_alpha = nn.Dense(1, use_bias=True,
                                kernel_init=_uniform_init(),
                                bias_init=_uniform_init(self.attn_dim),
                                name="w_alpha")
        self.w_h = nn.Dense(self.hidden_dim, use_bias=False,
                            kernel_init=_uniform_init(), name="W_h")

    def __call__(
        self,
        hidden_prev: jnp.ndarray,  # (prev_cap, D)
        q_rel: jnp.ndarray,        # (B,) query relation per batch element
        frontier: Frontier,
        node_cap: int,
    ) -> jnp.ndarray:
        rela_embed = self.rela_embed
        ws, wr, wqr = self.ws, self.wr, self.wqr
        w_alpha, w_h = self.w_alpha, self.w_h

        src, dst, rel, batch, valid = (
            frontier.src, frontier.dst, frontier.rel, frontier.batch,
            frontier.edge_valid,
        )
        if self.edge_axis is not None and self.edge_shards > 1:
            # Slice this chip's chunk of the (replicated) edge list.
            chunk = src.shape[0] // self.edge_shards
            start = jax.lax.axis_index(self.edge_axis) * chunk
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, start, chunk)
            src, dst, rel, batch, valid = map(sl, (src, dst, rel, batch, valid))

        cdt = jnp.dtype(self.compute_dtype)
        hidden_c = hidden_prev.astype(cdt)
        rela_c = rela_embed.astype(cdt)
        # Row gathers; the relation-table and per-query lookups use
        # take_rows so their backward is an MXU one-hot contraction
        # instead of a latency-bound per-edge scatter-add. Inside ANY
        # shard_map (data- or edge-sharded) the custom VJP's replication
        # can't be statically inferred by the vma checker, so those paths
        # keep the plain gathers (parallel/shard.py clears the flag).
        if frontier.src_values is not None and self.edge_axis is None:
            # h_src was fetched inside the frontier's fused metadata
            # gather, whose backward is a scatter-free range difference
            # of the gradient prefix sum (ops/gather.gather_rows_packed)
            hs = frontier.src_values.astype(cdt)     # (E, D)
        else:
            hs = hidden_c[src]                       # (E, D)
        if self.mxu_gather_backward and self.edge_axis is None:
            hr = take_rows(rela_c, rel)              # (E, D)
            h_qr = take_rows(take_rows(rela_c, q_rel), batch)
        else:
            hr = rela_c[rel]
            h_qr = rela_c[q_rel][batch]

        logits = w_alpha(jax.nn.relu(ws(hs) + wr(hr) + wqr(h_qr)))
        alpha = jax.nn.sigmoid(logits.astype(jnp.float32))
        # accumulate in fp32 regardless of compute dtype (segment sums of
        # up to ~10^6 messages)
        message = (hs + hr).astype(jnp.float32) * alpha
        message = jnp.where(valid[:, None], message, 0.0)

        agg = segment_sum(
            message,
            dst,
            num_segments=node_cap,
            indices_are_sorted=self.edges_sorted,
            impl=self.segment_impl,
        )
        if self.edge_axis is not None and self.edge_shards > 1:
            agg = jax.lax.psum(agg, self.edge_axis)
        return ACTIVATIONS[self.act](w_h(agg))

    def dense(self, hidden_dense, visited, q_rel, tsrc, trel, ttail,
              tail_rowptr, dense_agg: str = "sorted_scatter"):
        """One hop over the ENTIRE tail-sorted edge table, batch-shared
        (saturated-frontier regime; design notes in models/temporal.py).

        hidden_dense: (n_ent, b, d); visited: (n_ent, b) bool.
        Returns (act(W_h agg) (n_ent, b, d), new_visited (n_ent, b),
        live-edge count)."""
        d = self.hidden_dim
        n, b = visited.shape
        e_all = tsrc.shape[0]
        cdt = jnp.dtype(self.compute_dtype)

        # pack the visited bit: ONE row gather per edge serves the batch
        packed = jnp.concatenate(
            [hidden_dense.astype(cdt),
             visited[:, :, None].astype(cdt)], -1)   # (N, b, d+1)
        g = packed[tsrc]                              # (E, b, d+1)
        hs = g[..., :d]
        live = g[..., d] > 0.5                        # (E, b)

        rela_c = self.rela_embed.astype(cdt)
        hr = (take_rows(rela_c, trel) if self.mxu_gather_backward
              else rela_c[trel])                      # (E, d)
        h_qr = rela_c[q_rel]                          # (b, d)

        # attention terms factor: hr/h_qr projections amortize over
        # batch/edges; no (E, b, 3d) concat materializes
        logits = self.w_alpha(jax.nn.relu(
            self.ws(hs) + self.wr(hr)[:, None, :]
            + self.wqr(h_qr)[None, :, :]))
        alpha = jax.nn.sigmoid(logits.astype(jnp.float32))
        message = (hs + hr[:, None, :]).astype(jnp.float32) * alpha
        message = jnp.where(live[..., None], message, 0.0)

        if dense_agg == "cumsum":
            pref = jnp.cumsum(message, axis=0)
            pref = jnp.concatenate(
                [jnp.zeros((1, b, d), pref.dtype), pref], 0)
            agg = pref[tail_rowptr[1:]] - pref[tail_rowptr[:-1]]
            cnt = jnp.cumsum(live.astype(jnp.int32), axis=0)
            cnt = jnp.concatenate([jnp.zeros((1, b), jnp.int32), cnt], 0)
            new_visited = (cnt[tail_rowptr[1:]]
                           - cnt[tail_rowptr[:-1]]) > 0
        else:
            agg = segment_sum(message.reshape(e_all, b * d), ttail, n,
                              indices_are_sorted=True,
                              impl="xla").reshape(n, b, d)
            new_visited = segment_sum(
                live.astype(jnp.float32), ttail, n,
                indices_are_sorted=True, impl="xla") > 0
        n_live = jnp.sum(live.astype(jnp.int32))
        return ACTIVATIONS[self.act](self.w_h(agg)), new_visited, n_live


class GRUGate(nn.Module):
    """Single-step GRU carrying node state across hops.

    Matches the torch GRU gate equations (two bias vectors) so tuned
    hyperparameters transfer:
        r = sigmoid(x W_ir + b_ir + h W_hr + b_hr)
        z = sigmoid(x W_iz + b_iz + h W_hz + b_hz)
        n = tanh(x W_in + b_in + r * (h W_hn + b_hn))
        h' = (1 - z) * n + z * h
    """

    hidden_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
        d = self.hidden_dim
        w_ih = self.param("w_ih", _uniform_init(), (d, 3 * d))
        w_hh = self.param("w_hh", _uniform_init(), (d, 3 * d))
        b_ih = self.param("b_ih", _uniform_init(d), (3 * d,))
        b_hh = self.param("b_hh", _uniform_init(d), (3 * d,))

        gi = x @ w_ih + b_ih
        gh = h @ w_hh + b_hh
        i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        return (1.0 - z) * n + z * h
