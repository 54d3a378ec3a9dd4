"""Gather with an MXU-friendly backward for small tables.

The reference's per-edge embedding lookups (`rela_embed[rel]` etc. at
`Static/transductive/models.py:29-33`) autodiff to scatter-adds of one row
per edge. On TPU a scatter-add runs latency-bound (~7ns/row measured on
v5e — ~25x below HBM bandwidth), while the equivalent contraction
``one_hot(idx).T @ grad`` runs on the MXU in a few microseconds when the
table is small. ``take_rows`` keeps the forward as XLA's native gather and
swaps the backward for that contraction whenever the one-hot fits a modest
buffer; larger tables fall back to the standard segment-sum scatter.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from redgnn_tpu.ops.segment import _segment_sum_scan

# Largest fp32 one-hot (elements) the matmul backward may materialize.
# 32M elements = 128 MB — comfortably inside v5e HBM headroom and far
# cheaper than the latency-bound scatter it replaces.
_ONEHOT_BUDGET = 32 * 1024 * 1024


@jax.custom_vjp
def take_rows(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` with a matmul backward for small ``table``.

    Args:
      table: (R, D) float array.
      idx: int array of any shape with values in [0, R).
    """
    return table[idx]


def _fwd(table, idx):
    return table[idx], (idx, table.shape)


def _bwd(res, g):
    idx, shape = res
    r = shape[0]
    flat_idx = idx.reshape(-1)
    flat_g = g.reshape(flat_idx.shape[0], -1)
    if flat_idx.shape[0] * r <= _ONEHOT_BUDGET:
        onehot = (flat_idx[:, None] == jnp.arange(r, dtype=flat_idx.dtype)
                  [None, :]).astype(flat_g.dtype)
        d_table = jax.lax.dot_general(
            onehot, flat_g, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(flat_g.dtype)
    else:
        d_table = jax.ops.segment_sum(flat_g, flat_idx, num_segments=r)
    return d_table.reshape(shape), None


take_rows.defvjp(_fwd, _bwd)


@jax.custom_vjp
def take_rows_sorted(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``table[idx]`` for NON-DECREASING ``idx``, with a prefix-sum backward.

    The autodiff backward of a gather is a scatter-add of one row per index
    — latency-bound at ~7-9ns/row on v5e (~600us at E=66.5k). When the
    index vector is sorted, that scatter is a sorted-segment sum, which the
    cumsum + boundary-difference formulation computes in ~150us (log-depth
    vectorized scans; see ops/segment._segment_sum_scan).

    The frontier emits exactly such indices in bitmap-dedup mode:
    ``src = cummax(slot markers)`` is non-decreasing by construction
    (ops/frontier.py expansion order), so the per-hop ``hidden[src]``
    gather — the reference's `hidden.index_select`-equivalent at
    `Static/transductive/models.py:29` — qualifies.

    Caveats: same O(total_magnitude * eps) prefix-cancellation noise in the
    gradient as segment_sum(impl='scan') — fine for training, not for
    strict grad-parity tests. Sortedness is NOT checked (a wrong claim
    silently mis-sums gradients). MEASURED SLOWER than the plain gather
    in the family train step (8.45M vs 9.22M edges/s): locating segment
    ends costs an E-wide scatter-max inside _segment_sum_scan. Prefer
    gather_rows_packed when the caller knows the explicit per-row ranges
    (the frontier does) — its backward has no edge-length scatter at all.

    Args:
      table: (R, D) float array.
      idx: (E,) int array, non-decreasing, values in [0, R).
    """
    return table[idx]


def _fwd_sorted(table, idx):
    return table[idx], (idx, table.shape[0])


def _bwd_sorted(res, g):
    idx, r = res
    flat_g = g.reshape(idx.shape[0], -1)
    d_table = _segment_sum_scan(flat_g, idx, r)
    return d_table.reshape((r,) + g.shape[1:]).astype(g.dtype), None


take_rows_sorted.defvjp(_fwd_sorted, _bwd_sorted)


def _gather_packed_impl(meta, values, idx):
    if values.dtype != jnp.float32:
        raise TypeError("gather_rows_packed requires float32 values "
                        f"(got {values.dtype}); 32-bit lanes bitcast 1:1")
    packed = jnp.concatenate(
        [meta, jax.lax.bitcast_convert_type(values, jnp.int32)], axis=1)
    rows = packed[idx]
    m = meta.shape[1]
    return rows[:, :m], jax.lax.bitcast_convert_type(rows[:, m:],
                                                     jnp.float32)


@jax.custom_vjp
def gather_rows_packed(
    meta: jnp.ndarray,
    values: jnp.ndarray,
    idx: jnp.ndarray,
    start: jnp.ndarray,
    count: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fused row gather of an int32 ``meta`` table and an f32 ``values``
    table at a shared index vector with CSR-range structure.

    Forward: row gathers are latency-bound on v5e (~7ns/row,
    width-independent up to ~48 lanes) — two gathers with the same index
    vector cost twice what one (M+D)-wide gather does, so the float rows
    are bitcast into the int table and fetched together.

    Backward: the autodiff backward of a gather is a scatter-add of one
    row per index (latency-bound again, ~600us at E=66.5k). Here the
    caller — frontier expansion, ops/frontier.py — KNOWS the layout of
    ``idx``: row ``v`` of the tables is referenced by exactly the
    contiguous index slots ``[start[v], start[v]+count[v])`` (expansion
    order). The cotangent of ``values`` is then a pure range difference
    of the gradient's prefix sum:

        P = cumsum(g); d_values[v] = P[start+count-1] - P[start-1]

    — one log-depth cumsum plus two small node-side row gathers, with no
    edge-length scatter anywhere. (A generic sorted-segment backward
    still needs an E-wide scatter-max to locate segment ends; the
    explicit ranges eliminate even that.)

    Index slots outside every range (the padded tail, where the frontier
    holds ``idx`` at its last value) must carry zero gradient — true for
    frontier pads, whose messages are masked to zero. Ranges clipped by
    ``edge_cap`` degrade exactly: out-of-bounds positions clamp to the
    last slot and contribute P[last]-P[last] = 0. Prefix cancellation
    adds O(total_magnitude*eps) noise — fine for training.

    Args:
      meta: (P, M) int32 per-node metadata table.
      values: (P, D) float32 per-node values (differentiable).
      idx: (E,) int32, non-decreasing, in [0, P).
      start: (P,) int32 — first index slot owned by each row.
      count: (P,) int32 — number of slots owned by each row (0 for pads).

    Returns ``(meta[idx], values[idx])``.
    """
    return _gather_packed_impl(meta, values, idx)


def _gp_fwd(meta, values, idx, start, count):
    out = _gather_packed_impl(meta, values, idx)
    return out, (start, count)


def _gp_bwd(res, g):
    start, count = res
    _, g_vals = g
    e_cap = g_vals.shape[0]
    p = jnp.cumsum(g_vals.astype(jnp.float32), axis=0)
    last = jnp.clip(start + count - 1, 0, e_cap - 1)
    prev = jnp.clip(start - 1, 0, e_cap - 1)
    pe = jnp.where((count > 0)[:, None], p[last], 0.0)
    ps = jnp.where(((count > 0) & (start > 0))[:, None], p[prev], 0.0)
    return None, pe - ps, None, None, None


gather_rows_packed.defvjp(_gp_fwd, _gp_bwd)
