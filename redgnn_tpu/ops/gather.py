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
    silently mis-sums gradients).

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
