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
