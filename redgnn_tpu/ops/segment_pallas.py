"""Pallas TPU kernel: sorted-segment sum via one-hot MXU accumulation.

Replaces the torch_scatter CUDA scatter-sum hot kernel
(`Static/transductive/models.py:39`) with a TPU-native design:

  * edges arrive SORTED by destination segment (guaranteed by
    ops.frontier.expand_frontier), so the edges feeding any block of
    output nodes form a contiguous range;
  * scatter on TPU is slow (serialized HBM read-modify-write), but matmul
    is nearly free: for an edge chunk and a node block, the partial
    aggregate is ``onehot(local_dst).T @ messages`` — a (CHUNK x BN) x
    (CHUNK x D) contraction that runs on the MXU at full tilt;
  * the grid is (node_blocks, max_chunks); per-block edge ranges are
    computed with two vectorized searchsorteds and passed as
    scalar-prefetch arguments so the BlockSpec index_map can DMA exactly
    the needed edge chunks. Off-range iterations clamp to a repeated
    block index, which Pallas skips re-fetching, and are predicated off.

The backward pass of segment-sum is a gather (``dout[seg]``) — XLA's
native gather is already bandwidth-optimal, so the custom VJP uses it.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Default edge rows per DMA chunk and nodes per output block. Round-1
# shipped 256x128, which is grid-overhead-bound (~1.6us/iteration across
# thousands of tiny blocks); the round-2 sweep picks larger tiles.
CHUNK = 1024
BN = 512


def _make_kernel(chunk, bn):
    def _kernel(chunk0_ref, nchunks_ref, seg_ref, data_ref, out_ref,
                acc_ref):
        j = pl.program_id(0)
        k = pl.program_id(1)
        kmax = pl.num_programs(1)

        @pl.when(k == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        @pl.when(k < nchunks_ref[j])
        def _():
            seg = seg_ref[...]          # (chunk, 1) int32
            data = data_ref[...]        # (chunk, D)
            local = seg - j * bn        # local node ids within this block
            col = jax.lax.broadcasted_iota(jnp.int32, (chunk, bn), 1)
            onehot = (local == col).astype(jnp.float32)  # (chunk, bn)
            acc_ref[...] += jax.lax.dot_general(
                onehot, data,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(k == kmax - 1)
        def _():
            out_ref[...] = acc_ref[...]

    return _kernel


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def segment_sum_pallas(data: jnp.ndarray, segment_ids: jnp.ndarray,
                       num_segments: int,
                       kmax: int | None = None) -> jnp.ndarray:
    """Sum rows of ``data`` by sorted ``segment_ids`` into ``num_segments``.

    Requirements: segment_ids sorted ascending; rows whose contribution
    must vanish should carry zero data (out-of-range ids also work — they
    fall outside every block's local window).

    ``kmax`` statically bounds the edge chunks any single node block may
    consume. None = exact worst case (every chunk); for balanced segment
    distributions pass ~4x the mean via `default_kmax` — blocks needing
    more are detected by `segment_sum_pallas_checked`'s overflow flag and
    handled by the caller's recompile-and-grow machinery (same philosophy
    as the frontier capacity buckets).
    """
    out, _ = _segment_sum_fwd_impl(data, segment_ids, num_segments, kmax)
    return out


def default_kmax(edge_cap: int, num_segments: int, skew: float = 4.0,
                 chunk: int = CHUNK, bn: int = BN) -> int:
    """Static chunk budget per node block for balanced-ish segments."""
    nb = max(1, -(-num_segments // bn))
    mean_chunks = -(-edge_cap // (nb * chunk))
    return min(-(-edge_cap // chunk), int(mean_chunks * skew) + 2)


def _segment_sum_fwd_impl(data, segment_ids, num_segments, kmax=None,
                          chunk: int = None, bn: int = None):
    CHUNK = chunk or globals()["CHUNK"]
    BN = bn or globals()["BN"]
    e, d = data.shape
    n = num_segments
    n_pad = pl.cdiv(n, BN) * BN
    e_pad = pl.cdiv(e, CHUNK) * CHUNK
    if e_pad != e:
        data = jnp.pad(data, ((0, e_pad - e), (0, 0)))
        # padding edges go to an out-of-range segment
        segment_ids = jnp.pad(segment_ids, (0, e_pad - e),
                              constant_values=n_pad + BN)
    nb = n_pad // BN
    total_chunks = e_pad // CHUNK

    # Per node-block edge range [start, end) via binary search on the
    # sorted segment ids, then covering chunk-aligned window.
    block_lo = jnp.arange(nb, dtype=jnp.int32) * BN
    starts = jnp.searchsorted(segment_ids, block_lo, side="left")
    ends = jnp.searchsorted(segment_ids, block_lo + BN, side="left")
    chunk0 = (starts // CHUNK).astype(jnp.int32)
    chunk1 = jnp.where(ends > starts, (ends - 1) // CHUNK, chunk0 - 1)
    nchunks = (chunk1 - chunk0 + 1).astype(jnp.int32)
    overflow = jnp.any(nchunks > (kmax if kmax else total_chunks))
    kmax = int(kmax) if kmax else int(total_chunks)
    nchunks = jnp.minimum(nchunks, kmax)

    seg2d = segment_ids.astype(jnp.int32).reshape(e_pad, 1)

    def chunk_index(j, k, chunk0, nchunks):
        return (jnp.minimum(chunk0[j] + k, total_chunks - 1), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb, kmax),
        in_specs=[
            pl.BlockSpec((CHUNK, 1), index_map=chunk_index),
            pl.BlockSpec((CHUNK, d), index_map=chunk_index),
        ],
        out_specs=pl.BlockSpec(
            (BN, d), index_map=lambda j, k, chunk0, nchunks: (j, 0)
        ),
        scratch_shapes=[pltpu.VMEM((BN, d), jnp.float32)],
    )

    out = pl.pallas_call(
        _make_kernel(CHUNK, BN),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        interpret=jax.default_backend() == "cpu",
    )(chunk0, nchunks, seg2d, data.astype(jnp.float32))
    return out[:n], overflow


def segment_sum_pallas_checked(data, segment_ids, num_segments,
                               kmax: int | None = None,
                               chunk: int = None, bn: int = None):
    """(out, overflow) — overflow means some block exceeded ``kmax`` and
    its tail chunks were dropped; the caller must grow kmax + recompile
    (the trainers' standard replay path)."""
    return _segment_sum_fwd_impl(data, segment_ids, num_segments, kmax,
                                 chunk, bn)


def _fwd(data, segment_ids, num_segments, kmax):
    out, _ = _segment_sum_fwd_impl(data, segment_ids, num_segments, kmax)
    return out, (segment_ids, data.shape[0])


def _bwd(num_segments, kmax, res, g):
    segment_ids, e = res
    safe = jnp.minimum(segment_ids[:e], num_segments - 1)
    d_data = g[safe]
    d_data = jnp.where((segment_ids[:e] < num_segments)[:, None], d_data, 0.0)
    return d_data, None


segment_sum_pallas.defvjp(_fwd, _bwd)
