"""On-device filtered ranking with exact reference tie semantics.

The reference ranks on the host with scipy
(`Static/transductive/utils.py:7-14`):

    scores     = scores - min(scores, axis=1) + 1e-8
    full_rank  = rankdata(-scores, method='average', axis=1)
    filter_rank= rankdata(-(scores * filters), method='min', axis=1)
    rank(a)    = full_rank(a) - filter_rank(a) + 1     for each answer a

Both rankdata calls reduce to counting, per candidate value v:
    average rank = #(s > v) + (#(s == v) + 1) / 2
    min rank     = #(s > v) + 1
which we evaluate for *all* entities at once with two sorted arrays and
vectorized binary searches — O(n log n) per query row, entirely on device
(the reference does an O(n log n) host sort *plus* a device->host copy of
the full score matrix).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def filtered_rank_all(
    scores: jnp.ndarray,   # (B, n_ent) raw model scores
    filters: jnp.ndarray,  # (B, n_ent) 1.0 for known-true tails (all splits)
) -> jnp.ndarray:
    """Per-entity filtered rank, replicating cal_ranks for every candidate.

    Returns (B, n_ent) float ranks; caller gathers at answer positions.
    """
    n = scores.shape[1]
    s = scores - jnp.min(scores, axis=1, keepdims=True) + 1e-8
    sf = s * filters

    asc = jnp.sort(s, axis=1)
    ascf = jnp.sort(sf, axis=1)

    def row(asc_r, ascf_r, s_r, sf_r):
        hi = jnp.searchsorted(asc_r, s_r, side="right")
        lo = jnp.searchsorted(asc_r, s_r, side="left")
        cnt_gt = n - hi
        cnt_eq = hi - lo
        full_rank = cnt_gt + (cnt_eq + 1) / 2.0
        hif = jnp.searchsorted(ascf_r, sf_r, side="right")
        filter_rank = (n - hif) + 1
        return full_rank - filter_rank + 1.0

    return jax.vmap(row)(asc, ascf, s, sf)


def rank_metric_sums(
    scores: jnp.ndarray,
    labels: jnp.ndarray,   # (B, n_ent) 1.0 at answer entities (0 on padded rows)
    filters: jnp.ndarray,
) -> dict:
    """Partial sums for MRR / Hits@k over all answers in the batch.

    Matches `cal_performance` (`Static/transductive/utils.py:17-21`) when the
    partial sums are combined across batches.
    """
    ranks = filtered_rank_all(scores, filters)
    lab = labels.astype(scores.dtype)
    return {
        "rr_sum": jnp.sum(lab / jnp.maximum(ranks, 1e-9)),
        "h1_sum": jnp.sum(lab * (ranks <= 1.0)),
        "h3_sum": jnp.sum(lab * (ranks <= 3.0)),
        "h10_sum": jnp.sum(lab * (ranks <= 10.0)),
        "count": jnp.sum(lab),
    }
