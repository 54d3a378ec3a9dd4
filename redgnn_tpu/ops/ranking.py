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


def _avg_rank_desc(s_row: jnp.ndarray) -> jnp.ndarray:
    """Average-tie rank of every element under descending order.

    Sort-scan formulation: vectorized searchsorted lowers ~10x slower
    than sort on TPU, so ranks come from one argsort + tie-group
    averaging via cummax/segment scans.
    """
    n = s_row.shape[0]
    order = jnp.argsort(-s_row, stable=True)
    sorted_s = s_row[order]
    pos = jnp.arange(n, dtype=jnp.float32)
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_s[1:] != sorted_s[:-1]])
    # group start position, broadcast to members via cummax
    group_start = jax.lax.cummax(jnp.where(is_new, pos, 0.0))
    # group end position: reverse cummin of (next boundary - 1)
    rev_new = jnp.concatenate([is_new[1:], jnp.ones((1,), bool)])
    group_end = jax.lax.cummin(
        jnp.where(rev_new, pos, float(n)), reverse=True)
    avg_sorted = (group_start + group_end) / 2.0 + 1.0
    return jnp.zeros(n).at[order].set(avg_sorted)


def _min_rank_desc(s_row: jnp.ndarray) -> jnp.ndarray:
    """Min-tie rank (rankdata method='min') under descending order."""
    n = s_row.shape[0]
    order = jnp.argsort(-s_row, stable=True)
    sorted_s = s_row[order]
    pos = jnp.arange(n, dtype=jnp.float32)
    is_new = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_s[1:] != sorted_s[:-1]])
    min_sorted = jax.lax.cummax(jnp.where(is_new, pos, 0.0)) + 1.0
    return jnp.zeros(n).at[order].set(min_sorted)


def filtered_rank_all(
    scores: jnp.ndarray,   # (B, n_ent) raw model scores
    filters: jnp.ndarray,  # (B, n_ent) 1.0 for known-true tails (all splits)
) -> jnp.ndarray:
    """Per-entity filtered rank, replicating cal_ranks for every candidate.

    Returns (B, n_ent) float ranks; caller gathers at answer positions.
    """
    s = scores - jnp.min(scores, axis=1, keepdims=True) + 1e-8
    sf = s * filters
    full_rank = jax.vmap(_avg_rank_desc)(s)
    filter_rank = jax.vmap(_min_rank_desc)(sf)
    return full_rank - filter_rank + 1.0


def raw_rank_metric_sums(
    scores: jnp.ndarray,   # (B, n_ent)
    targets: jnp.ndarray,  # (B,) answer entity per query
    qmask: jnp.ndarray,    # (B,) bool
) -> dict:
    """Unfiltered ranking over the dense score matrix (temporal
    interpolation eval, `Temporal/interpolation/main.py:154-164`), with
    average tie-breaking in place of the reference's arbitrary argsort
    order (equal in expectation, deterministic here)."""
    s_t = scores[jnp.arange(scores.shape[0]), targets]
    gt = jnp.sum(scores > s_t[:, None], axis=1)
    eq = jnp.sum(scores == s_t[:, None], axis=1)
    ranks = gt + (eq + 1) / 2.0
    m = qmask.astype(scores.dtype)
    return {
        "rr_sum": jnp.sum(m / jnp.maximum(ranks, 1e-9)),
        "h1_sum": jnp.sum(m * (ranks <= 1.0)),
        "h3_sum": jnp.sum(m * (ranks <= 3.0)),
        "h10_sum": jnp.sum(m * (ranks <= 10.0)),
        "count": jnp.sum(m),
    }


def frontier_rank_metric_sums(
    prob: jnp.ndarray,      # (B, n_ent) frontier softmax scattered dense
    visited: jnp.ndarray,   # (B, n_ent) bool — reached within L hops
    targets: jnp.ndarray,   # (B,)
    qmask: jnp.ndarray,     # (B,)
    fil: jnp.ndarray,       # (B, n_ent) bool keep-mask ((s,p)-filtered)
    fil_t: jnp.ndarray,     # (B, n_ent) bool keep-mask ((s,p,t)-filtered)
) -> dict:
    """Extrapolation's raw / filtered / time-filtered segment ranking
    (`Temporal/extrapolation/segment.py:346-387`): rank the target among
    the *visited* frontier entities only; unreached target => rank 1e9
    (the MINERVA convention, `segment.py:342`); ties average as
    ``count> + (count= - 1)/2 + 1``.
    """
    b = prob.shape[0]
    rows = jnp.arange(b)
    found = visited[rows, targets] & qmask
    p_t = prob[rows, targets]

    def ranks_under(keep):
        live = visited & keep
        gt = jnp.sum(jnp.where(live, prob > p_t[:, None], False), axis=1)
        eq = jnp.sum(jnp.where(live, prob == p_t[:, None], False), axis=1)
        r = gt + (eq - 1) / 2.0 + 1.0
        return jnp.where(found, r, 1e9)

    keep_all = jnp.ones_like(visited, dtype=bool)
    out = {}
    for name, keep in (("raw", keep_all), ("fil", fil), ("fil_t", fil_t)):
        r = ranks_under(keep)
        m = qmask.astype(prob.dtype)
        out[f"{name}_rr_sum"] = jnp.sum(m / jnp.maximum(r, 1e-9))
        out[f"{name}_h1_sum"] = jnp.sum(m * (r <= 1.0))
        out[f"{name}_h3_sum"] = jnp.sum(m * (r <= 3.0))
        out[f"{name}_h10_sum"] = jnp.sum(m * (r <= 10.0))
        out[f"{name}_mr_sum"] = jnp.sum(m * jnp.minimum(r, 1e9))
    out["count"] = jnp.sum(qmask.astype(prob.dtype))
    out["found_sum"] = jnp.sum(found.astype(prob.dtype))
    return out


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
