"""Filtered ranking vs a scipy.stats.rankdata oracle (`utils.py:7-21`)."""

import numpy as np
import jax.numpy as jnp
from scipy.stats import rankdata

from redgnn_tpu.ops.ranking import filtered_rank_all, rank_metric_sums
from redgnn_tpu.utils.metrics import combine_metric_sums


def oracle_ranks(scores, labels, filters):
    """Clean-room re-expression of cal_ranks (`Static/transductive/utils.py:7-14`)."""
    scores = scores - np.min(scores, axis=1, keepdims=True) + 1e-8
    full_rank = rankdata(-scores, method="average", axis=1)
    filter_scores = scores * filters
    filter_rank = rankdata(-filter_scores, method="min", axis=1)
    ranks = (full_rank - filter_rank + 1) * labels
    return ranks[np.nonzero(ranks)]


def make_case(rng, b=6, n=40, with_ties=True):
    scores = rng.normal(size=(b, n)).astype(np.float32)
    if with_ties:
        # unreached entities share score 0 — the common RED-GNN case
        mask = rng.random((b, n)) < 0.5
        scores = np.where(mask, 0.0, scores)
    labels = (rng.random((b, n)) < 0.1).astype(np.float32)
    labels[:, 0] = 1.0  # at least one answer per row
    filters = np.clip(labels + (rng.random((b, n)) < 0.15), 0, 1)
    return scores, labels, filters


def test_rank_values_match_scipy(rng):
    scores, labels, filters = make_case(rng)
    ranks = np.asarray(
        filtered_rank_all(jnp.asarray(scores), jnp.asarray(filters))
    )
    got = ranks[labels.astype(bool)]
    expected = oracle_ranks(scores, labels, filters)
    np.testing.assert_allclose(np.sort(got), np.sort(expected), rtol=1e-5)


def test_metrics_match_reference_formula(rng):
    scores, labels, filters = make_case(rng, b=10, n=60)
    sums = rank_metric_sums(jnp.asarray(scores), jnp.asarray(labels),
                            jnp.asarray(filters))
    m = combine_metric_sums([sums])
    expected_ranks = oracle_ranks(scores, labels, filters)
    np.testing.assert_allclose(m["mrr"], (1.0 / expected_ranks).mean(),
                               rtol=1e-5)
    np.testing.assert_allclose(m["h1"], (expected_ranks <= 1).mean(),
                               rtol=1e-5)
    np.testing.assert_allclose(m["h10"], (expected_ranks <= 10).mean(),
                               rtol=1e-5)


def test_padded_rows_excluded(rng):
    scores, labels, filters = make_case(rng, b=4, n=30)
    labels[2:] = 0.0  # padded queries contribute nothing
    sums = rank_metric_sums(jnp.asarray(scores), jnp.asarray(labels),
                            jnp.asarray(filters))
    expected = oracle_ranks(scores, labels, filters)
    assert float(sums["count"]) == len(expected)
