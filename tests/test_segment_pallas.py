"""Pallas sorted-segment-sum kernel vs the XLA reference (interpret mode)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from redgnn_tpu.ops.segment import segment_sum
from redgnn_tpu.ops.segment_pallas import segment_sum_pallas


@pytest.mark.parametrize("e,d,n", [(512, 48, 128), (1000, 16, 300),
                                   (256, 128, 50)])
def test_matches_xla(rng, e, d, n):
    seg = np.sort(rng.integers(0, n, e)).astype(np.int32)
    data = rng.normal(size=(e, d)).astype(np.float32)
    got = segment_sum_pallas(jnp.asarray(data), jnp.asarray(seg), n)
    want = segment_sum(jnp.asarray(data), jnp.asarray(seg), n,
                       indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_empty_and_skewed_segments(rng):
    # all edges into one segment + many empty segments
    e, d, n = 512, 32, 256
    seg = np.full(e, 7, np.int32)
    data = rng.normal(size=(e, d)).astype(np.float32)
    got = np.asarray(segment_sum_pallas(jnp.asarray(data), jnp.asarray(seg), n))
    np.testing.assert_allclose(got[7], data.sum(0), rtol=1e-4)
    assert np.all(got[:7] == 0) and np.all(got[8:] == 0)


def test_out_of_range_dropped(rng):
    e, d, n = 256, 8, 64
    seg = np.sort(rng.integers(0, n + 50, e)).astype(np.int32)
    data = rng.normal(size=(e, d)).astype(np.float32)
    got = segment_sum_pallas(jnp.asarray(data), jnp.asarray(seg), n)
    want = segment_sum(jnp.asarray(data), jnp.asarray(seg), n,
                       indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_gradient(rng):
    e, d, n = 300, 16, 90
    seg = np.sort(rng.integers(0, n, e)).astype(np.int32)
    data = rng.normal(size=(e, d)).astype(np.float32)

    def f_pallas(x):
        return jnp.sum(segment_sum_pallas(x, jnp.asarray(seg), n) ** 2)

    def f_xla(x):
        return jnp.sum(segment_sum(x, jnp.asarray(seg), n) ** 2)

    g1 = jax.grad(f_pallas)(jnp.asarray(data))
    g2 = jax.grad(f_xla)(jnp.asarray(data))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-4,
                               atol=1e-5)
