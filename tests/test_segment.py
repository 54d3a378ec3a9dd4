"""Segment reduction ops vs numpy oracles."""

import numpy as np
import jax.numpy as jnp

from redgnn_tpu.ops.segment import (
    segment_max,
    segment_normalize_l1,
    segment_softmax,
    segment_sum,
)


def _np_segment_sum(data, seg, n):
    out = np.zeros((n,) + data.shape[1:], data.dtype)
    for i, s in enumerate(seg):
        if 0 <= s < n:
            out[s] += data[i]
    return out


def test_segment_sum_matches_numpy(rng):
    data = rng.normal(size=(200, 16)).astype(np.float32)
    seg = rng.integers(0, 50, size=200)
    got = segment_sum(jnp.asarray(data), jnp.asarray(seg), 50)
    np.testing.assert_allclose(got, _np_segment_sum(data, seg, 50), rtol=1e-5)


def test_segment_sum_sorted_path(rng):
    data = rng.normal(size=(128, 8)).astype(np.float32)
    seg = np.sort(rng.integers(0, 30, size=128))
    got = segment_sum(jnp.asarray(data), jnp.asarray(seg), 30,
                      indices_are_sorted=True)
    np.testing.assert_allclose(got, _np_segment_sum(data, seg, 30), rtol=1e-5)


def test_segment_sum_drops_out_of_range(rng):
    data = np.ones((10, 4), np.float32)
    seg = np.array([0, 1, 2, 99, 99, 3, 3, 4, 100, 5])
    got = np.asarray(segment_sum(jnp.asarray(data), jnp.asarray(seg), 6))
    expected = _np_segment_sum(data, seg, 6)
    np.testing.assert_allclose(got, expected)


def test_segment_max(rng):
    data = rng.normal(size=(100,)).astype(np.float32)
    seg = rng.integers(0, 20, size=100)
    got = np.asarray(segment_max(jnp.asarray(data), jnp.asarray(seg), 21))
    for s in range(20):
        vals = data[seg == s]
        if len(vals):
            np.testing.assert_allclose(got[s], vals.max(), rtol=1e-6)
    assert got[20] <= -1e29  # empty segment


def test_segment_softmax_sums_to_one(rng):
    data = rng.normal(size=(100,)).astype(np.float32)
    seg = np.sort(rng.integers(0, 10, size=100))
    valid = rng.random(100) > 0.2
    out = np.asarray(
        segment_softmax(jnp.asarray(data), jnp.asarray(seg), 10,
                        valid=jnp.asarray(valid))
    )
    assert np.all(out[~valid] == 0)
    for s in range(10):
        m = (seg == s) & valid
        if m.sum():
            np.testing.assert_allclose(out[m].sum(), 1.0, rtol=1e-5)
            # matches direct softmax
            e = np.exp(data[m] - data[m].max())
            np.testing.assert_allclose(out[m], e / e.sum(), rtol=1e-5)


def test_segment_normalize_l1(rng):
    data = np.abs(rng.normal(size=(50,))).astype(np.float32)
    seg = rng.integers(0, 5, size=50)
    out = np.asarray(
        segment_normalize_l1(jnp.asarray(data), jnp.asarray(seg), 5)
    )
    for s in range(5):
        m = seg == s
        if m.sum():
            np.testing.assert_allclose(out[m].sum(), 1.0, rtol=1e-5)


def test_take_rows_grad_matches_plain_gather(rng):
    """take_rows' one-hot-matmul backward must equal autodiff of table[idx],
    on both the small-table (matmul) and fallback (segment-sum) paths."""
    import jax
    from redgnn_tpu.ops import gather as G

    table = jnp.asarray(rng.normal(size=(7, 5)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 7, size=64), jnp.int32)
    w = jnp.asarray(rng.normal(size=(5,)), jnp.float32)

    def loss_custom(t):
        return jnp.sum(jnp.tanh(G.take_rows(t, idx)) @ w)

    def loss_plain(t):
        return jnp.sum(jnp.tanh(t[idx]) @ w)

    g_custom = jax.grad(loss_custom)(table)
    g_plain = jax.grad(loss_plain)(table)
    np.testing.assert_allclose(np.asarray(g_custom), np.asarray(g_plain),
                               rtol=1e-5, atol=1e-6)

    # force the fallback path
    old = G._ONEHOT_BUDGET
    try:
        G._ONEHOT_BUDGET = 1
        g_fb = jax.grad(loss_custom)(table)
    finally:
        G._ONEHOT_BUDGET = old
    np.testing.assert_allclose(np.asarray(g_fb), np.asarray(g_plain),
                               rtol=1e-5, atol=1e-6)

    # 2-D index shape (the h_qr two-level gather pattern)
    idx2 = jnp.asarray(rng.integers(0, 7, size=(8, 3)), jnp.int32)

    def loss2(t):
        return jnp.sum(G.take_rows(t, idx2) ** 2)

    def loss2_plain(t):
        return jnp.sum(t[idx2] ** 2)

    np.testing.assert_allclose(np.asarray(jax.grad(loss2)(table)),
                               np.asarray(jax.grad(loss2_plain)(table)),
                               rtol=1e-5, atol=1e-6)


def test_segment_sum_scan_impl_matches_xla(rng):
    """impl='scan' (cumsum-diff over sorted segments) vs the scatter path,
    values and gradients; includes empty segments and out-of-range pads."""
    import jax
    e, n, d = 300, 40, 5
    ids = np.sort(rng.integers(0, n, e))
    ids[-7:] = n  # padded edges (zero data, out-of-range segment)
    data = rng.normal(size=(e, d)).astype(np.float32)
    data[-7:] = 0.0
    jids = jnp.asarray(ids, jnp.int32)
    jdata = jnp.asarray(data)

    out_scan = segment_sum(jdata, jids, n, indices_are_sorted=True,
                           impl="scan")
    out_xla = segment_sum(jdata, jids, n, indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_xla),
                               rtol=1e-4, atol=1e-4)

    w = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)

    def loss(x, impl):
        return jnp.sum(segment_sum(x, jids, n, indices_are_sorted=True,
                                   impl=impl) * w)

    g_scan = jax.grad(lambda x: loss(x, "scan"))(jdata)
    g_xla = jax.grad(lambda x: loss(x, "xla"))(jdata)
    np.testing.assert_allclose(np.asarray(g_scan), np.asarray(g_xla),
                               rtol=1e-5, atol=1e-5)

    import pytest
    with pytest.raises(ValueError):
        segment_sum(jdata, jids, n, indices_are_sorted=False, impl="scan")


def test_take_rows_sorted_grad_matches_plain_gather(rng):
    """take_rows_sorted (prefix-sum backward for non-decreasing indices —
    the bitmap-frontier hidden[src] gather) must match autodiff of
    table[idx] in value and gradient, including repeated and skipped rows
    and a fully-clamped pad tail."""
    import jax
    from redgnn_tpu.ops.gather import take_rows_sorted

    table = jnp.asarray(rng.normal(size=(13, 6)), jnp.float32)
    # non-decreasing with repeats, gaps, and a clamped pad tail at 12
    idx = np.sort(rng.integers(0, 12, size=90)).astype(np.int32)
    idx = jnp.asarray(np.concatenate([idx, np.full(10, 12, np.int32)]))
    w = jnp.asarray(rng.normal(size=(6,)), jnp.float32)

    def loss_custom(t):
        return jnp.sum(jnp.tanh(take_rows_sorted(t, idx)) @ w)

    def loss_plain(t):
        return jnp.sum(jnp.tanh(t[idx]) @ w)

    np.testing.assert_allclose(
        np.asarray(take_rows_sorted(table, idx)), np.asarray(table[idx]))
    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_custom)(table)),
        np.asarray(jax.grad(loss_plain)(table)), rtol=1e-4, atol=1e-5)


def test_gather_rows_packed_matches_separate_gathers(rng):
    """The fused (metadata ‖ bitcast values) row gather must reproduce the
    two separate gathers exactly (bitcast roundtrip is bit-exact) and its
    range-difference backward must match plain-gather autodiff, including
    empty ranges and a padded tail holding the last index."""
    import jax
    from redgnn_tpu.ops.gather import gather_rows_packed

    p = 11
    meta = jnp.asarray(rng.integers(-5, 2**30, size=(p, 3)), jnp.int32)
    vals = jnp.asarray(rng.normal(size=(p, 7)), jnp.float32)
    # CSR-style layout: each row owns a contiguous (possibly empty) range
    count = rng.integers(0, 6, size=p).astype(np.int32)
    start = (np.cumsum(count) - count).astype(np.int32)
    total = int(count.sum())
    e_cap = total + 9  # padded tail
    idx_np = np.repeat(np.arange(p, dtype=np.int32), count)
    idx_np = np.concatenate(
        [idx_np, np.full(e_cap - total, idx_np[-1] if total else 0,
                         np.int32)])
    idx = jnp.asarray(idx_np)
    start_j, count_j = jnp.asarray(start), jnp.asarray(count)

    m_rows, v_rows = gather_rows_packed(meta, vals, idx, start_j, count_j)
    np.testing.assert_array_equal(np.asarray(m_rows),
                                  np.asarray(meta)[idx_np])
    np.testing.assert_array_equal(np.asarray(v_rows),
                                  np.asarray(vals)[idx_np])

    w = jnp.asarray(rng.normal(size=(7,)), jnp.float32)
    # zero out the padded tail, as the frontier's message masking does —
    # pad slots lie outside every range so they must not contribute
    tail_mask = jnp.asarray(
        (np.arange(e_cap) < total)[:, None].astype(np.float32))

    def loss_fused(v):
        _, rows = gather_rows_packed(meta, v, idx, start_j, count_j)
        return jnp.sum((jnp.tanh(rows) * tail_mask) @ w)

    def loss_plain(v):
        return jnp.sum((jnp.tanh(v[idx]) * tail_mask) @ w)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_fused)(vals)),
        np.asarray(jax.grad(loss_plain)(vals)), rtol=1e-4, atol=1e-5)

    # ranges clipped by e_cap degrade to partial sums, never corruption
    idx_clip = jnp.asarray(idx_np[: max(total - 2, 1)])
    mask_c = tail_mask[: max(total - 2, 1)]

    def loss_clip(v):
        _, rows = gather_rows_packed(meta, v, idx_clip, start_j, count_j)
        return jnp.sum((jnp.tanh(rows) * mask_c) @ w)

    def loss_clip_plain(v):
        return jnp.sum((jnp.tanh(v[idx_clip]) * mask_c) @ w)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_clip)(vals)),
        np.asarray(jax.grad(loss_clip_plain)(vals)), rtol=1e-4, atol=1e-5)
