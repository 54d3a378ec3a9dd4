"""Native graphcore library vs numpy implementations."""

import numpy as np
import pytest

from redgnn_tpu import native
from redgnn_tpu.graph.kg import build_csr as np_build_csr


@pytest.fixture(scope="module")
def have_native():
    if not native.available():
        pytest.skip("g++ unavailable / native build failed")
    return True


def test_build_csr_matches_numpy(have_native, rng):
    n_ent = 50
    triples = np.stack([
        rng.integers(0, n_ent, 400), rng.integers(0, 9, 400),
        rng.integers(0, n_ent, 400)], 1).astype(np.int64)
    got = native.build_csr(triples, n_ent)
    assert got is not None
    rowptr, rel, tail = got
    nrow, nrel, ntail = np_build_csr(triples, n_ent)
    np.testing.assert_array_equal(rowptr, nrow)
    np.testing.assert_array_equal(rel, nrel)
    np.testing.assert_array_equal(tail, ntail)


def test_simulate_hops_matches_numpy(have_native, rng):
    # force numpy path by calling the vectorized implementation directly
    import redgnn_tpu.graph.calibrate as cal

    n_ent = 40
    triples = np.stack([
        rng.integers(0, n_ent, 300), rng.integers(0, 5, 300),
        rng.integers(0, n_ent, 300)], 1).astype(np.int64)
    ents = np.arange(n_ent)
    triples = np.concatenate(
        [triples, np.stack([ents, np.full(n_ent, 10), ents], 1)], 0)
    rowptr, rel, tail = np_build_csr(triples, n_ent)
    heads = rng.integers(0, n_ent, 6)

    got = native.simulate_hops(rowptr, tail, n_ent, heads, 3)
    # numpy reference: bypass the native fast path
    import unittest.mock as mock

    with mock.patch.object(native, "simulate_hops", return_value=None):
        want = cal.simulate_hops(rowptr, tail, n_ent, heads, 3)
    assert got[0] == want[0] and got[1] == want[1]


def test_simulate_windowed_matches_numpy(have_native, rng):
    import unittest.mock as mock
    import redgnn_tpu.graph.calibrate as cal
    from redgnn_tpu.graph.temporal import TemporalKG
    from tests.test_temporal import write_temporal_dir
    import tempfile, pathlib

    kg = TemporalKG.load_vocab_dir(
        str(write_temporal_dir(pathlib.Path(tempfile.mkdtemp()), rng)))
    heads = kg.splits["valid"][:8, 0]
    times = kg.splits["valid"][:8, 3]
    got = native.simulate_hops_windowed(
        kg.ekey_np, kg.graph_np[2], kg.n_ent, kg.time_key_base,
        heads, times, 5, 2)
    with mock.patch.object(native, "simulate_hops_windowed",
                           return_value=None):
        want = cal.simulate_hops_windowed(
            kg.ekey_np, kg.graph_np[2], kg.n_ent, kg.time_key_base,
            heads, times, 5, 2)
    assert got[0] == want[0] and got[1] == want[1]


def test_per_query_counts_sum_to_batch_counts(rng):
    """The exact-caps foundation: composite keys make per-query frontiers
    independent, so any batch's counts = sum of its queries' rows
    (native and numpy fallback must both satisfy this)."""
    import unittest.mock as mock

    import redgnn_tpu.graph.calibrate as cal

    n_ent = 40
    triples = np.stack([
        rng.integers(0, n_ent, 300), rng.integers(0, 5, 300),
        rng.integers(0, n_ent, 300)], 1).astype(np.int64)
    ents = np.arange(n_ent)
    triples = np.concatenate(
        [triples, np.stack([ents, np.full(n_ent, 10), ents], 1)], 0)
    rowptr, _, tail = np_build_csr(triples, n_ent)
    heads = rng.integers(0, n_ent, 37)

    variants = [lambda: cal.per_query_counts(rowptr, tail, n_ent, heads, 3)]
    if native.available():
        def np_path():
            with mock.patch.object(native, "per_query_hop_counts",
                                   return_value=None):
                return cal.per_query_counts(rowptr, tail, n_ent, heads, 3)
        variants.append(np_path)
    for fn in variants:
        nc, ec = fn()
        assert nc.shape == (37, 4) and ec.shape == (37, 3)
        for lo in range(0, 37, 8):
            bn, be = cal.simulate_hops(rowptr, tail, n_ent,
                                       heads[lo:lo + 8], 3)
            np.testing.assert_array_equal(nc[lo:lo + 8].sum(0), bn)
            np.testing.assert_array_equal(ec[lo:lo + 8].sum(0), be)


def test_per_query_counts_windowed_sum_to_batch_counts(rng):
    import redgnn_tpu.graph.calibrate as cal

    n_ent, T = 30, 12
    key_base = T + 2
    h = rng.integers(0, n_ent, 250)
    t = rng.integers(0, T, 250)
    tails = rng.integers(0, n_ent, 250)
    order = np.lexsort((t, h))
    ekey = (h[order] * key_base + t[order]).astype(np.int32)
    tail = tails[order].astype(np.int32)
    heads = rng.integers(0, n_ent, 29).astype(np.int64)
    times = rng.integers(1, T, 29).astype(np.int64)

    nc, ec = cal.per_query_counts_windowed(
        ekey, tail, n_ent, key_base, heads, times, 4, 3)
    for lo in range(0, 29, 7):
        bn, be = cal.simulate_hops_windowed(
            ekey, tail, n_ent, key_base, heads[lo:lo + 7],
            times[lo:lo + 7], 4, 3)
        np.testing.assert_array_equal(nc[lo:lo + 7].sum(0), bn)
        np.testing.assert_array_equal(ec[lo:lo + 7].sum(0), be)


def test_caps_for_batches_cover_every_batch(rng):
    import redgnn_tpu.graph.calibrate as cal

    nc = rng.integers(0, 100, (53, 4)).astype(np.int64)
    ec = rng.integers(0, 500, (53, 3)).astype(np.int64)
    nc[:, 0] = 1
    caps = cal.caps_for_batches(nc, ec, 8)
    ub = cal.caps_upper_bound(nc, ec, 8)
    assert ub.covers(caps)
    for lo in range(0, 53, 8):
        bn = nc[lo:lo + 8].sum(0)
        be = ec[lo:lo + 8].sum(0)
        assert all(caps.node_caps[i] >= bn[i] for i in range(1, 4))
        assert all(caps.edge_caps[i] >= be[i] for i in range(3))
    # union/covers algebra
    other = cal.FrontierCaps((8, 999999, 0, 0), (0, 0, 999999))
    u = caps.union(other)
    assert u.covers(caps) and u.covers(other)
