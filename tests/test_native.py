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
