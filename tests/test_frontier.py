"""Frontier expansion vs a scipy/numpy oracle of `get_neighbors`.

Oracle semantics from `Static/transductive/load_data.py:106-131`: one-hot
node matrix x CSR SpMM -> incident edges; unique-sort for compact ids.
"""

import numpy as np
import jax
import jax.numpy as jnp

from redgnn_tpu.graph.kg import build_csr
from redgnn_tpu.ops.frontier import (
    SENTINEL,
    align_old_to_new,
    expand_frontier,
)


def random_graph(rng, n_ent=30, n_edges=120, n_rel=5):
    """Random triples + self-loops, like load_graph (`load_data.py:76-82`)."""
    h = rng.integers(0, n_ent, n_edges)
    r = rng.integers(0, 2 * n_rel, n_edges)
    t = rng.integers(0, n_ent, n_edges)
    triples = np.stack([h, r, t], 1)
    ents = np.arange(n_ent)
    idd = np.stack([ents, np.full(n_ent, 2 * n_rel), ents], 1)
    return np.concatenate([triples, idd], 0)


def oracle_expand(triples, n_ent, node_keys):
    """All (batch, head, rel, tail) with head in frontier, + unique tails."""
    valid = node_keys[node_keys != np.iinfo(np.int32).max]
    edges = []
    for key in valid:
        b, e = divmod(int(key), n_ent)
        for h, r, t in triples[triples[:, 0] == e]:
            edges.append((b, h, r, t))
    tail_keys = sorted({b * n_ent + t for (b, h, r, t) in edges})
    return edges, tail_keys


def test_expand_matches_oracle(rng):
    n_ent, n_rel = 30, 5
    triples = random_graph(rng, n_ent=n_ent, n_rel=n_rel)
    rowptr, rel, tail = build_csr(triples, n_ent)

    b = 4
    heads = rng.integers(0, n_ent, b)
    keys = np.array([i * n_ent + h for i, h in enumerate(heads)], np.int32)
    node_cap, edge_cap = 256, 1024
    keys_padded = np.full(8, np.iinfo(np.int32).max, np.int32)
    keys_padded[:b] = np.sort(keys)

    fr = expand_frontier(
        jnp.asarray(rowptr), jnp.asarray(rel), jnp.asarray(tail),
        n_ent, jnp.asarray(keys_padded), edge_cap, node_cap,
    )
    fr = jax.device_get(fr)

    edges, tail_keys = oracle_expand(triples, n_ent, keys_padded)

    assert not fr.edge_overflow and not fr.node_overflow
    assert int(fr.num_edges) == len(edges)
    assert int(fr.num_nodes) == len(tail_keys)

    got_keys = fr.node_keys[fr.node_keys != np.iinfo(np.int32).max]
    np.testing.assert_array_equal(got_keys, np.array(tail_keys))
    # node_keys sorted ascending
    assert np.all(np.diff(fr.node_keys.astype(np.int64)) >= 0)

    # each valid emitted edge must reconstruct an oracle edge, with dst
    # pointing at the right compact node slot and src at the right old slot
    got = []
    for i in range(edge_cap):
        if not fr.edge_valid[i]:
            continue
        b_i = int(fr.batch[i])
        src_key = int(keys_padded[fr.src[i]])
        dst_key = int(fr.node_keys[fr.dst[i]])
        assert src_key // n_ent == b_i and dst_key // n_ent == b_i
        got.append((b_i, src_key % n_ent, int(fr.rel[i]), dst_key % n_ent))
    assert sorted(got) == sorted(edges)
    # dst segments are sorted (enables in-order segment sum)
    dst_valid = fr.dst[fr.edge_valid]
    assert np.all(np.diff(dst_valid) >= 0)


def test_expand_overflow_flags(rng):
    n_ent, n_rel = 20, 3
    triples = random_graph(rng, n_ent=n_ent, n_edges=200, n_rel=n_rel)
    rowptr, rel, tail = build_csr(triples, n_ent)
    keys = np.full(4, np.iinfo(np.int32).max, np.int32)
    keys[:2] = [3, n_ent + 7]  # two queries

    fr = expand_frontier(jnp.asarray(rowptr), jnp.asarray(rel),
                         jnp.asarray(tail), n_ent, jnp.asarray(keys),
                         edge_cap=4, node_cap=256)
    assert bool(fr.edge_overflow)

    fr = expand_frontier(jnp.asarray(rowptr), jnp.asarray(rel),
                         jnp.asarray(tail), n_ent, jnp.asarray(keys),
                         edge_cap=1024, node_cap=2)
    assert bool(fr.node_overflow)


def test_align_old_to_new():
    smax = np.iinfo(np.int32).max
    old_keys = jnp.asarray(np.array([5, 17, 42, smax], np.int32))
    new_keys = jnp.asarray(np.array([2, 5, 17, 30, 42, 50, smax, smax],
                                    np.int32))
    old_vals = jnp.asarray(np.array([[1.0], [2.0], [3.0], [99.0]], np.float32))
    out = np.asarray(align_old_to_new(old_keys, new_keys, old_vals, 8))
    expected = np.zeros((8, 1), np.float32)
    expected[1], expected[2], expected[4] = 1.0, 2.0, 3.0
    np.testing.assert_array_equal(out, expected)


def test_expand_in_jit(rng):
    """The whole expansion must be traceable (no host callbacks)."""
    n_ent, n_rel = 25, 4
    triples = random_graph(rng, n_ent=n_ent, n_rel=n_rel)
    rowptr, rel, tail = build_csr(triples, n_ent)
    keys = np.full(4, np.iinfo(np.int32).max, np.int32)
    keys[:2] = [0, n_ent + 1]

    f = jax.jit(lambda rp, rl, tl, k: expand_frontier(
        rp, rl, tl, n_ent, k, 512, 128))
    fr = f(jnp.asarray(rowptr), jnp.asarray(rel), jnp.asarray(tail),
           jnp.asarray(keys))
    assert fr.node_keys.shape == (128,)


def test_bitmap_dedup_matches_sort(rng):
    """Both dedup schemes must produce the same node set and per-node
    aggregation result (edge order differs by design)."""
    n_ent, n_rel = 30, 5
    triples = random_graph(rng, n_ent=n_ent, n_rel=n_rel)
    rowptr, rel, tail = build_csr(triples, n_ent)
    b = 4
    keys = np.full(8, np.iinfo(np.int32).max, np.int32)
    keys[:b] = [i * n_ent + h for i, h in
                enumerate(rng.integers(0, n_ent, b))]

    args = (jnp.asarray(rowptr), jnp.asarray(rel), jnp.asarray(tail),
            n_ent, jnp.asarray(keys), 1024, 256)
    fr_s = expand_frontier(*args, dedup_impl="sort")
    fr_b = expand_frontier(*args, dedup_impl="bitmap", key_space=b * n_ent)

    np.testing.assert_array_equal(np.asarray(fr_s.node_keys),
                                  np.asarray(fr_b.node_keys))
    assert int(fr_s.num_nodes) == int(fr_b.num_nodes)
    assert int(fr_s.num_edges) == int(fr_b.num_edges)

    # identical segment sums of an arbitrary per-edge payload
    import jax

    def agg(fr):
        payload = jnp.where(
            fr.edge_valid,
            (fr.rel * 31 + fr.batch * 7 + 1).astype(jnp.float32), 0.0)
        return jax.ops.segment_sum(payload, fr.dst, num_segments=256)

    np.testing.assert_allclose(np.asarray(agg(fr_s)), np.asarray(agg(fr_b)),
                               rtol=1e-6)


def test_align_drops_missing_keys():
    """Old keys absent from the new frontier (edge-cap overflow clipped
    their self-loop) must be DROPPED, not scattered onto other slots —
    including the prefix[key]-1 == -1 negative-wrap case."""
    import jax.numpy as jnp
    from redgnn_tpu.ops.frontier import align_old_to_new, SENTINEL

    new_keys = jnp.asarray([2, 5, SENTINEL, SENTINEL], jnp.int32)
    old_keys = jnp.asarray([1, 5], jnp.int32)  # key 1 missing (rank -1)
    old_vals = jnp.asarray([[9.0], [7.0]])
    key_space = 8
    present = jnp.zeros(key_space, bool).at[jnp.asarray([2, 5])].set(True)
    prefix = jnp.cumsum(present.astype(jnp.int32))

    for kp in (None, prefix):
        out = align_old_to_new(old_keys, new_keys, old_vals, 4,
                               key_prefix=kp)
        np.testing.assert_allclose(
            np.asarray(out), [[0.0], [7.0], [0.0], [0.0]],
            err_msg=f"key_prefix={'bitmap' if kp is not None else 'sort'}")
