"""Per-hop capacity calibration for fixed-shape frontier expansion.

XLA needs static shapes; frontiers are data-dependent
(`SURVEY.md` §1: "Shapes are data-dependent"). We bound each hop with a
(node_cap, edge_cap) bucket, calibrated host-side by simulating the exact
expansion (numpy CSR walk) on sampled query batches, padded with headroom
and rounded up to lane multiples. If a runtime batch overflows, the caps
grow geometrically and the step recompiles — at most O(log frontier) times
over a whole run.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import numpy as np


def _round_up(x: int, m: int = 256) -> int:
    return int(-(-x // m) * m)


@dataclass(frozen=True)
class FrontierCaps:
    """Static per-hop shape budget: node_caps has n_layer+1 entries."""

    node_caps: Tuple[int, ...]
    edge_caps: Tuple[int, ...]

    def covers(self, other: "FrontierCaps") -> bool:
        return all(a >= b for a, b in zip(self.node_caps, other.node_caps)) \
            and all(a >= b for a, b in zip(self.edge_caps, other.edge_caps))

    def union(self, other: "FrontierCaps") -> "FrontierCaps":
        return FrontierCaps(
            tuple(max(a, b) for a, b in zip(self.node_caps,
                                            other.node_caps)),
            tuple(max(a, b) for a, b in zip(self.edge_caps,
                                            other.edge_caps)))


def simulate_hops(
    rowptr: np.ndarray,
    tail: np.ndarray,
    n_ent: int,
    heads: np.ndarray,
    n_layer: int,
) -> Tuple[List[int], List[int]]:
    """Exact node/edge counts per hop for one batch of query heads.

    Uses the native graphcore walker when built; otherwise a fully
    vectorized numpy CSR walk (repeat/cumsum edge enumeration — the
    host-side mirror of ops.frontier.expand_frontier).
    """
    from redgnn_tpu import native

    res = native.simulate_hops(rowptr, tail, n_ent, heads, n_layer)
    if res is not None:
        return res
    rowptr = rowptr.astype(np.int64)
    keys = np.arange(len(heads), dtype=np.int64) * n_ent + heads
    node_counts = [len(keys)]
    edge_counts = []
    for _ in range(n_layer):
        ents = keys % n_ent
        batch_base = keys - ents  # b * n_ent
        starts = rowptr[ents]
        degs = rowptr[ents + 1] - starts
        total = int(degs.sum())
        edge_counts.append(total)
        if total == 0:
            keys = np.empty(0, dtype=np.int64)
            node_counts.append(0)
            continue
        node_of_e = np.repeat(np.arange(len(keys)), degs)
        excl = np.concatenate([[0], np.cumsum(degs)[:-1]])
        within = np.arange(total) - excl[node_of_e]
        edge_id = starts[node_of_e] + within
        tails = tail[edge_id].astype(np.int64) + batch_base[node_of_e]
        keys = np.unique(tails)
        node_counts.append(len(keys))
    return node_counts, edge_counts


def simulate_hops_windowed(
    ekey: np.ndarray,          # (n_edges,) head*key_base+time, sorted
    tail: np.ndarray,          # (n_edges,) CSR-ordered tails
    n_ent: int,
    key_base: int,
    heads: np.ndarray,
    times: np.ndarray,         # per-query time ids
    window: int,
    n_layer: int,
) -> Tuple[List[int], List[int]]:
    """Exact counts for the time-windowed (extrapolation) expansion,
    including the always-present self-loop edge per frontier node."""
    from redgnn_tpu import native

    res = native.simulate_hops_windowed(ekey, tail, n_ent, key_base,
                                        heads, times, window, n_layer)
    if res is not None:
        return res
    keys = np.arange(len(heads), dtype=np.int64) * n_ent + heads
    node_counts = [len(keys)]
    edge_counts = []
    for _ in range(n_layer):
        ents = keys % n_ent
        batch_base = keys - ents
        t_q = times[(keys // n_ent).astype(np.int64)]
        lo = np.maximum(t_q - window, 0)
        start = np.searchsorted(ekey, ents * key_base + lo)
        end = np.searchsorted(ekey, ents * key_base + t_q)
        degs = (end - start) + 1  # +1: self-loop
        total = int(degs.sum())
        edge_counts.append(total)
        wdeg = end - start
        node_of_e = np.repeat(np.arange(len(keys)), wdeg)
        excl = np.concatenate([[0], np.cumsum(wdeg)[:-1]])
        within = np.arange(int(wdeg.sum())) - excl[node_of_e]
        edge_id = start[node_of_e] + within
        tails = tail[edge_id].astype(np.int64) + batch_base[node_of_e]
        keys = np.unique(np.concatenate([tails, keys]))  # self-loops keep nodes
        node_counts.append(len(keys))
    return node_counts, edge_counts


def per_query_counts(
    rowptr: np.ndarray,
    tail: np.ndarray,
    n_ent: int,
    heads: np.ndarray,
    n_layer: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Exact per-query frontier counts: (n, n_layer+1) nodes, (n, n_layer)
    edges.

    Composite batch keys (b*n_ent + ent) never collide across batch
    elements, so ANY batch's frontier counts are exactly the sum of its
    queries' rows — this is what makes permutation-exact capacity
    calibration possible (`caps_for_batches`). Counts depend only on the
    query head, so unique heads are walked once and broadcast back.
    """
    from redgnn_tpu import native

    heads = np.asarray(heads, np.int64)
    uniq, inv = np.unique(heads, return_inverse=True)
    res = native.per_query_hop_counts(rowptr, tail, n_ent, uniq, n_layer)
    if res is None:
        ncs = np.zeros((len(uniq), n_layer + 1), np.int64)
        ecs = np.zeros((len(uniq), n_layer), np.int64)
        for i, h in enumerate(uniq):
            nc, ec = simulate_hops(rowptr, tail, n_ent,
                                   np.asarray([h], np.int64), n_layer)
            ncs[i], ecs[i] = nc, ec
        res = ncs, ecs
    nc_u, ec_u = res
    return nc_u[inv], ec_u[inv]


def per_query_counts_windowed(
    ekey: np.ndarray,
    tail: np.ndarray,
    n_ent: int,
    key_base: int,
    heads: np.ndarray,
    times: np.ndarray,
    window: int,
    n_layer: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Windowed (extrapolation) variant of `per_query_counts`; counts
    depend on (head, time), deduped accordingly."""
    from redgnn_tpu import native

    heads = np.asarray(heads, np.int64)
    times = np.asarray(times, np.int64)
    t_span = int(times.max()) + 1 if len(times) else 1
    pair = heads * t_span + times
    uniq, inv = np.unique(pair, return_inverse=True)
    u_heads, u_times = uniq // t_span, uniq % t_span
    res = native.per_query_hop_counts_windowed(
        ekey, tail, n_ent, key_base, u_heads, u_times, window, n_layer)
    if res is None:
        ncs = np.zeros((len(uniq), n_layer + 1), np.int64)
        ecs = np.zeros((len(uniq), n_layer), np.int64)
        for i, (h, t) in enumerate(zip(u_heads, u_times)):
            nc, ec = simulate_hops_windowed(
                ekey, tail, n_ent, key_base, np.asarray([h], np.int64),
                np.asarray([t], np.int64), window, n_layer)
            ncs[i], ecs[i] = nc, ec
        res = ncs, ecs
    nc_u, ec_u = res
    return nc_u[inv], ec_u[inv]


def caps_for_batches(node_pq: np.ndarray, edge_pq: np.ndarray,
                     batch_size: int, slack: int = 8) -> FrontierCaps:
    """EXACT caps covering every contiguous batch of the given per-query
    count rows (row order = the actual epoch batch order). With these caps
    a frontier overflow is structurally impossible for this epoch — no
    sampling headroom, no replay (the round-2 failure mode where an
    overflow at step 3072/4552 discarded the whole epoch)."""
    n = len(node_pq)
    nb = max(-(-n // batch_size), 1)
    pad = nb * batch_size - n
    npad = np.concatenate(
        [node_pq, np.zeros((pad, node_pq.shape[1]), np.int64)])
    epad = np.concatenate(
        [edge_pq, np.zeros((pad, edge_pq.shape[1]), np.int64)])
    nmax = npad.reshape(nb, batch_size, -1).sum(1).max(0)
    emax = epad.reshape(nb, batch_size, -1).sum(1).max(0)
    node_caps = [batch_size] + [_round_up(int(c) + slack) for c in nmax[1:]]
    edge_caps = [_round_up(int(c) + slack) for c in emax]
    return FrontierCaps(tuple(node_caps), tuple(edge_caps))


def caps_upper_bound(node_pq: np.ndarray, edge_pq: np.ndarray,
                     batch_size: int, slack: int = 8) -> FrontierCaps:
    """Permutation-INDEPENDENT exact upper bound: sum of the top-b
    per-query counts. Valid for any shuffle of the split (never needs a
    recompile across epochs), at the cost of looser padding than
    `caps_for_batches`."""

    def topb(a):
        k = min(batch_size, len(a))
        s = np.partition(a, len(a) - k, axis=0)[len(a) - k:]
        return s.sum(0)

    nmax = topb(node_pq)
    emax = topb(edge_pq)
    node_caps = [batch_size] + [_round_up(int(c) + slack) for c in nmax[1:]]
    edge_caps = [_round_up(int(c) + slack) for c in emax]
    return FrontierCaps(tuple(node_caps), tuple(edge_caps))


def _calibrate(sim_fn, queries, batch_size, n_ent, n_layer,
               n_sample_batches, headroom, seed) -> FrontierCaps:
    rng = np.random.default_rng(seed)
    node_max = [batch_size] + [0] * n_layer
    edge_max = [0] * n_layer
    n = len(queries)
    for _ in range(n_sample_batches):
        idx = rng.choice(n, size=min(batch_size, n), replace=False)
        nc, ec = sim_fn(idx)
        for i in range(n_layer):
            node_max[i + 1] = max(node_max[i + 1], nc[i + 1])
            edge_max[i] = max(edge_max[i], ec[i])
    node_caps = [batch_size] + [
        min(_round_up(int(c * headroom) + 8), _round_up(batch_size * n_ent))
        for c in node_max[1:]
    ]
    edge_caps = [_round_up(int(c * headroom) + 8) for c in edge_max]
    return FrontierCaps(tuple(node_caps), tuple(edge_caps))


def calibrate_caps(
    rowptr: np.ndarray,
    tail: np.ndarray,
    n_ent: int,
    query_heads: np.ndarray,
    batch_size: int,
    n_layer: int,
    n_sample_batches: int = 6,
    headroom: float = 1.2,
    seed: int = 0,
) -> FrontierCaps:
    """Measure max frontier sizes over sampled batches, add headroom."""
    return _calibrate(
        lambda idx: simulate_hops(rowptr, tail, n_ent, query_heads[idx],
                                  n_layer),
        query_heads, batch_size, n_ent, n_layer, n_sample_batches,
        headroom, seed,
    )


def calibrate_caps_windowed(
    ekey: np.ndarray,
    tail: np.ndarray,
    n_ent: int,
    key_base: int,
    query_heads: np.ndarray,
    query_times: np.ndarray,
    window: int,
    batch_size: int,
    n_layer: int,
    n_sample_batches: int = 6,
    headroom: float = 1.2,
    seed: int = 0,
) -> FrontierCaps:
    def sim(idx):
        return simulate_hops_windowed(
            ekey, tail, n_ent, key_base, query_heads[idx],
            query_times[idx], window, n_layer,
        )

    return _calibrate(sim, query_heads, batch_size, n_ent, n_layer,
                      n_sample_batches, headroom, seed)
