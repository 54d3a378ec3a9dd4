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

    def grown(self, hop: int, grow_nodes: bool, grow_edges: bool,
              factor: float = 1.5) -> "FrontierCaps":
        nc = list(self.node_caps)
        ec = list(self.edge_caps)
        if grow_nodes:
            nc[hop + 1] = _round_up(int(nc[hop + 1] * factor))
        if grow_edges:
            ec[hop] = _round_up(int(ec[hop] * factor))
        return FrontierCaps(tuple(nc), tuple(ec))


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
