"""Static knowledge graphs: vocab, splits, filters, device-resident CSR.

Capability parity with `Static/transductive/load_data.py` and
`Static/inductive/load_data.py`:

  * entity/relation vocabularies from `entities.txt` / `relations.txt`
    (bare names, or `name\tid` pairs in the inductive variant,
    `Static/inductive/load_data.py:15,22`),
  * inverse relations appended with id ``r + n_rel``
    (`load_data.py:69-74`),
  * an identity self-loop relation ``2 * n_rel`` added for every entity
    (`load_data.py:77-79`) — this is what guarantees hop-to-hop state carry,
  * `(h, r) -> {t}` filter sets over all splits for filtered ranking
    (`load_data.py:30,53-54,65-66`),
  * grouped evaluation queries (`load_data.py:91-104`),
  * the per-epoch random 3:1 facts/train re-split (`load_data.py:152-164`).

The TPU-facing representation is a head-sorted CSR (`rowptr`, `rel`, `tail`)
living in HBM; re-splits rebuild it host-side with *identical shapes* so the
compiled propagation program is reused across epochs.
"""

from __future__ import annotations

import os
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def build_csr(
    triples: np.ndarray, n_ent: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Head-sorted CSR from an (N, 3) int array of (head, rel, tail)."""
    heads = triples[:, 0]
    order = np.argsort(heads, kind="stable")
    sorted_t = triples[order]
    counts = np.bincount(heads, minlength=n_ent)
    rowptr = np.zeros(n_ent + 1, dtype=np.int32)
    np.cumsum(counts, out=rowptr[1:])
    return (
        rowptr,
        sorted_t[:, 1].astype(np.int32),
        sorted_t[:, 2].astype(np.int32),
    )


def build_tail_sorted(rowptr: np.ndarray, rel: np.ndarray,
                      tail: np.ndarray, n_ent: int):
    """Tail-sorted view of a CSR for dense-mode hops: (src, rel, tail,
    tail_rowptr) with STATIC per-tail aggregation ranges (see
    models/temporal.py dense hops; the static model reuses the design)."""
    heads = np.repeat(np.arange(n_ent, dtype=np.int32),
                      np.diff(rowptr))
    order = np.argsort(tail, kind="stable").astype(np.int32)
    counts = np.bincount(tail, minlength=n_ent)
    tail_rowptr = np.zeros(n_ent + 1, dtype=np.int32)
    np.cumsum(counts, out=tail_rowptr[1:])
    return heads[order], rel[order], tail[order], tail_rowptr


@jax.tree_util.register_pytree_node_class
class DeviceGraph:
    """Immutable device-resident CSR fact graph (+ self-loops).

    ``tsrc/trel/ttail/tail_rowptr`` (optional) are the tail-sorted view
    used by dense-mode hops; graphs built without them simply disable
    dense mode."""

    def __init__(self, rowptr, rel, tail, tsrc=None, trel=None, ttail=None,
                 tail_rowptr=None):
        self.rowptr = rowptr
        self.rel = rel
        self.tail = tail
        self.tsrc = tsrc
        self.trel = trel
        self.ttail = ttail
        self.tail_rowptr = tail_rowptr

    @property
    def n_edges(self) -> int:
        return self.rel.shape[0]

    @property
    def has_dense(self) -> bool:
        return self.tsrc is not None

    @classmethod
    def from_csr(cls, rowptr, rel, tail, n_ent: int) -> "DeviceGraph":
        dense = build_tail_sorted(rowptr, rel, tail, n_ent)
        return cls(jnp.asarray(rowptr), jnp.asarray(rel), jnp.asarray(tail),
                   *(jnp.asarray(a) for a in dense))

    @classmethod
    def from_triples(cls, triples: np.ndarray, n_ent: int) -> "DeviceGraph":
        rowptr, rel, tail = build_csr(triples, n_ent)
        return cls.from_csr(rowptr, rel, tail, n_ent)

    def tree_flatten(self):
        return (self.rowptr, self.rel, self.tail, self.tsrc, self.trel,
                self.ttail, self.tail_rowptr), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _add_self_loops(triples: np.ndarray, n_ent: int, idd_rel: int) -> np.ndarray:
    ents = np.arange(n_ent, dtype=np.int64)
    idd = np.stack([ents, np.full(n_ent, idd_rel, dtype=np.int64), ents], 1)
    if len(triples) == 0:
        return idd
    return np.concatenate([triples, idd], 0)


def _double(triples: np.ndarray, n_rel: int) -> np.ndarray:
    """Append inverse edges (t, r + n_rel, h) — `load_data.py:69-74`."""
    if len(triples) == 0:
        return triples.reshape(0, 3)
    inv = np.stack(
        [triples[:, 2], triples[:, 1] + n_rel, triples[:, 0]], 1
    )
    return np.concatenate([triples, inv], 0)


def _read_vocab(path: str) -> Dict[str, int]:
    """Name->id map from either format the reference ships: bare names
    (id = position among non-blank lines) or explicit `name\\tid` pairs
    (`Static/transductive/load_data.py:15-23` vs inductive `:15,22`).
    Ids must come out dense in [0, len) — downstream CSR/key arithmetic
    sizes arrays by len(vocab)."""
    vocab: Dict[str, int] = {}
    next_id = 0  # counts accepted entries, not raw lines (blank-safe)
    with open(path) as f:
        for line in f:
            line = line.rstrip("\n")
            if not line.strip():
                continue
            parts = line.split("\t")
            if len(parts) == 2 and parts[1].strip().isdigit():
                name, idx = parts[0], int(parts[1])
            else:
                name, idx = line.strip(), next_id
            if name in vocab:
                raise ValueError(f"{path}: duplicate vocab entry {name!r}")
            vocab[name] = idx
            next_id += 1
    ids = sorted(vocab.values())
    if ids != list(range(len(vocab))):
        raise ValueError(
            f"{path}: vocab ids are not a dense [0, {len(vocab)}) range "
            "(duplicate or gapped ids would corrupt CSR/key arithmetic)")
    return vocab


def group_queries(
    doubled_triples: np.ndarray,
) -> Tuple[np.ndarray, List[np.ndarray]]:
    """(h, r)-grouped eval queries with sorted-unique multi-answers —
    the reference's grouped evaluation protocol (`load_data.py:91-104`).
    Shared by the transductive and inductive loaders so tie-breaking /
    answer-dedup semantics stay in one place."""
    groups: Dict[Tuple[int, int], List[int]] = defaultdict(list)
    for h, r, t in doubled_triples:
        groups[(int(h), int(r))].append(int(t))
    keys = sorted(groups.keys())
    queries = np.array(keys, dtype=np.int64).reshape(-1, 2)
    answers = [np.array(sorted(set(groups[k]))) for k in keys]
    return queries, answers


def filters_of(
    *triple_sets: np.ndarray,
) -> Dict[Tuple[int, int], np.ndarray]:
    """(h, r) -> sorted known-true tails over the given (already-doubled)
    triple sets, for filtered ranking (`load_data.py:170-192`)."""
    filt: Dict[Tuple[int, int], set] = defaultdict(set)
    for triples in triple_sets:
        for h, r, t in triples:
            filt[(int(h), int(r))].add(int(t))
    return {k: np.array(sorted(v)) for k, v in filt.items()}


@dataclass
class EvalSpec:
    """Everything a trainer needs to evaluate one split: the graph to
    propagate over, its entity count (differs across graphs in the
    inductive task), grouped queries, and filtered-ranking sets."""

    queries: np.ndarray            # (Q, 2) grouped (h, r)
    answers: List[np.ndarray]      # per-query answer entity ids
    graph: "DeviceGraph"
    graph_np: Tuple[np.ndarray, np.ndarray, np.ndarray]
    n_ent: int
    filters: Dict[Tuple[int, int], np.ndarray]

    def filter_row(self, h: int, r: int) -> np.ndarray:
        return self.filters.get((int(h), int(r)), np.empty(0, dtype=np.int64))


@dataclass
class StaticKG:
    """Host-side container for a static transductive KG with splits."""

    n_ent: int
    n_rel: int
    fact: np.ndarray   # (F, 3) original direction only
    train: np.ndarray  # (T, 3) original direction only
    valid: np.ndarray
    test: np.ndarray
    filters: Dict[Tuple[int, int], np.ndarray] = field(default_factory=dict)
    entity2id: Dict[str, int] = field(default_factory=dict)
    relation2id: Dict[str, int] = field(default_factory=dict)

    # populated by resplit()/finalize
    train_data: np.ndarray | None = None  # doubled training queries
    graph_np: Tuple[np.ndarray, np.ndarray, np.ndarray] | None = None
    graph: DeviceGraph | None = None
    eval_graph: DeviceGraph | None = None

    @property
    def idd_rel(self) -> int:
        return 2 * self.n_rel


    @classmethod
    def load(cls, data_dir: str) -> "StaticKG":
        entity2id = _read_vocab(os.path.join(data_dir, "entities.txt"))
        relation2id = _read_vocab(os.path.join(data_dir, "relations.txt"))
        n_ent, n_rel = len(entity2id), len(relation2id)

        filters: Dict[Tuple[int, int], set] = defaultdict(set)

        def read(fname: str) -> np.ndarray:
            out = []
            with open(os.path.join(data_dir, fname)) as f:
                for line in f:
                    if not line.strip():
                        continue
                    h, r, t = line.split()
                    h, r, t = entity2id[h], relation2id[r], entity2id[t]
                    out.append((h, r, t))
                    filters[(h, r)].add(t)
                    filters[(t, r + n_rel)].add(h)
            return np.array(out, dtype=np.int64).reshape(-1, 3)

        if os.path.exists(os.path.join(data_dir, "facts.txt")):
            fact, train = read("facts.txt"), read("train.txt")
        else:
            # YAGO (and nell) ship train/valid/test only; the reference's
            # own loader crashes on them (`load_data.py:32` opens
            # facts.txt unconditionally) even though `README.md:25` lists
            # the run command. Since the fact/train split is re-drawn 3:1
            # every epoch anyway (`load_data.py:152-164`), derive the
            # initial split the same way from train.txt, seeded for
            # reproducibility.
            pool = read("train.txt")
            perm = np.random.default_rng(1234).permutation(len(pool))
            cut = len(pool) * 3 // 4
            fact, train = pool[perm[:cut]], pool[perm[cut:]]
        kg = cls(
            n_ent=n_ent,
            n_rel=n_rel,
            fact=fact,
            train=train,
            valid=read("valid.txt"),
            test=read("test.txt"),
            entity2id=entity2id,
            relation2id=relation2id,
        )
        kg.filters = {k: np.array(sorted(v)) for k, v in filters.items()}

        # Evaluation graph = facts + train, doubled, + self-loops; built once
        # and never re-split (`load_data.py:84-89`).
        eval_triples = _add_self_loops(
            _double(np.concatenate([kg.fact, kg.train], 0), n_rel),
            n_ent,
            kg.idd_rel,
        )
        kg.eval_graph = DeviceGraph.from_triples(eval_triples, n_ent)
        kg.eval_graph_np = build_csr(eval_triples, n_ent)

        # Initial split: facts as graph, train as queries (`load_data.py:37-43`).
        kg._set_graph(kg.fact, kg.train)
        return kg

    def _set_graph(self, graph_triples: np.ndarray, query_triples: np.ndarray):
        self.train_data = _double(query_triples, self.n_rel)
        g = _add_self_loops(
            _double(graph_triples, self.n_rel), self.n_ent, self.idd_rel
        )
        self.graph_np = build_csr(g, self.n_ent)
        # per-epoch refresh keeps the same shapes (the 3:1 split is
        # deterministic in the pool size), so compiled programs are reused
        self.graph = DeviceGraph.from_csr(*self.graph_np, self.n_ent)

    def resplit(self, rng: np.random.Generator) -> None:
        """Per-epoch random 3:1 facts/train re-split (`load_data.py:152-164`).

        Shapes stay constant so the jitted step is reused.
        """
        pool = np.concatenate([self.fact, self.train], 0)
        perm = rng.permutation(len(pool))
        pool = pool[perm]
        cut = len(pool) * 3 // 4
        self._set_graph(pool[:cut], pool[cut:])

    # ---- evaluation queries grouped by (h, r) — `load_data.py:91-104` ----
    def eval_queries(
        self, split: str
    ) -> Tuple[np.ndarray, List[np.ndarray]]:
        triples = {"valid": self.valid, "test": self.test}[split]
        return group_queries(_double(triples, self.n_rel))

    def filter_row(self, h: int, r: int) -> np.ndarray:
        """Known-true tails for (h, r) across all splits (for filtered MRR)."""
        return self.filters.get((h, r), np.empty(0, dtype=np.int64))

    def eval_spec(self, split: str) -> EvalSpec:
        """Evaluation happens on the facts+train graph (`load_data.py:110-112`)."""
        queries, answers = self.eval_queries(split)
        return EvalSpec(
            queries=queries, answers=answers, graph=self.eval_graph,
            graph_np=self.eval_graph_np, n_ent=self.n_ent,
            filters=self.filters,
        )
