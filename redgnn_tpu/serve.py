"""Batch inference / serving entry point.

The reference has no serving path (training scripts only); this is the
framework's production-facing API: a compiled predictor that takes
(head, relation[, time]) queries and returns top-k candidate entities
with scores, reusing the trainers' calibrated capacity buckets.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from redgnn_tpu.graph.calibrate import FrontierCaps, calibrate_caps


class Predictor:
    """Top-k link prediction over a frozen model + graph."""

    def __init__(self, trainer, split: str = "test", top_k: int = 10):
        """``trainer`` is a fitted StaticTrainer or TemporalTrainer.

        ``split`` picks the graph/capacity profile: the caps are
        calibrated on that split's query heads, so serve-time queries of
        similar locality fit. Out-of-profile queries are detected by the
        on-device overflow flags and raised, never silently truncated.
        """
        self.trainer = trainer
        self.top_k = top_k
        self.is_temporal = hasattr(trainer, "_eval_scan")
        if self.is_temporal:
            self.caps = trainer._get_caps(
                f"eval_{split}", trainer.kg.splits[split],
                trainer.cfg.eval_batch_size)
            self.batch = trainer.cfg.eval_batch_size
            self._graph_args = trainer._kgarrs
        else:
            spec = trainer.kg.eval_spec(split)
            if split not in trainer.eval_caps:
                # calibrate directly — no need to run a full evaluate()
                rowptr, _, tail = spec.graph_np
                heads = (spec.queries[:, 0] if len(spec.queries)
                         else np.zeros(1, np.int64))
                trainer.eval_caps[split] = calibrate_caps(
                    rowptr, tail, spec.n_ent, heads, trainer.cfg.n_tbatch,
                    trainer.cfg.n_layer, headroom=trainer.cfg.cap_headroom,
                )
            self.caps = trainer.eval_caps[split]
            self.batch = trainer.cfg.n_tbatch
            self._graph_args = spec.graph
        self._predict = jax.jit(self._predict_impl,
                                static_argnames=("caps",))

    def _predict_impl(self, params, graph_args, subs, rels, times, qmask,
                      caps: FrontierCaps):
        # graph arrays travel as jit ARGUMENTS (closure capture would bake
        # them into the HLO as constants; see temporal_loop._apply)
        tr = self.trainer
        if self.is_temporal:
            scores, aux = tr._apply(params, graph_args, subs, rels, times,
                                    qmask, caps, None, False)
        else:
            scores, aux = tr.model.apply(
                {"params": params}, graph_args, subs, rels, qmask,
                caps, False)
        overflow = (jnp.any(aux["edge_overflow"])
                    | jnp.any(aux["node_overflow"]))
        top_scores, top_idx = jax.lax.top_k(scores, self.top_k)
        return top_scores, top_idx, overflow

    def predict(self, heads: np.ndarray, rels: np.ndarray,
                times: Optional[np.ndarray] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
        """Returns (scores, entities), each (n_queries, top_k)."""
        n = len(heads)
        b = self.batch
        out_s, out_e = [], []
        for start in range(0, n, b):
            hs = heads[start:start + b]
            rs = rels[start:start + b]
            ts = (times[start:start + b] if times is not None
                  else np.zeros(len(hs), np.int64))
            pad = b - len(hs)
            qmask = np.concatenate([np.ones(len(hs), bool),
                                    np.zeros(pad, bool)])
            if pad:
                hs = np.concatenate([hs, np.zeros(pad, np.int64)])
                rs = np.concatenate([rs, np.zeros(pad, np.int64)])
                ts = np.concatenate([ts, np.zeros(pad, np.int64)])
            s, e, overflow = self._predict(
                self.trainer.params, self._graph_args,
                jnp.asarray(hs, jnp.int32), jnp.asarray(rs, jnp.int32),
                jnp.asarray(ts, jnp.int32), jnp.asarray(qmask), self.caps)
            if bool(overflow):
                raise RuntimeError(
                    "frontier capacity overflow for queries "
                    f"[{start}:{start + b - pad}]: these heads expand past "
                    "the serving profile calibrated at construction — "
                    "rebuild the Predictor with a wider split profile or "
                    "raise cfg.cap_headroom")
            s, e = jax.device_get((s, e))
            out_s.append(s[:b - pad])
            out_e.append(e[:b - pad])
        return np.concatenate(out_s), np.concatenate(out_e)
