"""Batch inference / serving entry point.

The reference has no serving path (training scripts only); this is the
framework's production-facing API: a compiled predictor that takes
(head, relation[, time]) queries and returns top-k candidate entities
with scores, reusing the trainers' calibrated capacity buckets.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from redgnn_tpu.graph.calibrate import FrontierCaps


class Predictor:
    """Top-k link prediction over a frozen model + graph."""

    def __init__(self, trainer, split: str = "test", top_k: int = 10):
        """``trainer`` is a fitted StaticTrainer or TemporalTrainer."""
        self.trainer = trainer
        self.top_k = top_k
        self.is_temporal = hasattr(trainer, "_eval_scan")
        if self.is_temporal:
            self.caps = trainer._get_caps(
                f"eval_{split}", trainer.kg.splits[split],
                trainer.cfg.eval_batch_size)
            self.batch = trainer.cfg.eval_batch_size
        else:
            spec = trainer.kg.eval_spec(split)
            if split not in trainer.eval_caps:
                trainer.evaluate(split)  # populates caps lazily
            self.caps = trainer.eval_caps[split]
            self.spec = spec
            self.batch = trainer.cfg.n_tbatch
        self._predict = jax.jit(self._predict_impl,
                                static_argnames=("caps",))

    def _predict_impl(self, params, subs, rels, times, qmask,
                      caps: FrontierCaps):
        tr = self.trainer
        if self.is_temporal:
            scores, _ = tr._apply(params, subs, rels, times, qmask, caps,
                                  None, False)
        else:
            model = tr.model
            scores, _ = model.apply(
                {"params": params}, self.spec.graph, subs, rels, qmask,
                caps, False)
        top_scores, top_idx = jax.lax.top_k(scores, self.top_k)
        return top_scores, top_idx

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
            s, e = self._predict(
                self.trainer.params,
                jnp.asarray(hs, jnp.int32), jnp.asarray(rs, jnp.int32),
                jnp.asarray(ts, jnp.int32), jnp.asarray(qmask), self.caps)
            s, e = jax.device_get((s, e))
            out_s.append(s[:b - pad])
            out_e.append(e[:b - pad])
        return np.concatenate(out_s), np.concatenate(out_e)
