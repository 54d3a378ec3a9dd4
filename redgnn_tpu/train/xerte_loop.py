"""Trainer for the xERTE baseline.

Capability parity with `Temporal/extrapolation/train.py` + `eval.py`:
Adam, BCE on per-entity attention mass vs the one-hot answer
(`model.py:545-570`), raw/filtered/time-filtered segment ranking over the
final attended entities (`eval.py` -> `segment.py:346-387`), gradient
accumulation flag, best checkpoint on valid MRR.
"""

from __future__ import annotations

import time
from collections import defaultdict
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from redgnn_tpu.graph.temporal import TemporalKG
from redgnn_tpu.models.xerte import XErte, XErteConfig, bce_loss
from redgnn_tpu.ops.ranking import frontier_rank_metric_sums


class XErteTrainer:
    def __init__(self, kg: TemporalKG, cfg: XErteConfig,
                 lr: float = 1e-3, batch_size: int = 128,
                 grad_accum_steps: int = 1, seed: int = 1):
        self.kg = kg
        self.cfg = cfg
        self.batch_size = batch_size
        self.model = XErte(cfg)

        rng = jax.random.PRNGKey(seed)
        self.rng, init_rng = jax.random.split(rng)
        b = batch_size
        self.params = self.model.init(
            init_rng, kg.graph.rowptr, kg.graph.rel, kg.graph.tail,
            kg.ekey, kg.time_key_base,
            jnp.zeros(b, jnp.int32), jnp.zeros(b, jnp.int32),
            jnp.ones(b, jnp.int32), jnp.ones(b, bool), jnp.int32(0),
        )["params"]
        tx = optax.adam(lr)
        if grad_accum_steps > 1:
            tx = optax.MultiSteps(tx, grad_accum_steps)
        self.tx = tx
        self.opt_state = tx.init(self.params)
        self._np_rng = np.random.default_rng(seed)
        self._kgarrs = (kg.graph.rowptr, kg.graph.rel, kg.graph.tail,
                        kg.ekey)
        self._step_counter = 0
        self.history: List[Dict[str, Any]] = []

        self._train_step = jax.jit(self._train_step_impl)
        self._eval_step = jax.jit(self._eval_step_impl)

    def _apply(self, params, kgarrs, subs, rels, times, qmask, seed):
        # graph arrays travel as jit arguments (closure capture would embed
        # them as HLO constants; see temporal_loop._apply)
        rowptr, rel, tail, ekey = kgarrs
        return self.model.apply(
            {"params": params}, rowptr, rel, tail, ekey,
            self.kg.time_key_base, subs, rels, times, qmask, seed,
        )

    def _train_step_impl(self, params, opt_state, kgarrs, subs, rels, objs,
                         times, qmask, seed):
        def loss_fn(p):
            mass, aux = self._apply(p, kgarrs, subs, rels, times, qmask,
                                    seed)
            return bce_loss(mass, objs, qmask), aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _eval_step_impl(self, params, kgarrs, subs, rels, objs, times,
                        qmask, fil, fil_t, seed):
        mass, aux = self._apply(params, kgarrs, subs, rels, times, qmask,
                                seed)
        sums = frontier_rank_metric_sums(mass, aux["visited"], objs, qmask,
                                         fil, fil_t)
        sums["loss_sum"] = bce_loss(mass, objs, qmask) * jnp.sum(qmask)
        return sums

    def _batches(self, data, b):
        for start in range(0, len(data), b):
            batch = data[start:start + b]
            pad = b - len(batch)
            qmask = np.concatenate([np.ones(len(batch), bool),
                                    np.zeros(pad, bool)])
            if pad:
                batch = np.concatenate(
                    [batch, np.zeros((pad, batch.shape[1]), np.int64)])
            yield batch, qmask

    def train_epoch(self, epoch: int) -> float:
        data = self.kg.splits["train"]
        data = data[self._np_rng.permutation(len(data))]
        losses = []
        for batch, qmask in self._batches(data, self.batch_size):
            self._step_counter += 1
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state, self._kgarrs,
                jnp.asarray(batch[:, 0], jnp.int32),
                jnp.asarray(batch[:, 1], jnp.int32),
                jnp.asarray(batch[:, 2], jnp.int32),
                jnp.asarray(batch[:, 3], jnp.int32),
                jnp.asarray(qmask), jnp.int32(self._step_counter),
            )
            losses.append(loss)
        return float(np.sum(jax.device_get(losses)))

    def evaluate(self, split: str) -> Dict[str, float]:
        kg = self.kg
        data = kg.splits[split]
        b = self.batch_size
        sp2o: Dict[tuple, set] = defaultdict(set)
        spt2o: Dict[tuple, set] = defaultdict(set)
        for s in ("train", "valid", "test"):
            for h, r, t, tau in kg.splits[s]:
                sp2o[(h, r)].add(t)
                spt2o[(h, r, tau)].add(t)
        partials = []
        for batch, qmask in self._batches(data, b):
            fil = np.ones((b, kg.n_ent), bool)
            fil_t = np.ones((b, kg.n_ent), bool)
            for i in range(len(batch)):
                if not qmask[i]:
                    continue
                h, r, t, tau = batch[i]
                fil[i, [e for e in sp2o.get((h, r), ()) if e != t]] = False
                fil_t[i, [e for e in spt2o.get((h, r, tau), ())
                          if e != t]] = False
            partials.append(self._eval_step(
                self.params, self._kgarrs,
                jnp.asarray(batch[:, 0], jnp.int32),
                jnp.asarray(batch[:, 1], jnp.int32),
                jnp.asarray(batch[:, 2], jnp.int32),
                jnp.asarray(batch[:, 3], jnp.int32),
                jnp.asarray(qmask), jnp.asarray(fil), jnp.asarray(fil_t),
                jnp.int32(0),
            ))
        tot = defaultdict(float)
        for p in jax.device_get(partials):
            for k, v in p.items():
                tot[k] += float(v)
        n = max(tot["count"], 1.0)
        out = {"n": n, "loss": tot["loss_sum"] / n,
               "found_rate": tot["found_sum"] / n}
        for pre in ("raw_", "fil_", "fil_t_"):
            for m in ("mrr", "h1", "h3", "h10"):
                key = {"mrr": "rr_sum", "h1": "h1_sum", "h3": "h3_sum",
                       "h10": "h10_sum"}[m]
                out[pre + m] = tot[pre + key] / n
        out["mrr"] = out["fil_mrr"]
        return out

    def fit(self, epochs: int = 20, log=print) -> Dict[str, Any]:
        best = {"valid_mrr": -1.0}
        for epoch in range(epochs):
            t0 = time.time()
            loss = self.train_epoch(epoch)
            vm = self.evaluate("valid")
            row = {"epoch": epoch, "loss": loss, "time": time.time() - t0,
                   **{f"valid_{k}": v for k, v in vm.items()}}
            if vm["mrr"] > best["valid_mrr"]:
                tm = self.evaluate("test")
                row.update({f"test_{k}": v for k, v in tm.items()})
                best = dict(row, valid_mrr=vm["mrr"])
            self.history.append(row)
            log(f"xerte epoch {epoch} loss {loss:.3f} "
                f"valid fil-MRR {vm['mrr']:.4f}")
        return best
