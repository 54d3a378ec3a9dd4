"""Trainer for the xERTE baseline.

Capability parity with `Temporal/extrapolation/train.py` + `eval.py`:
Adam, BCE on per-entity attention mass vs the one-hot answer
(`model.py:545-570`), raw/filtered/time-filtered segment ranking over the
final attended entities (`eval.py` -> `segment.py:346-387`), gradient
accumulation flag, best checkpoint on valid MRR.

The model's visited-node set has a static capacity (XErteConfig.cap_factor
x the pruned-frontier budget); the model reports insertion overflow in
``aux['node_overflow']`` and the trainer reacts with the framework-wide
contract: restore the epoch snapshot, grow the capacity geometrically,
recompile, replay — never train or rank on silently-clamped frontiers.
"""

from __future__ import annotations

import dataclasses
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
                 grad_clip: float = 1.0,
                 grad_accum_steps: int = 1, seed: int = 1,
                 epochs: int = 20, max_train_batches=None,
                 max_eval_batches=None):
        self.kg = kg
        self.cfg = cfg
        self.batch_size = batch_size
        self.epochs = epochs
        self.max_train_batches = max_train_batches
        self.max_eval_batches = max_eval_batches
        self._fil_cache: Dict[tuple, tuple] = {}
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
        # reference parity: xERTE's trainer clips grad global-norm to 1.0
        # (`Temporal/extrapolation/train.py:243`) — missing in round 4 and
        # the likely cause of the post-best divergence (test fil-MRR 0.41
        # at ep2 -> 0.11 by ep9).
        # non-positive values disable clipping (clip_by_global_norm(0.0)
        # would silently zero every gradient and freeze training)
        if grad_clip is not None and np.isfinite(grad_clip) and grad_clip > 0:
            tx = optax.chain(optax.clip_by_global_norm(grad_clip),
                             optax.adam(lr))
        else:
            tx = optax.adam(lr)
        if grad_accum_steps > 1:
            tx = optax.MultiSteps(tx, grad_accum_steps)
        self.tx = tx
        self.opt_state = tx.init(self.params)
        self._np_rng = np.random.default_rng(seed)
        self._kgarrs = (kg.graph.rowptr, kg.graph.rel, kg.graph.tail,
                        kg.ekey)
        self._step_counter = 0
        self._ckpt_dir: Optional[str] = None
        self.history: List[Dict[str, Any]] = []
        self._jit_steps()

    def _jit_steps(self) -> None:
        self._train_step = jax.jit(self._train_step_impl)
        self._eval_step = jax.jit(self._eval_step_impl)

    def _grow_caps(self) -> None:
        """Double the visited-set capacity and recompile (overflow path)."""
        self.cfg = dataclasses.replace(self.cfg,
                                       cap_factor=self.cfg.cap_factor * 2)
        self.model = XErte(self.cfg)
        self._jit_steps()

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
        overflow = jnp.any(aux["node_overflow"])
        return params, opt_state, loss, overflow

    def _eval_step_impl(self, params, kgarrs, subs, rels, objs, times,
                        qmask, fil_idx, filt_idx, seed):
        mass, aux = self._apply(params, kgarrs, subs, rels, times, qmask,
                                seed)
        # keep-masks scattered on device from padded index lists (pad id =
        # n_ent, dropped) — see temporal_loop.stage_filter_indices
        b = subs.shape[0]
        rows = jnp.arange(b)[:, None]
        fil = jnp.ones((b, self.cfg.n_ent), bool).at[rows, fil_idx].set(
            False, mode="drop")
        fil_t = jnp.ones((b, self.cfg.n_ent), bool).at[rows, filt_idx].set(
            False, mode="drop")
        sums = frontier_rank_metric_sums(mass, aux["visited"], objs, qmask,
                                         fil, fil_t)
        sums["loss_sum"] = bce_loss(mass, objs, qmask) * jnp.sum(qmask)
        return sums, jnp.any(aux["node_overflow"])

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
        if self.max_train_batches is not None:
            data = data[: self.max_train_batches * self.batch_size]
        for _attempt in range(6):
            snap = (self.params, self.opt_state, self._step_counter)
            losses, overflows = [], []
            for bi, (batch, qmask) in enumerate(
                    self._batches(data, self.batch_size)):
                self._step_counter += 1
                self.params, self.opt_state, loss, ov = self._train_step(
                    self.params, self.opt_state, self._kgarrs,
                    jnp.asarray(batch[:, 0], jnp.int32),
                    jnp.asarray(batch[:, 1], jnp.int32),
                    jnp.asarray(batch[:, 2], jnp.int32),
                    jnp.asarray(batch[:, 3], jnp.int32),
                    jnp.asarray(qmask), jnp.int32(self._step_counter),
                )
                losses.append(loss)
                overflows.append(ov)
                # intra-epoch progress anchor (same contract as
                # temporal_loop): the tunneled worker can die mid-epoch;
                # resuming replays this epoch with the progressed weights
                # instead of losing them
                if self._ckpt_dir and bi % 128 == 127:
                    from redgnn_tpu.utils.checkpoint import save_latest

                    save_latest(self._ckpt_dir, self.state(), epoch, -1.0,
                                host=self.host_state())
            if not any(jax.device_get(overflows)):
                return float(np.sum(jax.device_get(losses)))
            self.params, self.opt_state, self._step_counter = snap
            self._grow_caps()
            print(f"xerte epoch {epoch}: visited-set overflow; "
                  f"cap_factor -> {self.cfg.cap_factor}, replaying",
                  flush=True)
        raise RuntimeError("xerte visited caps failed to stabilize")

    def _filters(self):
        """(s,p)- and (s,p,t)-filter dicts over all splits, built once."""
        if not hasattr(self, "_sp2o"):
            sp2o: Dict[tuple, set] = defaultdict(set)
            spt2o: Dict[tuple, set] = defaultdict(set)
            for s in ("train", "valid", "test"):
                for h, r, t, tau in self.kg.splits[s]:
                    sp2o[(h, r)].add(t)
                    spt2o[(h, r, tau)].add(t)
            self._sp2o = {k: np.array(sorted(v)) for k, v in sp2o.items()}
            self._spt2o = {k: np.array(sorted(v)) for k, v in spt2o.items()}
        return self._sp2o, self._spt2o

    def _staged_filters(self, split: str, data, b: int):
        from redgnn_tpu.train.temporal_loop import stage_filter_indices

        key = (split, len(data), b)
        cached = self._fil_cache.get(key)
        if cached is None:
            sp2o, spt2o = self._filters()
            cached = stage_filter_indices(sp2o, spt2o, data, b,
                                          self.cfg.n_ent)
            self._fil_cache[key] = cached
        return cached

    def evaluate(self, split: str) -> Dict[str, float]:
        kg = self.kg
        data = kg.splits[split]
        b = self.batch_size
        if self.max_eval_batches is not None:
            data = data[: self.max_eval_batches * b]
        fil3, filt3 = self._staged_filters(split, data, b)
        for _attempt in range(6):
            partials, overflows = [], []
            for bi, (batch, qmask) in enumerate(self._batches(data, b)):
                sums, ov = self._eval_step(
                    self.params, self._kgarrs,
                    jnp.asarray(batch[:, 0], jnp.int32),
                    jnp.asarray(batch[:, 1], jnp.int32),
                    jnp.asarray(batch[:, 2], jnp.int32),
                    jnp.asarray(batch[:, 3], jnp.int32),
                    jnp.asarray(qmask), jnp.asarray(fil3[bi], jnp.int32),
                    jnp.asarray(filt3[bi], jnp.int32), jnp.int32(0),
                )
                partials.append(sums)
                overflows.append(ov)
            if not any(jax.device_get(overflows)):
                break
            self._grow_caps()
            print(f"xerte eval[{split}]: visited-set overflow; "
                  f"cap_factor -> {self.cfg.cap_factor}, retrying",
                  flush=True)
        else:
            raise RuntimeError("xerte visited caps failed to stabilize")
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

    # -- checkpointing (same scheme as the main trainers) ---------------
    def state(self) -> Dict[str, Any]:
        return {"params": self.params, "opt_state": self.opt_state}

    def host_state(self) -> Dict[str, Any]:
        return {"np_rng": self._np_rng.bit_generator.state,
                "step_counter": int(self._step_counter),
                "cap_factor": float(self.cfg.cap_factor)}

    def restore_host(self, ckpt_path: str) -> None:
        from redgnn_tpu.utils.checkpoint import load_host

        host = load_host(ckpt_path)
        if host is None:
            return
        try:
            self._np_rng.bit_generator.state = host["np_rng"]
        except (KeyError, ValueError):
            pass
        self._step_counter = int(host.get("step_counter", 0))
        cap = float(host.get("cap_factor", self.cfg.cap_factor))
        if cap != self.cfg.cap_factor:
            self.cfg = dataclasses.replace(self.cfg, cap_factor=cap)
            self.model = XErte(self.cfg)
            self._jit_steps()

    def save(self, ckpt_dir: str, epoch: int, metric: float) -> str:
        from redgnn_tpu.utils.checkpoint import save_checkpoint

        return save_checkpoint(ckpt_dir, self.state(), epoch, metric,
                               host=self.host_state())

    def restore(self, path: str) -> int:
        from redgnn_tpu.utils.checkpoint import load_checkpoint

        state, epoch, _ = load_checkpoint(path, self.state())
        self.params = state["params"]
        self.opt_state = state["opt_state"]
        self.restore_host(path)
        return epoch

    def fit(self, epochs: Optional[int] = None, log=print, logger=None,
            ckpt_dir: Optional[str] = None,
            start_epoch: int = 0) -> Dict[str, Any]:
        from redgnn_tpu.utils.checkpoint import save_latest

        epochs = epochs or self.epochs
        self._ckpt_dir = ckpt_dir
        best: Dict[str, Any] = {"valid_mrr": -1.0}
        for epoch in range(start_epoch, epochs):
            t0 = time.time()
            loss = self.train_epoch(epoch)
            vm = self.evaluate("valid")
            row = {"epoch": epoch, "loss": loss, "time": time.time() - t0,
                   **{f"valid_{k}": v for k, v in vm.items()}}
            if vm["mrr"] > best["valid_mrr"]:
                tm = self.evaluate("test")
                row.update({f"test_{k}": v for k, v in tm.items()})
                best = dict(row, valid_mrr=vm["mrr"])
                if ckpt_dir:
                    self.save(ckpt_dir, epoch, vm["mrr"])
            # log AFTER the best/test update so best-epoch rows carry
            # their test metrics in the JSONL (they used to exist only
            # in the end-of-run BEST line, which a deadline-stopped run
            # never prints)
            if logger is not None:
                logger.log_scalars(epoch, {k: v for k, v in row.items()
                                           if isinstance(v, (int, float))},
                                   tag="eval")
            self.history.append(row)
            if ckpt_dir:
                save_latest(ckpt_dir, self.state(), epoch + 1, vm["mrr"],
                            host=self.host_state())
            log(f"xerte epoch {epoch} loss {loss:.3f} "
                f"valid fil-MRR {vm['mrr']:.4f}")
        return best
