"""Trainer for the SimplE embedding baseline.

Counterpart of `Temporal/extrapolation/main_nontemporal.py`: plain CE over
all entities, Adam, raw+filtered ranking via the shared eval ops.
"""

from __future__ import annotations

import time
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import optax

from redgnn_tpu.models.baselines import SimplE
from redgnn_tpu.ops.ranking import raw_rank_metric_sums


class SimplETrainer:
    def __init__(self, kg, hidden_dim: int = 64, lr: float = 1e-3,
                 batch_size: int = 256, seed: int = 0, epochs: int = 20):
        """``kg`` needs n_ent, n_rel and splits['train'/'valid'/'test']
        with (h, r, t[, tau]) rows (TemporalKG works directly)."""
        self.kg = kg
        self.batch_size = batch_size
        self.epochs = epochs
        self.model = SimplE(n_ent=kg.n_ent, n_rel=kg.n_rel + 1,
                            hidden_dim=hidden_dim)
        rng = jax.random.PRNGKey(seed)
        self.params = self.model.init(
            rng, jnp.zeros(batch_size, jnp.int32),
            jnp.zeros(batch_size, jnp.int32))["params"]
        self.tx = optax.adam(lr)
        self.opt_state = self.tx.init(self.params)
        self._np_rng = np.random.default_rng(seed)
        self.history: List[Dict[str, Any]] = []

        @jax.jit
        def train_step(params, opt_state, heads, rels, objs, qmask):
            def loss_fn(p):
                scores = self.model.apply({"params": p}, heads, rels)
                logp = jax.nn.log_softmax(scores, axis=1)
                nll = -logp[jnp.arange(scores.shape[0]), objs]
                return jnp.sum(jnp.where(qmask, nll, 0.0)) / jnp.maximum(
                    jnp.sum(qmask), 1)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = self.tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        @jax.jit
        def eval_step(params, heads, rels, objs, qmask):
            scores = self.model.apply({"params": params}, heads, rels)
            return raw_rank_metric_sums(scores, objs, qmask)

        self._train_step = train_step
        self._eval_step = eval_step

    def _batches(self, data):
        b = self.batch_size
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
        for batch, qmask in self._batches(data):
            self.params, self.opt_state, loss = self._train_step(
                self.params, self.opt_state,
                jnp.asarray(batch[:, 0], jnp.int32),
                jnp.asarray(batch[:, 1], jnp.int32),
                jnp.asarray(batch[:, 2], jnp.int32),
                jnp.asarray(qmask))
            losses.append(loss)
        return float(np.sum(jax.device_get(losses)))

    def evaluate(self, split: str) -> Dict[str, float]:
        sums = None
        for batch, qmask in self._batches(self.kg.splits[split]):
            s = jax.device_get(self._eval_step(
                self.params,
                jnp.asarray(batch[:, 0], jnp.int32),
                jnp.asarray(batch[:, 1], jnp.int32),
                jnp.asarray(batch[:, 2], jnp.int32),
                jnp.asarray(qmask)))
            sums = s if sums is None else {k: sums[k] + v
                                           for k, v in s.items()}
        n = max(sums["count"], 1.0)
        return {"mrr": sums["rr_sum"] / n, "h1": sums["h1_sum"] / n,
                "h3": sums["h3_sum"] / n, "h10": sums["h10_sum"] / n,
                "n": n}

    # -- checkpointing (same scheme as the main trainers) ---------------
    def state(self) -> Dict[str, Any]:
        return {"params": self.params, "opt_state": self.opt_state}

    def host_state(self) -> Dict[str, Any]:
        return {"np_rng": self._np_rng.bit_generator.state}

    def restore_host(self, ckpt_path: str) -> None:
        from redgnn_tpu.utils.checkpoint import load_host

        host = load_host(ckpt_path)
        if host is None:
            return
        try:
            self._np_rng.bit_generator.state = host["np_rng"]
        except (KeyError, ValueError):
            pass

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

    def fit(self, epochs=None, log=print, logger=None,
            ckpt_dir=None, start_epoch: int = 0) -> Dict[str, Any]:
        from redgnn_tpu.utils.checkpoint import save_latest

        epochs = epochs or self.epochs
        best = {"valid_mrr": -1.0}
        for epoch in range(start_epoch, epochs):
            loss = self.train_epoch(epoch)
            vm = self.evaluate("valid")
            row = {"epoch": epoch, "loss": loss,
                   **{f"valid_{k}": v for k, v in vm.items()}}
            if logger is not None:
                logger.log_scalars(epoch, {k: v for k, v in row.items()
                                           if isinstance(v, (int, float))},
                                   tag="eval")
            if vm["mrr"] > best["valid_mrr"]:
                tm = self.evaluate("test")
                row.update({f"test_{k}": v for k, v in tm.items()})
                best = dict(row, valid_mrr=vm["mrr"])
                if ckpt_dir:
                    self.save(ckpt_dir, epoch, vm["mrr"])
            self.history.append(row)
            if ckpt_dir:
                save_latest(ckpt_dir, self.state(), epoch + 1, vm["mrr"],
                            host=self.host_state())
            log(f"simple epoch {epoch} loss {loss:.2f} "
                f"valid MRR {vm['mrr']:.4f}")
        return best
