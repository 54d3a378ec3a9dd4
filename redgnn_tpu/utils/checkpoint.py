"""Checkpoint / resume.

Capability parity with both reference schemes:
  * interpolation: `{metric:.5}.{epoch}.tar` files holding
    model/optimizer/scheduler/epoch state, saved on valid-metric
    improvement (`Temporal/interpolation/util.py:16-39`, `main.py:247-249`);
  * extrapolation: timestamped checkpoint dirs + full-state files that a
    loader can rebuild from (`Temporal/extrapolation/utils.py:617-690`).

Serialization is flax msgpack (`flax.serialization`) for the device state
(params/optimizer), plus an optional JSON sidecar (`<file>.host.json`) for
host-side training state — plateau-scheduler counters, rng states — so an
elastic resume continues with the same learning rate and shuffles. The
sidecar is optional on load: checkpoints written before it existed still
restore.
"""

from __future__ import annotations

import glob
import json
import os
import time
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


def new_checkpoint_dir(root: str, prefix: str = "checkpoints") -> str:
    """Timestamped checkpoint directory (`utils.py:679-690`)."""
    stamp = time.strftime("%Y_%m_%d_%H_%M_%S")
    path = os.path.join(root, f"{prefix}_{stamp}")
    os.makedirs(path, exist_ok=True)
    return path


def _write_host(path: str, host: Optional[Dict[str, Any]]) -> None:
    if host is None:
        # don't leave a stale sidecar paired with a host-less save
        try:
            os.remove(path + ".host.json")
        except OSError:
            pass
        return
    tmp = path + ".host.tmp"
    with open(tmp, "w") as f:
        json.dump(host, f)
    os.replace(tmp, path + ".host.json")


def load_host(path: str) -> Optional[Dict[str, Any]]:
    """Host-state sidecar of checkpoint ``path`` (None if absent)."""
    try:
        with open(path + ".host.json") as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def save_checkpoint(ckpt_dir: str, state: Dict[str, Any], epoch: int,
                    metric: float, keep: int = 3,
                    host: Optional[Dict[str, Any]] = None) -> str:
    """Write `{metric:.5f}.{epoch}.msgpack`; prune to the best ``keep``."""
    os.makedirs(ckpt_dir, exist_ok=True)
    state = dict(state, _meta=np.array([epoch, metric], np.float64))
    path = os.path.join(ckpt_dir, f"{metric:.5f}.{epoch}.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))
    _write_host(path, host)
    ckpts = sorted(
        (p for p in glob.glob(os.path.join(ckpt_dir, "*.msgpack"))
         if os.path.basename(p) != "latest.msgpack"),
        key=lambda p: float(os.path.basename(p).split(".msgpack")[0]
                            .rsplit(".", 1)[0]),
        reverse=True,
    )
    for stale in ckpts[keep:]:
        os.remove(stale)
        if os.path.exists(stale + ".host.json"):
            os.remove(stale + ".host.json")
    return path


def load_checkpoint(path: str, template: Dict[str, Any]
                    ) -> Tuple[Dict[str, Any], int, float]:
    """Restore a state pytree from a checkpoint file.

    ``template`` must have the same structure (an initialized trainer's
    state) — the loader rebuilds model+data first, exactly like
    `extrapolation/utils.py:617-676`.
    """
    template = dict(template, _meta=np.zeros(2, np.float64))
    with open(path, "rb") as f:
        state = serialization.from_bytes(template, f.read())
    meta = state.pop("_meta")
    return state, int(meta[0]), float(meta[1])


def save_latest(ckpt_dir: str, state: Dict[str, Any], epoch: int,
                metric: float,
                host: Optional[Dict[str, Any]] = None) -> str:
    """Overwrite `latest.msgpack` — the elastic-recovery anchor: written
    every epoch so a crashed run (the tunneled TPU worker dies under
    sustained load) resumes from the last completed epoch."""
    os.makedirs(ckpt_dir, exist_ok=True)
    state = dict(state, _meta=np.array([epoch, metric], np.float64))
    tmp = os.path.join(ckpt_dir, ".latest.tmp")
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(state)))
    path = os.path.join(ckpt_dir, "latest.msgpack")
    # sidecar first, then the msgpack rename: a crash in between pairs the
    # OLD msgpack with the new sidecar for one restart, never a NEW
    # checkpoint with a stale lr/plateau/rng sidecar
    _write_host(path, host)
    os.replace(tmp, path)
    return path


def load_latest(ckpt_dir: str, template: Dict[str, Any]
                ) -> Optional[Tuple[Dict[str, Any], int, float]]:
    path = os.path.join(ckpt_dir, "latest.msgpack")
    if not os.path.exists(path):
        return None
    return load_checkpoint(path, template)


def best_checkpoint(ckpt_dir: str) -> Optional[str]:
    ckpts = [p for p in glob.glob(os.path.join(ckpt_dir, "*.msgpack"))
             if os.path.basename(p) != "latest.msgpack"]
    if not ckpts:
        return None
    return max(ckpts, key=lambda p: float(
        os.path.basename(p).split(".msgpack")[0].rsplit(".", 1)[0]))
