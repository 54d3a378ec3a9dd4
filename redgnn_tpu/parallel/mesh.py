"""Device mesh construction for multi-chip / multi-host execution.

The reference is strictly single-GPU (`SURVEY.md` §2.6: no
torch.distributed/NCCL anywhere); the distributed layer here is designed
from scratch for TPU:

  * axis ``data``  — query-parallel: each chip expands and propagates the
    frontiers of its own sub-batch. Zero communication until the gradient
    pmean (rides ICI).
  * axis ``edge``  — edge-parallel within a sub-batch: the per-hop edge
    list is sliced across chips, each computes attention + messages for
    its slice and partial segment-sums; a psum over ``edge`` reassembles
    per-node aggregates each hop. This is the hop-wise analogue of
    sequence/context parallelism for the frontier dimension
    (`SURVEY.md` §5 long-context).
"""

from __future__ import annotations

import jax


def make_mesh(n_data: int = 1, n_edge: int = 1,
              devices=None) -> jax.sharding.Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    need = n_data * n_edge
    if len(devices) < need:
        raise ValueError(
            f"mesh {n_data}x{n_edge} needs {need} devices, "
            f"have {len(devices)}"
        )
    # Auto axis types: sharding is driven by shard_map/pjit annotations,
    # not the jax 0.9 explicit-sharding mode (which would require every
    # caller to enter a jax.set_mesh context).
    return jax.make_mesh(
        (n_data, n_edge), ("data", "edge"),
        axis_types=(jax.sharding.AxisType.Auto,) * 2,
        devices=devices[:need],
    )
