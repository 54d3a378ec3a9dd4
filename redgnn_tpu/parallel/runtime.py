"""Multi-host runtime initialization.

The reference has no communication backend at all (`SURVEY.md` §2.6 — no
NCCL/MPI/torch.distributed anywhere); this is the new TPU-native layer:
`jax.distributed` for multi-host process coordination, with mesh axes laid
out so the per-hop edge-psum rides ICI within a host-group and only
epoch-boundary aggregation (metrics, checkpoints) touches DCN.
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize the multi-host runtime (no-op single-process).

    Reads the standard env (JAX_COORDINATOR_ADDRESS etc.) when args are
    omitted; returns a summary dict for logging.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    pod_env = any(os.environ.get(k) for k in (
        "TPU_WORKER_HOSTNAMES", "MEGASCALE_COORDINATOR_ADDRESS",
        "CLOUD_TPU_TASK_ID"))
    if coordinator_address:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes or int(
                os.environ.get("JAX_NUM_PROCESSES", "1")),
            process_id=process_id if process_id is not None else int(
                os.environ.get("JAX_PROCESS_ID", "0")),
        )
    elif pod_env:
        # real multi-host TPU pod: argless initialize() auto-detects the
        # coordinator from the pod metadata (without this the flag would
        # silently no-op and each host would train independently)
        try:
            jax.distributed.initialize()
        except Exception as e:  # single-process despite pod-ish env
            print("warning: jax.distributed.initialize() auto-detect "
                  f"failed ({e}); continuing single-process")
    info = {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
    if info["process_count"] == 1 and not coordinator_address \
            and not pod_env:
        print("warning: --distributed requested but no coordinator "
              "environment found (JAX_COORDINATOR_ADDRESS or TPU pod "
              "metadata); running single-process")
    return info


def default_mesh_shape(n_devices: int, prefer_edge: int = 2):
    """data x edge factorization: keep the edge group within one host's
    ICI domain (edge-psum every hop), put the rest on data (one psum per
    step)."""
    n_edge = 1
    while (n_edge * 2 <= prefer_edge and n_devices % (n_edge * 2) == 0):
        n_edge *= 2
    return n_devices // n_edge, n_edge
