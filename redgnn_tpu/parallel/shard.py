"""shard_map train step: data-parallel queries x edge-parallel propagation.

Design (new — the reference is single-GPU with no distributed path,
`SURVEY.md` §2.6):

  * queries are sharded over mesh axis ``data``; every chip runs the full
    L-hop expansion for its local sub-batch. Frontier expansion is
    query-local, so this axis needs NO communication until the loss psum.
  * within each data shard, the per-hop edge list is sliced over axis
    ``edge`` (see RelAttnLayer.edge_axis): expansion indices are computed
    redundantly on each edge-group member (cheap int ops); the D-wide
    attention/message math — the FLOP/HBM-heavy part — is sharded; a
    per-hop ``psum(node_cap x D)`` over ``edge`` reassembles aggregates
    over ICI.
  * the graph CSR is replicated: even the largest reference KG (YAGO,
    ~660k doubled edges) is ~8 MB, thousands of times smaller than HBM.

Differentiation happens OUTSIDE the shard_map: the mapped function returns
the psum'd (replicated) global loss, and jax.grad transposes the internal
collectives itself. This is the only correct general treatment when the
forward mixes replicated (node-side) and sharded (edge-side) compute —
hand-written gradient psums would double-count the replicated paths.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P
from jax import shard_map

from redgnn_tpu.graph.calibrate import FrontierCaps
from redgnn_tpu.models.redgnn import ModelConfig, RedGNN
from redgnn_tpu.train.loop import softmax_ce_loss


def make_dp_loss_fn(
    model_cfg: ModelConfig,
    mesh: jax.sharding.Mesh,
    caps: FrontierCaps,
) -> Callable:
    """Sharded global-loss function (differentiable through shard_map).

    loss_fn(params, graph, subs, rels, objs, qmask, rng) -> (loss, overflow)
    with batch arrays global-sized and sharded over ``data``.
    """
    n_edge = mesh.shape["edge"]
    local_cfg = dataclasses.replace(
        model_cfg,
        edge_axis="edge" if n_edge > 1 else None,
        edge_shards=n_edge,
        # custom-VJP replication can't be vma-inferred inside shard_map
        mxu_gather_backward=False,
        scan_src_backward=False,
    )
    model = RedGNN(local_cfg)

    def forward(params, graph, subs, rels, objs, qmask, rng):
        # distinct dropout per data shard; identical within an edge group
        rng = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        scores, aux = model.apply(
            {"params": params}, graph, subs, rels, qmask, caps, True,
            rngs={"dropout": rng},
        )
        loss = softmax_ce_loss(scores, objs, qmask)
        loss = jax.lax.psum(loss, "data")
        if n_edge > 1:
            # replicated across edge: average the identical copies so the
            # value (and its gradient) is not scaled by the axis size
            loss = jax.lax.pmean(loss, "edge")
        overflow = (
            jnp.any(aux["edge_overflow"]) | jnp.any(aux["node_overflow"])
        ).astype(jnp.int32)
        overflow = jax.lax.pmax(jax.lax.pmax(overflow, "data"), "edge")
        return loss, overflow

    sharded_forward = shard_map(
        forward,
        mesh=mesh,
        in_specs=(P(), P(), P("data"), P("data"), P("data"), P("data"), P()),
        out_specs=(P(), P()),
    )

    def loss_fn(params, graph, subs, rels, objs, qmask, rng):
        loss, overflow = sharded_forward(
            params, graph, subs, rels, objs, qmask, rng
        )
        return loss, overflow

    return loss_fn


def make_dp_train_step(
    model_cfg: ModelConfig,
    tx,
    mesh: jax.sharding.Mesh,
    caps: FrontierCaps,
) -> Callable:
    """Build a jitted multi-chip train step.

    Batch arrays are global (B_global = caps.node_caps[0] * mesh 'data'
    size) and get sharded over ``data``; params/graph/opt_state are
    replicated.

    Returns step(params, opt_state, graph, subs, rels, objs, qmask, rng)
      -> (params, opt_state, loss, overflow)
    """
    loss_fn = make_dp_loss_fn(model_cfg, mesh, caps)

    @jax.jit
    def step(params, opt_state, graph, subs, rels, objs, qmask, rng):
        (loss, overflow), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, graph, subs, rels, objs, qmask, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, overflow

    return step
