"""Multi-chip sharding on a virtual 8-device CPU mesh.

Checks that the data x edge sharded train step computes exactly the same
loss and parameter updates as the single-device step (dropout off).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from redgnn_tpu.graph.calibrate import FrontierCaps
from redgnn_tpu.graph.kg import DeviceGraph, build_csr
from redgnn_tpu.models.redgnn import ModelConfig, RedGNN
from redgnn_tpu.parallel.mesh import make_mesh
from redgnn_tpu.parallel.shard import make_dp_loss_fn, make_dp_train_step
from redgnn_tpu.train.loop import make_optimizer, softmax_ce_loss
from redgnn_tpu.utils.config import TrainConfig

N_ENT, N_REL, D, L = 30, 4, 16, 2


def setup(rng):
    h = rng.integers(0, N_ENT, 150)
    r = rng.integers(0, 2 * N_REL, 150)
    t = rng.integers(0, N_ENT, 150)
    triples = np.stack([h, r, t], 1)
    ents = np.arange(N_ENT)
    idd = np.stack([ents, np.full(N_ENT, 2 * N_REL), ents], 1)
    triples = np.concatenate([triples, idd], 0)
    rowptr, rel, tail = build_csr(triples, N_ENT)
    return DeviceGraph(jnp.asarray(rowptr), jnp.asarray(rel),
                       jnp.asarray(tail))


# one parametrization exercising BOTH mesh axes (data- and edge-parallel);
# more combinations compile for minutes on the virtual CPU mesh
@pytest.mark.parametrize("n_data,n_edge", [(4, 2), (8, 1)])
def test_dp_matches_single_device(rng, n_data, n_edge):
    graph = setup(rng)
    b_global = 8
    b_local = b_global // n_data
    cfg = ModelConfig(n_ent=N_ENT, n_rel=N_REL, hidden_dim=D, attn_dim=5,
                      n_layer=L, dropout=0.0, act="relu")
    local_caps = FrontierCaps((b_local, 128, 128), (512, 512))
    global_caps = FrontierCaps((b_global, 256, 256), (1024, 1024))

    model = RedGNN(cfg)
    key = jax.random.PRNGKey(7)
    subs = jnp.asarray(rng.integers(0, N_ENT, b_global), jnp.int32)
    rels = jnp.asarray(rng.integers(0, 2 * N_REL, b_global), jnp.int32)
    objs = jnp.asarray(rng.integers(0, N_ENT, b_global), jnp.int32)
    qmask = jnp.ones(b_global, bool)

    params = model.init({"params": key, "dropout": key}, graph,
                        subs, rels, qmask, global_caps, False)["params"]
    tcfg = TrainConfig(lr=0.01, lamb=0.0)
    tx = make_optimizer(tcfg, steps_per_epoch=10)
    opt_state = tx.init(params)

    # single-device reference update
    def loss_fn(p):
        scores, _ = model.apply({"params": p}, graph, subs, rels, qmask,
                                global_caps, False)
        return softmax_ce_loss(scores, objs, qmask)

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)

    # sharded loss + grads (dropout=0 so rng folding is irrelevant)
    mesh = make_mesh(n_data, n_edge)
    dp_loss_fn = make_dp_loss_fn(cfg, mesh, local_caps)
    (loss, overflow), grads = jax.value_and_grad(dp_loss_fn, has_aux=True)(
        params, graph, subs, rels, objs, qmask, jax.random.PRNGKey(0)
    )
    assert int(overflow) == 0
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4
        ),
        ref_grads, grads,
    )

    # the full jitted step runs end-to-end on the mesh
    step = make_dp_train_step(cfg, tx, mesh, local_caps)
    new_params, _, loss2, overflow2 = step(
        params, opt_state, graph, subs, rels, objs, qmask,
        jax.random.PRNGKey(0),
    )
    assert int(overflow2) == 0
    np.testing.assert_allclose(float(loss2), float(ref_loss), rtol=1e-5)
