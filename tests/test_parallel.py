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


def test_temporal_dp_matches_single_device(tmp_path, rng):
    """TRedGNN data-parallel step == single-device step on an 8-way mesh
    (dropout off, replicated leave-one-out exclusion)."""
    from test_temporal import _make_kg
    from redgnn_tpu.train.temporal_loop import TemporalTrainer
    from redgnn_tpu.utils.config import TemporalTrainConfig

    kg = _make_kg(tmp_path, rng)
    cfg = TemporalTrainConfig(hidden_dim=12, attn_dim=8, n_layer=2,
                              dropout=0.0, lr=5e-3, batch_size=16,
                              eval_batch_size=16, epochs=1)
    single = TemporalTrainer(kg, cfg)
    mesh = make_mesh(8, 1)
    sharded = TemporalTrainer(kg, cfg, mesh=mesh)
    # same seed -> identical init
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        single.params, sharded.params)

    b = cfg.batch_size
    data = kg.splits["train"][:b]
    rows = kg.exclusion_slots(np.arange(b))
    args = (jnp.asarray(data[:, 0], jnp.int32),
            jnp.asarray(data[:, 1], jnp.int32),
            jnp.asarray(data[:, 2], jnp.int32),
            jnp.asarray(data[:, 3], jnp.int32),
            jnp.ones(b, bool), jnp.asarray(rows, jnp.int32))
    rng_key = jax.random.PRNGKey(3)
    caps_s = single._get_caps("train", data, b)
    caps_m = sharded._get_caps("train", data, sharded._cap_b(b))
    assert caps_m.node_caps[0] == b // 8

    p1, o1, loss1, ov1, _ = jax.jit(
        single._train_step_impl, static_argnames=("caps",))(
        single.params, single.opt_state, single._kgarrs, *args,
        rng_key, caps_s)
    p2, o2, loss2, ov2, _ = jax.jit(
        sharded._train_step_impl, static_argnames=("caps",))(
        sharded.params, sharded.opt_state, sharded._kgarrs, *args,
        rng_key, caps_m)
    assert not bool(ov1) and not bool(ov2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-5),
        p1, p2)

    # eval parity: full evaluate() through the sharded scan path
    m1 = single.evaluate("valid")
    m2 = sharded.evaluate("valid")
    for k in ("mrr", "h1", "h10", "n"):
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-5, atol=1e-7)


def test_temporal_dp_extrapolation_eval(tmp_path, rng):
    """Extrapolation sharded eval (fil/fil_t scatter per shard) matches
    the single-device metrics."""
    from test_temporal import _make_kg
    from redgnn_tpu.train.temporal_loop import TemporalTrainer
    from redgnn_tpu.utils.config import TemporalTrainConfig

    kg = _make_kg(tmp_path, rng)
    cfg = TemporalTrainConfig(hidden_dim=12, attn_dim=8, n_layer=2,
                              dropout=0.0, batch_size=16,
                              eval_batch_size=16, epochs=1,
                              mode="extrapolation", window=6)
    single = TemporalTrainer(kg, cfg)
    sharded = TemporalTrainer(kg, cfg, mesh=make_mesh(8, 1))
    m1 = single.evaluate("valid")
    m2 = sharded.evaluate("valid")
    for k in ("raw_mrr", "fil_mrr", "fil_t_mrr", "found_rate", "n"):
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-5, atol=1e-7)


def test_static_trainer_mesh_matches_single_device(tmp_path, rng):
    """StaticTrainer(mesh=...) — the CLI-reachable path — produces the
    same first-epoch loss and params as the single-device trainer
    (dropout off)."""
    from test_train_loop import write_kg
    from redgnn_tpu.graph.kg import StaticKG
    from redgnn_tpu.train.loop import StaticTrainer

    kg1 = StaticKG.load(str(write_kg(tmp_path, rng)))
    kg2 = StaticKG.load(str(tmp_path))
    cfg = TrainConfig(hidden_dim=16, attn_dim=5, n_layer=2, dropout=0.0,
                      lr=0.01, lamb=1e-5, n_batch=16, n_tbatch=16, epochs=1)
    single = StaticTrainer(kg1, cfg)
    sharded = StaticTrainer(kg2, cfg, mesh=make_mesh(8, 1))
    assert sharded.train_caps.node_caps[0] == 2
    l1 = single.train_epoch(0)
    l2 = sharded.train_epoch(0)
    np.testing.assert_allclose(l1, l2, rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=3e-4),
        single.params, sharded.params)


def test_static_eval_sharded_matches_single_device(tmp_path, rng):
    """Static eval under the mesh (round-3: eval must scale with the mesh
    too — at WN18RR scale eval is a large fraction of epoch time): the
    shard_map'ed per-batch eval with psum'd metric sums reproduces the
    single-device filtered metrics exactly."""
    from test_train_loop import write_kg
    from redgnn_tpu.graph.kg import StaticKG
    from redgnn_tpu.train.loop import StaticTrainer

    kg1 = StaticKG.load(str(write_kg(tmp_path, rng)))
    kg2 = StaticKG.load(str(tmp_path))
    cfg = TrainConfig(hidden_dim=16, attn_dim=5, n_layer=2, dropout=0.0,
                      lr=0.01, lamb=1e-5, n_batch=16, n_tbatch=16, epochs=1)
    single = StaticTrainer(kg1, cfg)
    sharded = StaticTrainer(kg2, cfg, mesh=make_mesh(8, 1))
    # identical params so eval is directly comparable
    sharded.params = jax.tree_util.tree_map(lambda x: x, single.params)
    for split in ("valid", "test"):
        m1 = single.evaluate(split)
        m2 = sharded.evaluate(split)
        for k in ("mrr", "h1", "h10", "count"):
            if k in m1:
                np.testing.assert_allclose(m1[k], m2[k], rtol=1e-5,
                                           err_msg=f"{split}:{k}")


def test_static_eval_n_tbatch_rounds_up_to_mesh(tmp_path, rng):
    """Reference configs like WN18RR's n_tbatch=50 don't divide a 8-way
    mesh: the trainer rounds the eval batch up (padding handles the rest)
    instead of rejecting the config."""
    from test_train_loop import write_kg
    from redgnn_tpu.graph.kg import StaticKG
    from redgnn_tpu.train.loop import StaticTrainer

    kg1 = StaticKG.load(str(write_kg(tmp_path, rng)))
    kg2 = StaticKG.load(str(tmp_path))
    cfg = TrainConfig(hidden_dim=16, attn_dim=5, n_layer=2, dropout=0.0,
                      lr=0.01, lamb=1e-5, n_batch=16, n_tbatch=13, epochs=1)
    single = StaticTrainer(kg1, cfg)
    sharded = StaticTrainer(kg2, cfg, mesh=make_mesh(8, 1))
    assert sharded.n_tbatch == 16 and single.n_tbatch == 13
    sharded.params = jax.tree_util.tree_map(lambda x: x, single.params)
    m1 = single.evaluate("valid")
    m2 = sharded.evaluate("valid")
    for k in ("mrr", "h1", "h10", "count"):
        if k in m1:
            np.testing.assert_allclose(m1[k], m2[k], rtol=1e-5)


def test_static_eval_sharded_edge_axis(tmp_path, rng):
    """Same parity through a (4 data x 2 edge) mesh — the edge-sliced hop
    math inside the eval shard_map."""
    from test_train_loop import write_kg
    from redgnn_tpu.graph.kg import StaticKG
    from redgnn_tpu.train.loop import StaticTrainer

    kg1 = StaticKG.load(str(write_kg(tmp_path, rng)))
    kg2 = StaticKG.load(str(tmp_path))
    cfg = TrainConfig(hidden_dim=16, attn_dim=5, n_layer=2, dropout=0.0,
                      lr=0.01, lamb=1e-5, n_batch=16, n_tbatch=16, epochs=1)
    single = StaticTrainer(kg1, cfg)
    sharded = StaticTrainer(kg2, cfg, mesh=make_mesh(4, 2))
    sharded.params = jax.tree_util.tree_map(lambda x: x, single.params)
    m1 = single.evaluate("valid")
    m2 = sharded.evaluate("valid")
    for k in ("mrr", "h1", "h10"):
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-5)


def test_temporal_dense_under_mesh(tmp_path, rng):
    """Dense-mode hops inside the shard_map data axis: sharded loss ==
    single device with dense forced on every hop."""
    import dataclasses
    from test_temporal import _make_kg
    from redgnn_tpu.train.temporal_loop import TemporalTrainer
    from redgnn_tpu.utils.config import TemporalTrainConfig

    kg = _make_kg(tmp_path, rng)
    cfg = TemporalTrainConfig(hidden_dim=12, attn_dim=8, n_layer=2,
                              dropout=0.0, lr=5e-3, batch_size=16,
                              eval_batch_size=16, epochs=1,
                              dense_switch=0.0)
    single = TemporalTrainer(kg, cfg)
    sharded = TemporalTrainer(kg, cfg, mesh=make_mesh(8, 1))
    b = cfg.batch_size
    data = kg.splits["train"][:b]
    rows = kg.exclusion_slots(np.arange(b))
    args = (jnp.asarray(data[:, 0], jnp.int32),
            jnp.asarray(data[:, 1], jnp.int32),
            jnp.asarray(data[:, 2], jnp.int32),
            jnp.asarray(data[:, 3], jnp.int32),
            jnp.ones(b, bool), jnp.asarray(rows, jnp.int32))
    caps_s = single._get_caps("train", data, b)
    caps_m = sharded._get_caps("train", data, sharded._cap_b(b))
    k = jax.random.PRNGKey(5)
    _, _, loss1, ov1, _ = jax.jit(single._train_step_impl,
                                  static_argnames=("caps",))(
        single.params, single.opt_state, single._kgarrs, *args, k, caps_s)
    _, _, loss2, ov2, _ = jax.jit(sharded._train_step_impl,
                                  static_argnames=("caps",))(
        sharded.params, sharded.opt_state, sharded._kgarrs, *args, k,
        caps_m)
    assert not bool(ov1) and not bool(ov2)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)


def test_initialize_distributed_single_process():
    """--distributed is a no-op single-process: no coordinator env means
    no jax.distributed.initialize call, just a truthful summary dict."""
    from redgnn_tpu.parallel.runtime import initialize_distributed

    info = initialize_distributed()
    assert info["process_index"] == 0
    assert info["process_count"] == 1
    assert info["local_devices"] >= 1
    assert info["global_devices"] >= info["local_devices"]
