"""Interpolation ablation variants (`Temporal/interpolation/
model_cuda_aba.py:14,189,353`): T_RED_GNN_wo_tau (use_time=False),
T_RED_GNN_wo_Attn (use_attention=False), T_RED_GNN_W (bias direction
transform + absolute time table) and the prototype's random edge drop.

Each ablation is checked two ways:
  1. dense-mode hops == sparse frontier hops under the ablated config
     (both implementations carry every flag; round-3 VERDICT flagged that
     nothing exercised them), and
  2. a semantic oracle — the flag provably changes/removes exactly the
     computation it claims (perturbing the now-unused parameters must not
     move the output).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from redgnn_tpu.graph.calibrate import calibrate_caps
from redgnn_tpu.models.temporal import TemporalModelConfig, TRedGNN

from test_temporal import _make_kg


def _setup(tmp_path, rng, **abl):
    kg = _make_kg(tmp_path, rng)
    b = 8
    base = TemporalModelConfig(
        n_ent=kg.n_ent, n_rel_vocab=kg.n_rel + 1, idd_rel=kg.idd_rel,
        hidden_dim=12, attn_dim=8, n_layer=2, dropout=0.0,
        act="leakyrelu", mode="interpolation",
        time_key_base=kg.time_key_base,
        n_time=kg.n_time if abl.get("time_embedding") == "absolute"
        else None,
        **abl)
    data = kg.splits["train"][:b]
    caps = calibrate_caps(kg.graph_np[0], kg.graph_np[2], kg.n_ent,
                          data[:, 0], b, base.n_layer)
    args = (jnp.asarray(data[:, 0], jnp.int32),
            jnp.asarray(data[:, 1], jnp.int32),
            jnp.asarray(data[:, 3], jnp.int32))
    qmask = jnp.ones(b, bool)
    return kg, base, caps, args, qmask


def _apply(model, params, kg, caps, args, qmask, train=False, rng_seed=1):
    subs, rels, times = args
    rngs = {"dropout": jax.random.PRNGKey(rng_seed)} if train else None
    scores, aux = model.apply(
        {"params": params}, kg.graph, kg.etime, subs, rels, times,
        qmask, caps, None, train, kg.ekey, kg.selfloop_slot, None,
        kg.dense, rngs=rngs)
    return scores, aux


ABLATIONS = [
    {"use_time": False},
    {"use_attention": False},
    {"direction_transform": "bias"},
    {"time_embedding": "absolute"},
    {"use_time": False, "use_attention": False},  # combined wo_tau+wo_Attn
]


@pytest.mark.parametrize(
    "abl", ABLATIONS,
    ids=["wo_tau", "wo_attn", "bias_W", "abs_time", "wo_both"])
def test_ablation_dense_matches_sparse(tmp_path, rng, abl):
    kg, base, caps, args, qmask = _setup(tmp_path, rng, **abl)
    sparse_m = TRedGNN(dataclasses.replace(base, dense_hops=False))
    dense_m = TRedGNN(dataclasses.replace(base, dense_hops=True,
                                          dense_switch=0.0))
    subs, rels, times = args
    params = sparse_m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        kg.graph, kg.etime, subs, rels, times, qmask, caps,
        None, False, kg.ekey, kg.selfloop_slot)["params"]
    s_scores, s_aux = _apply(sparse_m, params, kg, caps, args, qmask)
    d_scores, d_aux = _apply(dense_m, params, kg, caps, args, qmask)
    assert np.all(np.isfinite(np.asarray(s_scores)))
    np.testing.assert_allclose(np.asarray(d_scores), np.asarray(s_scores),
                               rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(d_aux["num_nodes"]),
                                  np.asarray(s_aux["num_nodes"]))


def _perturb(params, path_pred, scale=10.0):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = params
    for path, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path)
        if path_pred(name):
            keys = [getattr(p, "key", p) for p in path]
            node = out
            for k in keys[:-1]:
                node = node[k]
            assert keys, name
            out = _set_in(out, keys, node[keys[-1]] + scale)
    return out


def _set_in(tree, keys, value):
    if len(keys) == 1:
        new = dict(tree)
        new[keys[0]] = value
        return new
    new = dict(tree)
    new[keys[0]] = _set_in(tree[keys[0]], keys[1:], value)
    return new


@pytest.mark.parametrize("dense", [False, True], ids=["sparse", "dense"])
def test_wo_tau_ignores_time_parameters(tmp_path, rng, dense):
    """use_time=False must make the output independent of the periodic
    time-embedding parameters; the default config must not be."""
    kg, base, caps, args, qmask = _setup(tmp_path, rng)
    is_time = lambda n: any(s in n for s in ("time_freq", "time_w",
                                             "time_b"))
    for use_time in (True, False):
        cfg = dataclasses.replace(base, use_time=use_time,
                                  dense_hops=dense, dense_switch=0.0)
        m = TRedGNN(cfg)
        subs, rels, times = args
        params = m.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            kg.graph, kg.etime, subs, rels, times, qmask, caps,
            None, False, kg.ekey, kg.selfloop_slot)["params"]
        a, _ = _apply(m, params, kg, caps, args, qmask)
        b_, _ = _apply(m, _perturb(params, is_time), kg, caps, args, qmask)
        diff = float(jnp.max(jnp.abs(a - b_)))
        if use_time:
            assert diff > 1e-6, "time params should matter by default"
        else:
            assert diff == 0.0, "wo_tau output moved with time params"


@pytest.mark.parametrize("dense", [False, True], ids=["sparse", "dense"])
def test_wo_attn_ignores_attention_parameters(tmp_path, rng, dense):
    kg, base, caps, args, qmask = _setup(tmp_path, rng)
    is_attn = lambda n: "attn1_" in n or "attn2_" in n
    for use_attention in (True, False):
        cfg = dataclasses.replace(base, use_attention=use_attention,
                                  dense_hops=dense, dense_switch=0.0)
        m = TRedGNN(cfg)
        subs, rels, times = args
        params = m.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)},
            kg.graph, kg.etime, subs, rels, times, qmask, caps,
            None, False, kg.ekey, kg.selfloop_slot)["params"]
        a, _ = _apply(m, params, kg, caps, args, qmask)
        b_, _ = _apply(m, _perturb(params, is_attn), kg, caps, args, qmask)
        diff = float(jnp.max(jnp.abs(a - b_)))
        if use_attention:
            assert diff > 1e-6
        else:
            assert diff == 0.0, "wo_Attn output moved with attn params"


def test_bias_transform_swaps_parameter_family(tmp_path, rng):
    """direction_transform='bias' (T_RED_GNN_W) replaces the three d x d
    direction matrices with three additive d-vectors, and those biases
    must actually steer the output."""
    kg, base, caps, args, qmask = _setup(
        tmp_path, rng, direction_transform="bias")
    m = TRedGNN(base)
    subs, rels, times = args
    params = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        kg.graph, kg.etime, subs, rels, times, qmask, caps,
        None, False, kg.ekey, kg.selfloop_slot)["params"]
    names = set(params.keys())
    assert {"past_bias", "now_bias", "future_bias"} <= names
    assert not ({"past_linear", "now_linear", "future_linear"} & names)
    a, _ = _apply(m, params, kg, caps, args, qmask)
    b_, _ = _apply(m, _perturb(params, lambda n: "past_bias" in n, 0.5),
                   kg, caps, args, qmask)
    assert float(jnp.max(jnp.abs(a - b_))) > 1e-6


def test_absolute_time_table_is_used_and_clip_safe(tmp_path, rng):
    """time_embedding='absolute' must read the per-timestamp table rows of
    the times that occur in the graph, and out-of-range ids (eval-split
    timestamps beyond the table) must clip, not crash."""
    kg, base, caps, args, qmask = _setup(
        tmp_path, rng, time_embedding="absolute")
    assert base.n_time == kg.n_time
    m = TRedGNN(base)
    subs, rels, times = args
    params = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        kg.graph, kg.etime, subs, rels, times, qmask, caps,
        None, False, kg.ekey, kg.selfloop_slot)["params"]
    assert params["time_embed_abs"].shape == (kg.n_time, base.hidden_dim)
    a, _ = _apply(m, params, kg, caps, args, qmask)
    b_, _ = _apply(m, _perturb(params, lambda n: "time_embed_abs" in n),
                   kg, caps, args, qmask)
    assert float(jnp.max(jnp.abs(a - b_))) > 1e-6
    # clip safety: query times far beyond the table
    big = (subs, rels, jnp.full_like(times, 10 * kg.n_time))
    c, _ = _apply(m, params, kg, caps, big, qmask)
    assert np.all(np.isfinite(np.asarray(c)))


@pytest.mark.parametrize("dense", [False, True], ids=["sparse", "dense"])
def test_edge_dropout_train_only_stochastic(tmp_path, rng, dense):
    """edge_dropout>0: stochastic across dropout rngs in train mode, a
    no-op in eval mode (matches the prototype's train-time 50% drop,
    `RED-GNN/model.py:188-189`)."""
    kg, base, caps, args, qmask = _setup(tmp_path, rng, edge_dropout=0.5)
    cfg = dataclasses.replace(base, dense_hops=dense, dense_switch=0.0)
    m = TRedGNN(cfg)
    m0 = TRedGNN(dataclasses.replace(cfg, edge_dropout=0.0))
    subs, rels, times = args
    params = m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        kg.graph, kg.etime, subs, rels, times, qmask, caps,
        None, False, kg.ekey, kg.selfloop_slot)["params"]
    t1, _ = _apply(m, params, kg, caps, args, qmask, train=True, rng_seed=1)
    t2, _ = _apply(m, params, kg, caps, args, qmask, train=True, rng_seed=2)
    assert float(jnp.max(jnp.abs(t1 - t2))) > 1e-6, \
        "edge dropout should be stochastic in train mode"
    e1, _ = _apply(m, params, kg, caps, args, qmask)
    e0, _ = _apply(m0, params, kg, caps, args, qmask)
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e0),
                               rtol=1e-6, atol=1e-7)
