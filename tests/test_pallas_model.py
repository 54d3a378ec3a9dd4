"""Model forward with the Pallas segment path == XLA segment path."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from redgnn_tpu.graph.calibrate import FrontierCaps
from redgnn_tpu.graph.kg import DeviceGraph, build_csr
from redgnn_tpu.models.redgnn import ModelConfig, RedGNN


def test_pallas_segment_path_matches_xla(rng):
    n_ent, n_rel = 25, 4
    h = rng.integers(0, n_ent, 100)
    r = rng.integers(0, 2 * n_rel, 100)
    t = rng.integers(0, n_ent, 100)
    ents = np.arange(n_ent)
    idd = np.stack([ents, np.full(n_ent, 2 * n_rel), ents], 1)
    triples = np.concatenate([np.stack([h, r, t], 1), idd], 0)
    rowptr, rel, tail = build_csr(triples, n_ent)
    graph = DeviceGraph(jnp.asarray(rowptr), jnp.asarray(rel),
                        jnp.asarray(tail))

    b = 4
    caps = FrontierCaps((b, 256, 256), (1024, 1024))
    subs = jnp.asarray(rng.integers(0, n_ent, b), jnp.int32)
    rels = jnp.asarray(rng.integers(0, 2 * n_rel, b), jnp.int32)
    qmask = jnp.ones(b, bool)

    cfg_x = ModelConfig(n_ent=n_ent, n_rel=n_rel, hidden_dim=16, attn_dim=5,
                        n_layer=2, dropout=0.0, segment_impl="xla")
    cfg_p = dataclasses.replace(cfg_x, segment_impl="pallas")
    mx, mp = RedGNN(cfg_x), RedGNN(cfg_p)
    key = jax.random.PRNGKey(0)
    variables = mx.init({"params": key, "dropout": key}, graph, subs, rels,
                        qmask, caps, False)

    sx, _ = mx.apply(variables, graph, subs, rels, qmask, caps, False)
    sp, _ = mp.apply(variables, graph, subs, rels, qmask, caps, False)
    np.testing.assert_allclose(np.asarray(sx), np.asarray(sp), atol=1e-5)

    # gradients agree too (custom VJP of the pallas kernel)
    def loss(params, model):
        s, _ = model.apply({"params": params}, graph, subs, rels, qmask,
                           caps, False)
        return jnp.sum(s * s)

    gx = jax.grad(lambda p: loss(p, mx))(variables["params"])
    gp = jax.grad(lambda p: loss(p, mp))(variables["params"])
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                                atol=1e-4),
        gx, gp,
    )
