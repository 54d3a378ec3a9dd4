"""Full forward parity: padded TPU model vs a dynamic-shape numpy oracle.

The oracle is a clean-room numpy re-derivation of the reference forward
(`Static/transductive/models.py:23-89`): per-hop frontier growth, message
attention, scatter-sum, GRU gating, and zero scores for unreached entities.
Same weights => identical dense score matrices (up to fp tolerance).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from redgnn_tpu.graph.calibrate import FrontierCaps
from redgnn_tpu.graph.kg import DeviceGraph, build_csr
from redgnn_tpu.models.redgnn import ModelConfig, RedGNN

N_ENT, N_REL, D, A, L = 25, 4, 16, 5, 3


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def make_graph(rng, n_edges=80):
    h = rng.integers(0, N_ENT, n_edges)
    r = rng.integers(0, 2 * N_REL, n_edges)
    t = rng.integers(0, N_ENT, n_edges)
    triples = np.stack([h, r, t], 1)
    ents = np.arange(N_ENT)
    idd = np.stack([ents, np.full(N_ENT, 2 * N_REL), ents], 1)
    return np.concatenate([triples, idd], 0)


def oracle_forward(params, triples, subs, rels):
    b = len(subs)
    nodes = [(i, int(s)) for i, s in enumerate(subs)]  # (batch, ent)
    hidden = np.zeros((b, D))
    h0 = np.zeros((b, D))
    gp = params["gate"]

    for layer in range(L):
        lp = params[f"layer_{layer}"]
        rela = np.asarray(lp["rela_embed"])
        edges = []  # (dst_key, src_slot, rel)
        for si, (bi, e) in enumerate(nodes):
            for h, r, t in triples[triples[:, 0] == e]:
                edges.append((bi * N_ENT + t, si, int(r), bi))
        tail_keys = sorted({k for k, *_ in edges})
        key2slot = {k: i for i, k in enumerate(tail_keys)}

        agg = np.zeros((len(tail_keys), D))
        for key, si, r, bi in edges:
            hs = hidden[si]
            hr = rela[r]
            h_qr = rela[int(rels[bi])]
            pre = (
                hs @ np.asarray(lp["Ws_attn"]["kernel"])
                + hr @ np.asarray(lp["Wr_attn"]["kernel"])
                + h_qr @ np.asarray(lp["Wqr_attn"]["kernel"])
                + np.asarray(lp["Wqr_attn"]["bias"])
            )
            alpha = sigmoid(
                np.maximum(pre, 0) @ np.asarray(lp["w_alpha"]["kernel"])
                + np.asarray(lp["w_alpha"]["bias"])
            )
            agg[key2slot[key]] += alpha[0] * (hs + hr)
        hidden_new = np.maximum(agg @ np.asarray(lp["W_h"]["kernel"]), 0)

        h0_new = np.zeros((len(tail_keys), D))
        for si, (bi, e) in enumerate(nodes):
            h0_new[key2slot[bi * N_ENT + e]] = h0[si]

        # GRU (torch equations)
        gi = hidden_new @ np.asarray(gp["w_ih"]) + np.asarray(gp["b_ih"])
        gh = h0_new @ np.asarray(gp["w_hh"]) + np.asarray(gp["b_hh"])
        i_r, i_z, i_n = np.split(gi, 3, axis=1)
        h_r, h_z, h_n = np.split(gh, 3, axis=1)
        r_g = sigmoid(i_r + h_r)
        z_g = sigmoid(i_z + h_z)
        n_g = np.tanh(i_n + r_g * h_n)
        hidden = (1 - z_g) * n_g + z_g * h0_new
        h0 = hidden
        nodes = [(k // N_ENT, k % N_ENT) for k in tail_keys]

    scores = (hidden @ np.asarray(params["W_final"]["kernel"]))[:, 0]
    out = np.zeros((b, N_ENT))
    for si, (bi, e) in enumerate(nodes):
        out[bi, e] = scores[si]
    return out


def test_forward_matches_oracle(rng):
    triples = make_graph(rng)
    rowptr, rel, tail = build_csr(triples, N_ENT)
    graph = DeviceGraph(jnp.asarray(rowptr), jnp.asarray(rel),
                        jnp.asarray(tail))

    cfg = ModelConfig(n_ent=N_ENT, n_rel=N_REL, hidden_dim=D, attn_dim=A,
                      n_layer=L, dropout=0.0, act="relu")
    model = RedGNN(cfg)
    b = 4
    subs = rng.integers(0, N_ENT, b)
    rels = rng.integers(0, 2 * N_REL, b)
    caps = FrontierCaps((b, 256, 256, 256), (2048, 2048, 2048))

    key = jax.random.PRNGKey(42)
    variables = model.init(
        {"params": key, "dropout": key}, graph,
        jnp.asarray(subs, jnp.int32), jnp.asarray(rels, jnp.int32),
        jnp.ones(b, bool), caps, False,
    )
    scores, aux = model.apply(
        variables, graph, jnp.asarray(subs, jnp.int32),
        jnp.asarray(rels, jnp.int32), jnp.ones(b, bool), caps, False,
    )
    assert not bool(jnp.any(aux["edge_overflow"]))
    assert not bool(jnp.any(aux["node_overflow"]))

    expected = oracle_forward(
        jax.device_get(variables["params"]), triples, subs, rels
    )
    np.testing.assert_allclose(np.asarray(scores), expected, atol=2e-5)


def test_padded_queries_score_zero(rng):
    triples = make_graph(rng)
    rowptr, rel, tail = build_csr(triples, N_ENT)
    graph = DeviceGraph(jnp.asarray(rowptr), jnp.asarray(rel),
                        jnp.asarray(tail))
    cfg = ModelConfig(n_ent=N_ENT, n_rel=N_REL, hidden_dim=D, attn_dim=A,
                      n_layer=2, dropout=0.0)
    model = RedGNN(cfg)
    b = 4
    caps = FrontierCaps((b, 128, 128), (1024, 1024))
    qmask = jnp.asarray([True, True, False, False])
    key = jax.random.PRNGKey(0)
    variables = model.init({"params": key, "dropout": key}, graph,
                           jnp.zeros(b, jnp.int32), jnp.zeros(b, jnp.int32),
                           qmask, caps, False)
    scores, _ = model.apply(variables, graph, jnp.zeros(b, jnp.int32),
                            jnp.zeros(b, jnp.int32), qmask, caps, False)
    assert np.all(np.asarray(scores)[2:] == 0.0)


def test_dedup_bitmap_matches_sort_forward(rng):
    """The two node-compaction schemes must give identical scores (the
    frontier sets are equal; only edge order / dst indexing differ)."""
    import dataclasses
    triples = make_graph(rng)
    rowptr, rel, tail = build_csr(triples, N_ENT)
    graph = DeviceGraph(jnp.asarray(rowptr), jnp.asarray(rel),
                        jnp.asarray(tail))
    cfg_s = ModelConfig(n_ent=N_ENT, n_rel=N_REL, hidden_dim=D, attn_dim=A,
                        n_layer=L, dropout=0.0, dedup_impl="sort")
    cfg_b = dataclasses.replace(cfg_s, dedup_impl="bitmap")
    b = 4
    caps = FrontierCaps((b, 256, 256, 256), (2048, 2048, 2048))
    subs = jnp.asarray(rng.integers(0, N_ENT, b), jnp.int32)
    rels = jnp.asarray(rng.integers(0, 2 * N_REL, b), jnp.int32)
    qmask = jnp.ones(b, bool)
    key = jax.random.PRNGKey(7)
    ms, mb = RedGNN(cfg_s), RedGNN(cfg_b)
    variables = ms.init({"params": key, "dropout": key}, graph, subs, rels,
                        qmask, caps, False)
    ss, _ = ms.apply(variables, graph, subs, rels, qmask, caps, False)
    sb, _ = mb.apply(variables, graph, subs, rels, qmask, caps, False)
    np.testing.assert_allclose(np.asarray(sb), np.asarray(ss), atol=1e-5)


def test_segment_scan_impl_matches_xla_forward(rng):
    """dedup='sort' + segment_impl='scan' (cumsum-diff aggregation) must
    match the scatter path up to prefix-cancellation noise."""
    import dataclasses
    triples = make_graph(rng)
    rowptr, rel, tail = build_csr(triples, N_ENT)
    graph = DeviceGraph(jnp.asarray(rowptr), jnp.asarray(rel),
                        jnp.asarray(tail))
    cfg_x = ModelConfig(n_ent=N_ENT, n_rel=N_REL, hidden_dim=D, attn_dim=A,
                        n_layer=L, dropout=0.0, dedup_impl="sort")
    cfg_s = dataclasses.replace(cfg_x, segment_impl="scan")
    b = 4
    caps = FrontierCaps((b, 256, 256, 256), (2048, 2048, 2048))
    subs = jnp.asarray(rng.integers(0, N_ENT, b), jnp.int32)
    rels = jnp.asarray(rng.integers(0, 2 * N_REL, b), jnp.int32)
    qmask = jnp.ones(b, bool)
    key = jax.random.PRNGKey(11)
    mx, ms = RedGNN(cfg_x), RedGNN(cfg_s)
    variables = mx.init({"params": key, "dropout": key}, graph, subs, rels,
                        qmask, caps, False)
    sx, _ = mx.apply(variables, graph, subs, rels, qmask, caps, False)
    ss, _ = ms.apply(variables, graph, subs, rels, qmask, caps, False)
    np.testing.assert_allclose(np.asarray(ss), np.asarray(sx),
                               rtol=1e-4, atol=1e-4)


def test_bfloat16_compute_close_to_fp32(rng):
    import dataclasses
    triples = make_graph(rng)
    rowptr, rel, tail = build_csr(triples, N_ENT)
    graph = DeviceGraph(jnp.asarray(rowptr), jnp.asarray(rel),
                        jnp.asarray(tail))
    cfg32 = ModelConfig(n_ent=N_ENT, n_rel=N_REL, hidden_dim=D, attn_dim=A,
                        n_layer=2, dropout=0.0)
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    b = 4
    caps = FrontierCaps((b, 128, 128), (1024, 1024))
    subs = jnp.asarray(rng.integers(0, N_ENT, b), jnp.int32)
    rels = jnp.asarray(rng.integers(0, 2 * N_REL, b), jnp.int32)
    qmask = jnp.ones(b, bool)
    key = jax.random.PRNGKey(0)
    m32, m16 = RedGNN(cfg32), RedGNN(cfg16)
    variables = m32.init({"params": key, "dropout": key}, graph, subs, rels,
                         qmask, caps, False)
    s32, _ = m32.apply(variables, graph, subs, rels, qmask, caps, False)
    s16, _ = m16.apply(variables, graph, subs, rels, qmask, caps, False)
    # bf16 has ~3 decimal digits; scores are O(0.1-1)
    np.testing.assert_allclose(np.asarray(s16), np.asarray(s32),
                               atol=5e-2, rtol=5e-2)


def test_dedup_segment_impl_conflicts():
    from redgnn_tpu.models.redgnn import _resolve_dedup
    import pytest

    # auto defers to the segment impl's sortedness requirement
    assert _resolve_dedup("auto", 100, 1000, "scan") == "sort"
    assert _resolve_dedup("auto", 100, 1000, "pallas") == "sort"
    assert _resolve_dedup("auto", 100, 1000, "xla") == "bitmap"
    assert _resolve_dedup("auto", 10**9, 1000, "xla") == "sort"
    with pytest.raises(ValueError):
        _resolve_dedup("bitmap", 100, 1000, "scan")
    with pytest.raises(ValueError):
        _resolve_dedup("bogus", 100, 1000, "xla")


def test_scan_src_backward_grads_match(rng):
    """Bitmap-dedup hops claim src is non-decreasing in expansion order;
    the prefix-sum backward of hidden[src] must then reproduce the
    scatter-add gradients (up to prefix-cancellation noise). A wrong
    sortedness claim would mis-sum grads wholesale, so this is the
    end-to-end guard for ops/gather.take_rows_sorted."""
    import dataclasses
    triples = make_graph(rng)
    rowptr, rel, tail = build_csr(triples, N_ENT)
    graph = DeviceGraph(jnp.asarray(rowptr), jnp.asarray(rel),
                        jnp.asarray(tail))
    cfg_on = ModelConfig(n_ent=N_ENT, n_rel=N_REL, hidden_dim=D, attn_dim=A,
                         n_layer=L, dropout=0.0, dedup_impl="bitmap",
                         scan_src_backward=True)
    cfg_off = dataclasses.replace(cfg_on, scan_src_backward=False)
    b = 4
    caps = FrontierCaps((b, 256, 256, 256), (2048, 2048, 2048))
    subs = jnp.asarray(rng.integers(0, N_ENT, b), jnp.int32)
    rels = jnp.asarray(rng.integers(0, 2 * N_REL, b), jnp.int32)
    objs = jnp.asarray(rng.integers(0, N_ENT, b), jnp.int32)
    qmask = jnp.ones(b, bool)
    key = jax.random.PRNGKey(3)
    m_on, m_off = RedGNN(cfg_on), RedGNN(cfg_off)
    variables = m_on.init({"params": key, "dropout": key}, graph, subs,
                          rels, qmask, caps, False)

    def loss(params, model):
        scores, _ = model.apply({"params": params}, graph, subs, rels,
                                qmask, caps, False)
        logp = jax.nn.log_softmax(scores, axis=-1)
        return -jnp.mean(logp[jnp.arange(b), objs])

    g_on = jax.grad(loss)(variables["params"], m_on)
    g_off = jax.grad(loss)(variables["params"], m_off)
    flat_on = jax.tree_util.tree_leaves(g_on)
    flat_off = jax.tree_util.tree_leaves(g_off)
    for a_, b_ in zip(flat_on, flat_off):
        np.testing.assert_allclose(np.asarray(a_), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("agg", ["sorted_scatter", "cumsum"])
def test_static_dense_hops_match_sparse(tmp_path, rng, agg):
    """Dense-mode static hops (batch-shared tail-sorted table + GRU carry)
    == the sparse frontier path."""
    import dataclasses
    from redgnn_tpu.graph.kg import StaticKG
    from redgnn_tpu.graph.calibrate import calibrate_caps
    from tests.test_train_loop import write_kg

    kg = StaticKG.load(str(write_kg(tmp_path, rng)))
    b = 8
    base = ModelConfig(n_ent=kg.n_ent, n_rel=kg.n_rel, hidden_dim=16,
                       attn_dim=5, n_layer=3, dropout=0.0, act="relu")
    sparse_m = RedGNN(dataclasses.replace(base, dense_hops=False))
    dense_m = RedGNN(dataclasses.replace(base, dense_hops=True,
                                         dense_switch=0.0, dense_agg=agg))
    data = kg.train_data[:b]
    rowptr, _, tail = kg.graph_np
    caps = calibrate_caps(rowptr, tail, kg.n_ent, data[:, 0], b,
                          base.n_layer)
    subs = jnp.asarray(data[:, 0], jnp.int32)
    rels = jnp.asarray(data[:, 1], jnp.int32)
    qmask = jnp.asarray([True] * (b - 2) + [False] * 2)
    params = sparse_m.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        kg.graph, subs, rels, qmask, caps, False)["params"]
    s_scores, s_aux = sparse_m.apply({"params": params}, kg.graph, subs,
                                     rels, qmask, caps, False)
    d_scores, d_aux = dense_m.apply({"params": params}, kg.graph, subs,
                                    rels, qmask, caps, False)
    np.testing.assert_allclose(np.asarray(d_scores), np.asarray(s_scores),
                               rtol=2e-4, atol=3e-5)
    np.testing.assert_array_equal(np.asarray(d_aux["num_nodes"]),
                                  np.asarray(s_aux["num_nodes"]))
    np.testing.assert_array_equal(np.asarray(d_aux["num_edges"]),
                                  np.asarray(s_aux["num_edges"]))
