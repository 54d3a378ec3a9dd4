"""Clean-room numpy re-derivation of the T-RED-GNN forward pass.

Independent oracle for both temporal modes, mirroring the static model's
oracle (`tests/test_model_static.py`): propagation is re-implemented from
the reference's math spec with python dicts and numpy only —
  * interpolation (`Temporal/interpolation/model_cuda_new_embdding.py`):
    whole-timeline edges, Δ = τ_edge − τ_query, periodic time embedding,
    past/now/future transforms by sign(Δ), leave-one-out row exclusion;
  * extrapolation (`Temporal/extrapolation/model_cuda_new_embedding.py`):
    per-query window [τ−W, τ), Δ = τ_query − τ_edge, past transform only,
    self-loop at the window floor (`:170`), scatter-softmax head.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from redgnn_tpu.graph.calibrate import (
    FrontierCaps,
    calibrate_caps,
    calibrate_caps_windowed,
)
from redgnn_tpu.models.temporal import TemporalModelConfig, TRedGNN
from redgnn_tpu.ops.frontier import SENTINEL
from tests.test_temporal import _make_kg


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _leaky(x):
    return np.where(x > 0, x, 0.01 * x)


def oracle_forward(kg, params, cfg, subs, rels, times, qmask,
                   exclude_slots=None):
    """Dense (b, n_ent) scores + final visited sets, python-loop oracle."""
    d = cfg.hidden_dim
    rowptr, rel_a, tail_a = kg.graph_np
    time_a = kg.etime_np
    n_ent = kg.n_ent
    b = len(subs)

    def time_embed(p, delta):
        z = 2 * np.pi * delta * np.asarray(p["time_freq"])
        feats = np.concatenate([np.cos(z), np.sin(z)])
        return np.maximum(feats @ np.asarray(p["time_w"])
                          + np.asarray(p["time_b"]), 0)

    excl = set(int(s) for s in exclude_slots) if exclude_slots is not None \
        else set()

    # frontier: dict (query, entity) -> hidden vector
    frontier = {(i, int(subs[i])): np.zeros(d)
                for i in range(b) if qmask[i]}
    for layer in range(cfg.n_layer):
        rela = np.asarray(params[f"rela_embed_{layer}"])
        a1 = np.asarray(params[f"attn1_{layer}"])
        a2 = np.asarray(params[f"attn2_{layer}"])
        pw = np.asarray(params["past_linear"])
        nw = np.asarray(params["now_linear"])
        fw = np.asarray(params["future_linear"])
        agg = {}
        for (qi, u), h_u in frontier.items():
            t_q = float(times[qi])
            edges = []
            if cfg.mode == "interpolation":
                for s in range(rowptr[u], rowptr[u + 1]):
                    if s in excl:
                        continue
                    edges.append((int(rel_a[s]), int(tail_a[s]),
                                  float(time_a[s]) - t_q))
            else:
                lo = max(t_q - cfg.window, 0)
                for s in range(rowptr[u], rowptr[u + 1]):
                    if int(rel_a[s]) == cfg.idd_rel:
                        continue
                    if lo <= time_a[s] < t_q:
                        edges.append((int(rel_a[s]), int(tail_a[s]),
                                      t_q - float(time_a[s])))
                # self-loop at the window floor
                edges.append((cfg.idd_rel, u, min(t_q, float(cfg.window))))
            for r, v, delta in edges:
                h_r = rela[r]
                h_qr = rela[int(rels[qi])]
                msg = h_u + h_r + time_embed(params, delta)
                if cfg.mode == "interpolation":
                    w = fw if delta > 0 else (pw if delta < 0 else nw)
                else:
                    w = pw
                transformed = msg @ w
                pre = np.concatenate([h_u, h_r, h_qr])
                alpha = _sigmoid(np.maximum(pre @ a1, 0) @ a2)[0]
                agg[(qi, v)] = agg.get((qi, v), np.zeros(d)) \
                    + alpha * transformed
        frontier = {k: _leaky(v) for k, v in agg.items()}

    cls_w = np.asarray(params["classifier_w"])
    cls_b = np.asarray(params["classifier_b"])
    scores = np.zeros((b, n_ent))
    visited = np.zeros((b, n_ent), bool)
    for (qi, v), h in frontier.items():
        scores[qi, v] = (h @ cls_w + cls_b)[0]
        visited[qi, v] = True
    return scores, visited


@pytest.mark.parametrize("mode", ["interpolation", "extrapolation"])
def test_temporal_forward_matches_numpy_oracle(tmp_path, rng, mode):
    kg = _make_kg(tmp_path, rng)
    b = 6
    window = 6 if mode == "extrapolation" else None
    cfg = TemporalModelConfig(
        n_ent=kg.n_ent, n_rel_vocab=kg.n_rel + 1, idd_rel=kg.idd_rel,
        hidden_dim=10, attn_dim=7, n_layer=3, dropout=0.0,
        act="leakyrelu", mode=mode, window=window,
        time_key_base=kg.time_key_base, dense_hops=False)
    model = TRedGNN(cfg)
    data = kg.splits["train"][5:5 + b]
    if mode == "extrapolation":
        # need queries with nonzero time for a meaningful window
        data = kg.splits["train"][np.asarray(kg.splits["train"][:, 3] > 2
                                             ).nonzero()[0][:b]]
    subs = jnp.asarray(data[:, 0], jnp.int32)
    rels = jnp.asarray(data[:, 1], jnp.int32)
    times = jnp.asarray(data[:, 3], jnp.int32)
    qmask = jnp.asarray([True] * (b - 1) + [False])
    if mode == "extrapolation":
        caps = calibrate_caps_windowed(
            kg.ekey_np, kg.graph_np[2], kg.n_ent, kg.time_key_base,
            data[:, 0], data[:, 3], window, b, cfg.n_layer)
    else:
        caps = calibrate_caps(kg.graph_np[0], kg.graph_np[2], kg.n_ent,
                              data[:, 0], b, cfg.n_layer)
    params = model.init(
        {"params": jax.random.PRNGKey(2), "dropout": jax.random.PRNGKey(3)},
        kg.graph, kg.etime, subs, rels, times, qmask, caps,
        None, False, kg.ekey, kg.selfloop_slot, kg.time_rowptr,
        kg.dense)["params"]

    excl = (jnp.asarray(kg.exclusion_slots(np.arange(5, 5 + b)), jnp.int32)
            if mode == "interpolation" else None)
    got, aux = model.apply(
        {"params": params}, kg.graph, kg.etime, subs, rels, times, qmask,
        caps, excl, False, kg.ekey, kg.selfloop_slot, kg.time_rowptr,
        kg.dense)
    want, visited = oracle_forward(
        kg, params, cfg, np.asarray(subs), np.asarray(rels),
        np.asarray(times), np.asarray(qmask),
        np.asarray(excl) if excl is not None else None)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    if mode == "extrapolation":
        # scatter-softmax head: per-query distribution over the visited
        # frontier (`model_cuda_new_embedding.py:245-257`)
        keys = np.asarray(aux["frontier_keys"])
        prob = np.asarray(aux["frontier_softmax"])
        raw = {}
        for k, p in zip(keys, prob):
            if k == SENTINEL:
                continue
            raw[(k // kg.n_ent, k % kg.n_ent)] = p
        for qi in range(b):
            vs = [v for (q2, v) in raw if q2 == qi]
            if not vs:
                continue
            s = np.array([want[qi, v] for v in vs])
            soft = np.exp(s - s.max())
            soft /= soft.sum()
            got_soft = np.array([raw[(qi, v)] for v in vs])
            np.testing.assert_allclose(got_soft, soft, rtol=1e-4,
                                       atol=1e-6)
            assert set(vs) == set(np.nonzero(visited[qi])[0])
