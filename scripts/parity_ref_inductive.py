"""Score-level parity check: REFERENCE RED_GNN_induc vs our RedGNN on the
SAME random weights and the SAME inductive graph.

Instantiates the reference model (CPU-patched copy, torch), ports its
state_dict into our flax tree (scripts/port_ref_inductive_eval.port), and
compares the full (b, n_ent_ind) score matrices of both forward passes on
a batch of inductive test queries.  Any structural eval/graph bug (the
round-5 nell_v4 investigation) shows up here as a score mismatch with
zero training in the loop.

Usage:
  python scripts/parity_ref_inductive.py <ref_copy_dir> <dataset> [b]
  e.g. python scripts/parity_ref_inductive.py /tmp/ref_induct2 nell_v4 20
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main():
    ref_dir, dataset = sys.argv[1], sys.argv[2]
    b = int(sys.argv[3]) if len(sys.argv) > 3 else 20

    # --- reference side (torch, CPU-patched) ---------------------------
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.cuda.set_device = lambda *a, **k: None
    torch.cuda.is_available = lambda: False
    torch.manual_seed(7)

    sys.path.insert(0, ref_dir)
    os.chdir(ref_dir)
    from load_data import DataLoader as RefLoader  # noqa: E402
    from models import RED_GNN_induc  # noqa: E402

    class Opts:
        pass

    from redgnn_tpu.utils.config import dataset_config

    cfg = dataset_config("static_inductive", dataset)
    opts = Opts()
    opts.hidden_dim = cfg.hidden_dim
    opts.attn_dim = cfg.attn_dim
    opts.n_layer = cfg.n_layer
    opts.dropout = cfg.dropout
    opts.act = cfg.act

    ref_loader = RefLoader(os.path.join(ref_dir, "data", dataset))
    opts.n_rel = ref_loader.n_rel
    ref_model = RED_GNN_induc(opts, ref_loader)
    ref_model.eval()

    qs = np.array([q[0] for q in ref_loader.test_q[:b]], np.int64)
    rs = np.array([q[1] for q in ref_loader.test_q[:b]], np.int64)
    with torch.no_grad():
        ref_scores = ref_model(list(qs), list(rs), mode="inductive").numpy()

    # --- our side ------------------------------------------------------
    import dataclasses

    import jax.numpy as jnp

    from redgnn_tpu.graph.calibrate import FrontierCaps, _round_up, simulate_hops
    from redgnn_tpu.graph.inductive import InductiveKG
    from redgnn_tpu.models.redgnn import ModelConfig, RedGNN
    from scripts.port_ref_inductive_eval import port

    kg = InductiveKG.load(
        f"/root/reference/Static/inductive/data/{dataset}")
    assert kg.n_rel == ref_loader.n_rel and kg.n_ent_ind == ref_loader.n_ent_ind

    model_cfg = ModelConfig(
        n_ent=kg.n_ent_ind, n_rel=kg.n_rel, hidden_dim=cfg.hidden_dim,
        attn_dim=cfg.attn_dim, n_layer=cfg.n_layer, dropout=cfg.dropout,
        act=cfg.act, dedup_impl=cfg.dedup_impl,
        dense_hops=cfg.dense_hops, dense_switch=cfg.dense_switch,
    )
    model = RedGNN(model_cfg)

    rowptr, _, tail = kg.ind_graph_np
    nc, ec = simulate_hops(rowptr, tail, kg.n_ent_ind, qs, cfg.n_layer)
    caps = FrontierCaps(
        tuple([b] + [_round_up(c + 8) for c in nc[1:]]),
        tuple(_round_up(c + 8) for c in ec),
    )

    params = port(ref_model.state_dict(), cfg.n_layer)
    params = jax.tree_util.tree_map(jnp.asarray, params)
    scores, _aux = model.apply(
        {"params": params}, kg.ind_graph,
        jnp.asarray(qs, jnp.int32), jnp.asarray(rs, jnp.int32),
        jnp.ones(b, bool), caps, False,
    )
    ours = np.asarray(scores)

    diff = np.abs(ours - ref_scores)
    # ranks of the true answers under both score sets tell us whether any
    # numeric drift is metric-relevant
    print("max|diff|", float(diff.max()),
          "mean|diff|", float(diff.mean()),
          "ref |scores| mean", float(np.abs(ref_scores).mean()))
    worst = np.unravel_index(diff.argmax(), diff.shape)
    print("worst (query_idx, entity)", worst,
          "ref", float(ref_scores[worst]), "ours", float(ours[worst]))
    nz_ref = (ref_scores != 0).sum(1)
    nz_ours = (ours != 0).sum(1)
    print("visited-count per query  ref:", nz_ref.tolist())
    print("visited-count per query ours:", nz_ours.tolist())


if __name__ == "__main__":
    main()
