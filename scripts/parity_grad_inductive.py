"""Gradient-level parity: REFERENCE vs our trainer on ONE train batch from
the SAME weights (dropout disabled both sides).

Follows scripts/parity_ref_inductive.py (score parity passed to 2e-6 on
nell_v4).  Here we compute d(loss)/d(params) for the first training batch
(the reference trains inductive in FILE ORDER — no shuffle_train call)
in both frameworks and report per-tensor max|diff|.  Matching gradients
+ matching Adam semantics (optax add_decayed_weights before
scale_by_adam == torch coupled weight_decay) proves the training loop is
equivalent modulo dropout RNG and batch order, leaving seed variance as
the only explanation for the nell_v4 test gap.

Usage: python scripts/parity_grad_inductive.py /tmp/ref_induct2 nell_v4
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402


def main():
    ref_dir, dataset = sys.argv[1], sys.argv[2]
    b = 20

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

    from redgnn_tpu.utils.config import dataset_config

    cfg = dataset_config("static_inductive", dataset)

    class Opts:
        pass

    opts = Opts()
    opts.hidden_dim = cfg.hidden_dim
    opts.attn_dim = cfg.attn_dim
    opts.n_layer = cfg.n_layer
    opts.dropout = cfg.dropout
    opts.act = cfg.act

    ref_loader = RefLoader(os.path.join(ref_dir, "data", dataset))
    opts.n_rel = ref_loader.n_rel
    ref_model = RED_GNN_induc(opts, ref_loader)
    ref_model.eval()  # dropout OFF; grads still flow

    triple = ref_loader.get_batch(np.arange(b))
    subs_np = np.asarray(triple[:, 0])
    rels_np = np.asarray(triple[:, 1])
    objs_np = np.asarray(triple[:, 2])

    scores = ref_model(list(subs_np), list(rels_np), mode="transductive")
    pos = scores[torch.arange(len(scores)), torch.LongTensor(objs_np)]
    max_n = torch.max(scores, 1, keepdim=True)[0]
    loss = torch.sum(-pos + max_n.squeeze(1)
                     + torch.log(torch.sum(torch.exp(scores - max_n), 1)))
    loss.backward()
    ref_grads = {k: v.grad.detach().numpy().copy()
                 for k, v in ref_model.named_parameters()}
    print("ref loss", float(loss))

    # --- our side ------------------------------------------------------
    import jax.numpy as jnp

    from redgnn_tpu.graph.calibrate import FrontierCaps, _round_up, simulate_hops
    from redgnn_tpu.graph.inductive import InductiveKG
    from redgnn_tpu.models.redgnn import ModelConfig, RedGNN
    from redgnn_tpu.train.loop import softmax_ce_loss
    from scripts.port_ref_inductive_eval import port

    kg = InductiveKG.load(f"/root/reference/Static/inductive/data/{dataset}")
    model_cfg = ModelConfig(
        n_ent=kg.n_ent, n_rel=kg.n_rel, hidden_dim=cfg.hidden_dim,
        attn_dim=cfg.attn_dim, n_layer=cfg.n_layer, dropout=cfg.dropout,
        act=cfg.act, dedup_impl=cfg.dedup_impl,
        dense_hops=cfg.dense_hops, dense_switch=cfg.dense_switch,
    )
    model = RedGNN(model_cfg)
    rowptr, _, tail = kg.graph_np
    nc, ec = simulate_hops(rowptr, tail, kg.n_ent, subs_np, cfg.n_layer)
    caps = FrontierCaps(
        tuple([b] + [_round_up(c + 8) for c in nc[1:]]),
        tuple(_round_up(c + 8) for c in ec),
    )
    params = jax.tree_util.tree_map(
        jnp.asarray, port(ref_model.state_dict(), cfg.n_layer))

    def loss_fn(p):
        scores, aux = model.apply(
            {"params": p}, kg.graph,
            jnp.asarray(subs_np, jnp.int32), jnp.asarray(rels_np, jnp.int32),
            jnp.ones(b, bool), caps, False,
        )
        return softmax_ce_loss(scores, jnp.asarray(objs_np), jnp.ones(b, bool))

    our_loss, our_grads = jax.value_and_grad(loss_fn)(params)
    print("our loss", float(our_loss))

    # --- compare (reuse the port mapping in reverse) -------------------
    def t(key):
        return ref_grads[key]

    worst = 0.0
    for i in range(cfg.n_layer):
        pre = f"gnn_layers.{i}."
        g = our_grads[f"layer_{i}"]
        pairs = [
            (t(pre + "rela_embed.weight"), g["rela_embed"], f"L{i}.rela"),
            (t(pre + "Ws_attn.weight").T, g["Ws_attn"]["kernel"], f"L{i}.Ws"),
            (t(pre + "Wr_attn.weight").T, g["Wr_attn"]["kernel"], f"L{i}.Wr"),
            (t(pre + "Wqr_attn.weight").T, g["Wqr_attn"]["kernel"], f"L{i}.Wqr"),
            (t(pre + "Wqr_attn.bias"), g["Wqr_attn"]["bias"], f"L{i}.Wqr.b"),
            (t(pre + "w_alpha.weight").T, g["w_alpha"]["kernel"], f"L{i}.wa"),
            (t(pre + "w_alpha.bias"), g["w_alpha"]["bias"], f"L{i}.wa.b"),
            (t(pre + "W_h.weight").T, g["W_h"]["kernel"], f"L{i}.Wh"),
        ]
        for ref_g, ours_g, name in pairs:
            d = float(np.abs(np.asarray(ours_g) - ref_g).max())
            scale = float(np.abs(ref_g).max()) or 1.0
            worst = max(worst, d / scale)
            print(f"{name:10s} max|dg| {d:.3e}  rel {d/scale:.3e}")
    for ref_k, ours_g, name in [
        ("gate.weight_ih_l0", our_grads["gate"]["w_ih"], "gate.wih"),
        ("gate.weight_hh_l0", our_grads["gate"]["w_hh"], "gate.whh"),
        ("gate.bias_ih_l0", our_grads["gate"]["b_ih"], "gate.bih"),
        ("gate.bias_hh_l0", our_grads["gate"]["b_hh"], "gate.bhh"),
        ("W_final.weight", our_grads["W_final"]["kernel"], "W_final"),
    ]:
        ref_g = t(ref_k)
        if ref_g.ndim == 2:
            ref_g = ref_g.T
        d = float(np.abs(np.asarray(ours_g) - ref_g).max())
        scale = float(np.abs(ref_g).max()) or 1.0
        worst = max(worst, d / scale)
        print(f"{name:10s} max|dg| {d:.3e}  rel {d/scale:.3e}")
    print("WORST relative grad diff:", worst)


if __name__ == "__main__":
    main()
