"""Cross-framework A/B: evaluate a REFERENCE-trained checkpoint with OUR
eval machinery.

Loads a torch ``state_dict`` saved from the reference inductive trainer
(`Static/inductive/base_model.py` / `models.py` — the CPU-patched copy at
/tmp/ref_induct2 saves `results/ep<N>.pt` per epoch), ports the weights
into our flax RedGNN parameter tree, and runs our StaticTrainer
evaluation on valid (train graph) and test (ind graph).

Purpose (round-5 nell_v4 investigation): at matched valid MRR the
reference run scores ~+0.06..0.13 higher test MRR on nell_v4 than our
training runs do.  If OUR eval of REF weights reproduces the reference's
own printed numbers, the eval/frontier machinery is exonerated and the
gap is a training-dynamics difference; if it comes out low, the
ind-graph eval path is at fault.

Parameter mapping (torch Linear stores (out,in); flax kernel is (in,out)):
  gnn_layers.{i}.rela_embed.weight -> layer_{i}/rela_embed
  gnn_layers.{i}.{Ws,Wr}_attn.weight^T -> layer_{i}/{Ws,Wr}_attn/kernel
  gnn_layers.{i}.Wqr_attn.{weight^T,bias} -> layer_{i}/Wqr_attn
  gnn_layers.{i}.w_alpha.{weight^T,bias} -> layer_{i}/w_alpha
  gnn_layers.{i}.W_h.weight^T -> layer_{i}/W_h/kernel
  gate.{weight_ih_l0^T,weight_hh_l0^T,bias_ih_l0,bias_hh_l0}
      -> gate/{w_ih,w_hh,b_ih,b_hh}   (same r,z,n gate order)
  W_final.weight^T -> W_final/kernel

Usage:
  python scripts/port_ref_inductive_eval.py <state.pt> <data_path> [dataset]
"""

import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")  # never touch the shared chip

import numpy as np  # noqa: E402


def port(state, n_layer):
    def t(key):
        return np.asarray(state[key].detach().cpu().numpy())

    params = {}
    for i in range(n_layer):
        pre = f"gnn_layers.{i}."
        params[f"layer_{i}"] = {
            "rela_embed": t(pre + "rela_embed.weight"),
            "Ws_attn": {"kernel": t(pre + "Ws_attn.weight").T},
            "Wr_attn": {"kernel": t(pre + "Wr_attn.weight").T},
            "Wqr_attn": {"kernel": t(pre + "Wqr_attn.weight").T,
                         "bias": t(pre + "Wqr_attn.bias")},
            "w_alpha": {"kernel": t(pre + "w_alpha.weight").T,
                        "bias": t(pre + "w_alpha.bias")},
            "W_h": {"kernel": t(pre + "W_h.weight").T},
        }
    params["gate"] = {
        "w_ih": t("gate.weight_ih_l0").T,
        "w_hh": t("gate.weight_hh_l0").T,
        "b_ih": t("gate.bias_ih_l0"),
        "b_hh": t("gate.bias_hh_l0"),
    }
    params["W_final"] = {"kernel": t("W_final.weight").T}
    return params


def main():
    pt_path = sys.argv[1]
    data_path = sys.argv[2]
    dataset = sys.argv[3] if len(sys.argv) > 3 else data_path.rstrip("/").split("/")[-1]

    import torch

    state = torch.load(pt_path, map_location="cpu")

    from redgnn_tpu.graph.inductive import InductiveKG
    from redgnn_tpu.train.loop import StaticTrainer
    from redgnn_tpu.utils.config import dataset_config

    cfg = dataset_config("static_inductive", dataset)
    kg = InductiveKG.load(data_path)
    trainer = StaticTrainer(kg, cfg)

    ported = port(state, cfg.n_layer)
    # shape check against the initialized tree
    flat_init = jax.tree_util.tree_leaves_with_path(trainer.params)
    flat_port = dict(jax.tree_util.tree_leaves_with_path(ported))
    import jax.numpy as jnp
    for path, leaf in flat_init:
        assert path in flat_port, f"missing ported leaf {path}"
        assert flat_port[path].shape == leaf.shape, (
            f"{path}: ported {flat_port[path].shape} vs ours {leaf.shape}")
    trainer.params = jax.tree_util.tree_map(jnp.asarray, ported)

    import json
    for split in ("valid", "test"):
        m = trainer.evaluate(split)
        print(json.dumps({"split": split, "ckpt": pt_path,
                          **{k: round(float(v), 4) for k, v in m.items()}}),
              flush=True)


if __name__ == "__main__":
    main()
