"""End-to-end training smoke: the full driver learns on a tiny KG."""

import numpy as np
import pytest

from redgnn_tpu.graph.kg import StaticKG
from redgnn_tpu.train.loop import StaticTrainer
from redgnn_tpu.utils.config import TrainConfig


def write_kg(tmp_path, rng, n_ent=40, n_rel=4):
    """A compositional KG: r2(x) = r0(r1(x)) so 2-hop reasoning helps."""
    ents = [f"e{i}" for i in range(n_ent)]
    rels = [f"r{i}" for i in range(n_rel)]
    (tmp_path / "entities.txt").write_text("\n".join(ents) + "\n")
    (tmp_path / "relations.txt").write_text("\n".join(rels) + "\n")

    perm1 = rng.permutation(n_ent)
    perm0 = rng.permutation(n_ent)
    triples = []
    for i in range(n_ent):
        triples.append((f"e{i}", "r1", f"e{perm1[i]}"))
        triples.append((f"e{perm1[i]}", "r0", f"e{perm0[perm1[i]]}"))
        triples.append((f"e{i}", "r2", f"e{perm0[perm1[i]]}"))  # composition
        triples.append((f"e{i}", "r3", f"e{rng.integers(n_ent)}"))  # noise
    rng.shuffle(triples)
    n = len(triples)
    splits = {
        "facts.txt": triples[: int(n * 0.6)],
        "train.txt": triples[int(n * 0.6): int(n * 0.85)],
        "valid.txt": triples[int(n * 0.85): int(n * 0.95)],
        "test.txt": triples[int(n * 0.95):],
    }
    for fname, tri in splits.items():
        (tmp_path / fname).write_text(
            "\n".join(f"{h}\t{r}\t{t}" for h, r, t in tri) + "\n"
        )
    return tmp_path


def test_training_learns(tmp_path, rng):
    kg = StaticKG.load(str(write_kg(tmp_path, rng)))
    cfg = TrainConfig(hidden_dim=16, attn_dim=5, n_layer=2, dropout=0.05,
                      lr=0.01, lamb=1e-5, n_batch=16, n_tbatch=16, epochs=4)
    trainer = StaticTrainer(kg, cfg)
    losses, mrrs = [], []
    for epoch in range(4):
        losses.append(trainer.train_epoch(epoch))
        mrrs.append(trainer.evaluate("valid")["mrr"])
        trainer.kg.resplit(trainer._np_rng)
    assert losses[-1] < losses[0] * 0.9, losses
    # random MRR over 40 entities ~ 0.1; a learning model beats it easily
    assert max(mrrs) > 0.2, mrrs


def test_eval_metrics_shape(tmp_path, rng):
    kg = StaticKG.load(str(write_kg(tmp_path, rng)))
    cfg = TrainConfig(hidden_dim=16, attn_dim=5, n_layer=2, dropout=0.0,
                      n_batch=16, n_tbatch=8)
    trainer = StaticTrainer(kg, cfg)
    m = trainer.evaluate("test")
    for k in ("mrr", "h1", "h3", "h10"):
        assert 0.0 <= m[k] <= 1.0
    assert m["h1"] <= m["h3"] <= m["h10"]


def test_predictor_topk(tmp_path, rng):
    from redgnn_tpu.serve import Predictor

    kg = StaticKG.load(str(write_kg(tmp_path, rng)))
    cfg = TrainConfig(hidden_dim=16, attn_dim=5, n_layer=2, dropout=0.0,
                      n_batch=16, n_tbatch=8)
    trainer = StaticTrainer(kg, cfg)
    trainer.train_epoch(0)
    pred = Predictor(trainer, split="test", top_k=5)
    nq = min(10, len(kg.test))
    heads = kg.test[:nq, 0]
    rels = kg.test[:nq, 1]
    scores, ents = pred.predict(heads, rels)
    assert scores.shape == (nq, 5) and ents.shape == (nq, 5)
    assert np.all(np.diff(scores, axis=1) <= 1e-6)  # sorted desc
    assert np.all((ents >= 0) & (ents < kg.n_ent))


def test_vocab_blank_lines_and_dense_ids(tmp_path):
    """Review fix: blank lines must not gap the id space, and explicit
    name\\tid files must produce a dense [0, n) range."""
    from redgnn_tpu.graph.kg import _read_vocab

    p = tmp_path / "entities.txt"
    p.write_text("a\nb\n\nc\n")
    v = _read_vocab(str(p))
    assert v == {"a": 0, "b": 1, "c": 2}

    p2 = tmp_path / "pairs.txt"
    p2.write_text("x\t1\ny\t0\n\nz\t2\n")
    assert _read_vocab(str(p2)) == {"x": 1, "y": 0, "z": 2}

    import pytest
    bad = tmp_path / "gapped.txt"
    bad.write_text("x\t0\ny\t5\n")
    with pytest.raises(ValueError):
        _read_vocab(str(bad))
    dup = tmp_path / "dup.txt"
    dup.write_text("x\nx\n")
    with pytest.raises(ValueError):
        _read_vocab(str(dup))


def test_static_nonfinite_step_rejected(tmp_path, rng):
    """Static analogue of test_nonfinite_step_rejected: a batch whose
    loss/grads are non-finite must leave params and Adam moments exactly
    as they were (the reference-parity random nan-scrub must never see a
    NaN'd tree)."""
    import jax
    import jax.numpy as jnp

    kg = StaticKG.load(str(write_kg(tmp_path, rng)))
    cfg = TrainConfig(hidden_dim=16, attn_dim=5, n_layer=2, dropout=0.0,
                      lr=0.01, n_batch=8, n_tbatch=8)
    trainer = StaticTrainer(kg, cfg)
    data = kg.train_data[:8]
    args = (jnp.asarray(data[:, 0], jnp.int32),
            jnp.asarray(data[:, 1], jnp.int32),
            jnp.asarray(data[:, 2], jnp.int32),
            jnp.ones(8, bool))
    step = jax.jit(trainer._train_step_impl, static_argnames=("caps",))

    # healthy step: params move
    p1, o1, loss1, ov1, _ = step(trainer.params, trainer.opt_state,
                                 kg.graph, *args, jax.random.PRNGKey(0),
                                 trainer.train_caps)
    assert np.isfinite(float(loss1))
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p1, trainer.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0

    # poisoned weights -> non-finite forward -> the step must be a no-op
    poisoned = jax.tree_util.tree_map(
        lambda p: jnp.full_like(p, 1e38), trainer.params)
    p2, o2, loss2, ov2, _ = step(poisoned, trainer.opt_state,
                                 kg.graph, *args, jax.random.PRNGKey(0),
                                 trainer.train_caps)
    assert float(loss2) == 0.0
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        p2, poisoned)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                   np.asarray(b)),
        o2, trainer.opt_state)


def test_load_without_facts_file(tmp_path, rng):
    """YAGO/nell ship no facts.txt (the reference's own loader crashes on
    them, `load_data.py:32`); StaticKG must derive the initial 3:1
    fact/train split from train.txt, reproducibly."""
    d = write_kg(tmp_path, rng)
    all_train = np.loadtxt(d / "train.txt", dtype=str).tolist() \
        + np.loadtxt(d / "facts.txt", dtype=str).tolist()
    (d / "train.txt").write_text(
        "\n".join("\t".join(t) for t in all_train) + "\n")
    (d / "facts.txt").unlink()
    kg = StaticKG.load(str(d))
    n = len(all_train)
    assert len(kg.fact) == n * 3 // 4
    assert len(kg.fact) + len(kg.train) == n
    # deterministic split
    kg2 = StaticKG.load(str(d))
    np.testing.assert_array_equal(kg.fact, kg2.fact)
    # the usual machinery still works
    cfg = TrainConfig(hidden_dim=8, attn_dim=5, n_layer=2, dropout=0.0,
                      n_batch=8, n_tbatch=8)
    trainer = StaticTrainer(kg, cfg)
    trainer.train_epoch(0)
    m = trainer.evaluate("valid")
    assert 0.0 <= m["mrr"] <= 1.0
