"""xERTE baseline: shapes, probability semantics, differentiability."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from redgnn_tpu.graph.temporal import TemporalKG
from redgnn_tpu.models.xerte import XErte, XErteConfig, bce_loss
from tests.test_temporal import write_temporal_dir


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    rng = np.random.default_rng(3)
    kg = TemporalKG.load_vocab_dir(
        str(write_temporal_dir(tmp_path_factory.mktemp("xerte"), rng)))
    cfg = XErteConfig(
        n_ent=kg.n_ent, n_rel=kg.idd_rel, n_time=kg.n_time + 2,
        emb_dim=(32, 16, 8), dp_steps=2, dp_num_edges=4,
        max_attended_edges=8,
    )
    model = XErte(cfg)
    b = 4
    q = kg.splits["valid"][:b]
    args = (
        kg.graph.rowptr, kg.graph.rel, kg.graph.tail, kg.ekey,
        kg.time_key_base,
        jnp.asarray(q[:, 0], jnp.int32), jnp.asarray(q[:, 1], jnp.int32),
        jnp.asarray(q[:, 3], jnp.int32), jnp.ones(b, bool),
        jnp.int32(0),
    )
    variables = model.init(jax.random.PRNGKey(0), *args)
    return kg, cfg, model, variables, args, q


def test_forward_shapes_and_mass(setup):
    kg, cfg, model, variables, args, q = setup
    mass, aux = model.apply(variables, *args)
    b = 4
    assert mass.shape == (b, kg.n_ent)
    mass_np = np.asarray(mass)
    assert np.all(mass_np >= 0)
    # per-query attention mass is L1-normalized over visited nodes; entity
    # mass (a sum of node masses) must total ~1 per live query
    sums = mass_np.sum(axis=1)
    np.testing.assert_allclose(sums, 1.0, atol=1e-3)
    assert not bool(jnp.any(aux["node_overflow"]))


def test_sampling_strategies(setup):
    kg, cfg, model, variables, args, q = setup
    import dataclasses

    with pytest.raises(ValueError):
        m_bad = XErte(dataclasses.replace(cfg, sampling="frist"))
        m_bad.apply(variables, *args)

    for strat in ("uniform", "first", "last", "weighted", "whole"):
        cfg2 = dataclasses.replace(cfg, sampling=strat)
        m2 = XErte(cfg2)
        mass, _ = m2.apply(variables, *args)
        assert np.all(np.isfinite(np.asarray(mass)))


def test_bce_loss_grad(setup):
    kg, cfg, model, variables, args, q = setup
    targets = jnp.asarray(q[:, 2], jnp.int32)

    def loss_fn(params):
        mass, _ = model.apply({"params": params}, *args)
        return bce_loss(mass, targets, jnp.ones(4, bool))

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree_util.tree_leaves(grads)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)


def test_jit_compiles(setup):
    kg, cfg, model, variables, args, q = setup
    f = jax.jit(lambda v, *a: model.apply(v, *a)[0])
    mass = f(variables, *args)
    assert mass.shape == (4, kg.n_ent)


def test_xerte_trainer_smoke(tmp_path, rng):
    from redgnn_tpu.train.xerte_loop import XErteTrainer

    kg = TemporalKG.load_vocab_dir(
        str(write_temporal_dir(tmp_path, rng)))
    cfg = XErteConfig(
        n_ent=kg.n_ent, n_rel=kg.idd_rel, n_time=kg.n_time + 2,
        emb_dim=(16, 8), dp_steps=1, dp_num_edges=4, max_attended_edges=6,
    )
    trainer = XErteTrainer(kg, cfg, batch_size=16)
    loss0 = trainer.train_epoch(0)
    loss1 = trainer.train_epoch(1)
    assert np.isfinite(loss0) and np.isfinite(loss1)
    m = trainer.evaluate("valid")
    assert 0.0 <= m["mrr"] <= 1.0


def test_seen_unseen_splits(tmp_path, rng):
    import pathlib
    from redgnn_tpu.graph.preprocess import augment_with_inverses

    (tmp_path / "src").mkdir()
    src = write_temporal_dir(tmp_path / "src", rng)
    # round-trip through the augmentation utility into an id-free dir
    # (the vocab loader re-reads names, so this checks the preprocess too)
    dst = tmp_path / "aug"
    augment_with_inverses(str(src), str(dst))
    assert (dst / "train.txt").exists()
    n_src = len((src / "train.txt").read_text().splitlines())
    n_dst = len((dst / "train.txt").read_text().splitlines())
    assert n_dst == 2 * n_src


def test_wikidata_augmentation_folds_since(tmp_path):
    """wikidata11k 5-col format: the reference rewrites relation ->
    relation-since and keeps ONLY rewritten rows + inverses
    (`interpolation/data/preprocess.py:27-45`)."""
    from redgnn_tpu.graph.preprocess import augment_with_inverses

    src = tmp_path / "wd"
    src.mkdir()
    (src / "train.txt").write_text(
        "E1\tP26\tE2\toccursSince\t2001\n"
        "E3\tP39\tE4\toccursUntil\t1999\n")
    dst = tmp_path / "wd_aug"
    augment_with_inverses(str(src), str(dst), files=("train.txt",),
                          wikidata_format=True)
    out = (dst / "train.txt").read_text().splitlines()
    assert out == [
        "e1\tp26-occurssince\te2\t2001",
        "e3\tp39-occursuntil\te4\t1999",
        "e2\t~p26-occurssince\te1\t2001",
        "e4\t~p39-occursuntil\te3\t1999",
    ]


def test_xerte_overflow_grows_caps(tmp_path, rng):
    """Visited-set overflow is surfaced and handled by geometric capacity
    growth + replay (review fix: it used to be silently dropped,
    clamping distinct nodes onto one slot)."""
    from redgnn_tpu.train.xerte_loop import XErteTrainer

    kg = TemporalKG.load_vocab_dir(
        str(write_temporal_dir(tmp_path, rng)))
    # max_attended_edges far below the per-step unique-target count so
    # the pre-pruning insert overflows the budgeted visited capacity
    cfg = XErteConfig(
        n_ent=kg.n_ent, n_rel=kg.idd_rel, n_time=kg.n_time + 2,
        emb_dim=(16, 8, 8), dp_steps=2, dp_num_edges=8,
        max_attended_edges=2,
    )
    trainer = XErteTrainer(kg, cfg, batch_size=16)
    loss = trainer.train_epoch(0)
    assert np.isfinite(loss)
    assert trainer.cfg.cap_factor > 1.0, \
        "expected the overflow path to grow cap_factor"
    m = trainer.evaluate("valid")
    assert 0.0 <= m["mrr"] <= 1.0
