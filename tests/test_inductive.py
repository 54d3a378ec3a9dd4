"""Inductive KGC: two-graph plumbing on the real fb237_v1 dataset."""

import os

import numpy as np
import pytest

from redgnn_tpu.graph.inductive import InductiveKG
from redgnn_tpu.train.loop import StaticTrainer
from redgnn_tpu.utils.config import TrainConfig

DATA = "/root/reference/Static/inductive/data/fb237_v1"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(DATA), reason="reference dataset not available"
)


@pytest.fixture(scope="module")
def kg():
    return InductiveKG.load(DATA)


def test_load_semantics(kg):
    # vocab files carry explicit ids
    assert kg.n_ent == 1594 and kg.n_ent_ind == 1093 and kg.n_rel == 180
    # training queries are the doubled transductive valid set
    assert len(kg.train_data) == 2 * 489
    # graphs: doubled train + self-loops
    assert kg.graph_np[1].shape[0] == 2 * 4245 + kg.n_ent
    assert kg.ind_graph_np[1].shape[0] == 2 * 1993 + kg.n_ent_ind
    # eval specs: valid on transductive graph, test on inductive graph
    vs, ts = kg.eval_spec("valid"), kg.eval_spec("test")
    assert vs.n_ent == 1594 and ts.n_ent == 1093
    # test queries come from inductive valid+test (doubled, grouped)
    assert sum(len(a) for a in ts.answers) == 2 * (205 + 206)


def test_inductive_train_and_eval(kg):
    cfg = TrainConfig(hidden_dim=16, attn_dim=5, n_layer=3, dropout=0.1,
                      lr=0.005, lamb=1e-5, n_batch=32, n_tbatch=32)
    trainer = StaticTrainer(kg, cfg)
    loss0 = trainer.train_epoch(0)
    assert np.isfinite(loss0)
    vm = trainer.evaluate("valid")
    tm = trainer.evaluate("test")
    for m in (vm, tm):
        assert 0.0 <= m["mrr"] <= 1.0
        assert m["h1"] <= m["h10"]
    # the two splits ran on different graphs with different entity counts
    assert set(trainer._eval_steps.keys()) == {1594, 1093}


def test_shuffle_train_flag(kg):
    """shuffle_train=False keeps the reference's file-order training
    (`Static/inductive/base_model.py` never calls `shuffle_train`,
    `load_data.py:166`): fit() must leave train_data order untouched."""
    cfg = TrainConfig(hidden_dim=8, attn_dim=4, n_layer=2, dropout=0.0,
                      n_batch=64, n_tbatch=64, epochs=1,
                      shuffle_train=False)
    kg2 = InductiveKG.load(DATA)
    before = kg2.train_data.copy()
    StaticTrainer(kg2, cfg).fit(eval_every=2)  # no eval: order check only
    assert np.array_equal(kg2.train_data, before)

    kg3 = InductiveKG.load(DATA)
    before3 = kg3.train_data.copy()
    cfg_shuf = TrainConfig(hidden_dim=8, attn_dim=4, n_layer=2,
                           dropout=0.0, n_batch=64, n_tbatch=64, epochs=1)
    StaticTrainer(kg3, cfg_shuf).fit(eval_every=2)
    assert not np.array_equal(kg3.train_data, before3)
