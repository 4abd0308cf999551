"""Reproducibility: identical seeds ⇒ identical batches, losses, params."""

import jax
import numpy as np
import pytest

from uc2_tpu.config import UC2Config
from uc2_tpu.data.collate import BucketSpec
from uc2_tpu.data.db import DetectFeatDb, TxtTokDb
from uc2_tpu.data.loader import TaskLoader
from uc2_tpu.data.synth import synth_corpus
from uc2_tpu.data import datasets as D
from uc2_tpu.models.pretraining import UC2ForPretraining
from uc2_tpu.training import optim as O
from uc2_tpu.training.step import create_train_state, make_train_step

TINY = UC2Config(vocab_size=512, hidden_size=32, num_hidden_layers=1,
                 num_attention_heads=2, intermediate_size=64,
                 max_position_embeddings=64, img_dim=16, img_label_dim=11,
                 dtype="float32", use_pallas_attention=False)


def run_once(corpus, n_steps=3):
    txt = TxtTokDb(corpus["txt_db"], max_txt_len=20)
    img = DetectFeatDb(corpus["img_db"], conf_th=0.2, max_bb=10, min_bb=4)
    tl = TaskLoader("mlm", D.MlmDataset(txt, img),
                    [BucketSpec(22, 10, 8, 8)], seed=5)
    model = UC2ForPretraining(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    tx = O.build_optimizer(params, O.constant(1e-3))
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, "mlm", tx))
    losses = []
    for i in range(n_steps):
        b = tl.next_batch()
        b.pop("_bucket")
        state, m = step(state, b, jax.random.PRNGKey(100 + i))
        losses.append(float(m["loss"]))
    return losses, state


def test_bitwise_reproducible(tmp_path):
    corpus = synth_corpus(str(tmp_path), n_imgs=10, txt_per_img=2, min_bb=4,
                          max_bb=10, img_dim=16, n_classes=11, seed=17,
                          vocab=512)
    l1, s1 = run_once(corpus)
    l2, s2 = run_once(corpus)
    assert l1 == l2
    k1 = np.asarray(s1.params["cls"]["dense"]["kernel"])
    k2 = np.asarray(s2.params["cls"]["dense"]["kernel"])
    np.testing.assert_array_equal(k1, k2)
