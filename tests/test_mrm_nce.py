"""MRM-NCE (completed contrastive objective) tests."""

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


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("nce_corpus")
    return synth_corpus(str(out), n_imgs=10, txt_per_img=2, min_bb=4,
                        max_bb=10, img_dim=16, n_classes=11, seed=11,
                        max_words=6, vocab=512)


def test_mrm_nce_dataset_and_step(corpus):
    txt = TxtTokDb(corpus["txt_db"], max_txt_len=20)
    img = DetectFeatDb(corpus["img_db"], conf_th=0.2, max_bb=10, min_bb=4)
    ds = D.MrmNceDataset(txt, img, neg_size=32)
    tl = TaskLoader("mrm-nce", ds, [BucketSpec(22, 10, 8, 8)], seed=0)
    batch = tl.next_batch()
    batch.pop("_bucket")
    assert batch["neg_feats"].shape == (32 + 8 * 7, 16)
    assert batch["feat_targets"].shape == (8, 8, 16)

    model = UC2ForPretraining(TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    loss_sum, n, correct = model.forward_mrm_nce(params, batch)
    assert np.isfinite(float(loss_sum)) and float(n) >= 8
    # with_stats: reference validate_mrm_nce's extra scalars
    # (pretrain.py:901-943) — mean L2 and cosine pred↔gold feature
    s2, n2, c2, l2, cos = model.forward_mrm_nce(params, batch,
                                                with_stats=True)
    np.testing.assert_allclose(float(s2), float(loss_sum), rtol=1e-6)
    assert np.isfinite(float(l2)) and float(l2) > 0
    assert -float(n2) <= float(cos) <= float(n2)   # per-slot cos in [-1,1]

    from uc2_tpu.training.step import make_eval_step
    ev = jax.jit(make_eval_step(model, "mrm-nce"))
    out = ev(params, batch)
    assert {"loss", "n_correct", "n_feat", "l2_sum", "cos_sum"} \
        <= set(out)
    np.testing.assert_allclose(float(out["loss"]), float(loss_sum),
                               rtol=1e-5)

    tx = O.build_optimizer(params, O.constant(1e-3))
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, "mrm-nce", tx))
    losses = []
    for i in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
        assert np.isfinite(losses[-1])
    assert min(losses[1:]) < losses[0]
