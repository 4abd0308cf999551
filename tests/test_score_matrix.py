"""score_matrix tiling correctness: each (text, image) cell must equal a
direct single-pair forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uc2_tpu.config import UC2Config
from uc2_tpu.data.db import DetectFeatDb, TxtTokDb
from uc2_tpu.data.synth import synth_corpus
from uc2_tpu.evalu.retrieval import score_matrix
from uc2_tpu.models.finetune import UC2ForImageTextRetrieval

CFG = UC2Config(vocab_size=512, hidden_size=32, num_hidden_layers=1,
                num_attention_heads=2, intermediate_size=64,
                max_position_embeddings=64, img_dim=16, img_label_dim=11,
                dtype="float32", use_pallas_attention=False)


def test_score_matrix_matches_direct(tmp_path):
    corpus = synth_corpus(str(tmp_path), n_imgs=5, txt_per_img=1, min_bb=4,
                          max_bb=8, img_dim=16, n_classes=11, seed=33,
                          vocab=512)
    txt_db = TxtTokDb(corpus["txt_db"], max_txt_len=20)
    img_db = DetectFeatDb(corpus["img_db"], conf_th=0.2, max_bb=8, min_bb=4)
    model = UC2ForImageTextRetrieval(CFG)
    params = model.init_params(jax.random.PRNGKey(0))

    txt_ids = list(txt_db.ids)[:3]
    img_ids = sorted({txt_db.txt2img[t] for t in txt_db.ids})
    Lt, Nb = 22, 8
    m = score_matrix(model, params, txt_db, img_db, txt_ids, img_ids,
                     Lt, Nb, batch_size=2)
    assert m.shape == (3, len(img_ids))

    # bucket smaller than batch_size (regression: pad > bucket size)
    m2 = score_matrix(model, params, txt_db, img_db, txt_ids, img_ids,
                      Lt, Nb, batch_size=16, nbb_buckets=(5, 6))
    np.testing.assert_allclose(m2, m, rtol=1e-4, atol=1e-4)

    # direct single-pair scoring for a few cells
    for (i, j) in [(0, 0), (1, 2), (2, len(img_ids) - 1)]:
        rec = txt_db[txt_ids[i]]
        ids = np.asarray(txt_db.combine_inputs(rec["input_ids"]))[:Lt]
        row = np.full((1, Lt), 1, np.int32)
        row[0, :len(ids)] = ids
        tmask = np.zeros((1, Lt), np.int32)
        tmask[0, :len(ids)] = 1
        feat, bb7 = img_db[img_ids[j]]
        k = feat.shape[0]
        f = np.zeros((1, Nb, 16), np.float32)
        b7 = np.zeros((1, Nb, 7), np.float32)
        f[0, :k] = feat
        b7[0, :k] = bb7
        imask = np.zeros((1, Nb), np.int32)
        imask[0, :k] = 1
        batch = {"input_ids": jnp.asarray(row), "img_feat": jnp.asarray(f),
                 "img_pos_feat": jnp.asarray(b7),
                 "attn_mask": jnp.asarray(
                     np.concatenate([tmask, imask], 1))}
        want = float(model.scores(params, batch)[0])
        assert m[i, j] == pytest.approx(want, rel=1e-4, abs=1e-4), (i, j)
