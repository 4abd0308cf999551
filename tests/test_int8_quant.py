"""int8 serving quantization (encoder-block matmuls): accuracy envelope and
score agreement with the fp path."""

import jax
import jax.numpy as jnp
import numpy as np

from uc2_tpu.config import UC2Config
from uc2_tpu.models.encoder import int8_matmul
from uc2_tpu.models.finetune import UC2ForImageTextRetrieval


def test_int8_matmul_accuracy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 768)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((768, 768)) * 0.02, jnp.float32)
    y_q = np.asarray(int8_matmul(x, w, jnp.float32))
    y = np.asarray(x @ w)
    rel = np.linalg.norm(y_q - y) / np.linalg.norm(y)
    assert rel < 0.02, rel          # ~1% relative Frobenius error


def test_int8_scores_track_fp_scores():
    """Same params, quant vs fp scoring: scores stay close and the ranking
    over a batch is preserved (the serving contract)."""
    rng = np.random.default_rng(1)
    base = dict(vocab_size=512, hidden_size=64, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=128,
                max_position_embeddings=64, img_dim=16, img_label_dim=11,
                dtype="float32", use_pallas_attention=False)
    fp = UC2ForImageTextRetrieval(UC2Config(**base))
    q8 = UC2ForImageTextRetrieval(UC2Config(**base, quant="int8"))
    params = fp.init_params(jax.random.PRNGKey(0))

    B, Lt, Nb = 16, 12, 8
    ids = rng.integers(4, 512, (B, Lt)).astype(np.int32)
    ids[:, 0] = 0
    batch = {
        "input_ids": jnp.asarray(ids),
        "img_feat": jnp.asarray(
            rng.standard_normal((B, Nb, 16)).astype(np.float32)),
        "img_pos_feat": jnp.asarray(rng.random((B, Nb, 7))
                                    .astype(np.float32)),
        "attn_mask": jnp.ones((B, Lt + Nb), jnp.int32),
    }
    s_fp = np.asarray(fp.scores(params, batch, deterministic=True)).ravel()
    s_q8 = np.asarray(q8.scores(params, batch, deterministic=True)).ravel()
    assert np.all(np.isfinite(s_q8))
    # scores drift but stay within a tight band of the fp spread
    spread = np.abs(s_fp).max() + 1e-6
    assert np.max(np.abs(s_q8 - s_fp)) < 0.15 * spread, (
        np.max(np.abs(s_q8 - s_fp)), spread)
    # rank correlation of the batch ordering
    r_fp = np.argsort(np.argsort(s_fp))
    r_q8 = np.argsort(np.argsort(s_q8))
    rho = np.corrcoef(r_fp, r_q8)[0, 1]
    assert rho > 0.95, rho


def test_int8_full_retrieval_rk_agreement(tmp_path):
    """End-to-end R@K preservation: full_retrieval_eval (the serving path,
    reference itm.py:492-538) over a synthetic gallery, int8 vs fp on the
    SAME params, at a mid-size config (CPU budget; the uc2-base-on-real-
    artifacts run is one command via scripts/verify_real_ckpt.py --quant
    int8). Every R@K metric must agree within 1 retrieval hit."""
    from uc2_tpu.data.db import DetectFeatDb, TxtTokDb
    from uc2_tpu.data.synth import synth_corpus
    from uc2_tpu.evalu.retrieval import full_retrieval_eval

    corpus = synth_corpus(str(tmp_path / "c"), n_imgs=16, txt_per_img=2,
                          min_bb=4, max_bb=12, img_dim=32, n_classes=11,
                          seed=9, max_words=7, vocab=600)
    base = dict(vocab_size=600, hidden_size=128, num_hidden_layers=4,
                num_attention_heads=4, intermediate_size=256,
                max_position_embeddings=64, img_dim=32, img_label_dim=11,
                dtype="float32", use_pallas_attention=False,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    fp = UC2ForImageTextRetrieval(UC2Config(**base))
    q8 = UC2ForImageTextRetrieval(UC2Config(**base, quant="int8"))
    params = fp.init_params(jax.random.PRNGKey(2))
    tdb = TxtTokDb(corpus["txt_db"], max_txt_len=16)
    idb = DetectFeatDb(corpus["img_db"], 0.2, 12, 4, 12)

    m_fp, (mat_fp, _, _) = full_retrieval_eval(fp, params, tdb, idb, 18, 12,
                                               batch_size=8,
                                               return_matrix=True)
    m_q8, (mat_q8, _, _) = full_retrieval_eval(q8, params, tdb, idb, 18, 12,
                                               batch_size=8,
                                               return_matrix=True)
    # the serving contract is ranking preservation: per-text orderings over
    # the gallery must rank-correlate tightly...
    rhos = []
    for r_fp, r_q8 in zip(mat_fp, mat_q8):
        a = np.argsort(np.argsort(r_fp))
        b = np.argsort(np.argsort(r_q8))
        rhos.append(np.corrcoef(a, b)[0, 1])
    assert float(np.mean(rhos)) > 0.98, float(np.mean(rhos))
    # ...and R@K may move only by near-tie flips (random-init params give
    # razor-thin margins; ≤2 flipped hits out of 16/32 queries)
    n_txt, n_img = len(tdb.ids), 16
    for k in ("txt_r1", "txt_r5", "txt_r10"):
        assert abs(m_q8[k] - m_fp[k]) <= 2.0 / n_img + 1e-9, (k, m_fp, m_q8)
    for k in ("img_r1", "img_r5", "img_r10"):
        assert abs(m_q8[k] - m_fp[k]) <= 2.0 / n_txt + 1e-9, (k, m_fp, m_q8)
