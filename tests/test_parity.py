"""fp32 parity: JAX model vs an independent torch oracle, through the
checkpoint converter (models/convert.py). This is the test the reference
never had (SURVEY.md §4): logit-level agreement for encoder + every head.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from uc2_tpu.config import UC2Config
from uc2_tpu.models.pretraining import UC2ForPretraining
from uc2_tpu.models import convert

from tests.torch_oracle import OracleUC2

CFG = UC2Config(vocab_size=1000, hidden_size=64, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=128,
                max_position_embeddings=66, img_dim=32, img_label_dim=11,
                dtype="float32", use_pallas_attention=False,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    oracle = OracleUC2()
    # randomize LayerNorm/bias params away from init for a stronger test
    with torch.no_grad():
        for p in oracle.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    model = UC2ForPretraining(CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    loaded = convert.torch_to_params(oracle.state_dict())
    params = convert.merge_params(params, loaded)
    # rank head lives outside init_params; check init_rank_from_itm directly
    rng = np.random.RandomState(1)
    B, Lt, Nb = 3, 10, 7
    ids = np.full((B, Lt), CFG.pad_token_id, np.int64)
    n_txt = [10, 6, 8]
    n_img = [7, 4, 5]
    for b in range(B):
        ids[b, :n_txt[b]] = rng.randint(3, 1000, n_txt[b])
        ids[b, 0] = 0
    feat = rng.randn(B, Nb, 32).astype(np.float32)
    pos = rng.rand(B, Nb, 7).astype(np.float32)
    mask = np.zeros((B, Lt + Nb), np.int64)
    for b in range(B):
        mask[b, :n_txt[b]] = 1
        mask[b, Lt:Lt + n_img[b]] = 1
    return oracle, model, params, (ids, feat, pos, mask, n_txt, n_img)


def valid_sel(mask):
    return mask.astype(bool)


def test_encoder_parity(setup):
    oracle, model, params, (ids, feat, pos, mask, n_txt, n_img) = setup
    with torch.no_grad():
        t_seq, t_pool = oracle.encode(
            torch.tensor(ids), torch.tensor(feat), torch.tensor(pos),
            torch.tensor(mask))
    j_seq, j_pool = model.encoder.apply(
        {"params": params["roberta"]},
        input_ids=jnp.asarray(ids, jnp.int32), img_feat=jnp.asarray(feat),
        img_pos_feat=jnp.asarray(pos), attn_mask=jnp.asarray(mask, jnp.int32))
    sel = valid_sel(mask)
    np.testing.assert_allclose(np.asarray(j_seq)[sel],
                               t_seq.numpy()[sel], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_pool), t_pool.numpy(),
                               rtol=1e-4, atol=1e-4)


def test_mrm_masked_encoder_parity(setup):
    oracle, model, params, (ids, feat, pos, mask, n_txt, n_img) = setup
    rng = np.random.RandomState(2)
    img_masks = (rng.rand(3, 7) < 0.4)
    for b, n in enumerate(n_img):
        img_masks[b, n:] = False
    with torch.no_grad():
        t_seq, _ = oracle.encode(
            torch.tensor(ids), torch.tensor(feat), torch.tensor(pos),
            torch.tensor(mask), img_masks=torch.tensor(img_masks))
    j_seq, _ = model.encoder.apply(
        {"params": params["roberta"]},
        input_ids=jnp.asarray(ids, jnp.int32), img_feat=jnp.asarray(feat),
        img_pos_feat=jnp.asarray(pos), attn_mask=jnp.asarray(mask, jnp.int32),
        img_masks=jnp.asarray(img_masks))
    sel = valid_sel(mask)
    np.testing.assert_allclose(np.asarray(j_seq)[sel], t_seq.numpy()[sel],
                               rtol=1e-4, atol=1e-4)


def test_heads_parity(setup):
    oracle, model, params, (ids, feat, pos, mask, n_txt, n_img) = setup
    with torch.no_grad():
        t_seq, t_pool = oracle.encode(
            torch.tensor(ids), torch.tensor(feat), torch.tensor(pos),
            torch.tensor(mask))
        t_lm = oracle.lm_logits(t_seq[:, :3])
        t_rf = oracle.region_feat(t_seq[:, 10:13])
        t_rc = oracle.region_logits(t_seq[:, 10:13])
        t_itm = oracle.itm_output(t_pool)
        t_vqa = oracle.vqa_logits(t_pool)

    j_seq, j_pool = model.encoder.apply(
        {"params": params["roberta"]},
        input_ids=jnp.asarray(ids, jnp.int32), img_feat=jnp.asarray(feat),
        img_pos_feat=jnp.asarray(pos), attn_mask=jnp.asarray(mask, jnp.int32))
    emb = params["roberta"]["embeddings"]["word_embeddings"]
    j_lm = model.cls.apply({"params": params["cls"]}, j_seq[:, :3], emb)
    ik = params["roberta"]["img_embeddings"]["img_linear"]["kernel"]
    j_rf = model.feat_regress.apply({"params": params["feat_regress"]},
                                    j_seq[:, 10:13], ik)
    j_rc = model.region_classifier.apply(
        {"params": params["region_classifier"]}, j_seq[:, 10:13])
    j_itm = model.itm_output.apply({"params": params["itm_output"]}, j_pool)

    np.testing.assert_allclose(np.asarray(j_lm), t_lm.numpy(), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_rf), t_rf.numpy(), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_rc), t_rc.numpy(), rtol=1e-4,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(j_itm), t_itm.numpy(), rtol=1e-4,
                               atol=1e-4)

    # VQA head through the converter
    from uc2_tpu.models.heads import VqaHead
    vqa = VqaHead(CFG, num_answer=7)
    vparams = vqa.init(jax.random.PRNGKey(0), jnp.zeros((1, 64)))["params"]
    vl = convert.torch_to_params(oracle.state_dict())["vqa_output"]
    vparams = convert.merge_params(vparams, vl)
    j_vqa = vqa.apply({"params": vparams}, j_pool)
    np.testing.assert_allclose(np.asarray(j_vqa), t_vqa.numpy(), rtol=1e-4,
                               atol=1e-4)


def test_rank_head_init(setup):
    oracle, model, params, _ = setup
    import copy
    p = {"itm_output": {"out": {
        "kernel": np.asarray(params["itm_output"]["out"]["kernel"]),
        "bias": np.asarray(params["itm_output"]["out"]["bias"])}},
        "rank_output": {"out": {"kernel": np.zeros((64, 1), np.float32),
                                "bias": np.zeros((1,), np.float32)}}}
    p = convert.init_rank_from_itm(p)
    np.testing.assert_array_equal(
        p["rank_output"]["out"]["kernel"][:, 0],
        p["itm_output"]["out"]["kernel"][:, 1])


def test_partial_loading():
    """load_embedding_only / load_layer filters (model/model.py:24-41)."""
    sd = {
        "roberta.embeddings.word_embeddings.weight": np.zeros((10, 4)),
        "roberta.encoder.layer.0.intermediate.dense.weight": np.zeros((8, 4)),
        "roberta.encoder.layer.3.intermediate.dense.weight": np.zeros((8, 4)),
    }
    t = convert.torch_to_params(sd, load_embedding_only=True)
    assert "layer_0" not in t.get("roberta", {})
    assert "embeddings" in t["roberta"]
    t = convert.torch_to_params(sd, load_layer=2)
    assert "layer_0" in t["roberta"] and "layer_3" not in t["roberta"]


def test_ipot_vs_numpy():
    """IPOT transport plan vs a direct numpy transcription of the IPOT
    algorithm (Xie et al. 2019), incl. the reference's masking scheme."""
    from uc2_tpu.models.ot import optimal_transport_dist
    rng = np.random.RandomState(3)
    B, M, N, D = 2, 5, 4, 8
    x = rng.randn(B, M, D).astype(np.float32)
    y = rng.randn(B, N, D).astype(np.float32)
    x_pad = np.zeros((B, M), bool)
    y_pad = np.zeros((B, N), bool)
    x_pad[0, 3:] = True
    y_pad[0, 2:] = True

    def np_ot(x, y, x_pad, y_pad, beta=0.5, iters=50, k=1):
        xn = x / np.maximum(np.linalg.norm(x, axis=-1, keepdims=True), 1e-5)
        yn = y / np.maximum(np.linalg.norm(y, axis=-1, keepdims=True), 1e-5)
        C = 1 - np.einsum("bmd,bnd->bmn", xn, yn)
        jp = x_pad[:, :, None] | y_pad[:, None, :]
        C[jp] = 0
        xl = (M - x_pad.sum(1)).astype(np.float32)
        yl = (N - y_pad.sum(1)).astype(np.float32)
        b = x.shape[0]
        sigma = (np.ones((b, M)) / xl[:, None])
        sigma[x_pad] = 0
        sigma = sigma[:, :, None]
        T = np.ones((b, N, M))
        A = np.exp(-np.swapaxes(C, 1, 2) / beta)
        jpT = np.swapaxes(jp, 1, 2)
        T[jpT] = 0
        A[jpT] = 0
        xm = (x_pad * 1e4)[:, None, :]
        ym = (y_pad * 1e4)[:, None, :]
        for _ in range(iters):
            Q = A * T
            for _ in range(k):
                delta = 1 / (yl[:, None, None]
                             * np.swapaxes(Q @ sigma, 1, 2) + ym)
                sigma_new = 1 / (xl[:, None, None] * (delta @ Q) + xm)
            T = np.swapaxes(delta, 1, 2) * Q * sigma_new
            sigma = np.swapaxes(sigma_new, 1, 2)
        T[jpT] = 0
        return np.einsum("bmn,bnm->b", C, T)

    want = np_ot(x, y, x_pad, y_pad)
    got = optimal_transport_dist(jnp.asarray(x), jnp.asarray(y),
                                 jnp.asarray(x_pad), jnp.asarray(y_pad))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-4)
