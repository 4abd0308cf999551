"""Encoder unit tests: shapes, masking invariance, position ids, task forwards."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uc2_tpu.config import UC2Config
from uc2_tpu.models.encoder import (UC2Model,
                                    create_position_ids_from_input_ids)
from uc2_tpu.models.pretraining import UC2ForPretraining

SMALL = UC2Config(vocab_size=1000, hidden_size=64, num_hidden_layers=2,
                  num_attention_heads=4, intermediate_size=128,
                  max_position_embeddings=66, img_dim=32, img_label_dim=11,
                  dtype="float32", use_pallas_attention=False)


def make_batch(rng, B=2, Lt=8, Nb=6, cfg=SMALL, n_txt=None, n_img=None):
    n_txt = n_txt or [Lt] * B
    n_img = n_img or [Nb] * B
    ids = np.full((B, Lt), cfg.pad_token_id, np.int32)
    for b in range(B):
        ids[b, :n_txt[b]] = rng.randint(3, cfg.vocab_size, n_txt[b])
        ids[b, 0] = 0  # CLS
    feat = rng.randn(B, Nb, cfg.img_dim).astype(np.float32)
    pos = rng.rand(B, Nb, 7).astype(np.float32)
    mask = np.zeros((B, Lt + Nb), np.int32)
    for b in range(B):
        mask[b, :n_txt[b]] = 1
        mask[b, Lt:Lt + n_img[b]] = 1
        feat[b, n_img[b]:] = 0
        pos[b, n_img[b]:] = 0
    return {"input_ids": jnp.asarray(ids), "img_feat": jnp.asarray(feat),
            "img_pos_feat": jnp.asarray(pos), "attn_mask": jnp.asarray(mask)}


def test_position_ids(rng):
    ids = jnp.array([[0, 5, 7, 1, 1], [0, 9, 9, 9, 1]], jnp.int32)
    got = create_position_ids_from_input_ids(ids, 1)
    # non-pad tokens numbered from pad+1=2; pads stay at pad_id=1
    np.testing.assert_array_equal(
        np.asarray(got), [[2, 3, 4, 1, 1], [2, 3, 4, 5, 1]])


def test_forward_shapes(rng):
    model = UC2Model(SMALL)
    b = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), **b)["params"]
    seq, pooled = model.apply({"params": params}, **b)
    assert seq.shape == (2, 14, 64)
    assert pooled.shape == (2, 64)
    assert np.all(np.isfinite(np.asarray(seq)))


def test_padding_invariance(rng):
    """Valid positions must be unaffected by garbage in padded positions.

    This is the core guarantee that lets the static [txt|img] layout replace
    the reference's gather_index compaction (model/model.py:412-425): masked
    positions only leak through the additive -10000 bias, i.e. at ~1e-5
    relative scale in fp32 — below our tolerance.
    """
    model = UC2Model(SMALL)
    b = make_batch(rng, n_txt=[5, 8], n_img=[3, 6])
    params = model.init(jax.random.PRNGKey(0), **b)["params"]
    seq1, pooled1 = model.apply({"params": params}, **b)

    b2 = dict(b)
    ids = np.asarray(b["input_ids"]).copy()
    ids[0, 6] = 777  # garbage in padded text slot (still pad-masked)
    feat = np.asarray(b["img_feat"]).copy()
    feat[0, 4] = 3.14
    b2["input_ids"] = jnp.asarray(ids)
    b2["img_feat"] = jnp.asarray(feat)
    seq2, pooled2 = model.apply({"params": params}, **b2)

    valid = np.asarray(b["attn_mask"][0]).astype(bool)
    np.testing.assert_allclose(np.asarray(seq1[0])[valid],
                               np.asarray(seq2[0])[valid], rtol=2e-3,
                               atol=2e-3)


def test_pretraining_tasks_run(rng):
    model = UC2ForPretraining(SMALL)
    params = model.init_params(jax.random.PRNGKey(0))
    B, Lt, Nb, M = 2, 8, 6, 3
    b = make_batch(rng)
    b["masked_pos"] = jnp.asarray(rng.randint(0, Lt, (B, M)), jnp.int32)
    b["masked_weight"] = jnp.ones((B, M), jnp.float32)
    b["txt_labels"] = jnp.asarray(rng.randint(0, 1000, (B, M)), jnp.int32)
    loss, n = model.forward_mlm(params, b)
    assert np.isfinite(float(loss)) and float(n) == B * M

    # mrfr
    b["img_masks"] = jnp.asarray(rng.rand(B, Nb) < 0.3)
    b["masked_pos"] = jnp.asarray(Lt + rng.randint(0, Nb, (B, M)), jnp.int32)
    b["feat_targets"] = jnp.asarray(rng.randn(B, M, 32), jnp.float32)
    loss, n = model.forward_mrfr(params, b)
    assert np.isfinite(float(loss))

    # mrc hard + kl
    b["label_targets"] = jax.nn.softmax(
        jnp.asarray(rng.randn(B, M, 11), jnp.float32))
    for kl in (False, True):
        loss, n = model.forward_mrc(params, b, kl=kl)
        assert np.isfinite(float(loss))

    # itm + ot
    b["targets"] = jnp.asarray([0, 1], jnp.int32)
    loss, n, ot = model.forward_itm(params, b, compute_ot=True)
    assert np.isfinite(float(loss))
    assert ot.shape == (B,) and np.all(np.isfinite(np.asarray(ot)))

    # mmxlm-soft with a valid-id subset
    valid_ids = np.arange(0, 200, 2)
    b["label_targets"] = jax.nn.softmax(
        jnp.asarray(rng.randn(B, M, len(valid_ids)), jnp.float32))
    loss, n = model.forward_mmxlm_soft(params, b, valid_ids=valid_ids)
    assert np.isfinite(float(loss))


def test_text_only_forward(rng):
    """tlm-ni path: image inputs nulled (reference model/model.py:515-520)."""
    model = UC2Model(SMALL)
    b = make_batch(rng)
    params = model.init(jax.random.PRNGKey(0), **b)["params"]
    seq, pooled = model.apply(
        {"params": params}, input_ids=b["input_ids"],
        attn_mask=b["attn_mask"][:, :8])
    assert seq.shape == (2, 8, 64)
