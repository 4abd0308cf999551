"""Finetune models + retrieval/NLVR2 metrics tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uc2_tpu.config import UC2Config
from uc2_tpu.evalu.itm_metrics import itm_eval, nlvr2_eval
from uc2_tpu.models.finetune import (UC2ForImageTextRetrieval, UC2ForNlvr2,
                                     UC2ForVqa, expand_type_embeddings)
from uc2_tpu.models import convert

CFG = UC2Config(vocab_size=256, hidden_size=32, num_hidden_layers=1,
                num_attention_heads=2, intermediate_size=64,
                max_position_embeddings=40, img_dim=16, img_label_dim=7,
                dtype="float32", use_pallas_attention=False)


def mk_batch(rng, B=6, Lt=8, Nb=5):
    ids = rng.randint(4, 256, (B, Lt)).astype(np.int32)
    ids[:, 0] = 0
    return {
        "input_ids": jnp.asarray(ids),
        "img_feat": jnp.asarray(rng.randn(B, Nb, 16).astype(np.float32)),
        "img_pos_feat": jnp.asarray(rng.rand(B, Nb, 7).astype(np.float32)),
        "attn_mask": jnp.ones((B, Lt + Nb), jnp.int32),
    }


def test_itm_eval_perfect():
    txt_ids = [f"t{i}" for i in range(8)]
    img_ids = [f"i{j}" for j in range(4)]
    txt2img = {f"t{i}": f"i{i % 4}" for i in range(8)}
    img2txts = {f"i{j}": [f"t{j}", f"t{j+4}"] for j in range(4)}
    score = np.full((8, 4), -5.0)
    for i in range(8):
        score[i, i % 4] = 5.0
    out = itm_eval(score, txt_ids, img_ids, txt2img, img2txts)
    assert out["img_r1"] == 1.0 and out["txt_r1"] == 1.0
    assert out["r_mean"] == 1.0
    # adversarial: flip scores → r1 must drop
    out2 = itm_eval(-score, txt_ids, img_ids, txt2img, img2txts)
    assert out2["img_r1"] == 0.0


def test_itm_eval_partial():
    txt_ids = ["a", "b"]
    img_ids = ["x", "y"]
    txt2img = {"a": "x", "b": "y"}
    img2txts = {"x": ["a"], "y": ["b"]}
    score = np.array([[1.0, 2.0], [0.0, 3.0]])  # 'a' ranks x second
    out = itm_eval(score, txt_ids, img_ids, txt2img, img2txts)
    assert out["img_r1"] == 0.5 and out["img_r5"] == 1.0


def test_nlvr2_eval():
    labels = {"dev-1-0-0": 1, "dev-1-1-0": 0, "dev-2-0-0": 1}
    preds = {"dev-1-0-0": 1, "dev-1-1-0": 1, "dev-2-0-0": 1}
    out = nlvr2_eval(preds, labels)
    assert out["acc"] == pytest.approx(2 / 3)
    assert out["consistency"] == pytest.approx(1 / 2)


def test_retrieval_model():
    rng = np.random.RandomState(0)
    model = UC2ForImageTextRetrieval(CFG, margin=0.2)
    params = model.init_params(jax.random.PRNGKey(0))
    params = convert.init_rank_from_itm(
        jax.tree_util.tree_map(np.asarray, params))
    batch = mk_batch(rng)
    s = model.scores(params, batch)
    assert s.shape == (6,)
    loss = model.rank_loss(params, batch, sample_size=3, deterministic=True)
    assert loss.shape == (2, 2)
    assert np.all(np.asarray(loss) >= 0)


def test_vqa_model():
    rng = np.random.RandomState(1)
    model = UC2ForVqa(CFG, num_answer=9)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = mk_batch(rng)
    batch["soft_targets"] = jnp.asarray(
        rng.rand(6, 9).astype(np.float32))
    logits = model.logits(params, batch)
    assert logits.shape == (6, 9)
    loss = model.loss(params, batch, deterministic=True)
    assert loss.shape == (6, 9) and np.isfinite(np.asarray(loss)).all()


@pytest.mark.parametrize("fmt", ["triplet", "paired", "paired-attn"])
def test_nlvr2_model(fmt):
    rng = np.random.RandomState(2)
    model = UC2ForNlvr2(CFG, fmt=fmt)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = mk_batch(rng, B=6)
    batch["img_type_ids"] = jnp.ones((6, 5), jnp.int32)
    batch["targets"] = jnp.asarray([0, 1, 1] if fmt != "triplet"
                                   else [0, 1, 1, 0, 1, 0], jnp.int32)
    logits = model.logits(params, batch)
    expected_rows = 3 if fmt in ("paired", "paired-attn") else 6
    assert logits.shape == (expected_rows, 2)
    loss = model.loss(params, batch, deterministic=True)
    assert np.isfinite(np.asarray(loss)).all()


def test_expand_type_embeddings():
    p = {"roberta": {"token_type_embeddings": np.random.randn(2, 8)}}
    orig = p["roberta"]["token_type_embeddings"].copy()
    p = expand_type_embeddings(p)
    t = p["roberta"]["token_type_embeddings"]
    assert t.shape == (3, 8)
    np.testing.assert_array_equal(t[2], orig[1])
