"""Remat (activation checkpointing) and bf16 training smoke tests."""

import jax
import numpy as np
import pytest

from uc2_tpu.config import UC2Config
from uc2_tpu.models.pretraining import UC2ForPretraining
from uc2_tpu.training import optim as O
from uc2_tpu.training.step import create_train_state, make_train_step


def _batch(rng, vocab, B=4, Lt=10, Nb=6, M=8, img_dim=16):
    import jax.numpy as jnp
    ids = rng.integers(4, vocab, (B, Lt)).astype(np.int32)
    return {
        "input_ids": jnp.asarray(ids),
        "img_feat": jnp.asarray(
            rng.standard_normal((B, Nb, img_dim)).astype(np.float32)),
        "img_pos_feat": jnp.asarray(
            rng.random((B, Nb, 7)).astype(np.float32)),
        "attn_mask": jnp.ones((B, Lt + Nb), jnp.int32),
        "masked_pos": jnp.asarray(
            rng.integers(1, Lt, (B, M)).astype(np.int32)),
        "masked_weight": jnp.ones((B, M), jnp.float32),
        "txt_labels": jnp.asarray(
            rng.integers(4, vocab, (B, M)).astype(np.int32)),
    }


@pytest.mark.parametrize("remat,dtype", [("dots", "float32"),
                                         ("full", "float32"),
                                         ("none", "bfloat16")])
def test_remat_and_bf16_train(remat, dtype):
    cfg = UC2Config(vocab_size=256, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=2, intermediate_size=64,
                    max_position_embeddings=40, img_dim=16, img_label_dim=7,
                    dtype=dtype, remat=remat, use_pallas_attention=False)
    model = UC2ForPretraining(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    tx = O.build_optimizer(params, O.constant(1e-3))
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, "mlm", tx))
    rng = np.random.default_rng(0)
    batch = _batch(rng, 256)
    losses = []
    for i in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        assert np.isfinite(float(m["loss"]))
        losses.append(float(m["loss"]))
    assert min(losses[1:]) < losses[0]
    # params stay fp32 regardless of compute dtype
    k = state.params["roberta"]["layer_0"]["attention"]["qkv"]["kernel"]
    assert k.dtype == np.float32


def test_remat_matches_no_remat():
    """Remat must not change the forward value."""
    import jax.numpy as jnp
    rng = np.random.default_rng(1)
    outs = []
    for remat in ("none", "full"):
        cfg = UC2Config(vocab_size=256, hidden_size=32, num_hidden_layers=2,
                        num_attention_heads=2, intermediate_size=64,
                        max_position_embeddings=40, img_dim=16,
                        img_label_dim=7, dtype="float32", remat=remat,
                        use_pallas_attention=False,
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0)
        model = UC2ForPretraining(cfg)
        params = model.init_params(jax.random.PRNGKey(0))
        batch = _batch(np.random.default_rng(2), 256)
        s, n = model.forward_mlm(params, batch)
        outs.append(float(s))
    assert outs[0] == pytest.approx(outs[1], rel=1e-6)
