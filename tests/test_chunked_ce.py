"""Chunked-vocab cross-entropy: values and gradients match the dense path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uc2_tpu.config import UC2Config
from uc2_tpu.models.heads import (chunked_softmax_cross_entropy,
                                  cross_entropy_with_logits)
from uc2_tpu.models.pretraining import UC2ForPretraining


def test_chunked_matches_dense():
    rng = np.random.default_rng(0)
    N, H, V = 10, 16, 103  # V deliberately not divisible by n_chunks
    h = jnp.asarray(rng.standard_normal((N, H)), jnp.float32)
    table = jnp.asarray(rng.standard_normal((V, H)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(V), jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, N), jnp.int32)
    w = jnp.asarray((rng.random(N) > 0.3).astype(np.float32))

    dense = cross_entropy_with_logits(h @ table.T + bias, labels, w)
    for n_chunks in (1, 4, 8):
        chunked = chunked_softmax_cross_entropy(h, table, bias, labels, w,
                                                n_chunks=n_chunks)
        np.testing.assert_allclose(np.asarray(chunked), np.asarray(dense),
                                   rtol=1e-5, atol=1e-5)

    # gradients w.r.t. h, table, bias
    def loss_dense(h, t, b):
        return jnp.sum(cross_entropy_with_logits(h @ t.T + b, labels, w))

    def loss_chunked(h, t, b):
        return jnp.sum(chunked_softmax_cross_entropy(h, t, b, labels, w,
                                                     n_chunks=4))

    gd = jax.grad(loss_dense, argnums=(0, 1, 2))(h, table, bias)
    gc = jax.grad(loss_chunked, argnums=(0, 1, 2))(h, table, bias)
    for a, b_ in zip(gc, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-5)


def test_model_chunked_mlm_matches():
    cfg = UC2Config(vocab_size=211, hidden_size=32, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=64,
                    max_position_embeddings=40, img_dim=16, img_label_dim=7,
                    dtype="float32", use_pallas_attention=False)
    rng = np.random.default_rng(1)
    B, Lt, Nb, M = 2, 8, 4, 4
    batch = {
        "input_ids": jnp.asarray(rng.integers(4, 211, (B, Lt)), jnp.int32),
        "img_feat": jnp.asarray(
            rng.standard_normal((B, Nb, 16)), jnp.float32),
        "img_pos_feat": jnp.asarray(rng.random((B, Nb, 7)), jnp.float32),
        "attn_mask": jnp.ones((B, Lt + Nb), jnp.int32),
        "masked_pos": jnp.asarray(rng.integers(1, Lt, (B, M)), jnp.int32),
        "masked_weight": jnp.ones((B, M), jnp.float32),
        "txt_labels": jnp.asarray(rng.integers(4, 211, (B, M)), jnp.int32),
    }
    dense_model = UC2ForPretraining(cfg)
    params = dense_model.init_params(jax.random.PRNGKey(0))
    chunked_model = UC2ForPretraining(cfg, lm_ce_chunks=4)
    s1, n1 = dense_model.forward_mlm(params, batch)
    s2, n2 = chunked_model.forward_mlm(params, batch)
    assert float(n1) == float(n2)
    assert float(s1) == pytest.approx(float(s2), rel=1e-5)
    # gradients agree too
    g1 = jax.grad(lambda p: dense_model.forward_mlm(p, batch)[0])(params)
    g2 = jax.grad(lambda p: chunked_model.forward_mlm(p, batch)[0])(params)
    a = np.asarray(g1["roberta"]["embeddings"]["word_embeddings"])
    b = np.asarray(g2["roberta"]["embeddings"]["word_embeddings"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)
