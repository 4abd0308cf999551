"""Fused attention-block kernel (ops/fused_block.py) — correctness in
interpreter mode on CPU, both as a raw op against the unfused XLA chain and
integrated into the encoder ("fused-force" routes EncoderLayer through it
regardless of platform/shape)."""

import jax
import jax.numpy as jnp
import numpy as np

from uc2_tpu.config import UC2Config
from uc2_tpu.models.encoder import UC2Model
from uc2_tpu.ops.attention import _xla_attention
from uc2_tpu.ops.fused_block import (fused_attn_block, fused_block_profitable,
                                     fused_ffn_block, fused_layer_block)


def _xla_chain(q, k, v, bias, x, wo, bo, gamma, beta, eps):
    ctx = _xla_attention(q, k, v, bias)
    B, L, n, d = q.shape
    y = ctx.reshape(B, L, n * d) @ wo
    y = y.astype(jnp.float32) + bo + x.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    return (yn * gamma + beta).astype(x.dtype)


def test_fused_block_matches_xla_chain():
    B, L, n, d = 4, 48, 2, 16
    H = n * d
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((B, L, H)), jnp.float32)
    wo = jnp.asarray(rng.standard_normal((H, H)) * 0.05, jnp.float32)
    bo = jnp.asarray(rng.standard_normal((H,)) * 0.02, jnp.float32)
    gamma = jnp.asarray(1.0 + rng.standard_normal((H,)) * 0.1, jnp.float32)
    beta = jnp.asarray(rng.standard_normal((H,)) * 0.1, jnp.float32)
    mask = (rng.random((B, L)) < 0.8).astype(np.float32)
    mask[:, :2] = 1.0
    bias = jnp.asarray(((1.0 - mask) * -10000.0)[:, None, None, :],
                       jnp.float32)

    got = fused_attn_block(q, k, v, bias, x, wo, bo, gamma, beta,
                           eps=1e-12, interpret=True)
    want = _xla_chain(q, k, v, bias, x, wo, bo, gamma, beta, 1e-12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # BB > 1 grid splits agree too
    got2 = fused_attn_block(q, k, v, bias, x, wo, bo, gamma, beta,
                            eps=1e-12, BB=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_encoder_fused_force_matches_unfused():
    """The encoder with use_pallas_attention='fused-force' (interpret-mode
    fused block in every layer) matches the plain XLA encoder at fp32."""
    kw = dict(vocab_size=300, hidden_size=32, num_hidden_layers=2,
              num_attention_heads=2, intermediate_size=64,
              max_position_embeddings=64, img_dim=16, img_label_dim=5,
              dtype="float32", hidden_dropout_prob=0.0,
              attention_probs_dropout_prob=0.0)
    cfg_x = UC2Config(use_pallas_attention=False, **kw)
    cfg_f = UC2Config(use_pallas_attention="fused-force", **kw)
    rng = np.random.default_rng(1)
    B, Lt, Nb = 3, 9, 6
    ids = rng.integers(3, 300, (B, Lt)).astype(np.int32)
    ids[:, 0] = 0
    feat = rng.standard_normal((B, Nb, 16)).astype(np.float32)
    pos = rng.random((B, Nb, 7)).astype(np.float32)
    mask = np.ones((B, Lt + Nb), np.int32)
    mask[0, Lt - 2:Lt] = 0
    mask[1, Lt + 4:] = 0

    m_x = UC2Model(cfg_x)
    params = m_x.init({"params": jax.random.PRNGKey(0)},
                      input_ids=jnp.asarray(ids), img_feat=jnp.asarray(feat),
                      img_pos_feat=jnp.asarray(pos),
                      attn_mask=jnp.asarray(mask))["params"]
    seq_x, pool_x = m_x.apply({"params": params}, input_ids=jnp.asarray(ids),
                              img_feat=jnp.asarray(feat),
                              img_pos_feat=jnp.asarray(pos),
                              attn_mask=jnp.asarray(mask))
    m_f = UC2Model(cfg_f)
    seq_f, pool_f = m_f.apply({"params": params}, input_ids=jnp.asarray(ids),
                              img_feat=jnp.asarray(feat),
                              img_pos_feat=jnp.asarray(pos),
                              attn_mask=jnp.asarray(mask))
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(seq_f)[valid],
                               np.asarray(seq_x)[valid],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(pool_f), np.asarray(pool_x),
                               rtol=2e-4, atol=2e-4)


def test_fused_ffn_block_matches_xla_chain():
    B, L, H, F = 2, 30, 32, 128
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((B, L, H)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((H, F)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((F,)) * 0.02, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, H)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((H,)) * 0.02, jnp.float32)
    gamma = jnp.asarray(1.0 + rng.standard_normal((H,)) * 0.1, jnp.float32)
    beta = jnp.asarray(rng.standard_normal((H,)) * 0.1, jnp.float32)

    h = jax.nn.gelu(x @ w1 + b1, approximate=False)
    y = (h @ w2 + b2 + x).astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    want = ((y - mu) * jax.lax.rsqrt(var + 1e-12)) * gamma + beta

    # R=16 exercises row tiling + the ragged pad (B·L=60 % 16 != 0)
    got = fused_ffn_block(x, w1, b1, w2, b2, gamma, beta, eps=1e-12,
                          R=16, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_layer_block_matches_two_kernel_split():
    """Whole-layer kernel ≡ fused_attn_block ∘ fused_ffn_block."""
    B, L, n, d, F = 2, 32, 2, 16, 64
    H = n * d
    rng = np.random.default_rng(3)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
    q, k, v = f32(B, L, n, d), f32(B, L, n, d), f32(B, L, n, d)
    x = f32(B, L, H)
    wo, bo = f32(H, H), f32(H)
    g1 = jnp.asarray(1.0 + rng.standard_normal(H) * 0.1, jnp.float32)
    be1 = f32(H)
    w1, b1, w2, b2 = f32(H, F), f32(F), f32(F, H), f32(H)
    g2 = jnp.asarray(1.0 + rng.standard_normal(H) * 0.1, jnp.float32)
    be2 = f32(H)
    mask = (rng.random((B, L)) < 0.8).astype(np.float32)
    mask[:, :2] = 1.0
    bias = jnp.asarray(((1.0 - mask) * -10000.0)[:, None, None, :],
                       jnp.float32)
    x2 = fused_attn_block(q, k, v, bias, x, wo, bo, g1, be1, eps=1e-12,
                          interpret=True)
    want = fused_ffn_block(x2, w1, b1, w2, b2, g2, be2, eps=1e-12, R=16,
                           interpret=True)
    got = fused_layer_block(q, k, v, bias, x, wo, bo, g1, be1,
                            w1, b1, w2, b2, g2, be2, eps=1e-12,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_fused_attn_block_v2_matches_v1_plus_projection():
    """v2 (QKV projection in-kernel) ≡ XLA projection + v1 block, incl.
    the encoder's fused-[q|k|v] weight layout and head split."""
    from uc2_tpu.ops.fused_block import fused_attn_block_v2
    B, L, n, d = 3, 40, 4, 8
    H = n * d
    rng = np.random.default_rng(5)
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s) * 0.05, jnp.float32)
    x = f32(B, L, H)
    w_qkv, b_qkv = f32(H, 3 * H), f32(3 * H)
    wo, bo = f32(H, H), f32(H)
    gamma = jnp.asarray(1.0 + rng.standard_normal(H) * 0.1, jnp.float32)
    beta = f32(H)
    mask = (rng.random((B, L)) < 0.8).astype(np.float32)
    mask[:, :2] = 1.0
    bias = jnp.asarray(((1.0 - mask) * -10000.0)[:, None, None, :],
                       jnp.float32)

    qkv = x.reshape(B * L, H) @ w_qkv + b_qkv
    q, k, v = jnp.split(qkv.reshape(B, L, 3 * H), 3, axis=-1)
    want = fused_attn_block(q.reshape(B, L, n, d), k.reshape(B, L, n, d),
                            v.reshape(B, L, n, d), bias, x, wo, bo,
                            gamma, beta, eps=1e-12, interpret=True)
    got = fused_attn_block_v2(x, w_qkv, b_qkv, bias, wo, bo, gamma, beta,
                              n=n, eps=1e-12, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)
    # BB>1 grid split agrees
    got2 = fused_attn_block_v2(x, w_qkv, b_qkv, bias, wo, bo, gamma, beta,
                               n=n, eps=1e-12, BB=3, interpret=True)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_profitability_gate():
    # the three production eval buckets at uc2-base (Lt=62): fused wins only
    # at the ragged worst-case joint length
    assert fused_block_profitable(162, 12)        # Nb=100 bucket
    assert fused_block_profitable(128, 12)        # Nb=66: wins in-graph
    assert not fused_block_profitable(98, 12)     # Nb=36 (XLA faster, small)


def test_snap_bb_modes(monkeypatch):
    """gcd default degenerates to 1 on coprime budgets (the shipping
    behavior at every eval bucket: bb=3/5/9 vs B=64); UC2_BB_SNAP=div
    picks the largest divisor of B under the same VMEM budget."""
    from uc2_tpu.ops.tiles import snap_bb
    monkeypatch.delenv("UC2_BB_SNAP", raising=False)
    # gcd mode must stay bit-identical to the raced shipping behavior,
    # including the bb > B corner (gcd(100, 64) = 4, not 64)
    assert [snap_bb(b, 64) for b in (3, 5, 9, 16, 100)] == [1, 1, 1, 16, 4]
    monkeypatch.setenv("UC2_BB_SNAP", "div")
    assert [snap_bb(b, 64) for b in (3, 5, 9, 16, 100)] == [2, 4, 8, 16, 64]
    assert snap_bb(0, 64) == 1 and snap_bb(7, 1) == 1
