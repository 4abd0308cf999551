"""Finetune models: retrieval (ITM-rank), VQA/VE, NLVR2 (3 formats).

Reference: model/itm.py (VLXLMRForImageTextRetrieval :12-55, hard-neg
variant :105-186), model/vqa.py:14-50, model/ve.py:7-11,
model/nlvr2.py:16-182 (+ vendored MultiheadAttention, model/attention.py).

Same functional-composition pattern as pretraining.py: params =
{"roberta": ..., "<head>": ...}; rank-head init from the ITM head is
convert.init_rank_from_itm.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from uc2_tpu.config import UC2Config
from uc2_tpu.models.encoder import Dense, UC2Model, gelu
from uc2_tpu.models import heads as H


class UC2ForImageTextRetrieval:
    """Rank-score model + margin triplet loss (reference model/itm.py:12-55).

    Batches are flattened groups of ``sample_size`` = 1 positive +
    2·neg_size negatives; loss = clamp(margin + σ(neg) − σ(pos), 0).
    """

    def __init__(self, config: UC2Config, margin: float = 0.2):
        self.config = config
        self.margin = margin
        self.encoder = UC2Model(config)
        self.itm_output = H.ItmHead(config)
        self.rank_output = H.RankHead(config)

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        cfg = self.config
        r_enc, r_itm, r_rank = jax.random.split(rng, 3)
        ids = jnp.ones((1, 4), jnp.int32)
        feat = jnp.zeros((1, 3, cfg.img_dim))
        pos = jnp.zeros((1, 3, 7))
        mask = jnp.ones((1, 7), jnp.int32)
        enc = self.encoder.init({"params": r_enc}, input_ids=ids,
                                img_feat=feat, img_pos_feat=pos,
                                attn_mask=mask)["params"]
        pooled = jnp.zeros((1, cfg.hidden_size))
        return {"roberta": enc,
                "itm_output": self.itm_output.init(
                    {"params": r_itm}, pooled)["params"],
                "rank_output": self.rank_output.init(
                    {"params": r_rank}, pooled)["params"]}

    def scores(self, params, batch, deterministic=True, rngs=None):
        _, pooled = self.encoder.apply(
            {"params": params["roberta"]},
            input_ids=batch["input_ids"],
            position_ids=batch.get("position_ids"),
            img_feat=batch["img_feat"], img_pos_feat=batch["img_pos_feat"],
            attn_mask=batch["attn_mask"], deterministic=deterministic,
            rngs=rngs)
        return self.rank_output.apply(
            {"params": params["rank_output"]}, pooled)[:, 0]

    def rank_loss(self, params, batch, sample_size: int,
                  deterministic=False, rngs=None):
        """Margin triplet over groups (reference model/itm.py:45-53):
        group row 0 is the positive."""
        s = jax.nn.sigmoid(self.scores(params, batch, deterministic, rngs))
        s = s.reshape(-1, sample_size)
        pos = s[:, :1]
        neg = s[:, 1:]
        return jnp.maximum(self.margin + neg - pos, 0.0)


class UC2ForVqa:
    """VQA head over pooled CLS, BCE-with-logits vs soft targets
    (reference model/vqa.py:14-50); VE = 3 answers (model/ve.py:7-11)."""

    def __init__(self, config: UC2Config, num_answer: int):
        self.config = config
        self.num_answer = num_answer
        self.encoder = UC2Model(config)
        self.vqa_output = H.VqaHead(config, num_answer)

    def init_params(self, rng):
        cfg = self.config
        r_enc, r_head = jax.random.split(rng)
        ids = jnp.ones((1, 4), jnp.int32)
        enc = self.encoder.init(
            {"params": r_enc}, input_ids=ids,
            img_feat=jnp.zeros((1, 3, cfg.img_dim)),
            img_pos_feat=jnp.zeros((1, 3, 7)),
            attn_mask=jnp.ones((1, 7), jnp.int32))["params"]
        return {"roberta": enc,
                "vqa_output": self.vqa_output.init(
                    {"params": r_head},
                    jnp.zeros((1, cfg.hidden_size)))["params"]}

    def logits(self, params, batch, deterministic=True, rngs=None):
        _, pooled = self.encoder.apply(
            {"params": params["roberta"]},
            input_ids=batch["input_ids"],
            img_feat=batch["img_feat"], img_pos_feat=batch["img_pos_feat"],
            attn_mask=batch["attn_mask"], deterministic=deterministic,
            rngs=rngs)
        return self.vqa_output.apply({"params": params["vqa_output"]}, pooled)

    def loss(self, params, batch, deterministic=False, rngs=None):
        logits = self.logits(params, batch, deterministic, rngs)
        return H.bce_with_logits(logits, batch["soft_targets"])


def expand_type_embeddings(params, n_types: int = 3):
    """NLVR2 init_type_embedding (reference model/nlvr2.py:25-33): grow the
    token-type table to 3 rows, row 2 copied from row 1."""
    t = np.asarray(params["roberta"]["token_type_embeddings"])
    if t.shape[0] >= n_types:
        return params
    rows = [t[i] for i in range(t.shape[0])] + \
        [t[1]] * (n_types - t.shape[0])
    params["roberta"]["token_type_embeddings"] = np.stack(rows)
    return params


class AttentionPool(nn.Module):
    """gelu(w·x) softmax pooling (reference model/nlvr2.py:97-110)."""
    config: UC2Config

    @nn.compact
    def __call__(self, x, pad_mask, deterministic=True):
        cfg = self.config
        score = gelu(Dense(1, dtype=jnp.dtype(cfg.dtype),
                           name="fc")(x))[..., 0]
        score = score + pad_mask.astype(score.dtype) * -1e4
        p = jax.nn.softmax(score.astype(jnp.float32), axis=1)
        p = nn.Dropout(cfg.attention_probs_dropout_prob)(
            p, deterministic=deterministic)
        return jnp.einsum("bt,btd->bd", p.astype(x.dtype), x)


class CrossAttention(nn.Module):
    """Single cross-attention layer (replaces the vendored fairseq
    MultiheadAttention, model/attention.py:267-401 — only consumer is
    NLVR2-PairedAttn)."""
    config: UC2Config

    @nn.compact
    def __call__(self, q_in, kv_in, kv_pad, deterministic=True):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        B, Lq, Hd = q_in.shape
        n, d = cfg.num_attention_heads, cfg.head_dim
        q = Dense(Hd, dtype=dtype, name="q")(q_in).reshape(B, Lq, n, d)
        k = Dense(Hd, dtype=dtype, name="k")(kv_in).reshape(
            B, kv_in.shape[1], n, d)
        v = Dense(Hd, dtype=dtype, name="v")(kv_in).reshape(
            B, kv_in.shape[1], n, d)
        from uc2_tpu.ops.mp import einsum_f32
        scores = einsum_f32("blnd,bmnd->bnlm", q, k)
        scores = scores / jnp.sqrt(d) + jnp.where(
            kv_pad[:, None, None, :], -1e4, 0.0)
        p = jax.nn.softmax(scores, axis=-1)
        p = nn.Dropout(cfg.attention_probs_dropout_prob)(
            p, deterministic=deterministic)
        ctx = jnp.einsum("bnlm,bmnd->blnd", p.astype(v.dtype), v)
        return Dense(Hd, dtype=dtype, name="out")(ctx.reshape(B, Lq, Hd))


class _Nlvr2PairedAttnHead(nn.Module):
    """Bidirectional cross-attn + fc + attention pooling
    (reference model/nlvr2.py:112-182)."""
    config: UC2Config

    @nn.compact
    def __call__(self, left, right, left_pad, right_pad, deterministic=True):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        l2r = CrossAttention(cfg, name="attn1")(left, right, right_pad,
                                                deterministic)
        r2l = CrossAttention(cfg, name="attn2")(right, left, left_pad,
                                                deterministic)
        # fc and attn_pool are shared between the two directions (reference
        # uses single modules for both, model/nlvr2.py:126-131,172-175)
        fc_dense = Dense(cfg.hidden_size, dtype=dtype, name="fc")
        drop = nn.Dropout(cfg.hidden_dropout_prob)
        def fc(x):
            return drop(gelu(fc_dense(x)), deterministic=deterministic)
        left_out = fc(jnp.concatenate([l2r, left], -1))
        right_out = fc(jnp.concatenate([r2l, right], -1))
        pool = AttentionPool(cfg, name="attn_pool")
        left_p = pool(left_out, left_pad, deterministic)
        right_p = pool(right_out, right_pad, deterministic)
        return Dense(2, dtype=dtype, name="nlvr2_output")(
            jnp.concatenate([left_p, right_p], -1)).astype(jnp.float32)


class UC2ForNlvr2:
    """NLVR2 in three formats (reference model/nlvr2.py):
      * 'triplet': one joint sequence with both images (type ids 1/2),
        Linear(H → 2) on pooled CLS.
      * 'paired': two sequences per example (rows 2i, 2i+1), heads on the
        concatenated pooled pair, Linear(2H → 2).
      * 'paired-attn': paired + bidirectional cross-attention and attention
        pooling over the two sequences.
    """

    def __init__(self, config: UC2Config, fmt: str = "triplet"):
        assert fmt in ("triplet", "paired", "paired-attn")
        self.config = config
        self.fmt = fmt
        self.encoder = UC2Model(config.replace(type_vocab_size=3))
        self.attn_head = _Nlvr2PairedAttnHead(config)

    def init_params(self, rng):
        cfg = self.config
        r_enc, r_head = jax.random.split(rng)
        ids = jnp.ones((2, 4), jnp.int32)
        enc = self.encoder.init(
            {"params": r_enc}, input_ids=ids,
            img_feat=jnp.zeros((2, 3, cfg.img_dim)),
            img_pos_feat=jnp.zeros((2, 3, 7)),
            attn_mask=jnp.ones((2, 7), jnp.int32),
            img_type_ids=jnp.ones((2, 3), jnp.int32))["params"]
        params = {"roberta": enc}
        H_ = cfg.hidden_size
        if self.fmt == "triplet":
            params["nlvr2_output"] = {
                "kernel": jax.random.normal(r_head, (H_, 2)) * 0.02,
                "bias": jnp.zeros((2,))}
        elif self.fmt == "paired":
            params["nlvr2_output"] = {
                "kernel": jax.random.normal(r_head, (2 * H_, 2)) * 0.02,
                "bias": jnp.zeros((2,))}
        else:
            seq = jnp.zeros((1, 7, H_))
            pad = jnp.zeros((1, 7), bool)
            params["attn_head"] = self.attn_head.init(
                {"params": r_head}, seq, seq, pad, pad)["params"]
        return params

    def logits(self, params, batch, deterministic=True, rngs=None):
        seq, pooled = self.encoder.apply(
            {"params": params["roberta"]},
            input_ids=batch["input_ids"],
            img_feat=batch["img_feat"], img_pos_feat=batch["img_pos_feat"],
            attn_mask=batch["attn_mask"],
            img_type_ids=batch.get("img_type_ids"),
            deterministic=deterministic, rngs=rngs)
        if self.fmt == "triplet":
            w, b = params["nlvr2_output"]["kernel"], \
                params["nlvr2_output"]["bias"]
            return (pooled @ w + b).astype(jnp.float32)
        if self.fmt == "paired":
            n_pair = pooled.shape[0] // 2
            w, b = params["nlvr2_output"]["kernel"], \
                params["nlvr2_output"]["bias"]
            return (pooled.reshape(n_pair, -1) @ w + b).astype(jnp.float32)
        B, L, D = seq.shape
        pair = seq.reshape(B // 2, 2, L, D)
        pad = (batch["attn_mask"] == 0).reshape(B // 2, 2, L)
        return self.attn_head.apply(
            {"params": params["attn_head"]}, pair[:, 0], pair[:, 1],
            pad[:, 0], pad[:, 1], deterministic,
            rngs=rngs)

    def loss(self, params, batch, deterministic=False, rngs=None):
        logits = self.logits(params, batch, deterministic, rngs)
        return H.cross_entropy_with_logits(logits, batch["targets"])
