"""Single-stream multilingual vision-language encoder (UC2/UNITER style).

TPU-native re-design of the reference model (reference: model/model.py,
model/layer.py — VLXLMRModel and friends). Numerics match the reference to
fp32 tolerance; the *layout* is TPU-first:

  * The reference embeds text [B,Lt] and image regions [B,Nb] separately,
    concatenates, then re-compacts each row with a per-example ``gather_index``
    so valid tokens are contiguous (model/model.py:412-425). That is a ragged,
    data-dependent layout. Here the joint sequence is a *fixed* layout
    ``[txt_0..txt_{Lt-1} | img_0..img_{Nb-1}]`` and validity is expressed only
    through the additive attention mask — identical attention output for valid
    positions, no gather, static shapes for XLA.
  * The additive mask is ``(1 - mask) * -10000`` exactly as the reference
    (model/model.py:433-436) — not -inf — so logits agree with the fp32 torch
    model even where padding leaks epsilon attention.
  * Text position ids are recomputed from the pad mask XLM-R style
    (cumsum(ne(pad)) * mask + pad_id; reference model/model.py:280-290) unless
    explicitly provided (the `tlm` task passes segment-restarting ids).
  * bf16 activations / fp32 parameters; softmax and LayerNorm accumulate fp32.
  * Fused QKV projection (one MXU pass instead of three matmuls).

Parameter tree layout mirrors the reference module names closely enough that
checkpoint conversion (models/convert.py) is a mechanical rename.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import flax.linen as nn

from uc2_tpu.config import UC2Config
from uc2_tpu.ops.attention import _on_tpu, multi_head_attention


def create_position_ids_from_input_ids(input_ids: jnp.ndarray,
                                       padding_idx: int) -> jnp.ndarray:
    """XLM-R position ids: non-pad tokens numbered from padding_idx+1.

    Reference: model/model.py:280-290 (fairseq make_positions port).
    """
    mask = (input_ids != padding_idx).astype(jnp.int32)
    incremental = jnp.cumsum(mask, axis=1) * mask
    return incremental + padding_idx


class LayerNorm(nn.Module):
    """LayerNorm with fp32 accumulation (XLA fuses it; replaces apex
    FusedLayerNorm, reference model/layer.py:25)."""
    eps: float = 1e-12
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        scale = self.param("weight", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        y = y * scale + bias
        return y.astype(self.dtype)


def gelu(x):
    """erf-form gelu, matching reference model/layer.py:31-37."""
    return jax.nn.gelu(x, approximate=False)


def int8_matmul(x, kernel, out_dtype):
    """Serving int8 matmul: per-output-channel weight scales (computed from
    the fp32 kernel — loop-invariant, so XLA hoists the one-time weight
    quantization out of eval scans) + dynamic per-row activation scales.
    int8×int8→int32 rides the MXU at 2× bf16 peak on v5e."""
    x32 = x.astype(jnp.float32)
    s_x = jnp.max(jnp.abs(x32), axis=-1, keepdims=True) / 127.0
    s_x = jnp.maximum(s_x, 1e-8)
    x_q = jnp.clip(jnp.round(x32 / s_x), -127, 127).astype(jnp.int8)
    s_w = jnp.max(jnp.abs(kernel), axis=0, keepdims=True) / 127.0
    s_w = jnp.maximum(s_w, 1e-12)
    w_q = jnp.clip(jnp.round(kernel / s_w), -127, 127).astype(jnp.int8)
    y = jax.lax.dot_general(
        x_q, w_q, (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (y.astype(jnp.float32) * s_x * s_w).astype(out_dtype)


class Dense(nn.Module):
    """Linear layer; params fp32, compute in `dtype`. Kernel stored [in, out]
    (torch stores [out, in]; the checkpoint converter transposes).
    ``quant="int8"`` switches to the serving int8 path (int8_matmul)."""
    features: int
    dtype: Any = jnp.float32
    use_bias: bool = True
    quant: str = "none"

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.normal(stddev=0.02),
                            (x.shape[-1], self.features), jnp.float32)
        if self.quant == "int8":
            y = int8_matmul(x, kernel, self.dtype)
        else:
            y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype),
                        preferred_element_type=self.dtype)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            y = y + bias.astype(self.dtype)
        return y


class TextEmbeddings(nn.Module):
    """Word + position (+ externally supplied token-type) embeddings
    (reference model/model.py:292-335). The token-type table is owned by
    UC2Model because image tokens share it (reference model/model.py:403-406).
    """
    config: UC2Config

    @nn.compact
    def __call__(self, input_ids, type_embeddings, position_ids=None,
                 deterministic=True):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        init = nn.initializers.normal(stddev=cfg.initializer_range)
        word_emb = self.param("word_embeddings", init,
                              (cfg.vocab_size, cfg.hidden_size), jnp.float32)
        pos_emb = self.param("position_embeddings", init,
                             (cfg.max_position_embeddings, cfg.hidden_size),
                             jnp.float32)
        if position_ids is None:
            if cfg.position_style == "bert":
                position_ids = jnp.broadcast_to(
                    jnp.arange(input_ids.shape[1], dtype=jnp.int32)[None],
                    input_ids.shape)
            else:
                position_ids = create_position_ids_from_input_ids(
                    input_ids, cfg.pad_token_id)
        x = (jnp.take(word_emb, input_ids, axis=0)
             + jnp.take(pos_emb, position_ids, axis=0)
             + type_embeddings)
        x = LayerNorm(eps=cfg.layer_norm_eps, dtype=dtype, name="LayerNorm")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        return x


class ImageEmbeddings(nn.Module):
    """Region-feature embeddings (reference model/model.py:339-364):
    ``LN(img_linear(feat)) + LN(pos_linear(bbox7)) + type_emb`` → LN → dropout.

    Masked regions (MRM) get a learned ``mask_embedding`` row added; row 0 is
    forced to zero every forward exactly as the reference does
    (model/model.py:352-356).
    """
    config: UC2Config

    @nn.compact
    def __call__(self, img_feat, img_pos_feat, type_embeddings, img_masks=None,
                 deterministic=True):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        if img_masks is not None:
            mask_emb = self.param(
                "mask_embedding",
                nn.initializers.normal(stddev=cfg.initializer_range),
                (2, cfg.img_dim), jnp.float32)
            mask_emb = jnp.asarray(mask_emb).at[0].set(0.0)
            img_feat = img_feat + jnp.take(
                mask_emb, img_masks.astype(jnp.int32), axis=0
            ).astype(img_feat.dtype)
        transformed_im = LayerNorm(eps=cfg.layer_norm_eps, dtype=dtype,
                                   name="img_layer_norm")(
            Dense(cfg.hidden_size, dtype=dtype, name="img_linear")(img_feat))
        transformed_pos = LayerNorm(eps=cfg.layer_norm_eps, dtype=dtype,
                                    name="pos_layer_norm")(
            Dense(cfg.hidden_size, dtype=dtype, name="pos_linear")(img_pos_feat))
        x = transformed_im + transformed_pos + type_embeddings
        x = LayerNorm(eps=cfg.layer_norm_eps, dtype=dtype, name="LayerNorm")(x)
        x = nn.Dropout(cfg.hidden_dropout_prob)(x, deterministic=deterministic)
        return x


class SelfAttention(nn.Module):
    """Multi-head self-attention (reference model/layer.py:53-101), fused QKV.

    ``return_qkv``: skip the attention math and hand the projected
    [B, L, n, d] heads to the caller — the EncoderLayer's fused-block path
    consumes them directly (ops/fused_block.py) while the qkv params stay
    at their usual tree location (attention/qkv). ``return_qkv_params``:
    hand the RAW fused projection params instead (the v2 fused block
    computes the projection in-kernel)."""
    config: UC2Config
    return_qkv: bool = False
    return_qkv_params: bool = False

    @nn.compact
    def __call__(self, x, attn_bias, deterministic=True):
        cfg = self.config
        B, L, H = x.shape
        n, d = cfg.num_attention_heads, cfg.head_dim
        qkv_mod = DenseP(H, 3 * H, dtype=jnp.dtype(cfg.dtype),
                         quant=cfg.quant, name="qkv")
        if self.return_qkv_params:
            return qkv_mod.raw()
        qkv = qkv_mod(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        if self.return_qkv:
            return (q.reshape(B, L, n, d), k.reshape(B, L, n, d),
                    v.reshape(B, L, n, d))
        dropout_rng = None
        rate = cfg.attention_probs_dropout_prob
        if not deterministic and (
                rate > 0 or cfg.use_pallas_attention == "pallas-train"):
            # pallas-train gets the rng even at rate 0 so the dispatcher
            # can keep the grad path on the train kernel (its rate==0
            # branch skips mask generation at trace time) — a dropout-0
            # config must not silently change backward kernels
            dropout_rng = self.make_rng("dropout")
        ctx = multi_head_attention(
            q.reshape(B, L, n, d), k.reshape(B, L, n, d),
            v.reshape(B, L, n, d), attn_bias,
            dropout_rate=(0.0 if deterministic else rate),
            dropout_rng=dropout_rng,
            use_pallas=cfg.use_pallas_attention,
        )
        return ctx.reshape(B, L, H)


class DenseP(nn.Module):
    """Dense with setup-style params + ``raw()`` access, a drop-in for Dense
    at known in_features — used where a fused kernel consumes the kernel and
    bias directly. Identical param names/shapes/init to Dense, so the
    checkpoint tree is unchanged."""
    in_features: int
    features: int
    dtype: Any = jnp.float32
    quant: str = "none"

    def setup(self):
        self.kernel = self.param("kernel",
                                 nn.initializers.normal(stddev=0.02),
                                 (self.in_features, self.features),
                                 jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.features,), jnp.float32)

    def __call__(self, x):
        if self.quant == "int8":
            y = int8_matmul(x, self.kernel, self.dtype)
        else:
            y = jnp.dot(x.astype(self.dtype), self.kernel.astype(self.dtype),
                        preferred_element_type=self.dtype)
        return y + self.bias.astype(self.dtype)

    def raw(self):
        return self.kernel, self.bias


class LayerNormP(nn.Module):
    """LayerNorm with setup-style params + ``raw()`` access (see DenseP)."""
    dim: int
    eps: float = 1e-12
    dtype: Any = jnp.float32

    def setup(self):
        self.weight = self.param("weight", nn.initializers.ones,
                                 (self.dim,), jnp.float32)
        self.bias = self.param("bias", nn.initializers.zeros,
                               (self.dim,), jnp.float32)

    def __call__(self, x):
        x32 = x.astype(jnp.float32)
        mean = jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.eps)
        return (y * self.weight + self.bias).astype(self.dtype)

    def raw(self):
        return self.weight, self.bias


class EncoderLayer(nn.Module):
    """Post-LN transformer block (reference model/layer.py:159-170). In-block
    LayerNorms use eps=1e-12, hardcoded in the reference (model/layer.py:108,149)
    independent of config.layer_norm_eps.

    ``deterministic`` is a module attribute (not a call arg) so the layer can
    be wrapped in nn.remat without static-argnum plumbing.
    """
    config: UC2Config
    deterministic: bool = True

    @nn.compact
    def __call__(self, x, attn_bias):
        cfg = self.config
        deterministic = self.deterministic
        dtype = jnp.dtype(cfg.dtype)
        eps = cfg.block_layer_norm_eps
        H = cfg.hidden_size
        impl = {False: "xla", True: "pallas"}.get(cfg.use_pallas_attention,
                                                  cfg.use_pallas_attention)
        # whole-block fusion (attention + out-proj + residual + LN in one
        # Pallas kernel, ops/fused_block.py) on the inference path at shapes
        # where it wins on chip; "fused-force" exercises it in interpreter
        # mode regardless of platform/shape (CPU tests)
        from uc2_tpu.ops.fused_block import (fused_attn_block,
                                             fused_attn_block_v2,
                                             fused_block_profitable,
                                             fused_ffn_block,
                                             fused_ffn_profitable)
        import os
        force = impl == "fused-force"
        # "flash" (jax's stock TPU flash kernel) must NOT route into the
        # fused-block path, or the stock kernel would never actually run
        # in A/Bs (ADVICE r3 low)
        fusable = (deterministic and cfg.quant == "none"
                   and (force or (impl in ("pallas", "pallas-train")
                                  and _on_tpu())))
        fuse = fusable and (force or fused_block_profitable(
            x.shape[1], cfg.num_attention_heads))
        # v2 computes the QKV projection in-kernel (the [B, L, 3H]
        # intermediate never exists in HBM); experiment-gated pending the
        # in-graph A/B (UC2_ATTN_V2=1)
        v2 = fuse and bool(os.environ.get("UC2_ATTN_V2"))
        fuse_ffn = fusable and (force or fused_ffn_profitable(x.shape[1]))
        attn = SelfAttention(cfg, return_qkv=fuse and not v2,
                             return_qkv_params=v2, name="attention")
        od = DenseP(H, H, dtype=dtype, quant=cfg.quant,
                    name="attention_output_dense")
        oln = LayerNormP(H, eps=eps, dtype=dtype,
                         name="attention_output_LayerNorm")
        if v2:
            w_qkv, b_qkv = attn(x, attn_bias, deterministic)
            wo, bo = od.raw()
            gamma, beta = oln.raw()
            x = fused_attn_block_v2(x, w_qkv.astype(dtype), b_qkv,
                                    attn_bias, wo.astype(dtype), bo,
                                    gamma, beta,
                                    n=cfg.num_attention_heads, eps=eps,
                                    interpret=not _on_tpu())
        elif fuse:
            q, k, v = attn(x, attn_bias, deterministic)
            wo, bo = od.raw()
            gamma, beta = oln.raw()
            x = fused_attn_block(q, k, v, attn_bias, x, wo.astype(dtype),
                                 bo, gamma, beta, eps=eps,
                                 interpret=not _on_tpu())
        else:
            attn_out = attn(x, attn_bias, deterministic)
            attn_out = od(attn_out)
            attn_out = nn.Dropout(cfg.hidden_dropout_prob)(
                attn_out, deterministic=deterministic)
            x = oln(attn_out + x)
        inter = DenseP(H, cfg.intermediate_size, dtype=dtype, quant=cfg.quant,
                       name="intermediate_dense")
        down = DenseP(cfg.intermediate_size, H, dtype=dtype, quant=cfg.quant,
                      name="output_dense")
        oln2 = LayerNormP(H, eps=eps, dtype=dtype, name="output_LayerNorm")
        # training-path FFN fusion (full Pallas fwd+bwd, in-kernel dropout
        # + recompute — ops/ffn_train.py): raced end-to-end r4 — WASH
        # (+2% mean, inside trial spread; verdict table in the module
        # docstring) → stays opt-in via UC2_FFN_TRAIN=1 per the
        # ship-only-confirmed-wins rule
        ffn_train = (not deterministic and impl == "pallas-train"
                     and cfg.quant == "none"
                     and os.environ.get("UC2_FFN_TRAIN") == "1")
        if fuse_ffn:
            w1, b1 = inter.raw()
            w2, b2 = down.raw()
            g2, be2 = oln2.raw()
            x = fused_ffn_block(x, w1.astype(dtype), b1, w2.astype(dtype),
                                b2, g2, be2, eps=eps,
                                interpret=not _on_tpu())
        elif ffn_train:
            from uc2_tpu.ops.ffn_train import fused_ffn_block_train
            rate = cfg.hidden_dropout_prob
            if rate > 0:
                seed = jax.random.randint(self.make_rng("dropout"), (),
                                          0, 2 ** 31 - 1, dtype=jnp.int32)
            else:
                seed = jnp.int32(0)
            w1, b1 = inter.raw()
            w2, b2 = down.raw()
            g2, be2 = oln2.raw()
            x = fused_ffn_block_train(x, w1.astype(dtype), b1,
                                      w2.astype(dtype), b2, g2, be2, seed,
                                      float(rate), float(eps),
                                      not _on_tpu())
        else:
            h = gelu(inter(x))
            h = down(h)
            h = nn.Dropout(cfg.hidden_dropout_prob)(
                h, deterministic=deterministic)
            x = oln2(h + x)
        return x


class Pooler(nn.Module):
    """tanh(dense(first token)) (reference model/layer.py:173-185)."""
    config: UC2Config

    @nn.compact
    def __call__(self, hidden):
        x = Dense(self.config.hidden_size, dtype=jnp.dtype(self.config.dtype),
                  name="dense")(hidden[:, 0])
        return jnp.tanh(x)


class UC2Model(nn.Module):
    """Joint vision-language encoder (reference VLXLMRModel, model/model.py:385-458).

    Inputs (all static shapes; any of the text/image block may be omitted):
      input_ids    [B, Lt] int32, pad = config.pad_token_id
      img_feat     [B, Nb, img_dim] (fp32/bf16)
      img_pos_feat [B, Nb, 7]  ([x1,y1,x2,y2,w,h,w*h])
      attn_mask    [B, Lt+Nb] 1 = valid (txt block then img block; invalid
                   positions are masked, never compacted)
      position_ids optional [B, Lt] (`tlm` passes restart-per-segment ids)
      img_masks    optional [B, Nb] bool — MRM-masked regions
      img_type_ids optional [B, Nb] (NLVR2 passes 1/2); default all-ones
      txt_type_ids optional [B, Lt]; default all-zeros

    Returns (sequence_output [B, Lt+Nb, H], pooled [B, H]). The text block is
    at ``seq[:, :Lt]``, the image block at ``seq[:, Lt:]`` — fixed offsets
    replace the reference's gather/scatter bookkeeping (e.g. the OT scatter at
    model/model.py:701-727 becomes a plain slice).
    """
    config: UC2Config

    @nn.compact
    def __call__(self, input_ids=None, position_ids=None, img_feat=None,
                 img_pos_feat=None, attn_mask=None, img_masks=None,
                 txt_type_ids=None, img_type_ids=None, deterministic=True):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        type_table = self.param(
            "token_type_embeddings",
            nn.initializers.normal(stddev=cfg.initializer_range),
            (cfg.type_vocab_size, cfg.hidden_size), jnp.float32)

        parts = []
        if input_ids is not None:
            if txt_type_ids is None:
                txt_type_ids = jnp.zeros_like(input_ids)
            txt_type_emb = jnp.take(type_table, txt_type_ids, axis=0)
            parts.append(TextEmbeddings(cfg, name="embeddings")(
                input_ids, txt_type_emb, position_ids,
                deterministic=deterministic))
        if img_feat is not None:
            if img_type_ids is None:
                img_type_ids = jnp.ones(img_feat.shape[:2], dtype=jnp.int32)
            img_type_emb = jnp.take(type_table, img_type_ids, axis=0)
            parts.append(ImageEmbeddings(cfg, name="img_embeddings")(
                img_feat.astype(dtype), img_pos_feat.astype(dtype),
                img_type_emb, img_masks, deterministic=deterministic))
        x = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=1)

        # additive mask, exactly (1-m) * -10000 (reference model/model.py:433-436)
        attn_bias = ((1.0 - attn_mask.astype(jnp.float32))
                     * -10000.0)[:, None, None, :]

        layer = EncoderLayer
        if cfg.remat != "none":
            policy = (jax.checkpoint_policies.dots_saveable
                      if cfg.remat == "dots" else None)
            layer = nn.remat(EncoderLayer, policy=policy, prevent_cse=False)
        for i in range(cfg.num_hidden_layers):
            x = layer(cfg, deterministic, name=f"layer_{i}")(x, attn_bias)

        pooled = Pooler(cfg, name="pooler")(x)
        return x, pooled
