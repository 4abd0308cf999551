"""Task heads for pretraining and finetuning.

Reference: model/layer.py:236-293 (RobertaLMHead / VisualRobertaLMHead),
model/model.py:1143-1169 (RegionFeatureRegression / RegionClassification),
model/model.py:474 (itm_output), model/itm.py:12-55 (rank_output),
model/vqa.py:14-50 (VQA MLP head).

Weight tying is explicit: heads that share weights with the encoder
(LM decoder ↔ word embeddings, region regression ↔ img_linear) take the tied
table as a call argument instead of owning a copy — the composition layer
(models/pretraining.py) extracts it from the encoder's param subtree. This is
the functional-JAX equivalent of the reference's parameter aliasing
(model/layer.py:249, model/model.py:471).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
import numpy as np

from uc2_tpu.config import UC2Config
from uc2_tpu.models.encoder import Dense, LayerNorm, gelu
from uc2_tpu.ops.mp import einsum_f32


class RobertaLMHead(nn.Module):
    """dense → gelu → LN(config eps) → decoder tied to word embeddings + bias
    (reference model/layer.py:236-265).

    ``valid_ids`` restricts the output vocabulary (used by mmxlm-soft/vmlm-soft,
    which the reference implements by slicing the full-vocab logits at
    model/model.py:642 — restricting the matmul instead is mathematically
    identical and skips ~249k unused vocab rows).
    """
    config: UC2Config

    @nn.compact
    def __call__(self, h, embedding_table, valid_ids: Optional[np.ndarray] = None,
                 transform_only: bool = False):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        x = Dense(cfg.hidden_size, dtype=dtype, name="dense")(h)
        x = gelu(x)
        x = LayerNorm(eps=cfg.layer_norm_eps, dtype=dtype, name="layer_norm")(x)
        bias = self.param("bias", nn.initializers.zeros, (cfg.vocab_size,),
                          jnp.float32)
        if transform_only:
            # caller computes the decoder product itself (chunked CE path)
            return x
        table = embedding_table
        if valid_ids is not None:
            table = jnp.take(embedding_table, valid_ids, axis=0)
            bias = jnp.take(bias, valid_ids, axis=0)
        # einsum_f32: fp32 logits forward, compute-dtype backward — the
        # plain preferred=f32 dot made dW/dx (the model's two largest
        # matmuls, [B·M, vocab]-sized) run f32×f32 (ops/mp.py)
        logits = einsum_f32("...h,vh->...v", x, table.astype(dtype))
        return logits + bias.astype(jnp.float32)


class RegionFeatureRegression(nn.Module):
    """dense → gelu → LN(1e-12) → linear with the transposed img_linear kernel
    (weight tying; reference model/model.py:1143-1156)."""
    config: UC2Config

    @nn.compact
    def __call__(self, h, img_linear_kernel):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        x = Dense(cfg.hidden_size, dtype=dtype, name="dense")(h)
        x = gelu(x)
        x = LayerNorm(eps=cfg.block_layer_norm_eps, dtype=dtype,
                      name="layer_norm")(x)
        bias = self.param("bias", nn.initializers.zeros, (cfg.img_dim,),
                          jnp.float32)
        # img_linear_kernel is [img_dim, hidden] (JAX [in, out] layout); its
        # transpose maps hidden → img_dim, matching the reference's
        # F.linear(h, img_linear.weight.t(), bias).
        out = einsum_f32("...h,vh->...v", x, img_linear_kernel.astype(dtype))
        return out + bias.astype(jnp.float32)


class RegionClassification(nn.Module):
    """dense → gelu → LN(1e-12) → linear(num_labels)
    (reference model/model.py:1159-1169)."""
    config: UC2Config

    @nn.compact
    def __call__(self, h):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        x = Dense(cfg.hidden_size, dtype=dtype, name="dense")(h)
        x = gelu(x)
        x = LayerNorm(eps=cfg.block_layer_norm_eps, dtype=dtype,
                      name="layer_norm")(x)
        return Dense(cfg.img_label_dim, dtype=dtype, name="out")(x).astype(
            jnp.float32)


class NceHead(nn.Module):
    """MRM-NCE projection: dense → gelu → LN(1e-12) → Linear(H → img_dim).

    The reference sketches exactly this head but leaves it commented out and
    the task unimplemented (model/model.py:1186-1192, :1237); completed here.
    """
    config: UC2Config

    @nn.compact
    def __call__(self, h):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        x = Dense(cfg.hidden_size, dtype=dtype, name="dense")(h)
        x = gelu(x)
        x = LayerNorm(eps=cfg.block_layer_norm_eps, dtype=dtype,
                      name="layer_norm")(x)
        return Dense(cfg.img_dim, dtype=dtype, name="out")(x)


class ItmHead(nn.Module):
    """Linear(hidden → 2) over the pooled CLS (reference model/model.py:474)."""
    config: UC2Config

    @nn.compact
    def __call__(self, pooled):
        return Dense(2, dtype=jnp.dtype(self.config.dtype),
                     name="out")(pooled).astype(jnp.float32)


class RankHead(nn.Module):
    """Linear(hidden → 1) for retrieval finetuning (reference model/itm.py:19).
    Initialized from the ITM head's positive row via
    ``init_rank_from_itm`` in models/convert.py (reference init_output,
    model/itm.py:23-26)."""
    config: UC2Config

    @nn.compact
    def __call__(self, pooled):
        return Dense(1, dtype=jnp.dtype(self.config.dtype),
                     name="out")(pooled).astype(jnp.float32)


class VqaHead(nn.Module):
    """pooled → Linear(H→2H) → gelu → LN(config eps) → Linear(2H→num_answer)
    (reference model/vqa.py:20-26; VE = num_answer 3, model/ve.py:7-11)."""
    config: UC2Config
    num_answer: int

    @nn.compact
    def __call__(self, pooled):
        cfg = self.config
        dtype = jnp.dtype(cfg.dtype)
        x = Dense(cfg.hidden_size * 2, dtype=dtype, name="dense")(pooled)
        x = gelu(x)
        x = LayerNorm(eps=cfg.layer_norm_eps, dtype=dtype, name="layer_norm")(x)
        return Dense(self.num_answer, dtype=dtype, name="out")(x).astype(
            jnp.float32)


def chunked_softmax_cross_entropy(h, table, bias, labels, weights,
                                  n_chunks: int = 8):
    """CE over a huge vocabulary without materializing [N, V] logits.

    Streams the decoder table through the MXU in ``n_chunks`` vocab chunks
    with an online logsumexp; each chunk is jax.checkpoint'ed so backward
    recomputes chunk logits instead of storing them. Memory drops from
    O(N·V) to O(N·V/n_chunks); values match the dense path to fp32 rounding.

    h [N, H] (transform output), table [V, H], bias [V], labels [N],
    weights [N]. Returns per-element weighted CE [N].
    """
    N, H = h.shape
    V = table.shape[0]
    pad = (-V) % n_chunks
    if pad:
        table = jnp.concatenate(
            [table, jnp.zeros((pad, H), table.dtype)], axis=0)
        # padded rows must never win the logsumexp
        bias = jnp.concatenate(
            [bias, jnp.full((pad,), -1e30, bias.dtype)], axis=0)
    C = table.shape[0] // n_chunks
    h32 = h.astype(jnp.float32)
    gold_rows = jnp.take(table, labels, axis=0).astype(jnp.float32)
    gold = jnp.einsum("nh,nh->n", h32, gold_rows) \
        + jnp.take(bias, labels, axis=0)

    @jax.checkpoint
    def body(carry, chunk):
        m, s = carry
        tbl, b = chunk
        logits = einsum_f32("nh,ch->nc", h.astype(tbl.dtype), tbl) \
            + b.astype(jnp.float32)                     # [N, C]
        cm = jnp.max(logits, axis=-1)
        new_m = jnp.maximum(m, cm)
        s = s * jnp.exp(m - new_m) + jnp.sum(
            jnp.exp(logits - new_m[:, None]), axis=-1)
        return (new_m, s), None

    init = (jnp.full((N,), -jnp.inf, jnp.float32), jnp.zeros((N,),
                                                             jnp.float32))
    (m, s), _ = jax.lax.scan(
        body, init, (table.reshape(n_chunks, C, H),
                     bias.reshape(n_chunks, C)))
    lse = m + jnp.log(s)
    loss = lse - gold
    if weights is not None:
        loss = loss * weights
    return loss


# ---------------------------------------------------------------------------
# Loss utilities (reductions happen in the driver, as in the reference).
# ---------------------------------------------------------------------------

def cross_entropy_with_logits(logits, labels, weights=None):
    """Per-element CE (reference uses F.cross_entropy(reduction='none')).

    logits [..., V] fp32, labels [...] int. Returns per-element loss [...].
    """
    logits = logits.astype(jnp.float32)
    lse = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, labels[..., None], axis=-1)[..., 0]
    loss = lse - gold
    if weights is not None:
        loss = loss * weights
    return loss


def kl_div_with_logits(logits, target_probs, weights=None, elementwise=False):
    """KL(target || softmax(logits)), matching
    F.kl_div(log_softmax(logits), target, reduction='none') with 0·log0 := 0.

    ``elementwise=True`` returns the per-class elements [..., V] (the
    reference reduces soft losses with a flat .mean() over all elements);
    otherwise the class dim is summed.
    """
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    t = target_probs.astype(jnp.float32)
    elem = jnp.where(t > 0, t * (jnp.log(jnp.clip(t, 1e-30)) - logp), 0.0)
    if elementwise:
        return elem
    loss = jnp.sum(elem, axis=-1)
    if weights is not None:
        loss = loss * weights
    return loss


def bce_with_logits(logits, targets):
    """Per-element binary CE with logits (reference VQA loss,
    model/vqa.py:46-48)."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    return jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
