"""Multi-head attention for the UC2 encoder.

Two interchangeable implementations with identical semantics (reference:
model/layer.py:75-101 — scores/sqrt(d) + additive bias, softmax, dropout, ·V):

  * ``_xla_attention``  — plain jnp einsum chain; XLA fuses well, used on CPU
    and as the autodiff-friendly default.
  * Pallas flash attention (ops/flash_attention.py) — blockwise online-softmax
    kernel for TPU; selected when ``use_pallas`` and running on TPU with
    supported shapes.

Softmax runs in fp32 regardless of the activation dtype (the reference runs
fp16 end-to-end under apex O2; fp32 softmax only makes us *more* accurate).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:  # pragma: no cover
        return False


def _xla_attention(q, k, v, bias, dropout_rate=0.0, dropout_rng=None):
    """q,k,v: [B, L, n, d]; bias: [B, 1, 1, L] (broadcast over heads/queries).

    Returns [B, L, n, d].
    """
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(d).astype(jnp.float32)
    # [B, n, Lq, Lk], accumulated fp32 on the MXU
    scores = jnp.einsum("blnd,bmnd->bnlm", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores * scale + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(v.dtype)
    ctx = jnp.einsum("bnlm,bmnd->blnd", probs, v,
                     preferred_element_type=jnp.float32)
    return ctx.astype(v.dtype)


def multi_head_attention(q, k, v, bias, dropout_rate: float = 0.0,
                         dropout_rng=None, use_pallas: bool = True):
    """Dispatch between the Pallas TPU kernel and the XLA fallback.

    The Pallas path is used only for inference/no-dropout on TPU (dropout in
    attention probs needs the XLA path; pretraining uses
    attention_probs_dropout_prob=0.1 per reference config, and the kernel
    supports training via its custom VJP once dropout_rate == 0).
    """
    if use_pallas and _on_tpu() and dropout_rate == 0.0:
        try:
            from uc2_tpu.ops.flash_attention import flash_attention
            return flash_attention(q, k, v, bias)
        except ImportError:
            pass
    return _xla_attention(q, k, v, bias, dropout_rate, dropout_rng)
