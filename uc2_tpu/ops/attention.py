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
    from uc2_tpu.ops.mp import einsum_f32
    d = q.shape[-1]
    scale = 1.0 / jnp.sqrt(d).astype(jnp.float32)
    # [B, n, Lq, Lk], accumulated fp32 on the MXU; einsum_f32 keeps the
    # BACKWARD dots in the compute dtype (plain preferred_element_type=f32
    # makes dq/dk/dp/dv run f32×f32 — ops/mp.py)
    scores = einsum_f32("blnd,bmnd->bnlm", q, k)
    scores = scores * scale + bias.astype(jnp.float32)
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout_rate > 0.0 and dropout_rng is not None:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate,
                                    probs.shape)
        probs = jnp.where(keep, probs / (1.0 - dropout_rate), 0.0)
    probs = probs.astype(v.dtype)
    ctx = einsum_f32("bnlm,bmnd->blnd", probs, v)
    return ctx.astype(v.dtype)


def _stock_flash_attention(q, k, v, bias):
    """jax's tuned TPU flash-attention kernel
    (jax.experimental.pallas.ops.tpu.flash_attention) with padding expressed
    as segment ids. Padded keys get segment 0 vs valid 1 → masked with -inf;
    numerically identical to the reference's -10000 additive mask (both
    underflow to exactly 0 after the fp32 softmax shift).
    """
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds, flash_attention as stock_fa)
    B, L, n, d = q.shape
    if L < 128:
        return _xla_attention(q, k, v, bias)
    # the kernel blocks sequence in 128s — pad L up (padded keys get segment
    # 0 → masked; padded query rows are garbage and sliced off)
    Lp = -(-L // 128) * 128
    if Lp != L:
        pad = [(0, 0), (0, Lp - L), (0, 0), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    valid = (bias[:, 0, 0, :] >= -1.0).astype(jnp.int32)  # 1=valid, 0=pad
    if Lp != L:
        valid = jnp.pad(valid, [(0, 0), (0, Lp - L)])
    seg = SegmentIds(q=valid, kv=valid)
    out = stock_fa(q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
                   v.transpose(0, 2, 1, 3), segment_ids=seg,
                   sm_scale=1.0 / (d ** 0.5))
    return out.transpose(0, 2, 1, 3)[:, :L]


def multi_head_attention(q, k, v, bias, dropout_rate: float = 0.0,
                         dropout_rng=None, use_pallas=False):
    """Dispatch between attention backends.

    ``use_pallas``: False/"xla" → einsum path. True/"pallas"/"pallas-train"
    → our Pallas kernels everywhere: the fused inference kernel for
    dropout-free calls AND flash_attention_train (in-kernel probs dropout +
    full Pallas backward) for training. The chained-scan grad-only A/B at
    uc2-base/L=162/B=64 on v5e (round 4, every grad leaf live) measures
    pallas-train 10.5-10.75 vs XLA 7.44-7.48 steps/s (−31% step time);
    round 2's "9% slower" verdict came from per-dispatch timing, which
    does not sync through this image's tunnel, and round 3's 26.5-vs-17.7
    absolute rates were inflated by a dead-code hole (DESIGN.md
    post-mortem #3) — the relative verdict held through both fixes
    (bench_results.txt, train_ab). "flash" → jax's stock TPU flash kernel
    (inference only).
    """
    impl = {False: "xla", True: "pallas"}.get(use_pallas, use_pallas)
    if impl != "xla" and _on_tpu():
        try:
            if dropout_rng is not None and (
                    (dropout_rate > 0.0 and impl in ("pallas",
                                                     "pallas-train"))
                    or impl == "pallas-train"):
                # training path: in-kernel probs dropout + Pallas backward
                # (reference dropout-after-softmax, model/layer.py:99-101).
                # pallas-train takes this branch even at rate==0 so a
                # dropout-0 config keeps the SAME differentiable train
                # kernel instead of silently swapping to the inference
                # kernel + XLA reference vjp — grad_profile's nodrop arm
                # would otherwise conflate dropout cost with a ~31%
                # backward-kernel swap (ADVICE r4 medium)
                from uc2_tpu.ops.flash_attention import flash_attention_train
                seed = jax.random.randint(dropout_rng, (), 0, 2 ** 31 - 1,
                                          dtype=jnp.int32)
                return flash_attention_train(q, k, v, bias, seed,
                                             rate=float(dropout_rate))
            if dropout_rate == 0.0:
                if impl == "flash":
                    return _stock_flash_attention(q, k, v, bias)
                from uc2_tpu.ops.flash_attention import flash_attention
                return flash_attention(q, k, v, bias)
        except ImportError:
            pass
    return _xla_attention(q, k, v, bias, dropout_rate, dropout_rng)
