#!/usr/bin/env python
"""Attention-kernel variant race (raw op + end-to-end chain) on the chip.

The v3 kernel (default) measures 0.837 ms/op at B=64/L=162/n=12/d=64 —
~5% MXU efficiency; attention is memory/layout-bound and still ~45% of
scoring wall time. Candidates probe the obvious levers:

  v3      current default (BB auto≈2, fp32 scores)
  v3bb1   BB=1 (more grid cells → deeper pipelining)
  v3bb4   BB=4 + raised vmem limit
  v4bf16  scores/softmax statistics in fp32 but the [L,L] probs tensor
          written/read once in bf16 (halves VMEM traffic of the big ops)
  v4qs    q-split grid (B/BB, 2): Lq halves, smaller cells

Usage: python scripts/kernel_lab.py [--batch 64] [--num_bb 100] [--e2e]
"""

import argparse
import functools
import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uc2_tpu.ops.flash_attention import _fwd_pallas_v3
from uc2_tpu.ops.attention import _xla_attention


def _kernel_bf16(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, n, L, d):
    BB = q_ref.shape[0]
    q = q_ref[...].reshape(BB * n, L, d)
    k = k_ref[...].reshape(BB * n, L, d)
    v = v_ref[...].reshape(BB * n, L, d)
    bias = bias_ref[...].reshape(BB, 1, 1, L)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    s = s.reshape(BB, n, L, L) * scale + bias.astype(jnp.float32)
    s = s.reshape(BB * n, L, L)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m).astype(jnp.bfloat16)          # probs live in bf16
    denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        e, v.astype(jnp.bfloat16),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o = o / denom
    o_ref[...] = o.reshape(BB, n, L, d).astype(o_ref.dtype)


def _fwd_v4(q, k, v, bias, kernel_body, BB=0, vmem_mb=0, q_split=1):
    B, L, n, d = q.shape
    qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    if BB <= 0:
        BB = max(1, (4 * 1024 * 1024) // (n * L * L * 4))
    BB = math.gcd(BB, B)
    if q_split > 1:
        Lq = L // q_split if L % q_split == 0 else L
        q_split = L // Lq
    else:
        Lq = L
    grid = (B // BB,) if q_split == 1 else (B // BB, q_split)
    kernel = functools.partial(kernel_body, scale=1.0 / math.sqrt(d),
                               n=n, L=L, d=d)
    idx_full = (lambda b: (b, 0, 0, 0)) if q_split == 1 else \
        (lambda b, i: (b, 0, 0, 0))
    idx_q = (lambda b: (b, 0, 0, 0)) if q_split == 1 else \
        (lambda b, i: (b, 0, i, 0))
    cp = {}
    if vmem_mb:
        cp = dict(compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 1024 * 1024))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BB, n, Lq, d), idx_q, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, n, L, d), idx_full, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, n, L, d), idx_full, memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1, 1, L), idx_full, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, n, Lq, d), idx_q,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, L, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * n * L * L * d,
            bytes_accessed=(4 * B * L * n * d) * q.dtype.itemsize,
            transcendentals=B * n * L * L),
        **cp,
    )(qt, kt, vt, bias)
    return out.transpose(0, 2, 1, 3)


def _kernel_qsplit(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, n, L, d):
    BB = q_ref.shape[0]
    Lq = q_ref.shape[2]
    q = q_ref[...].reshape(BB * n, Lq, d)
    k = k_ref[...].reshape(BB * n, L, d)
    v = v_ref[...].reshape(BB * n, L, d)
    bias = bias_ref[...].reshape(BB, 1, 1, L)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    s = s.reshape(BB, n, Lq, L) * scale + bias.astype(jnp.float32)
    s = s.reshape(BB * n, Lq, L)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    o = jax.lax.dot_general(
        p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[...] = o.reshape(BB, n, Lq, d).astype(o_ref.dtype)


from uc2_tpu.ops.flash_attention import _attn_kernel_v3


VARIANTS = {
    "v3": lambda q, k, v, b: _fwd_pallas_v3(q, k, v, b),
    "v3bb1": lambda q, k, v, b: _fwd_v4(q, k, v, b, _attn_kernel_v3, BB=1),
    "v3bb4": lambda q, k, v, b: _fwd_v4(q, k, v, b, _attn_kernel_v3, BB=4,
                                        vmem_mb=96),
    "v4bf16": lambda q, k, v, b: _fwd_v4(q, k, v, b, _kernel_bf16),
    "v4qs": lambda q, k, v, b: _fwd_v4(q, k, v, b, _kernel_qsplit,
                                       q_split=2),
    "xla": lambda q, k, v, b: _xla_attention(q, k, v, b),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--txt_len", type=int, default=62)
    ap.add_argument("--num_bb", type=int, default=100)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--variants", nargs="*", default=list(VARIANTS))
    ap.add_argument("--mode",
                    choices=["op", "block", "block2", "ffn", "layer", "ce"],
                    default="op")
    args = ap.parse_args()
    if args.mode == "block":
        return block_race(args)
    if args.mode == "block2":
        return block2_race(args)
    if args.mode == "ffn":
        return ffn_race(args)
    if args.mode == "layer":
        return layer_race(args)
    if args.mode == "ce":
        return ce_race(args)

    B, L = args.batch, args.txt_len + args.num_bb
    n, d = 12, 64
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.bfloat16)
    mask = np.ones((B, L), np.float32)
    mask[:, -13:] = 0
    bias = jnp.asarray(((1.0 - mask) * -10000.0)[:, None, None, :],
                       jnp.float32)

    ref = None
    for name in args.variants:
        fn = VARIANTS[name]

        @jax.jit
        def chain(q, k, v, bias, fn=fn):
            def body(c, _):
                o = fn(q + c * 1e-30, k, v, bias)
                return jnp.mean(o.astype(jnp.float32)), None
            last, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                   length=args.iters)
            return last

        try:
            out = fn(q, k, v, bias)
            if ref is None:
                ref = np.asarray(VARIANTS["xla"](q, k, v, bias),
                                 np.float32)
            err = np.max(np.abs(np.asarray(out, np.float32) - ref))
            float(chain(q, k, v, bias))
            t0 = time.perf_counter()
            float(chain(q, k, v, bias))
            dt = time.perf_counter() - t0
            print(f"RESULT {name}: {dt / args.iters * 1e3:.3f} ms/op  "
                  f"maxerr={err:.4f}", flush=True)
        except Exception as e:
            print(f"RESULT {name}: FAILED {type(e).__name__} "
                  f"{str(e)[:160]}", flush=True)


# ---------------------------------------------------------------- block race
# Fused (attention → out-proj → +residual → LayerNorm) vs the XLA chain.
# The kernel under race IS the production one (uc2_tpu/ops/fused_block.py)
# so lab results can't drift from what ships.

from uc2_tpu.ops.fused_block import fused_attn_block


# ---------------------------------------------------------------- ffn race
# Row-tiled fused FFN block: LN2(gelu(x·W1+b1)·W2+b2 + x). Both weight
# matrices (768×3072 ×2 ≈ 9.4 MB bf16) stay VMEM-resident across grid
# cells (constant index map → the pipeline skips the re-fetch), and the
# [R, 3072] intermediate never touches HBM — the XLA chain writes/reads it
# (63 MB bf16 at B=64/L=162).

from uc2_tpu.ops.fused_block import fused_ffn_block


def xla_ffn_block(x, w1, b1, w2, b2, gamma, beta, eps=1e-12):
    h = (x.astype(jnp.bfloat16) @ w1).astype(jnp.float32) + b1
    h = jax.nn.gelu(h, approximate=False).astype(jnp.bfloat16)
    y = (h @ w2).astype(jnp.float32) + b2 + x.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    return (yn * gamma + beta).astype(x.dtype)


def ffn_race(args):
    B, L = args.batch, args.txt_len + args.num_bb
    H, F = 768, 3072
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, H)), jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((H, F)) * 0.02, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((F,)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, H)) * 0.02, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((H,)) * 0.01, jnp.float32)
    gamma = jnp.ones((H,), jnp.float32)
    beta = jnp.zeros((H,), jnp.float32)
    racers = [("xlaffn", xla_ffn_block)]
    for R in (128, 256, 512):
        racers.append((f"fusedffn_r{R}",
                       functools.partial(fused_ffn_block, R=R)))
    ref = None
    for name, fn in racers:
        @jax.jit
        def chain(x, fn=fn):
            def body(c, _):
                o = fn(x + c * 1e-30, w1, b1, w2, b2, gamma, beta)
                return jnp.mean(o.astype(jnp.float32)), None
            last, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                   length=args.iters)
            return last
        try:
            out = np.asarray(fn(x, w1, b1, w2, b2, gamma, beta), np.float32)
            if ref is None:
                ref = out
            err = np.max(np.abs(out - ref))
            float(chain(x))
            t0 = time.perf_counter()
            float(chain(x))
            dt = time.perf_counter() - t0
            print(f"RESULT {name}: {dt / args.iters * 1e3:.3f} ms/block  "
                  f"maxerr={err:.4f}", flush=True)
        except Exception as e:
            print(f"RESULT {name}: FAILED {type(e).__name__} "
                  f"{str(e)[:200]}", flush=True)


def xla_attn_block(q, k, v, bias, x, wo, bo, gamma, beta):
    ctx = _xla_attention(q, k, v, bias)
    B, L, n, d = q.shape
    y = ctx.reshape(B, L, n * d).astype(jnp.bfloat16) @ wo.astype(
        jnp.bfloat16)
    y = y.astype(jnp.float32) + bo + x.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + 1e-12)
    return (yn * gamma + beta).astype(x.dtype)


def block_race(args):
    B, L = args.batch, args.txt_len + args.num_bb
    n, d = 12, 64
    H = n * d
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, L, H)), jnp.bfloat16)
    wo = jnp.asarray(rng.standard_normal((H, H)) * 0.02, jnp.bfloat16)
    bo = jnp.asarray(rng.standard_normal((H,)) * 0.01, jnp.float32)
    gamma = jnp.ones((H,), jnp.float32)
    beta = jnp.zeros((H,), jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[:, -13:] = 0
    bias = jnp.asarray(((1.0 - mask) * -10000.0)[:, None, None, :],
                       jnp.float32)
    racers = [("fusedblock", fused_attn_block), ("xlablock", xla_attn_block)]
    for bb in (2, 4, 8):
        racers.append((f"fusedblock_bb{bb}",
                       functools.partial(fused_attn_block, BB=bb)))
    for name, fn in racers:
        @jax.jit
        def chain(q, k, v, fn=fn):
            def body(c, _):
                o = fn(q + c * 1e-30, k, v, bias, x, wo, bo, gamma, beta)
                return jnp.mean(o.astype(jnp.float32)), None
            last, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                   length=args.iters)
            return last
        try:
            out = np.asarray(fn(q, k, v, bias, x, wo, bo, gamma, beta),
                             np.float32)
            ref = np.asarray(xla_attn_block(q, k, v, bias, x, wo, bo,
                                            gamma, beta), np.float32)
            err = np.max(np.abs(out - ref))
            float(chain(q, k, v))
            t0 = time.perf_counter()
            float(chain(q, k, v))
            dt = time.perf_counter() - t0
            print(f"RESULT {name}: {dt / args.iters * 1e3:.3f} ms/block  "
                  f"maxerr={err:.4f}", flush=True)
        except Exception as e:
            print(f"RESULT {name}: FAILED {type(e).__name__} "
                  f"{str(e)[:200]}", flush=True)


# ---------------------------------------------------------------- layer race
# Whole encoder layer in ONE kernel vs the shipped two-kernel split
# (fused attention block + fused FFN block) vs the all-XLA chain.

from uc2_tpu.ops.fused_block import fused_ffn_block, fused_layer_block


def block2_race(args):
    """v2 attention block (QKV projection in-kernel) vs the shipped
    XLA-projection + v1-block chain. Both include the projection cost."""
    from uc2_tpu.ops.fused_block import fused_attn_block_v2
    B, L = args.batch, args.txt_len + args.num_bb
    n, d = 12, 64
    H = n * d
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, H)), jnp.bfloat16)
    w_qkv = jnp.asarray(rng.standard_normal((H, 3 * H)) * 0.02,
                        jnp.bfloat16)
    b_qkv = jnp.asarray(rng.standard_normal((3 * H,)) * 0.01, jnp.float32)
    wo = jnp.asarray(rng.standard_normal((H, H)) * 0.02, jnp.bfloat16)
    bo = jnp.asarray(rng.standard_normal((H,)) * 0.01, jnp.float32)
    gamma = jnp.ones((H,), jnp.float32)
    beta = jnp.zeros((H,), jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[:, -13:] = 0
    bias = jnp.asarray(((1.0 - mask) * -10000.0)[:, None, None, :],
                       jnp.float32)

    def v1_chain(x):
        qkv = (x.reshape(B * L, H) @ w_qkv).astype(jnp.float32) + b_qkv
        q, k, v = jnp.split(qkv.astype(x.dtype).reshape(B, L, 3 * H), 3,
                            axis=-1)
        return fused_attn_block(q.reshape(B, L, n, d),
                                k.reshape(B, L, n, d),
                                v.reshape(B, L, n, d), bias, x, wo, bo,
                                gamma, beta)

    def v2(x):
        return fused_attn_block_v2(x, w_qkv, b_qkv, bias, wo, bo,
                                   gamma, beta, n=n)

    ref = None
    for name, fn in (("v1chain", v1_chain), ("v2inkernel", v2)):
        @jax.jit
        def chain(x, fn=fn):
            def body(c, _):
                o = fn(x + c * 1e-30)
                return jnp.mean(o.astype(jnp.float32)), None
            last, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                   length=args.iters)
            return last
        try:
            out = np.asarray(fn(x), np.float32)
            if ref is None:
                ref = out
            err = np.max(np.abs(out - ref))
            float(chain(x))
            t0 = time.perf_counter()
            float(chain(x))
            dt = time.perf_counter() - t0
            print(f"RESULT {name}: {dt / args.iters * 1e3:.3f} ms/block  "
                  f"maxerr={err:.4f}", flush=True)
        except Exception as e:
            print(f"RESULT {name}: FAILED {type(e).__name__} "
                  f"{str(e)[:200]}", flush=True)


def layer_race(args):
    B, L = args.batch, args.txt_len + args.num_bb
    n, d = 12, 64
    H, F = n * d, 3072
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, L, H)), jnp.bfloat16)
    wo = jnp.asarray(rng.standard_normal((H, H)) * 0.02, jnp.bfloat16)
    bo = jnp.asarray(rng.standard_normal((H,)) * 0.01, jnp.float32)
    g1 = jnp.ones((H,), jnp.float32)
    be1 = jnp.zeros((H,), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((H, F)) * 0.02, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((F,)) * 0.01, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((F, H)) * 0.02, jnp.bfloat16)
    b2 = jnp.asarray(rng.standard_normal((H,)) * 0.01, jnp.float32)
    g2 = jnp.ones((H,), jnp.float32)
    be2 = jnp.zeros((H,), jnp.float32)
    mask = np.ones((B, L), np.float32)
    mask[:, -13:] = 0
    bias = jnp.asarray(((1.0 - mask) * -10000.0)[:, None, None, :],
                       jnp.float32)

    def split2(q, k, v):
        x2 = fused_attn_block(q, k, v, bias, x, wo, bo, g1, be1)
        return fused_ffn_block(x2, w1, b1, w2, b2, g2, be2)

    def xla_chain(q, k, v):
        x2 = xla_attn_block(q, k, v, bias, x, wo, bo, g1, be1)
        return xla_ffn_block(x2, w1, b1, w2, b2, g2, be2)

    def onekernel(q, k, v):
        return fused_layer_block(q, k, v, bias, x, wo, bo, g1, be1,
                                 w1, b1, w2, b2, g2, be2)

    ref = None
    for name, fn in (("xlalayer", xla_chain), ("split2", split2),
                     ("onekernel", onekernel)):
        @jax.jit
        def chain(q, k, v, fn=fn):
            def body(c, _):
                o = fn(q + c * 1e-30, k, v)
                return jnp.mean(o.astype(jnp.float32)), None
            last, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                   length=args.iters)
            return last
        try:
            out = np.asarray(fn(q, k, v), np.float32)
            if ref is None:
                ref = out
            err = np.max(np.abs(out - ref))
            float(chain(q, k, v))
            t0 = time.perf_counter()
            float(chain(q, k, v))
            dt = time.perf_counter() - t0
            print(f"RESULT {name}: {dt / args.iters * 1e3:.3f} ms/layer  "
                  f"maxerr={err:.4f}", flush=True)
        except Exception as e:
            print(f"RESULT {name}: FAILED {type(e).__name__} "
                  f"{str(e)[:200]}", flush=True)


# ---------------------------------------------------------------- CE race
# The 250k-vocab LM-head CE grad in isolation: the fwd matmul materializes
# fp32 logits [N, V] (~3 GB at N=3072) and the CE + backward re-touch them
# — candidate for a fused flash-CE kernel (online logsumexp over vocab
# tiles, logits never in HBM). Before building it, this race measures how
# far the XLA chain sits above its pure-matmul roofline (the three
# N·V·H products: fwd, dX, dW): if the gap is small, XLA already fuses
# the softmax into the consuming matmuls and a Pallas CE can't pay.


def ce_race(args):
    N, H, V = args.batch * 24, 768, 250002
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N, H)) * 0.05, jnp.bfloat16)
    table = jnp.asarray(rng.standard_normal((V, H)) * 0.02, jnp.bfloat16)
    bias = jnp.zeros((V,), jnp.float32)
    labels = jnp.asarray(rng.integers(4, V, (N,)).astype(np.int32))
    w = jnp.ones((N,), jnp.float32)

    def ce_loss(x, table, bias):
        logits = jnp.dot(x, table.T, preferred_element_type=jnp.float32) \
            + bias
        lse = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
        return jnp.sum((lse - gold) * w)

    def ce_chunked(x, table, bias):
        from uc2_tpu.models.heads import chunked_softmax_cross_entropy
        return jnp.sum(chunked_softmax_cross_entropy(
            x, table, bias, labels, w, n_chunks=8))

    def grad_arm(loss_fn):
        def run(x, table, bias):
            l, g = jax.value_and_grad(loss_fn, argnums=(0, 1, 2))(
                x, table, bias)
            return l + sum(jnp.sum(gi.astype(jnp.float32)) * 1e-30
                           for gi in g)
        return run

    def matmul_roofline(x, table, bias):
        # the three products a CE grad must perform, nothing else:
        # fwd logits, dX = g @ W, dW = g^T @ x  (g re-used as fake grad)
        logits = jnp.dot(x, table.T, preferred_element_type=jnp.float32)
        g = (logits * 1e-30 + 1.0).astype(jnp.bfloat16)
        dx = jnp.dot(g, table, preferred_element_type=jnp.float32)
        dw = jax.lax.dot_general(
            g, x, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return jnp.sum(dx) * 1e-30 + jnp.sum(dw) * 1e-30 + jnp.sum(bias)

    racers = [("xlace_grad", grad_arm(ce_loss)),
              ("chunked8_grad", grad_arm(ce_chunked)),
              ("matmul_roofline", matmul_roofline)]
    tf = 3 * 2 * N * V * H / 1e12
    for name, fn in racers:
        @jax.jit
        def chain(x, table, fn=fn):
            def body(c, _):
                out = fn(x + c * 1e-30, table, bias)
                return out * 1e-30 + c * 0.0, None
            last, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                   length=args.iters)
            return last
        try:
            float(chain(x, table))
            t0 = time.perf_counter()
            float(chain(x, table))
            dt = time.perf_counter() - t0
            ms = dt / args.iters * 1e3
            print(f"RESULT ce {name} N={N}: {ms:.2f} ms "
                  f"[{tf / (ms / 1e3):.0f} TF/s of 3x{2 * N * V * H / 1e12:.2f} TF "
                  f"matmul work]", flush=True)
        except Exception as e:
            print(f"RESULT ce {name}: FAILED {type(e).__name__} "
                  f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
