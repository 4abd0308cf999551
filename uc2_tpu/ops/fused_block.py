"""Fused attention block: attention → out-projection → +residual → LayerNorm
in ONE Pallas kernel (inference path).

The reference runs these as four separate modules (BertSelfAttention +
BertSelfOutput: dense, residual add, LayerNorm — model/layer.py:104-170);
under XLA that chain round-trips the [B, L, H] context and the pre-LN sum
through HBM between fusions. At retrieval-scoring shapes attention is
~45-55% of wall time at ~6% of the FLOPs — memory/layout-bound — so the win
is keeping everything per grid cell in VMEM. Raced on a v5e (B=64, n=12,
d=64, bench_results.txt): 0.990 ms vs 1.296 ms XLA at L=162 (the worst-case
Nb=100 eval bucket, −24%); dispatch is gated at L ≥ 128 after the in-graph
A/B (see ``fused_block_profitable``). The module also ships the always-on
row-tiled fused FFN block (``fused_ffn_block``) and keeps two
raced-and-retired candidates for the record (whole-layer monolith,
QKV-in-kernel v2) — every gate's docstring carries its measured verdict.

Mosaic notes:
  * the heads→hidden merge ([.., L, n, d] → [.., L, n·d]) is an unsupported
    minor-dims shape cast — the out-projection is instead decomposed into n
    static per-head dots y += ctx_h · Wo[h·d:(h+1)·d, :] (identical FLOPs);
  * fp32 scores/softmax/LN statistics, bf16 matmul operands;
  * grid over batch blocks; K/V for the whole row fit VMEM at L ≤ 512
    (SURVEY §5: the reference asserts joint length ≤ 512).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _block_kernel(q_ref, k_ref, v_ref, bias_ref, x_ref, wo_ref, bo_ref,
                  g_ref, b_ref, o_ref, *, scale, n, L, d, eps):
    BB = q_ref.shape[0]
    H = n * d
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
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    ctx = jax.lax.dot_general(
        p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)           # [BB*n, L, d]
    # heads → hidden without a minor-dims shape cast (Mosaic rejects
    # vector<..x n x d> → vector<..x n·d>): per-head dots, summed
    ctx = ctx.reshape(BB, n, L, d).astype(wo_ref.dtype)
    y = jnp.zeros((BB, L, H), jnp.float32)
    for h in range(n):
        y = y + jax.lax.dot_general(
            ctx[:, h], wo_ref[h * d:(h + 1) * d, :],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    y = y + bo_ref[...].astype(jnp.float32) + x_ref[...].astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    yn = yn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = yn.astype(o_ref.dtype)


def fused_attn_block(q, k, v, bias, x, wo, bo, gamma, beta,
                     eps: float = 1e-12, BB: int = 0,
                     interpret: bool = False):
    """One encoder attention block, fused.

    q,k,v  [B, L, n, d]   post-projection heads (bf16/fp32)
    bias   [B, 1, 1, L]   additive mask ((1-m)·-10000)
    x      [B, L, H]      block input (residual)
    wo     [H, H], bo [H] out-projection (wo in compute dtype)
    gamma, beta [H]       LayerNorm affine (fp32)
    Returns LayerNorm(x + ctx·wo + bo) as [B, L, H] in x.dtype.
    """
    B, L, n, d = q.shape
    H = n * d
    qt, kt, vt = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    import os
    if os.environ.get("UC2_ATTN_BB"):
        BB = int(os.environ["UC2_ATTN_BB"])   # in-graph tile A/Bs
    if BB <= 0:
        BB = max(1, (4 * 1024 * 1024) // (n * L * L * 4))
    from uc2_tpu.ops.tiles import snap_bb
    BB = snap_bb(BB, B)   # gcd by default; UC2_BB_SNAP=div for A/Bs
    kernel = functools.partial(_block_kernel, scale=1.0 / math.sqrt(d),
                               n=n, L=L, d=d, eps=float(eps))
    bspec = lambda shape, im: pl.BlockSpec(shape, im,
                                           memory_space=pltpu.VMEM)
    i4 = lambda b: (b, 0, 0, 0)
    i3 = lambda b: (b, 0, 0)
    iw = lambda b: (0, 0)
    iv = lambda b: (0,)
    return pl.pallas_call(
        kernel,
        grid=(B // BB,),
        in_specs=[
            bspec((BB, n, L, d), i4), bspec((BB, n, L, d), i4),
            bspec((BB, n, L, d), i4), bspec((BB, 1, 1, L), i4),
            bspec((BB, L, H), i3),
            bspec((H, H), iw), bspec((H,), iv),
            bspec((H,), iv), bspec((H,), iv),
        ],
        out_specs=bspec((BB, L, H), i3),
        out_shape=jax.ShapeDtypeStruct((B, L, H), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * n * L * L * d + 2 * B * L * H * H,
            bytes_accessed=(6 * B * L * H) * q.dtype.itemsize,
            transcendentals=B * n * L * L),
    )(qt, kt, vt, bias, x, wo, bo, gamma, beta)


def _erf_poly(x):
    """erf via Abramowitz & Stegun 7.1.26 (max abs error 1.5e-7 — exact at
    fp32 tolerance). Mosaic implements neither erf nor erfc, which is what
    lax.erf / jax.nn.gelu(approximate=False) lower to; this uses only
    exp/abs/sign, all supported."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    y = 1.0 - (((((a5 * t + a4) * t) + a3) * t + a2) * t + a1) * t \
        * jnp.exp(-ax * ax)
    return s * y


def _block2_kernel(x_ref, wq_ref, wk_ref, wv_ref, bq_ref, bk_ref, bv_ref,
                   bias_ref, wo_ref, bo_ref, g_ref, b_ref, o_ref,
                   *, scale, n, L, d, eps):
    """v2: the QKV projection moves INSIDE the kernel — input is the block
    input x, not precomputed heads, so the [B, L, 3H] QKV intermediate
    never exists in HBM (the v1 chain writes+reads it, ~96 MB/layer at
    B=64/L=162 bf16). Per-head weights arrive pre-split on a MAJOR dim
    ([n, H, d] / [n, d, H]) so the kernel never slices the lane dim.

    RETIRED (kept for the record + UC2_ATTN_V2 experiments): wins the
    ISOLATED race at L=162 (1.702 vs 2.156 ms incl. projection, −21%) but
    LOSES in-graph (3026-3059 vs 3347-3356 pairs/s end-to-end at Nb=100)
    — in the full graph XLA pipelines the projection matmul against
    neighboring kernels, erasing the roundtrip cost the isolated chain
    pays, while v2's per-head [L,768]×[768,64] projections run at N=64
    MXU utilization and serialize inside each grid cell. Third instance
    this round of the isolated-vs-in-graph verdict flipping — always A/B
    end-to-end before shipping a kernel."""
    BB = x_ref.shape[0]
    H = n * d
    x = x_ref[...].reshape(BB * L, H)
    bias = bias_ref[...].reshape(BB, 1, 1, L).astype(jnp.float32)
    y = jnp.zeros((BB, L, H), jnp.float32)
    for h in range(n):
        q = (jax.lax.dot_general(
            x, wq_ref[h], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + bq_ref[h].astype(jnp.float32)).astype(x.dtype)
        k = (jax.lax.dot_general(
            x, wk_ref[h], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + bk_ref[h].astype(jnp.float32)).astype(x.dtype)
        v = (jax.lax.dot_general(
            x, wv_ref[h], dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
            + bv_ref[h].astype(jnp.float32)).astype(x.dtype)
        q = q.reshape(BB, L, d)
        k = k.reshape(BB, L, d)
        v = v.reshape(BB, L, d)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [BB, L, L]
        s = s * scale + bias[:, 0]
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
        ctx = jax.lax.dot_general(
            p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)          # [BB, L, d]
        y = y + jax.lax.dot_general(
            ctx.astype(wo_ref.dtype), wo_ref[h],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # [BB, L, H]
    y = y + bo_ref[...].astype(jnp.float32) \
        + x_ref[...].astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    yn = yn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = yn.astype(o_ref.dtype)


def fused_attn_block_v2(x, w_qkv, b_qkv, bias, wo, bo, gamma, beta,
                        n: int, eps: float = 1e-12, BB: int = 0,
                        interpret: bool = False):
    """v2 attention block: LN(x + attn(xWq, xWk, xWv)·Wo + bo), QKV
    projection in-kernel. ``w_qkv`` [H, 3H] / ``b_qkv`` [3H] are the fused
    Dense params (encoder layout: concat [q|k|v] on the output dim)."""
    B, L, H = x.shape
    d = H // n
    # pre-split per head on MAJOR dims (loop-invariant → XLA hoists out of
    # eval scans): [H, 3H] → [3, n, H, d]
    w = w_qkv.reshape(H, 3, n, d).transpose(1, 2, 0, 3)
    bqkv = b_qkv.reshape(3, n, d)
    wo_h = wo.reshape(n, d, H)
    if BB <= 0:
        BB = max(1, (4 * 1024 * 1024) // (n * L * L * 4))
    BB = math.gcd(BB, B)
    kernel = functools.partial(_block2_kernel, scale=1.0 / math.sqrt(d),
                               n=n, L=L, d=d, eps=float(eps))
    bspec = lambda shape, im: pl.BlockSpec(shape, im,
                                           memory_space=pltpu.VMEM)
    i3 = lambda b: (b, 0, 0)
    iw = lambda b: (0, 0, 0)
    ib = lambda b: (0, 0)
    iv = lambda b: (0,)
    cp = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    return pl.pallas_call(
        kernel,
        grid=(B // BB,),
        in_specs=[
            bspec((BB, L, H), i3),
            bspec((n, H, d), iw), bspec((n, H, d), iw),
            bspec((n, H, d), iw),
            bspec((n, d), ib), bspec((n, d), ib), bspec((n, d), ib),
            bspec((BB, 1, 1, L), lambda b: (b, 0, 0, 0)),
            bspec((n, d, H), iw), bspec((H,), iv),
            bspec((H,), iv), bspec((H,), iv),
        ],
        out_specs=bspec((BB, L, H), i3),
        out_shape=jax.ShapeDtypeStruct((B, L, H), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * B * L * H * (4 * H) + 4 * B * n * L * L * d,
            bytes_accessed=(2 * B * L * H) * x.dtype.itemsize,
            transcendentals=B * n * L * L),
        **cp,
    )(x, w[0], w[1], w[2], bqkv[0], bqkv[1], bqkv[2], bias, wo_h, bo,
      gamma, beta)


def _ffn_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref, b_ref,
                o_ref, *, eps):
    x = x_ref[...]
    h = jax.lax.dot_general(
        x, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    # erf-form gelu (reference model/layer.py:31-37) via the polynomial erf
    h = 0.5 * h * (1.0 + _erf_poly(h * (1.0 / math.sqrt(2.0))))
    h = h.astype(x.dtype)
    y = jax.lax.dot_general(
        h, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y = y + b2_ref[...].astype(jnp.float32) + x.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    yn = yn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = yn.astype(o_ref.dtype)


def fused_ffn_block(x, w1, b1, w2, b2, gamma, beta, eps: float = 1e-12,
                    R: int = 0, interpret: bool = False):
    """Row-tiled fused FFN block: LN(gelu(x·W1+b1)·W2+b2 + x).

    x [B, L, H]; W1 [H, F], W2 [F, H] in compute dtype; b1/b2/gamma/beta
    fp32. Both weight matrices stay VMEM-resident across grid cells
    (constant index map → the pipeline skips the re-fetch) and the [R, F]
    intermediate never touches HBM — the XLA chain materializes it
    ([B·L, 3072] bf16 ≈ 63 MB at B=64/L=162).
    """
    B, L, H = x.shape
    F = w1.shape[1]
    rows = B * L
    import os
    if R <= 0:
        # tile rule from in-graph races (v5e, bench_results.txt): the
        # smallest zero-padding divisor in [256, 512] wins at every eval
        # bucket — rows=6272→448 (5744-5770 vs 5526 pairs/s end-to-end),
        # 8192→256 (4944-4954 vs 4909), 10368→384 (3328-3341 vs 3244);
        # a ragged tail costs more than smaller tiles do
        R = next((r for r in range(256, 513, 8) if rows % r == 0), 512)
    if os.environ.get("UC2_FFN_R"):
        R = int(os.environ["UC2_FFN_R"])     # in-graph tile A/Bs
    xr = x.reshape(rows, H)
    pad = (-rows) % R
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
    kernel = functools.partial(_ffn_kernel, eps=float(eps))
    bspec = lambda shape, im: pl.BlockSpec(shape, im,
                                           memory_space=pltpu.VMEM)
    cp = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    out = pl.pallas_call(
        kernel,
        grid=(xr.shape[0] // R,),
        in_specs=[
            bspec((R, H), lambda i: (i, 0)),
            bspec((H, F), lambda i: (0, 0)), bspec((F,), lambda i: (0,)),
            bspec((F, H), lambda i: (0, 0)), bspec((H,), lambda i: (0,)),
            bspec((H,), lambda i: (0,)), bspec((H,), lambda i: (0,)),
        ],
        out_specs=bspec((R, H), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((xr.shape[0], H), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * H * F,
            bytes_accessed=(2 * rows * H) * x.dtype.itemsize,
            transcendentals=rows * F),
        **cp,
    )(xr, w1, b1, w2, b2, gamma, beta)
    return out[:rows].reshape(B, L, H)


def _layer_kernel(q_ref, k_ref, v_ref, bias_ref, x_ref, wo_ref, bo_ref,
                  g1_ref, be1_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  g2_ref, be2_ref, o_ref, *, scale, n, L, d, eps):
    """Whole encoder layer in one cell: attention → out-proj → +res → LN →
    FFN → +res → LN. Saves the [BB, L, H] round-trip between the two
    fused blocks on top of their individual wins."""
    BB = q_ref.shape[0]
    H = n * d
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
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    ctx = jax.lax.dot_general(
        p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    ctx = ctx.reshape(BB, n, L, d).astype(wo_ref.dtype)
    y = jnp.zeros((BB, L, H), jnp.float32)
    for h_ in range(n):
        y = y + jax.lax.dot_general(
            ctx[:, h_], wo_ref[h_ * d:(h_ + 1) * d, :],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    y = y + bo_ref[...].astype(jnp.float32) + x_ref[...].astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    x2 = (y - mu) * jax.lax.rsqrt(var + eps)
    x2 = x2 * g1_ref[...].astype(jnp.float32) \
        + be1_ref[...].astype(jnp.float32)
    x2l = x2.astype(o_ref.dtype).reshape(BB * L, H)
    h = jax.lax.dot_general(
        x2l, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    h = h + b1_ref[...].astype(jnp.float32)
    h = 0.5 * h * (1.0 + _erf_poly(h * (1.0 / math.sqrt(2.0))))
    h = h.astype(o_ref.dtype)
    y2 = jax.lax.dot_general(
        h, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    y2 = y2 + b2_ref[...].astype(jnp.float32) + x2.reshape(BB * L, H)
    mu2 = jnp.mean(y2, axis=-1, keepdims=True)
    var2 = jnp.mean(jnp.square(y2 - mu2), axis=-1, keepdims=True)
    z = (y2 - mu2) * jax.lax.rsqrt(var2 + eps)
    z = z * g2_ref[...].astype(jnp.float32) \
        + be2_ref[...].astype(jnp.float32)
    o_ref[...] = z.reshape(BB, L, H).astype(o_ref.dtype)


def fused_layer_block(q, k, v, bias, x, wo, bo, g1, be1, w1, b1, w2, b2,
                      g2, be2, eps: float = 1e-12, BB: int = 0,
                      interpret: bool = False):
    """One whole encoder layer, fused (see _layer_kernel)."""
    B, L, n, d = q.shape
    H = n * d
    F = w1.shape[1]
    qt, kt, vt = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
    if BB <= 0:
        BB = max(1, (4 * 1024 * 1024) // (n * L * L * 4))
    BB = math.gcd(BB, B)
    kernel = functools.partial(_layer_kernel, scale=1.0 / math.sqrt(d),
                               n=n, L=L, d=d, eps=float(eps))
    bspec = lambda shape, im: pl.BlockSpec(shape, im,
                                           memory_space=pltpu.VMEM)
    i4 = lambda b: (b, 0, 0, 0)
    i3 = lambda b: (b, 0, 0)
    iw = lambda b: (0, 0)
    iv = lambda b: (0,)
    cp = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    return pl.pallas_call(
        kernel,
        grid=(B // BB,),
        in_specs=[
            bspec((BB, n, L, d), i4), bspec((BB, n, L, d), i4),
            bspec((BB, n, L, d), i4), bspec((BB, 1, 1, L), i4),
            bspec((BB, L, H), i3),
            bspec((H, H), iw), bspec((H,), iv),
            bspec((H,), iv), bspec((H,), iv),
            bspec((H, F), iw), bspec((F,), iv),
            bspec((F, H), iw), bspec((H,), iv),
            bspec((H,), iv), bspec((H,), iv),
        ],
        out_specs=bspec((BB, L, H), i3),
        out_shape=jax.ShapeDtypeStruct((B, L, H), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * B * n * L * L * d + 2 * B * L * H * H
            + 4 * B * L * H * F,
            bytes_accessed=(2 * B * L * H) * q.dtype.itemsize,
            transcendentals=B * n * L * L + B * L * F),
        **cp,
    )(qt, kt, vt, bias, x, wo, bo, g1, be1, w1, b1, w2, b2, g2, be2)


def fused_layer_profitable(L: int, n: int) -> bool:
    """Whole-layer fusion gate — raced on chip (kernel_lab --mode layer,
    v5e, B=64, L=162): one-kernel 1.655 vs two-kernel split 1.583 vs XLA
    2.138 ms/layer. The monolith LOSES to the split by ~4.5%: its FFN half
    runs on BB·L=162-row cells where the dedicated FFN kernel runs
    512-row tiles (bigger MXU ops), outweighing the saved [BB, L, H]
    round-trip. Permanently off; the split ships."""
    return False


def fused_ffn_profitable(L: int) -> bool:
    """Gate for the FFN-block fusion on the inference path. On-chip race
    (kernel_lab --mode ffn, v5e, B=64, R=512): fused wins at every eval
    bucket — L=162: 1.358 vs 1.500 ms (−9.5%), L=128: 1.142-1.160 vs
    1.456 (−21%), L=98: 1.034 vs 1.179 (−12%). Row-tiled, so the win is
    shape-insensitive: always on."""
    return True


def fused_block_profitable(L: int, n: int) -> bool:
    """Shape gate from the on-chip race (bench_results.txt, v5e, B=64,
    n=12, d=64): the fused block wins at L=162 (0.990 vs 1.296 ms, −24%)
    and loses at L=128 (0.866 vs 0.798, +8.5%) — the XLA chain's matmuls
    ride lane-aligned 128-multiples, while the fused kernel's VMEM win
    dominates at ragged L. The FULL-GRAPH A/B overrides the microbench at
    L=128: with the FFN block also fused, forcing attention fusion
    measures 4909-4916 vs 4852-4865 pairs/s end-to-end (UC2_FUSE_ATTN_ALL
    runs, bench_results.txt) — the isolated-race loss flips once XLA no
    longer schedules the surrounding chain. At L=98 the in-graph verdict
    matches the microbench (5366-5390 forced vs 5528-5580 gated: XLA
    wins). Gate: L ≥ 128. UC2_FUSE_ATTN_ALL=1 forces it on for in-graph
    A/Bs."""
    import os
    if os.environ.get("UC2_FUSE_ATTN_ALL"):
        return True
    return L >= 128
