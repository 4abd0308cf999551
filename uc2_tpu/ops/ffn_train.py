"""Training-path fused FFN block: LN(dropout(gelu(x·W1+b1)·W2+b2) + x)
with a full Pallas backward that RECOMPUTES the [R, F] intermediates
in-kernel (VERDICT r3 #6).

Reference chain being fused: BertIntermediate → BertOutput (dense → gelu →
dense → dropout → +residual → LayerNorm, model/layer.py:104-170). The
inference-side fused FFN block (ops/fused_block.py:fused_ffn_block) wins
every eval bucket but is gated to deterministic calls; under training XLA
materializes the [B·L, F] gelu input AND output to HBM for the backward
(≈ 2 × 63 MB bf16 at B=64/L=162/F=3072 per layer per direction). Here
neither pass writes anything F-sized to HBM:

  fwd:  one kernel, identical math to fused_ffn_block + in-kernel dropout
        (pltpu PRNG, mask derived from (seed, grid cell) — the
        flash_attention_train pattern, ops/flash_attention.py:160).
  bwd:  one kernel per row tile that recomputes a = x·W1+b1 and
        g = gelu(a) from x (two extra H×F matmuls), regenerates the same
        dropout mask from the same (seed, cell), and produces dx plus
        dW1/db1/dW2/db2/dgamma/dbeta accumulated across sequential grid
        cells into VMEM-resident fp32 outputs.

FLOPs: bwd runs 6 H×F-sized matmuls vs XLA's 4-with-stored-intermediates —
the bet is the saved ~126 MB/layer of HBM traffic at ~820 GB/s beats the
extra ~2.4 GFLOP at ~2 TF/s-per-layer-budget. Per the round-3 lesson
(isolated races do NOT predict in-graph wins — three flips), this ships
only behind an end-to-end chained-scan A/B: dispatch is gated on
UC2_FFN_TRAIN=1 until the race verdict is recorded here.

RACE VERDICT (v5e, 4-arm train_ab, mlm B=64 L=162 M=24, every grad leaf
live, 3 trials, bench_results.txt r4): pallas-train+ffnt 10.77 / 10.86 /
11.06 vs pallas-train 10.80 / 10.77 / 10.48 grad-steps/s — mean +2%,
inside the ±3% trial spread. The traffic model predicted ~2% (the FFN's
~126 MB/layer HBM saving against a ~93 ms step dominated by the
[1536, 250002] LM-head and attention backward), so the kernel performs
as designed but the step's bound is elsewhere. Verdict: WASH — never
loses, sometimes +5%; stays OPT-IN (UC2_FFN_TRAIN=1) per the ship-only-
confirmed-wins rule, revisit if the head/attention costs shrink (e.g.
larger batch, chunked-CE shapes, or models with a bigger FFN share).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from uc2_tpu.ops.fused_block import _erf_poly
from uc2_tpu.ops.flash_attention import _keep_mask

_INV_SQRT2 = 1.0 / math.sqrt(2.0)
_INV_SQRT2PI = 1.0 / math.sqrt(2.0 * math.pi)


def _gelu_f32(a):
    return 0.5 * a * (1.0 + _erf_poly(a * _INV_SQRT2))


def _dgelu_f32(a):
    # d/da [a·Φ(a)] = Φ(a) + a·φ(a)
    return (0.5 * (1.0 + _erf_poly(a * _INV_SQRT2))
            + a * jnp.exp(-0.5 * a * a) * _INV_SQRT2PI)


def _fwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                b_ref, o_ref, *, eps, rate, interpret):
    x = x_ref[...]
    a = jax.lax.dot_general(
        x, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...].astype(jnp.float32)
    h = _gelu_f32(a).astype(x.dtype)
    y2 = jax.lax.dot_general(
        h, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[...].astype(jnp.float32)
    if rate > 0.0:
        keep = _keep_mask(seed_ref[0], pl.program_id(0), y2.shape, rate,
                          interpret)
        y2 = jnp.where(keep, y2 * (1.0 / (1.0 - rate)), 0.0)
    y = y2 + x.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    yn = (y - mu) * jax.lax.rsqrt(var + eps)
    yn = yn * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)
    o_ref[...] = yn.astype(o_ref.dtype)


def _bwd_kernel(seed_ref, x_ref, w1_ref, b1_ref, w2_ref, b2_ref, g_ref,
                dy_ref, dx_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
                dg_ref, dbeta_ref, *, eps, rate, interpret):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _init():
        dw1_ref[...] = jnp.zeros_like(dw1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)
        dw2_ref[...] = jnp.zeros_like(dw2_ref)
        db2_ref[...] = jnp.zeros_like(db2_ref)
        dg_ref[...] = jnp.zeros_like(dg_ref)
        dbeta_ref[...] = jnp.zeros_like(dbeta_ref)

    x = x_ref[...]
    H = x.shape[1]
    # ---- recompute the forward up to the LN statistics (nothing F-sized
    # was stored; same (seed, cell) regenerates the identical mask)
    a = jax.lax.dot_general(
        x, w1_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b1_ref[...].astype(jnp.float32)
    h = _gelu_f32(a).astype(x.dtype)
    y2 = jax.lax.dot_general(
        h, w2_ref[...], dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) + b2_ref[...].astype(jnp.float32)
    if rate > 0.0:
        keep = _keep_mask(seed_ref[0], i, y2.shape, rate, interpret)
        y2 = jnp.where(keep, y2 * (1.0 / (1.0 - rate)), 0.0)
    y = y2 + x.astype(jnp.float32)
    mu = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    yn = (y - mu) * inv

    # ---- backward
    dy = dy_ref[...].astype(jnp.float32)
    dg_ref[...] += jnp.sum(dy * yn, axis=0)
    dbeta_ref[...] += jnp.sum(dy, axis=0)
    dyn = dy * g_ref[...].astype(jnp.float32)
    # LN vjp (per row over H): dy_pre = inv·(dyn − mean(dyn) − yn·mean(dyn·yn))
    dy_pre = inv * (dyn - jnp.mean(dyn, axis=-1, keepdims=True)
                    - yn * jnp.mean(dyn * yn, axis=-1, keepdims=True))
    if rate > 0.0:
        dy2 = jnp.where(keep, dy_pre * (1.0 / (1.0 - rate)), 0.0)
    else:
        dy2 = dy_pre
    db2_ref[...] += jnp.sum(dy2, axis=0)
    dy2l = dy2.astype(x.dtype)
    # dW2 += hᵀ · dy2 ; dh = dy2 · W2ᵀ
    dw2_ref[...] += jax.lax.dot_general(
        h, dy2l, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dh = jax.lax.dot_general(
        dy2l, w2_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    da = dh * _dgelu_f32(a)
    db1_ref[...] += jnp.sum(da, axis=0)
    dal = da.astype(x.dtype)
    dw1_ref[...] += jax.lax.dot_general(
        x, dal, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx = jax.lax.dot_general(
        dal, w1_ref[...], dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dx_ref[...] = (dx + dy_pre).astype(dx_ref.dtype)


def _pick_tile(rows: int) -> int:
    """Shared fwd/bwd row tile (a divergent tile would change the dropout
    mask between passes — the flash-attention shared-BB lesson). The bwd
    holds fp32 dW1+dW2 accumulators (~19 MB at uc2-base) on top of the
    weights, so tiles stay ≤ 256 rows."""
    import os
    if os.environ.get("UC2_FFN_TRAIN_R"):
        return int(os.environ["UC2_FFN_TRAIN_R"])
    return next((r for r in range(256, 127, -8) if rows % r == 0), 256)


def _ffn_train_fwd(x, w1, b1, w2, b2, gamma, beta, seed, rate, eps,
                   interpret):
    B, L, H = x.shape
    F = w1.shape[1]
    rows = B * L
    R = _pick_tile(rows)
    xr = x.reshape(rows, H)
    pad = (-rows) % R
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
    kernel = functools.partial(_fwd_kernel, eps=float(eps),
                               rate=float(rate), interpret=interpret)
    # index maps under PrefetchScalarGridSpec also receive the scalar refs
    row = lambda: pl.BlockSpec((R, H), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM)
    cst = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    cp = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024))
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(xr.shape[0] // R,),
            in_specs=[row(), cst((H, F)), cst((F,)), cst((F, H)),
                      cst((H,)), cst((H,)), cst((H,))],
            out_specs=row(),
        ),
        out_shape=jax.ShapeDtypeStruct((xr.shape[0], H), x.dtype),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * H * F,
            bytes_accessed=(2 * rows * H) * x.dtype.itemsize,
            transcendentals=rows * F),
        **cp,
    )(jnp.asarray(seed, jnp.int32).reshape(1), xr, w1, b1, w2, b2,
      gamma, beta)
    return out[:rows].reshape(B, L, H)


def _ffn_train_bwd(x, w1, b1, w2, b2, gamma, seed, rate, eps, interpret,
                   dy):
    B, L, H = x.shape
    F = w1.shape[1]
    rows = B * L
    R = _pick_tile(rows)
    xr = x.reshape(rows, H)
    dyr = dy.reshape(rows, H)
    pad = (-rows) % R
    if pad:
        xr = jnp.pad(xr, ((0, pad), (0, 0)))
        # zero upstream grads on pad rows keep the accumulators exact
        dyr = jnp.pad(dyr, ((0, pad), (0, 0)))
    kernel = functools.partial(_bwd_kernel, eps=float(eps),
                               rate=float(rate), interpret=interpret)
    row = lambda: pl.BlockSpec((R, H), lambda i, *_: (i, 0),
                               memory_space=pltpu.VMEM)
    cst = lambda shape: pl.BlockSpec(
        shape, lambda i, *_: tuple(0 for _ in shape),
        memory_space=pltpu.VMEM)
    cp = {} if interpret else dict(
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024))
    dx, dw1, db1, dw2, db2, dg, dbeta = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(xr.shape[0] // R,),
            in_specs=[row(), cst((H, F)), cst((F,)), cst((F, H)),
                      cst((H,)), cst((H,)), row()],
            out_specs=[row(), cst((H, F)), cst((F,)), cst((F, H)),
                       cst((H,)), cst((H,)), cst((H,))],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((xr.shape[0], H), x.dtype),
            jax.ShapeDtypeStruct((H, F), jnp.float32),
            jax.ShapeDtypeStruct((F,), jnp.float32),
            jax.ShapeDtypeStruct((F, H), jnp.float32),
            jax.ShapeDtypeStruct((H,), jnp.float32),
            jax.ShapeDtypeStruct((H,), jnp.float32),
            jax.ShapeDtypeStruct((H,), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=12 * rows * H * F,
            bytes_accessed=(4 * rows * H) * x.dtype.itemsize,
            transcendentals=2 * rows * F),
        **cp,
    )(jnp.asarray(seed, jnp.int32).reshape(1), xr, w1, b1, w2, b2, gamma,
      dyr)
    return dx[:rows].reshape(B, L, H), dw1, db1, dw2, db2, dg, dbeta


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def fused_ffn_block_train(x, w1, b1, w2, b2, gamma, beta, seed,
                          rate: float = 0.0, eps: float = 1e-12,
                          interpret: bool = False):
    """LN(dropout(gelu(x·W1+b1)·W2+b2) + x) with Pallas fwd AND bwd.

    x [B, L, H]; W1 [H, F] / W2 [F, H] in compute dtype; b1/b2/gamma/beta
    fp32; ``seed`` an int32 scalar (traced OK) deriving the per-cell
    dropout mask. Weight grads return fp32."""
    return _ffn_train_fwd(x, w1, b1, w2, b2, gamma, beta, seed, rate, eps,
                          interpret)


def _fft_fwd(x, w1, b1, w2, b2, gamma, beta, seed, rate, eps, interpret):
    out = _ffn_train_fwd(x, w1, b1, w2, b2, gamma, beta, seed, rate, eps,
                         interpret)
    return out, (x, w1, b1, w2, b2, gamma, seed)


def _fft_bwd(rate, eps, interpret, res, dy):
    import numpy as np
    x, w1, b1, w2, b2, gamma, seed = res
    dx, dw1, db1, dw2, db2, dg, dbeta = _ffn_train_bwd(
        x, w1, b1, w2, b2, gamma, seed, rate, eps, interpret, dy)
    dseed = np.zeros(jnp.shape(seed), dtype=jax.dtypes.float0)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1.dtype),
            dw2.astype(w2.dtype), db2.astype(b2.dtype),
            dg.astype(gamma.dtype), dbeta, dseed)


fused_ffn_block_train.defvjp(_fft_fwd, _fft_bwd)
