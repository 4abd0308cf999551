"""Fused attention kernel (Pallas/TPU).

The encoder's sequences are short (joint text+regions ≤ 512, reference
assert pretrain.py:1164-1168), so this is flash-attention in the "single
K-block" regime: for each (batch, head, q-block) grid cell the full K/V rows
live in VMEM (512×64 bf16 = 64 KB ≪ 16 MB) and the kernel computes
scores → softmax → context in one pass. Nothing [L×L]-shaped ever touches
HBM — the win over the unfused XLA path, which materializes the
[B, n, L, L] probability tensor twice.

Semantics match ops/attention.py::_xla_attention exactly: additive bias
(-10000-masked, broadcast over heads/queries), fp32 softmax, bf16 context.

Backward: custom_vjp that recomputes attention with the XLA einsum path —
correct gradients everywhere, kernel-accelerated forward for the inference-
heavy paths (ITM scoring is the headline benchmark). A full Pallas backward
is a planned optimization.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale):
    # Mosaic batched matmuls need batch dims at position 0 → transpose the
    # head axis front inside VMEM (cheap relayout, never touches HBM).
    q = q_ref[0].transpose(1, 0, 2)            # [n, bq, d]
    k = k_ref[0].transpose(1, 0, 2)            # [n, L, d]
    v = v_ref[0].transpose(1, 0, 2)            # [n, L, d]
    bias = bias_ref[0, 0, 0, :]                # [L]
    # heads-batched QK^T: batch n, contract d → [n, bq, L]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    s = s * scale + bias[None, None, :].astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    # batch n, contract L → [n, bq, d]
    o = jax.lax.dot_general(
        p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    o_ref[0] = o.transpose(1, 0, 2).astype(o_ref.dtype)


def _fwd_pallas(q, k, v, bias, block_q: int = 512):
    """q,k,v [B, L, n, d] — the encoder's native layout; no host-side
    transposes (head-batched matmuls inside the kernel instead)."""
    B, L, n, d = q.shape
    bq = L if L <= block_q else block_q
    grid = (B, pl.cdiv(L, bq))
    scale = 1.0 / math.sqrt(d)
    kernel = functools.partial(_attn_kernel, scale=scale)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, n, d), lambda b, i: (b, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, n, d), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, n, d), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, L), lambda b, i: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, n, d), lambda b, i: (b, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, n, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * n * L * L * d,
            bytes_accessed=(4 * B * L * n * d) * q.dtype.itemsize,
            transcendentals=B * n * L * L),
    )(q, k, v, bias)


def _attn_kernel_v3(q_ref, k_ref, v_ref, bias_ref, o_ref, *, scale, n, L, d):
    """Big-cell variant: each grid cell processes BB batch rows × all heads.
    Inputs arrive in [BB, n, L, d] blocks; leading dims collapse into one
    batch axis (free reshape) so the matmuls are well-shaped batched dots
    with batch at position 0 (Mosaic requirement). Nothing [L,L]-shaped
    leaves VMEM."""
    BB = q_ref.shape[0]
    q = q_ref[...].reshape(BB * n, L, d)
    k = k_ref[...].reshape(BB * n, L, d)
    v = v_ref[...].reshape(BB * n, L, d)
    bias = bias_ref[...].reshape(BB, 1, 1, L)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [BB*n, L, L]
    s = s.reshape(BB, n, L, L) * scale + bias.astype(jnp.float32)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    p = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(v.dtype)
    o = jax.lax.dot_general(
        p.reshape(BB * n, L, L), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [BB*n, L, d]
    o_ref[...] = o.reshape(BB, n, L, d).astype(o_ref.dtype)


def _fwd_pallas_v3(q, k, v, bias, batch_block: int = 0):
    """q,k,v [B, L, n, d]; runs on [B, n, L, d] with batch-blocked cells.

    batch_block=0 → largest BB whose fp32 score tensor (BB·n·L²·4B) stays
    within ~4MB of VMEM (leaves room for double-buffered inputs; BB=8 at
    L=162 blew the 16MB scoped limit, BB=2 measured best).
    """
    B, L, n, d = q.shape
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if batch_block <= 0:
        batch_block = max(1, (4 * 1024 * 1024) // (n * L * L * 4))
    BB = math.gcd(batch_block, B)
    grid = (B // BB,)
    kernel = functools.partial(_attn_kernel_v3, scale=1.0 / math.sqrt(d),
                               n=n, L=L, d=d)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((BB, n, L, d), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, n, L, d), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, n, L, d), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BB, 1, 1, L), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BB, n, L, d), lambda b: (b, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, n, L, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * n * L * L * d,
            bytes_accessed=(4 * B * L * n * d) * q.dtype.itemsize,
            transcendentals=B * n * L * L),
    )(qt, kt, vt, bias)
    return out.transpose(0, 2, 1, 3)


def _xla_ref(q, k, v, bias):
    from uc2_tpu.ops.attention import _xla_attention
    return _xla_attention(q, k, v, bias)


def _fwd_dispatch(q, k, v, bias):
    B, L, n, d = q.shape
    # v3 (batch-blocked, heads collapsed) when even BB=1 fits VMEM;
    # else the per-(batch, head) kernel. Measured at L=162/d=64/n=12:
    # v3 0.837 ms/op vs XLA 1.095 vs per-head 1.3+ (B=64, v5e).
    if n * L * L * 4 <= 8 * 1024 * 1024:
        return _fwd_pallas_v3(q, k, v, bias)
    return _fwd_pallas(q, k, v, bias)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def flash_attention(q, k, v, bias):
    """q,k,v [B, L, n, d]; bias [B, 1, 1, L] additive. Returns [B, L, n, d]."""
    return _fwd_dispatch(q, k, v, bias)


def _fa_fwd(q, k, v, bias):
    return _fwd_dispatch(q, k, v, bias), (q, k, v, bias)


def _fa_bwd(res, g):
    q, k, v, bias = res
    _, vjp = jax.vjp(_xla_ref, q, k, v, bias)
    return vjp(g)


flash_attention.defvjp(_fa_fwd, _fa_bwd)
