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

Two entry points:
  * ``flash_attention`` — inference forward (v3 batch-blocked kernel);
    backward falls back to the XLA einsum recompute.
  * ``flash_attention_train`` — training: in-kernel attention-probs dropout
    (pltpu PRNG, mask regenerated from the seed) with a full Pallas
    backward. Nothing [L, L]-shaped touches HBM in either pass.
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


# --------------------------------------------------------------- training
# Forward with in-kernel attention-probs dropout (pltpu PRNG) + a full
# Pallas backward that regenerates the identical mask from the same seed —
# so pretraining (attention_probs_dropout_prob=0.1, reference
# model/layer.py:99-101) runs the kernel instead of falling back to XLA,
# and nothing [L, L]-shaped is ever written to HBM in either pass.


def _keep_mask(seed, cell, shape, rate, interpret=False):
    """Deterministic per-cell keep mask — identical in fwd and bwd.

    TPU: pltpu PRNG seeded with (seed + grid cell). Interpreter mode (CPU
    tests) lacks the TPU PRNG primitives, so it derives an equivalent mask
    from jax.random — same (seed, cell) determinism, same keep rate."""
    if interpret:
        key = jax.random.fold_in(jax.random.key(seed), cell)
        return jax.random.uniform(key, shape) >= rate
    pltpu.prng_seed(seed + cell)
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    return bits >= jnp.uint32(min(int(rate * 4294967296.0), 4294967295))


def _probs(q, k, bias, scale, BB, n, L):
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [BB*n, L, L]
    s = s.reshape(BB, n, L, L) * scale + bias.astype(jnp.float32)
    s = s.reshape(BB * n, L, L)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)      # fp32 [BB*n, L, L]


def _load_heads(ref, n, L, d, native):
    """VMEM block → [BB*n, L, d] batched-dot operand.

    native=False: block is [BB, n, L, d] (host-side XLA transpose produced
    it). native=True: block is the encoder's untouched [BB, L, n, d] —
    the head-axis move happens HERE, in VMEM, so no [B, L, n, d] →
    [B, n, L, d] pass ever hits HBM around the custom call."""
    x = ref[...]
    BB = x.shape[0]
    if native:
        x = x.transpose(0, 2, 1, 3)
    return x.reshape(BB * n, L, d)


def _store_heads(ref, x, BB, n, L, d, native):
    x = x.reshape(BB, n, L, d)
    if native:
        x = x.transpose(0, 2, 1, 3)
    ref[...] = x.astype(ref.dtype)


_WARNED = set()


def _warn_once(key, msg):
    if key not in _WARNED:
        _WARNED.add(key)
        import sys
        print(f"flash_attention_train: {msg}", file=sys.stderr, flush=True)


def _train_native():
    import os
    return os.environ.get("UC2_ATTN_TRAIN_LAYOUT") == "native"


def _train_layout(B, n, L, d, rate):
    """Resolve (native, BB, HB) for BOTH passes from the same inputs/env,
    so the fwd/bwd grid geometry (and therefore the regenerated dropout
    mask streams) can never diverge. The bwd's modeled VMEM footprint
    (tiles.attn_train_bwd_vmem_bytes, calibrated to round 4's two on-chip
    Mosaic OOMs) gates everything pre-compile.

    HB is the head-block: the grid is (B//BB, n//HB) and each cell keeps
    only BB*HB [L, L]-class fp32 tensors live, so shrinking HB cuts the
    footprint with ZERO recompute (unlike a dQ/dKV pass split). Default
    resolution keeps the proven round-4 geometry whenever it fits
    (HB = n, batch-only grid — bit-identical mask streams); HB shrinks
    only when the full-head cell would OOM, which is exactly what makes
    the native layout feasible at the production bucket (L=162: native
    HB=12 models 24.4M > 16M, HB=6 models 14.4M — fits). The native
    layout still falls back to standard when even (BB=1, HB=1) does not
    fit. ``UC2_ATTN_TRAIN_HB`` overrides for sweeps (snapped to a divisor
    of n, clamped to the modeled budget like BB)."""
    import os
    from uc2_tpu.ops.tiles import max_train_hb
    native = _train_native()
    if native and max_train_hb(1, n, L, d, native=True, rate=rate) == 0:
        _warn_once(("native", B, n, L, d),
                   f"native layout bwd has no legal grid: every "
                   f"Mosaic-legal head-block (HB == n or HB % 8 == 0 — "
                   f"the head axis is the block's second-to-last dim) "
                   f"exceeds the modeled scoped-VMEM budget at B={B} "
                   f"n={n} L={L} d={d}; falling back to the standard "
                   f"layout")
        native = False
    hb_cap = max_train_hb(1, n, L, d, native=native, rate=rate)
    env_hb = int(os.environ.get("UC2_ATTN_TRAIN_HB", "0"))
    if env_hb > 0:
        hb = math.gcd(env_hb, n)
        if native and hb != n and hb % 8:
            _warn_once(("hb-legal", B, n, L, d, hb),
                       f"head-block {hb} is not Mosaic-legal in the "
                       f"native layout (needs HB == n or HB % 8 == 0); "
                       f"using {hb_cap}")
            hb = hb_cap
        if hb > hb_cap:
            _warn_once(("hb", B, n, L, d, native, hb),
                       f"head-block {hb} exceeds the modeled bwd VMEM "
                       f"budget at B={B} n={n} L={L}; clamped to {hb_cap}")
            hb = hb_cap
    else:
        hb = hb_cap
    if hb < n:
        _warn_once(("hbsplit", B, n, L, d, native),
                   f"head-split grid: HB={hb} of n={n} heads per cell "
                   f"(B={B} L={L}, {'native' if native else 'standard'} "
                   f"layout)")
    bb = _train_bb(B, n, L, d, rate, native, hb)
    return native, bb, hb


def _cell_id(two_d):
    """Flat grid-cell id — the per-cell dropout stream selector. MUST be
    computed identically in the fwd and bwd kernels (same grid via the
    shared _train_layout), or the regenerated masks decorrelate and the
    gradients are silently wrong. The head-split (HB < n) grid is 2D;
    HB == n keeps the pre-round-5 1D batch-only grid bit-identical (the
    chip-proven production geometry is untouched by the feature)."""
    if two_d:
        return pl.program_id(0) * pl.num_programs(1) + pl.program_id(1)
    return pl.program_id(0)


def _attn_train_fwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, o_ref,
                           *, scale, n, L, d, rate, interpret=False,
                           native=False, two_d=False):
    # ``n`` here is the heads-per-cell head block HB, not the model's total
    # head count — the grid is (B//BB, n_total//HB), see _train_layout
    BB = q_ref.shape[0]
    q = _load_heads(q_ref, n, L, d, native)
    k = _load_heads(k_ref, n, L, d, native)
    v = _load_heads(v_ref, n, L, d, native)
    bias = bias_ref[...].reshape(BB, 1, 1, L)
    p = _probs(q, k, bias, scale, BB, n, L)
    if rate > 0.0:
        keep = _keep_mask(seed_ref[0], _cell_id(two_d), p.shape, rate,
                          interpret)
        p = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    _store_heads(o_ref, o, BB, n, L, d, native)


def _attn_train_bwd_kernel(seed_ref, q_ref, k_ref, v_ref, bias_ref, g_ref,
                           dq_ref, dk_ref, dv_ref, db_ref,
                           *, scale, n, L, d, rate, interpret=False,
                           native=False, two_d=False):
    # ``n`` = heads-per-cell HB (see _train_layout); db_ref holds this
    # cell's per-head-block partial, summed across head cells by the host
    BB = q_ref.shape[0]
    q = _load_heads(q_ref, n, L, d, native)
    k = _load_heads(k_ref, n, L, d, native)
    v = _load_heads(v_ref, n, L, d, native)
    g = _load_heads(g_ref, n, L, d, native)
    bias = bias_ref[...].reshape(BB, 1, 1, L)
    p = _probs(q, k, bias, scale, BB, n, L)
    if rate > 0.0:
        keep = _keep_mask(seed_ref[0], _cell_id(two_d), p.shape, rate,
                          interpret)
        pd = jnp.where(keep, p * (1.0 / (1.0 - rate)), 0.0)
    else:
        pd = p
    # dv = pdᵀ · g (contract over queries)
    dv = jax.lax.dot_general(
        pd.astype(g.dtype), g,
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [BB*n, L, d]
    # d(pd) = g · vᵀ
    dpd = jax.lax.dot_general(
        g, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)            # [BB*n, Lq, Lk]
    if rate > 0.0:
        dp = jnp.where(keep, dpd * (1.0 / (1.0 - rate)), 0.0)
    else:
        dp = dpd
    # softmax vjp: ds = p ⊙ (dp − Σ_k dp ⊙ p)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dsl = ds.astype(q.dtype)
    dq = jax.lax.dot_general(
        dsl, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    dk = jax.lax.dot_general(
        dsl, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale
    _store_heads(dq_ref, dq, BB, n, L, d, native)
    _store_heads(dk_ref, dk, BB, n, L, d, native)
    _store_heads(dv_ref, dv, BB, n, L, d, native)
    # bias broadcasts over heads and queries → sum both
    db = jnp.sum(ds.reshape(BB, n, L, L), axis=(1, 2))
    db_ref[...] = db.reshape(BB, 1, 1, L)


def _train_bb(B, n, L, d, rate, native, hb=0):
    """Shared fwd/bwd batch block.

    MUST be identical in both passes: the dropout keep-mask is regenerated
    in the backward from (seed + program_id, block shape), so a different
    grid/block geometry would silently decorrelate the masks and corrupt
    gradients. Size for the bwd's VMEM pressure (4-5 fp32 [L,L]-class
    tensors live at once: p, pd/dpd, dp, ds, +mask bits) and let the fwd
    run the same, slightly smaller-than-optimal BB.

    ``UC2_ATTN_TRAIN_BB`` overrides the VMEM-budget heuristic for tile
    sweeps (applied identically to both passes, so mask correlation is
    preserved; values that don't divide B are gcd-snapped like the
    default). Sweep end-to-end only — isolated kernel races do not
    predict in-graph wins (DESIGN.md round-3 notes).

    Every result — env-requested or heuristic — is clamped to
    tiles.max_train_bb's modeled scoped-VMEM cap before a compile ever
    sees it: round 4's BB=2 sweep arm at L=162/B=128 cost a 50-minute
    chip job to discover a 21.49M > 16M Mosaic OOM the model now
    predicts offline (VERDICT r4 weak #3).
    """
    import os
    hb = hb or n
    from uc2_tpu.ops.tiles import (max_train_bb, snap_bb, train_vmem_limit,
                                   VMEM_SCOPED_LIMIT)
    cap = max_train_bb(B, n, L, d, native=native, rate=rate, hb=hb)
    env = int(os.environ.get("UC2_ATTN_TRAIN_BB", "0"))
    if env > 0:
        bb = env
    elif train_vmem_limit() > VMEM_SCOPED_LIMIT:
        # raised limit (the shipped 64 MiB default since r5o): target the
        # chip-raced peak BB=4 — NOT "use the room": BB=8 fits at 100 MiB
        # and measured SLOWER (r5n, 6.35 vs 6.48 steps/s; the per-cell
        # serial chain outgrows the grid's ability to hide it). Small
        # shapes keep the legacy heuristic when it asked for more (its
        # large blocks there are long-proven), clamped by the model.
        legacy = (4 * 1024 * 1024) // (4 * hb * L * L * 4)
        bb = max(1, min(4, cap), legacy)
    else:
        bb = max(1, (4 * 1024 * 1024) // (4 * hb * L * L * 4))
    bb = snap_bb(bb, B)   # gcd default; UC2_BB_SNAP=div for A/Bs
    if cap and bb > cap:
        _warn_once(("bb", B, n, L, d, native, bb),
                   f"batch-block {bb} exceeds the modeled bwd VMEM budget "
                   f"at B={B} n={n} L={L} HB={hb}; clamped to {cap}")
        bb = cap
    return bb


def _train_specs(B, L, n, d, native, BB, HB):
    """Grid + block specs for the training kernels.

    HB == n: 1D grid (B//BB,) — bit-identical to the pre-head-split
    (chip-proven) geometry, including dropout cell ids.
    HB < n: 2D head-split grid (B//BB, n//HB). standard: operands are
    host-transposed [B, n, L, d]; block (BB, HB, L, d) at grid index
    (b, h) → block (b, h, 0, 0). native: operands are the encoder's
    untouched [B, L, n, d]; block (BB, L, HB, d) at (b, h) → (b, 0, h, 0)
    — the head-axis move happens in VMEM inside the kernel. Bias is
    per-batch-row only: block (BB, 1, 1, L) at (b, h) → (b, 0, 0, 0),
    revisited across head cells. db gets one partial per head cell.
    Index maps under PrefetchScalarGridSpec also receive the scalar refs
    (hence *_)."""
    nh = n // HB
    two_d = nh > 1
    if two_d:
        grid = (B // BB, nh)
        hidx = ((lambda b, h, *_: (b, 0, h, 0)) if native
                else (lambda b, h, *_: (b, h, 0, 0)))
        lo_idx = lambda b, h, *_: (b, 0, 0, 0)
        db_idx = lambda b, h, *_: (b, h, 0, 0)
    else:
        grid = (B // BB,)
        hidx = lo_idx = db_idx = lambda b, *_: (b, 0, 0, 0)
    hblk = (BB, L, HB, d) if native else (BB, HB, L, d)
    head_spec = pl.BlockSpec(hblk, hidx, memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((BB, 1, 1, L), lo_idx,
                             memory_space=pltpu.VMEM)
    db_spec = pl.BlockSpec((BB, 1, 1, L), db_idx,
                           memory_space=pltpu.VMEM)
    return grid, head_spec, bias_spec, db_spec, two_d


def _train_compiler_params():
    """Per-kernel Mosaic scoped-VMEM override for the training kernels.

    The shipped default is 64 MiB (tiles.TRAIN_VMEM_DEFAULT_MB, raced on
    chip r5m/r5n/r5o — it admits the BB=4 block that wins-or-ties at
    every token-budget bucket). Mosaic's own 16 MiB is compiler
    accounting, not hardware (v5e: 128 MiB VMEM/core), and is exactly
    what OOM'd the BB=2 and native-layout arms in round 4 (tiles.py
    calibration note); ``UC2_ATTN_TRAIN_VMEM_MB=16`` restores it, in
    which case Mosaic gets *no* compiler params (the pre-r5o program,
    bit-identical)."""
    from uc2_tpu.ops.tiles import train_vmem_limit, VMEM_SCOPED_LIMIT
    lim = train_vmem_limit()
    if lim <= VMEM_SCOPED_LIMIT:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=lim)


def _fwd_train(q, k, v, bias, seed, rate, interpret=False):
    B, L, n, d = q.shape
    native, BB, HB = _train_layout(B, n, L, d, rate)
    if native:
        # UC2_ATTN_TRAIN_LAYOUT=native race arm: blocks read the encoder's
        # [B, L, n, d] directly; the head-axis move happens in VMEM inside
        # the kernel (identical math/dropout streams — same grid, same
        # cell ids, same [BB*HB, L, L] mask shape)
        qt, kt, vt = q, k, v
    else:
        qt, kt, vt = (x.transpose(0, 2, 1, 3) for x in (q, k, v))
    grid, head_spec, bias_spec, _, two_d = _train_specs(
        B, L, n, d, native, BB, HB)
    kernel = functools.partial(_attn_train_fwd_kernel,
                               scale=1.0 / math.sqrt(d), n=HB, L=L, d=d,
                               rate=float(rate), interpret=interpret,
                               native=native, two_d=two_d)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[head_spec] * 3 + [bias_spec],
            out_specs=head_spec,
        ),
        out_shape=jax.ShapeDtypeStruct((B, L, n, d) if native
                                       else (B, n, L, d), q.dtype),
        interpret=interpret,
        compiler_params=_train_compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * n * L * L * d,
            bytes_accessed=(4 * B * L * n * d) * q.dtype.itemsize,
            transcendentals=B * n * L * L),
    )(jnp.asarray(seed, jnp.int32).reshape(1), qt, kt, vt, bias)
    return out if native else out.transpose(0, 2, 1, 3)


def _bwd_train(q, k, v, bias, seed, rate, g, interpret=False):
    B, L, n, d = q.shape
    native, BB, HB = _train_layout(B, n, L, d, rate)
    if native:
        qt, kt, vt, gt = q, k, v, g
        oshape = (B, L, n, d)
    else:
        qt, kt, vt, gt = (x.transpose(0, 2, 1, 3) for x in (q, k, v, g))
        oshape = (B, n, L, d)
    grid, head_spec, bias_spec, db_spec, two_d = _train_specs(
        B, L, n, d, native, BB, HB)
    kernel = functools.partial(_attn_train_bwd_kernel,
                               scale=1.0 / math.sqrt(d), n=HB, L=L, d=d,
                               rate=float(rate), interpret=interpret,
                               native=native, two_d=two_d)
    # each head cell writes its own db partial ([B, n//HB, 1, L]); the
    # cross-head reduction is one cheap XLA sum on the host side of the
    # custom call (db itself is tiny: B*L fp32)
    nh = n // HB
    dq, dk, dv, db = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[head_spec] * 3 + [bias_spec, head_spec],
            out_specs=(head_spec, head_spec, head_spec, db_spec),
        ),
        out_shape=(jax.ShapeDtypeStruct(oshape, q.dtype),
                   jax.ShapeDtypeStruct(oshape, k.dtype),
                   jax.ShapeDtypeStruct(oshape, v.dtype),
                   jax.ShapeDtypeStruct((B, nh, 1, L), jnp.float32)),
        interpret=interpret,
        compiler_params=_train_compiler_params(),
        cost_estimate=pl.CostEstimate(
            flops=11 * B * n * L * L * d,
            bytes_accessed=(8 * B * L * n * d) * q.dtype.itemsize,
            transcendentals=B * n * L * L),
    )(jnp.asarray(seed, jnp.int32).reshape(1), qt, kt, vt, bias, gt)
    if not native:
        dq, dk, dv = (x.transpose(0, 2, 1, 3) for x in (dq, dk, dv))
    db = db.sum(axis=1).reshape(B, 1, 1, L)
    return dq, dk, dv, db.astype(bias.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def flash_attention_train(q, k, v, bias, seed, rate=0.0, interpret=False):
    """Training attention: q,k,v [B, L, n, d], bias [B, 1, 1, L] additive,
    ``seed`` an int32 scalar (traced OK) deriving the per-cell dropout
    streams, ``rate`` the attention-probs dropout rate (static). Full
    Pallas fwd+bwd; the bwd regenerates the identical keep mask."""
    return _fwd_train(q, k, v, bias, seed, rate, interpret)


def _fat_fwd(q, k, v, bias, seed, rate, interpret):
    out = _fwd_train(q, k, v, bias, seed, rate, interpret)
    return out, (q, k, v, bias, seed)


def _fat_bwd(rate, interpret, res, g):
    import numpy as np
    q, k, v, bias, seed = res
    dq, dk, dv, db = _bwd_train(q, k, v, bias, seed, rate, g, interpret)
    dseed = np.zeros(jnp.shape(seed), dtype=jax.dtypes.float0)
    return dq, dk, dv, db, dseed


flash_attention_train.defvjp(_fat_fwd, _fat_bwd)


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
