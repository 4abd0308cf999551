"""Batch-block tile snapping shared by the Pallas block kernels.

A kernel's batch-block (BB) starts from a VMEM-budget heuristic and must
then divide the actual batch B (`grid=(B // BB,)`). Two snap modes:

  * ``gcd`` (shipping default): ``math.gcd(bb, B)``. Degenerates to 1
    whenever the heuristic lands coprime with B — which it does at every
    production eval bucket (bb=3/5/9 vs B=64 → BB=1), serializing the
    grid into B cells with no batch-level reuse of the VMEM-resident
    weights.
  * ``div``: largest divisor of B that is ≤ bb — the largest legal block
    under the same VMEM budget (bb=3→2, 5→4, 9→8 at B=64).

``UC2_BB_SNAP=div`` flips the mode for on-chip A/Bs (trace-time env,
like the other tile knobs); the default stays ``gcd`` until a measured
end-to-end win per the ship-only-confirmed-wins rule (DESIGN.md round-3
measurement notes).
"""

from __future__ import annotations

import math
import os


def snap_bb(bb: int, B: int) -> int:
    """Snap the VMEM-budget block ``bb`` to a divisor of ``B`` (≥1)."""
    if os.environ.get("UC2_BB_SNAP") == "div":
        bb = max(1, min(bb, B))
        while B % bb:
            bb -= 1
        return bb
    # shipping default, bit-identical to the raced behavior (including
    # the bb > B corner, where gcd may pick a smaller block than fits)
    return max(1, math.gcd(bb, B))


# ------------------------------------------------ bwd VMEM footprint model
# Mosaic's scoped-VMEM limit is 16 MiB per kernel invocation. Round 4
# discovered it the expensive way: two 50-minute chip jobs died at compile
# time on the layer-11 attention BACKWARD (the binding pass — it keeps more
# [L, L]-class fp32 intermediates live than the forward). This model
# predicts that footprint so batch-blocks are clamped BEFORE a chip compile
# ever sees them (VERDICT r4 weak #3).

VMEM_SCOPED_LIMIT = 16 * 1024 * 1024
# headroom under the hard limit; the known-good production config
# (standard layout, BB=1, L=162, rate>0) models at 13.9M
VMEM_TRAIN_BUDGET = int(15.5 * 1024 * 1024)


# Shipped default for the TRAINING attention kernels' scoped-VMEM limit
# (MiB). 64 was raced on chip 2026-08-20 (r5m/r5n/r5o): it admits the
# BB=4 batch block that wins-or-ties at every token-budget bucket
# (L=98 +0.5%, L=128 wash, L=162 +1.6% over the 16 MiB geometry);
# 100 MiB admits BB=8, which measured SLOWER (6.35 vs 6.48 steps/s).
TRAIN_VMEM_DEFAULT_MB = 64


def train_vmem_limit() -> int:
    """Scoped-VMEM limit (bytes) for the TRAINING attention kernels.

    Mosaic's 16 MiB default is a compiler accounting cap, not hardware —
    v5e has 128 MiB of VMEM per core. The shipped default is
    ``TRAIN_VMEM_DEFAULT_MB`` (64, chip-raced); ``UC2_ATTN_TRAIN_VMEM_MB``
    overrides it per-process (``16`` restores the legacy Mosaic default
    bit-exactly: flash_attention then hands Mosaic *no* compiler params).
    flash_attention passes raised limits to Mosaic via
    ``pltpu.CompilerParams(vmem_limit_bytes=...)``, which is what makes
    batch-blocks > 1 compilable at the production bucket (BB=2 OOM'd the
    16 MiB default in round 4: 21.49M observed). Clamped to [16, 100]
    MiB — above ~100 MiB the pipeline's double-buffered operand blocks
    no longer fit beside the scratch. Trace-time env, like the other
    tile knobs."""
    mb = int(os.environ.get("UC2_ATTN_TRAIN_VMEM_MB", "0") or 0)
    if mb <= 0:
        mb = TRAIN_VMEM_DEFAULT_MB
    return min(max(mb, 16), 100) * 1024 * 1024


def train_vmem_budget() -> int:
    """Gate budget under the (possibly raised) limit. The footprint model
    over-predicts ~10% vs Mosaic's own accounting (calibration note on
    attn_train_bwd_vmem_bytes), so ~97% of the limit keeps the same
    safety margin the 15.5M/16M default ships with."""
    lim = train_vmem_limit()
    if lim == VMEM_SCOPED_LIMIT:
        return VMEM_TRAIN_BUDGET
    return int(lim * 15.5 / 16)


def _pad(x: int, m: int) -> int:
    return -(-x // m) * m


def attn_train_bwd_vmem_bytes(bb: int, n: int, L: int, d: int,
                              native: bool = False,
                              rate: float = 0.0, hb: int = 0) -> int:
    """Modeled scoped-VMEM bytes of the training-attention backward kernel
    (flash_attention.py::_attn_train_bwd_kernel) at batch-block ``bb`` and
    head-block ``hb`` (heads per grid cell; 0 = all ``n`` heads, the
    pre-round-5 geometry).

    Empirical, calibrated to Mosaic's own accounting on v5e (observed
    2026-08-19, uc2-base L=162 n=12 d=64, B=128, rate=0.1, hb=n):

      standard BB=1 → compiles (modeled 13.9M vs 16M limit)
      standard BB=2 → OOM at 21.49M observed (modeled 23.7M — the model
                      over-predicts ~10%, i.e. errs on the safe side)
      native   BB=1 → OOM at 24.10M observed (modeled 24.4M)

    Terms: each fp32 [L, L] slice pads to Mosaic's (8, 128) tiling; the
    bwd keeps ~4 such tensors per (batch-row, head) live at once (p,
    pd/dpd, dp, ds) plus the regenerated uint32 mask bits when rate > 0 —
    all scaling with bb*hb, which is why splitting the grid over heads
    shrinks the footprint with zero recompute; the native layout adds
    in-VMEM head-axis relayouts of 7 bf16 [L, hb, d] operands (q/k/v/g
    loads + dq/dk/dv stores), which Mosaic accounts far above their raw
    bytes — calibrated from the 24.10M observation. ~4M fixed covers
    double-buffered operand blocks and kernel scratch.
    """
    hb = hb or n
    P = _pad(L, 8) * _pad(L, 128) * 4
    n_ll = 5 if rate > 0.0 else 4
    body = n_ll * bb * hb * P
    if native:
        body += int(10.5e6 * bb * (hb * L * d) / (12 * 162 * 64))
    return body + int(4e6)


def max_train_bb(B: int, n: int, L: int, d: int, native: bool = False,
                 rate: float = 0.0, hb: int = 0) -> int:
    """Largest divisor of ``B`` whose modeled bwd footprint fits the
    scoped-VMEM budget at head-block ``hb`` (0 = all heads); 0 when even
    BB=1 does not fit (the caller must change strategy — e.g. shrink the
    head block or fall back from the native layout)."""
    best = 0
    for cand in range(1, B + 1):
        if B % cand:
            continue
        if attn_train_bwd_vmem_bytes(cand, n, L, d, native,
                                     rate, hb) <= train_vmem_budget():
            best = cand
    return best


def max_train_hb(bb: int, n: int, L: int, d: int, native: bool = False,
                 rate: float = 0.0) -> int:
    """Largest divisor of ``n`` (heads per grid cell) whose modeled bwd
    footprint fits the scoped-VMEM budget at batch-block ``bb``; 0 when
    even one head per cell does not fit. hb == n means the single-level
    batch-only grid (the pre-round-5 geometry) is already safe.

    native layout adds a Mosaic legality constraint on top of the VMEM
    model: the head axis is the block's second-to-last dim ([BB, L, HB,
    d]), and the Pallas TPU lowering requires that dim to be divisible
    by 8 or equal to the full axis (n). Standard layout blocks are
    [BB, HB, L, d] — the head axis is a leading dim, any divisor is
    legal. The r5b chip race hit exactly this: native@HB=6 compiled the
    VMEM model happily and then failed Mosaic's block-spec check
    (output/tab_r5b_native.log)."""
    for cand in range(n, 0, -1):
        if n % cand:
            continue
        if native and cand != n and cand % 8:
            continue
        if attn_train_bwd_vmem_bytes(bb, n, L, d, native,
                                     rate, cand) <= train_vmem_budget():
            return cand
    return 0
