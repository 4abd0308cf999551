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
