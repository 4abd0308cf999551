"""Tiny chip liveness probe for batch scripts.

The axon tunnel has a failure mode where a client attaches but the first
RPC never completes (observed 2026-08-19: the ve demo drive logged its
platform warning and then nothing for its whole 1800 s budget, right
after a crashing client's teardown). Batch scripts run this probe under
a short timeout in a retry loop BEFORE each real job, so a wedged-lease
window costs probe attempts instead of a real job's compile budget.

Exit 0 = a trivial computation round-tripped the device.
"""
import sys

import jax
import jax.numpy as jnp


def main() -> int:
    x = jnp.arange(8)
    y = int(jnp.sum(x * 2))
    assert y == 56, y
    print(f"probe ok: {jax.devices()[0].platform}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
