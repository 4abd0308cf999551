"""Headline benchmark: image-text pairs/sec/chip for ITM scoring.

The reference's retrieval eval scores every (text, image) pair through the
full 12-layer encoder + rank head (itm.py:516-538) on V100 fp16; this is
BASELINE.json's north-star metric. Here: uc2-base in bf16, jitted scoring
over a single chip.

What is measured — the production eval envelope, not one worst-case shape.
Both systems adapt work to the per-image region count: the reference sorts
images by nbb and pads each minibatch to its local max (data/itm.py:905,
itm.py:516-538); our eval routes images into static nbb buckets
(evalu/retrieval.py:default_nbb_buckets — edges at 128·k − Lt so the common
bucket rides the TPU's 128-lane tile). So the benchmark measures the three
production bucket shapes and reports the envelope-weighted throughput over
the reference's region-count range nbb ∈ [10, 100] (conf_th 0.2 defaults,
pretrain.py:1164-1168), assuming nbb uniform over that range:

  bucket Nb=36  (joint L=98):  images with 10-36 regions → weight 27/91
  bucket Nb=66  (joint L=128): images with 37-66         → weight 30/91
  bucket Nb=100 (joint L=162): images with 67-100        → weight 34/91

The flat worst-case single-shape number (every image padded to Nb=100) is
also reported as ``value_worst_case``.

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

# uniform nbb over the reference envelope [10, 100]; buckets match
# evalu/retrieval.py default_nbb_buckets(62, 100) = edges (36, 66, 100)
BUCKETS = [(36, (36 - 10 + 1) / 91.0),
           (66, (66 - 36) / 91.0),
           (100, (100 - 66) / 91.0)]


def _measure(model, params, B, Lt, Nb, n_iters=20):
    """Chained-scan scoring throughput (pairs/s) at one bucket shape.

    Timing note: through this image's axon tunnel block_until_ready()
    returns before device execution finishes; n_iters passes are chained
    inside ONE jitted scan (inputs perturbed per iteration so nothing
    hoists) and synced via a device→host scalar. Calibration on this chip
    (8192³ matmul) shows ~125 TF/s sustained bf16, consistent with these
    numbers.
    """
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    ids = rng.integers(4, 250002, (B, Lt)).astype(np.int32)
    ids[:, 0] = 0
    batch = {
        "input_ids": jnp.asarray(ids),
        "img_feat": jnp.asarray(
            rng.standard_normal((B, Nb, 2048)).astype(np.float32)),
        "img_pos_feat": jnp.asarray(rng.random((B, Nb, 7))
                                    .astype(np.float32)),
        "attn_mask": jnp.ones((B, Lt + Nb), jnp.int32),
    }

    @jax.jit
    def chain(params, batch):
        def body(c, _):
            b = dict(batch)
            b["img_feat"] = batch["img_feat"] + c * 1e-30
            s = model.scores(params, b, deterministic=True)
            return jnp.mean(s), None
        last, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n_iters)
        return last

    float(chain(params, batch))           # compile + warm
    t0 = time.perf_counter()
    float(chain(params, batch))
    dt = time.perf_counter() - t0
    return B * n_iters / dt


def main():
    import jax
    from uc2_tpu.config import UC2Config
    from uc2_tpu.models.finetune import UC2ForImageTextRetrieval

    cfg = UC2Config(dtype="bfloat16")
    model = UC2ForImageTextRetrieval(cfg)
    params = model.init_params(jax.random.PRNGKey(0))

    rates = {nb: _measure(model, params, B=64, Lt=62, Nb=nb)
             for nb, _ in BUCKETS}
    # envelope-weighted harmonic mean: time for a mixed gallery
    value = 1.0 / sum(w / rates[nb] for nb, w in BUCKETS)

    print(json.dumps({
        "metric": "itm_scoring_pairs_per_sec_per_chip",
        "value": round(value, 1),
        "unit": "pairs/s",
        "vs_baseline": round(value / V100_BASELINE_PAIRS_PER_SEC, 2),
        "value_worst_case": round(rates[100], 1),
        "bucket_rates": {str(nb): round(rates[nb], 1) for nb, _ in BUCKETS},
    }))


if __name__ == "__main__":
    main()
