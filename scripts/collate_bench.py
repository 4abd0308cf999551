#!/usr/bin/env python
"""Host batch-assembly throughput (the input-pipeline analog of the
reference's DataLoader workers, pretrain.py:90).

Measures collate_batch ex/s at realistic shapes: uc2-base field sizes,
nbb ~ U[10, 100], Lt ~ U[10, 62], with and without MRFR's 2048-d slot
targets, fp16 vs fp32 feature slabs. The fp16 path is the production
default (DetectFeatDb.keep_fp16): features stored fp16 on disk stay fp16
through collate and H2D, halving the dominant memcpy.

  python scripts/collate_bench.py [--batch 64] [--seconds 3]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uc2_tpu.data.collate import BucketSpec, collate_batch


def make_examples(rng, n, fp16, with_feat_targets):
    out = []
    dt = np.float16 if fp16 else np.float32
    for _ in range(n):
        L = int(rng.integers(10, 62))
        nbb = int(rng.integers(10, 100))
        tl = np.full(L, -1, np.int64)
        tl[rng.integers(0, L, 8)] = 5
        e = {"input_ids": rng.integers(2, 250000, L),
             "txt_labels": tl,
             "img_feat": rng.standard_normal((nbb, 2048)).astype(dt),
             "img_pos_feat": rng.random((nbb, 7)).astype(np.float32)}
        if with_feat_targets:
            e["img_masks"] = rng.random(nbb) < 0.15
            e["feat_targets"] = rng.standard_normal(
                (nbb, 2048)).astype(dt)
        out.append(e)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--seconds", type=float, default=3.0)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    spec = BucketSpec(64, 100, args.batch, 64)
    for fp16 in (False, True):
        for with_ft in (False, True):
            exs = make_examples(rng, args.batch, fp16, with_ft)
            keys = ("feat_targets",) if with_ft else ()
            collate_batch(exs, spec, slot_target_keys=keys)   # warm
            t0 = time.perf_counter()
            n = 0
            while time.perf_counter() - t0 < args.seconds:
                collate_batch(exs, spec, slot_target_keys=keys)
                n += args.batch
            rate = n / (time.perf_counter() - t0)
            print(f"RESULT collate fp16={int(fp16)} "
                  f"mrfr_targets={int(with_ft)}: {rate:.0f} ex/s",
                  flush=True)


if __name__ == "__main__":
    main()
