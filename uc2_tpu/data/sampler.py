"""Bucketed batch sampling — the static-shape replacement for the
reference's TokenBucketSampler (data/sampler.py:11-59).

The reference fills variable-size batches up to a token budget (padding
included) and shuffles; every batch has a fresh max-length → a fresh shape.
Here each example is routed to the smallest BucketSpec that fits its
(txt_len, num_bb); each bucket has a *fixed* batch size chosen for a roughly
equal token budget. Result: same token-throughput economics, ≤ n_buckets
compiled programs.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence, Tuple

import numpy as np

from uc2_tpu.data.collate import BucketSpec, pick_bucket


class BucketBatcher:
    """Yields (bucket_index, example_indices) batches.

    txt_lens/num_bbs: per-example dims used for routing. Incomplete trailing
    batches are padded by repeating examples (weight-0 padding is handled by
    the collator via attn_mask; repeated examples slightly oversample — the
    reference's droplast=True for training drops them instead, controlled
    here by ``drop_last``).
    """

    def __init__(self, txt_lens: Sequence[int], num_bbs: Sequence[int],
                 buckets: Sequence[BucketSpec], seed: int = 0,
                 shuffle: bool = True, drop_last: bool = True):
        self.txt_lens = list(txt_lens)
        self.num_bbs = list(num_bbs)
        self.buckets = list(buckets)
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.routing = [pick_bucket(self.buckets, t, n)
                        for t, n in zip(self.txt_lens, self.num_bbs)]
        self.n_skipped = sum(r is None for r in self.routing)
        if self.n_skipped:
            skipped = [(t, n) for t, n, r in
                       zip(self.txt_lens, self.num_bbs, self.routing)
                       if r is None]
            max_t = max(t for t, _ in skipped)
            max_n = max(n for _, n in skipped)
            import logging
            logging.getLogger("uc2_tpu").warning(
                "BucketBatcher: %d/%d examples fit no bucket and will be "
                "skipped every epoch (max txt_len=%d, max num_bb=%d; "
                "largest bucket=%s) — widen the bucket set to keep them",
                self.n_skipped, len(self.routing), max_t, max_n,
                max(self.buckets, key=lambda b: (b.txt_len, b.num_bb)))

    def epoch(self, epoch: int) -> Iterator[Tuple[int, List[int]]]:
        rng = np.random.default_rng((self.seed, epoch))
        per_bucket: List[List[int]] = [[] for _ in self.buckets]
        order = np.arange(len(self.txt_lens))
        if self.shuffle:
            rng.shuffle(order)
        batches = []
        for i in order:
            b = self.routing[i]
            if b is None:
                continue
            per_bucket[b].append(int(i))
            if len(per_bucket[b]) == self.buckets[b].batch_size:
                batches.append((b, per_bucket[b]))
                per_bucket[b] = []
        for b, rest in enumerate(per_bucket):
            if rest and not self.drop_last:
                batches.append((b, rest))
        if self.shuffle:
            rng.shuffle(batches)
        return iter(batches)

    def batches_per_epoch(self) -> int:
        counts = [0] * len(self.buckets)
        for r in self.routing:
            if r is not None:
                counts[r] += 1
        total = sum(c // s.batch_size for c, s in zip(counts, self.buckets))
        if not self.drop_last:
            total += sum(1 for c, s in zip(counts, self.buckets)
                         if c % s.batch_size)
        return total
