"""Task-mixing meta loader + device prefetch.

Reference equivalents:
  * MetaLoader (data/loader.py:13-55): samples a task per accumulation
    window, synchronized across workers with an ``any_broadcast`` collective
    every window. TPU-native: the schedule is a *pure function* of
    (seed, window index) → every host computes the same task with zero
    communication.
  * PrefetchLoader (data/loader.py:85-140): CUDA side-stream H2D copy.
    TPU-native: a background thread assembles numpy batches and
    ``jax.device_put``s them ahead of consumption (double buffering); under
    pjit the arrays are placed per the batch sharding.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from uc2_tpu.data.collate import BucketSpec
from uc2_tpu.data.sampler import BucketBatcher


class TaskLoader:
    """One task's infinite batch stream: dataset + batcher + collate."""

    def __init__(self, name: str, dataset, buckets: Sequence[BucketSpec],
                 seed: int = 0, drop_last: bool = True, shuffle: bool = True):
        self.name = name
        self.dataset = dataset
        # size the masked-slot arrays for THIS task's mask span (txt / img /
        # joint / none) — oversized M multiplies the [B·M, vocab] LM-head
        # logits cost for nothing
        if hasattr(dataset, "slot_budget"):
            buckets = [BucketSpec(b.txt_len, b.num_bb, b.batch_size,
                                  dataset.slot_budget(b.txt_len, b.num_bb))
                       for b in buckets]
        self.buckets = list(buckets)
        self.seed = seed
        self.drop_last = drop_last
        self.shuffle = shuffle
        self._epoch = -1
        self._iter = None

    def _effective_dims(self) -> Tuple[List[int], List[int]]:
        ds = self.dataset
        txt_lens = [t + 2 for t in ds.txt_lens]  # + CLS/SEP
        num_bbs = [l - t for l, t in zip(ds.lens, ds.txt_lens)]
        return txt_lens, num_bbs

    def _new_epoch(self):
        self._epoch += 1
        rng = np.random.default_rng((self.seed, self._epoch, hash(self.name)
                                     % (2 ** 31)))
        if hasattr(self.dataset, "new_epoch"):
            self.dataset.new_epoch(rng)
        txt_lens, num_bbs = self._effective_dims()
        batcher = BucketBatcher(txt_lens, num_bbs, self.buckets,
                                seed=self.seed + self._epoch,
                                shuffle=self.shuffle,
                                drop_last=self.drop_last)
        self._iter = batcher.epoch(self._epoch)

    def next_batch(self) -> Dict[str, np.ndarray]:
        while True:
            if self._iter is None:
                self._new_epoch()
            try:
                bucket_idx, indices = next(self._iter)
                break
            except StopIteration:
                self._iter = None
        rng = np.random.default_rng(
            (self.seed, self._epoch, indices[0], len(indices)))
        if hasattr(self.dataset, "prefetch"):
            self.dataset.prefetch(indices)
        examples = []
        for i in indices:
            ex = self.dataset.get_example(i, rng)
            if isinstance(ex, list):  # grouped datasets (ItmRank)
                examples.extend(ex)
            else:
                examples.append(ex)
        spec = self.buckets[bucket_idx]
        if len(examples) > spec.batch_size:
            # grouped datasets multiply examples; recompute an effective spec
            spec = BucketSpec(spec.txt_len, spec.num_bb, len(examples),
                              spec.max_masked)
        batch = self.dataset.collate(examples, spec)
        batch["_bucket"] = bucket_idx
        if hasattr(self.dataset, "sample_size"):
            batch["sample_size"] = self.dataset.sample_size
        return batch


def deterministic_task_schedule(names: Sequence[str],
                                ratios: Sequence[float], seed: int
                                ) -> Callable[[int], str]:
    """window index → task name; identical on every host (replaces the
    reference's per-window any_broadcast, data/loader.py:41-45)."""
    p = np.asarray(ratios, np.float64)
    p = p / p.sum()
    names = list(names)

    def pick(window: int) -> str:
        rng = np.random.default_rng((seed, window))
        return names[int(rng.choice(len(names), p=p))]

    return pick


class MetaLoader:
    """Infinite (task_name, batch) stream with mix-ratio task sampling.

    ``accum_steps`` consecutive batches come from the same task (gradient
    accumulation trains one task per optimizer step, reference
    data/loader.py:31-49).
    """

    def __init__(self, loaders: Dict[str, TaskLoader],
                 ratios: Optional[Dict[str, float]] = None,
                 accum_steps: int = 1, seed: int = 0):
        assert loaders
        self.loaders = loaders
        names = list(loaders.keys())
        r = [1.0 if ratios is None else ratios.get(n, 1.0) for n in names]
        self._pick = deterministic_task_schedule(names, r, seed)
        self.accum_steps = accum_steps
        self.step = 0

    def __iter__(self):
        return self

    def __next__(self) -> Tuple[str, Dict[str, np.ndarray]]:
        window = self.step // self.accum_steps
        name = self._pick(window)
        self.step += 1
        return name, self.loaders[name].next_batch()


class PrefetchLoader:
    """Wraps an iterator, running it in a worker thread with a small queue
    and (optionally) placing arrays on device ahead of use."""

    def __init__(self, it: Iterator, depth: int = 2,
                 device_put: Optional[Callable[[Any], Any]] = None):
        self.it = it
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self.device_put = device_put
        self._done = object()
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _worker(self):
        try:
            for item in self.it:
                if self.device_put is not None:
                    item = self.device_put(item)
                self.q.put(item)
        except Exception as e:  # surface worker errors to the consumer
            self.q.put(e)
        self.q.put(self._done)

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is self._done:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item
