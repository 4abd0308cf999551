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
        self._draws = 0          # per-epoch batch counter (RNG keying)
        self._iter_taken = 0     # draws taken from the CURRENT epoch's
                                 # iterator (state_dict replay cursor)
        self._pending: List[Tuple[int, List[int]]] = []

    def _effective_dims(self) -> Tuple[List[int], List[int]]:
        ds = self.dataset
        txt_lens = [t + 2 for t in ds.txt_lens]  # + CLS/SEP
        num_bbs = [l - t for l, t in zip(ds.lens, ds.txt_lens)]
        return txt_lens, num_bbs

    def _new_epoch(self):
        self._epoch += 1
        # zlib.crc32, NOT hash(): str hash is randomized per process, which
        # would make the stream irreproducible across runs and break
        # deterministic resume (MetaLoader.fast_forward)
        import zlib
        name_key = zlib.crc32(self.name.encode()) % (2 ** 31)
        rng = np.random.default_rng((self.seed, self._epoch, name_key))
        if hasattr(self.dataset, "new_epoch"):
            self.dataset.new_epoch(rng)
        txt_lens, num_bbs = self._effective_dims()
        batcher = BucketBatcher(txt_lens, num_bbs, self.buckets,
                                seed=self.seed + self._epoch,
                                shuffle=self.shuffle,
                                drop_last=self.drop_last)
        self._iter = batcher.epoch(self._epoch)
        self._iter_taken = 0

    def _draw(self) -> Tuple[int, List[int]]:
        if self._pending:
            return self._pending.pop(0)
        while True:
            if self._iter is None:
                self._new_epoch()
                self._draws = 0
            try:
                out = next(self._iter)
                self._iter_taken += 1
                return out
            except StopIteration:
                self._iter = None

    def _next_assignment(self, bucket: Optional[int] = None
                         ) -> Tuple[int, List[int]]:
        """Next (bucket_idx, indices), refreshing epochs as needed.

        ``bucket`` constrains the draw to one bucket (multi-host SPMD
        lockstep: every host must run the same compiled shape each step;
        host 0 broadcasts its bucket choice, the rest match it here).
        Off-bucket draws are deferred, not dropped.
        """
        if bucket is None:
            return self._draw()
        for k, (b, idx) in enumerate(self._pending):
            if b == bucket:
                return self._pending.pop(k)
        deferred = []
        epochs_seen = 0
        while True:
            was_fresh = self._iter is None
            if was_fresh:
                epochs_seen += 1
                assert epochs_seen < 64, (
                    f"bucket {bucket} never produced a full batch on this "
                    "host's data shard — bucket set and shard are "
                    "incompatible for lockstep training")
            b, idx = self._draw()
            if b == bucket:
                self._pending.extend(deferred)
                return b, idx
            deferred.append((b, idx))

    def next_batch(self, bucket: Optional[int] = None
                   ) -> Dict[str, np.ndarray]:
        bucket_idx, indices = self._next_assignment(bucket)
        return self._assemble(bucket_idx, indices)

    def skip_batch(self, bucket: Optional[int] = None) -> None:
        """Advance the stream exactly as next_batch would — same draws,
        same epoch rollovers, same ``_draws`` RNG bookkeeping — without
        collating the batch (deterministic resume fast-forward)."""
        self._next_assignment(bucket)
        self._draws += 1          # _assemble's counter, minus the work

    def skip_stacked(self, n: int, bucket: Optional[int] = None) -> None:
        """skip_batch's stacked twin: mirrors next_stacked's grouping and
        deferral logic so the post-skip stream state (pending queue, epoch,
        _draws) is identical to having consumed the batch."""
        first_b, first_idx = self._next_assignment(bucket)
        group = [(first_b, first_idx)]
        deferred = []
        epoch0 = self._epoch
        while len(group) < n:
            assert self._epoch - epoch0 < 64, (
                f"bucket {first_b} produced fewer than n={n} same-shape "
                "batches across 64 epochs (fast-forward)")
            b, idx = self._next_assignment()
            if b == first_b and (self.drop_last
                                 or len(idx) == len(first_idx)):
                group.append((b, idx))
            else:
                deferred.append((b, idx))
        self._pending = deferred + self._pending
        self._draws += len(group)

    def state_dict(self) -> Dict[str, Any]:
        """Serializable stream state: O(1)-restorable via
        :meth:`load_state_dict` (vs. :meth:`skip_batch` replay, which is
        O(consumed steps)). The per-epoch stream is a pure function of
        (seed, epoch, dataset) — see ``_new_epoch``'s crc32 keying — so
        the state is just the epoch number, a cursor into its batch
        iterator, the assembly-rng counter, and the deferred-draw queue."""
        return {
            "epoch": self._epoch,
            "draws": self._draws,
            "iter_taken": None if self._iter is None else self._iter_taken,
            "pending": [[int(b), [int(i) for i in idx]]
                        for b, idx in self._pending],
        }

    def load_state_dict(self, sd: Dict[str, Any]) -> None:
        """Restore exactly the stream state captured by state_dict:
        replays ``_new_epoch`` for the stored epoch (dataset.new_epoch is
        a pure function of its freshly-seeded rng, so dataset epoch state
        — e.g. ItmDataset's sampled negatives, which pending draws index
        into — is reproduced bit-exactly), then advances the epoch's
        batch iterator to the stored cursor."""
        self._pending = []
        self._iter = None
        epoch = int(sd["epoch"])
        if epoch >= 0:
            self._epoch = epoch - 1
            self._new_epoch()                      # replay epoch `epoch`
            if sd["iter_taken"] is None:
                self._iter = None                  # exhausted; dataset
                                                   # epoch state retained
            else:
                for _ in range(int(sd["iter_taken"])):
                    next(self._iter)               # deterministic cursor
                self._iter_taken = int(sd["iter_taken"])
        else:
            self._epoch = -1
            self._iter_taken = 0
        self._draws = int(sd["draws"])
        self._pending = [(int(b), [int(i) for i in idx])
                         for b, idx in sd["pending"]]

    def next_stacked(self, n: int, bucket: Optional[int] = None
                     ) -> Dict[str, np.ndarray]:
        """n same-bucket batches stacked along a new leading axis [n, B, ...]
        — feeds the in-XLA lax.scan gradient accumulation (training/step.py).
        Off-bucket draws are queued for later windows, so no example is
        dropped; all n micro-batches share one compiled shape."""
        first_b, first_idx = self._next_assignment(bucket)
        group = [(first_b, first_idx)]
        deferred = []
        epoch0 = self._epoch
        while len(group) < n:
            # same guard as _next_assignment: a rare (bucket, size) first
            # draw must fail loudly, not spin through epochs deferring
            # every other draw with unbounded _pending growth
            assert self._epoch - epoch0 < 64, (
                f"bucket {first_b} produced fewer than n={n} same-shape "
                f"batches across 64 epochs of this host's data shard — "
                "bucket set / accumulation window / shard are incompatible")
            b, idx = self._next_assignment()
            # batch sizes are fixed per bucket under drop_last, so bucket
            # equality alone matches; without drop_last a ragged tail
            # batch of the same bucket must still be deferred
            if b == first_b and (self.drop_last
                                 or len(idx) == len(first_idx)):
                group.append((b, idx))
            else:
                deferred.append((b, idx))
        self._pending = deferred + self._pending
        micro = [self._assemble(b, idx) for b, idx in group]
        out: Dict[str, np.ndarray] = {}
        for k in micro[0]:
            if k == "_bucket":
                out[k] = micro[0][k]
            elif k == "sample_size":
                out[k] = micro[0][k]
            else:
                out[k] = np.stack([m[k] for m in micro])
        return out

    def one_epoch(self) -> Iterator[Dict[str, np.ndarray]]:
        """Yield every batch of exactly one fresh epoch — the validation
        sweep (reference validates the whole val DB, pretrain.py:658-689)."""
        self._pending.clear()
        self._iter = None
        self._new_epoch()
        self._draws = 0
        while True:
            try:
                b, idx = next(self._iter)
            except StopIteration:
                self._iter = None
                return
            yield self._assemble(b, idx)

    def _assemble(self, bucket_idx: int,
                  indices: List[int]) -> Dict[str, np.ndarray]:
        self._draws += 1
        rng = np.random.default_rng(
            (self.seed, self._epoch, self._draws))
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
                 accum_steps: int = 1, seed: int = 0,
                 stack_microbatches: bool = False,
                 sync_buckets: bool = False):
        assert loaders
        self.loaders = loaders
        names = list(loaders.keys())
        r = [1.0 if ratios is None else ratios.get(n, 1.0) for n in names]
        self._pick = deterministic_task_schedule(names, r, seed)
        self.accum_steps = accum_steps
        # stacked mode: one __next__ per window, batch has a leading
        # [accum_steps] micro-batch axis for the in-step lax.scan
        self.stack = stack_microbatches and accum_steps > 1
        # multi-host: every host must jit the same (task, bucket) program
        # each step. The task is already a pure function of the window; the
        # bucket depends on host-local data, so host 0 draws first and
        # broadcasts its bucket choice (the control-plane collective that
        # replaces the reference's any_broadcast, data/loader.py:41-45)
        self.sync_buckets = sync_buckets
        self.step = 0
        # ring of recent stream states keyed by meta-step, maintained by
        # the consuming thread (possibly a PrefetchLoader worker) and read
        # by the main thread at checkpoint time: the snapshot keyed K is
        # the state from which the draw for meta-step K proceeds, so
        # restoring it resumes the stream exactly where an uninterrupted
        # run would be after K batch-steps — even though the prefetch
        # worker runs AHEAD of the optimizer step being checkpointed.
        self._snap_lock = threading.Lock()
        self._snapshots: Dict[int, Dict[str, Any]] = {}
        self._snap_keep = 128
        if sync_buckets:
            # run-unique KV namespace, agreed by a one-off broadcast at
            # construction (main thread, before any prefetch): without it a
            # RESUMED run's window counter restarts at 0 and collides with
            # the previous run's still-present `uc2/bucket/0` key
            import uuid
            from uc2_tpu.parallel import multihost as MH
            self.kv_ns = MH.broadcast_object(
                uuid.uuid4().hex[:12] if MH.process_index() == 0 else None)
        self._snapshot()

    def __iter__(self):
        return self

    # ------------------------------------------------------- stream state
    def state_dict(self) -> Dict[str, Any]:
        """Current stream state (only meaningful from the consuming
        thread; checkpoint code should use :meth:`snapshot_for`)."""
        return {"step": self.step,
                "loaders": {n: ld.state_dict()
                            for n, ld in self.loaders.items()}}

    def load_state_dict(self, sd: Dict[str, Any]) -> None:
        """O(1) exact resume — works single- AND multi-host (each host
        restores its own host-local state; under sync_buckets host 0's
        restored stream reproduces the same bucket broadcasts an
        uninterrupted run would have made). Supersedes
        :meth:`fast_forward` when a saved stream state exists."""
        for n, ld in self.loaders.items():
            ld.load_state_dict(sd["loaders"][n])
        self.step = int(sd["step"])
        with self._snap_lock:
            self._snapshots.clear()
        self._snapshot()

    def _snapshot(self) -> None:
        sd = self.state_dict()      # fresh lists — safe to retain
        with self._snap_lock:
            self._snapshots[self.step] = sd
            while len(self._snapshots) > self._snap_keep:
                del self._snapshots[min(self._snapshots)]

    def snapshot_for(self, meta_step: int) -> Optional[Dict[str, Any]]:
        """Stream state at the start of batch-step ``meta_step`` (= after
        ``meta_step / accum_steps`` optimizer steps), captured when the
        consuming thread passed that point. None if it hasn't yet, or if
        the ring (``_snap_keep`` entries) has already dropped it."""
        with self._snap_lock:
            return self._snapshots.get(meta_step)

    def _synced_batch(self, loader: TaskLoader,
                      step: int) -> Dict[str, np.ndarray]:
        # bucket sync rides the coordination-service KV store, NOT a device
        # collective — so this may run on a prefetch thread concurrently
        # with the main thread's mesh programs (device-collective order
        # stays identical on every host). Key is unique per window.
        from uc2_tpu.parallel import multihost as MH
        n = self.accum_steps if self.stack else None
        key = f"uc2/bucket/{self.kv_ns}/{step}"
        if MH.process_index() == 0:
            batch = (loader.next_stacked(n) if n else loader.next_batch())
            MH.kv_broadcast_object(key, int(batch["_bucket"]))
            # lazily retire old keys (root-side, per ADVICE r3): consumers
            # trail the producer by at most the prefetch depth, so a
            # 256-WRITE rolling window is far beyond any live reader.
            # Written keys are multiples of the step stride (accum_steps
            # when stacked), so the retired key must be offset by
            # 256*stride — a flat `step - 256` never aligns when the
            # stride doesn't divide 256 and would leak every key.
            stride = self.accum_steps if self.stack else 1
            if step >= 256 * stride:
                MH.kv_delete(f"uc2/bucket/{self.kv_ns}/{step - 256 * stride}")
            return batch
        b = MH.kv_broadcast_object(key)
        return (loader.next_stacked(n, bucket=b) if n
                else loader.next_batch(bucket=b))

    def __next__(self) -> Tuple[str, Dict[str, np.ndarray]]:
        window = self.step // self.accum_steps
        name = self._pick(window)
        loader = self.loaders[name]
        if self.sync_buckets:
            step = self.step
            self.step += self.accum_steps if self.stack else 1
            batch = self._synced_batch(loader, step)
        elif self.stack:
            self.step += self.accum_steps
            batch = loader.next_stacked(self.accum_steps)
        else:
            self.step += 1
            batch = loader.next_batch()
        self._snapshot()
        return name, batch

    def fast_forward(self, n_optimizer_steps: int) -> None:
        """Replay the stream to where an uninterrupted run would be after
        ``n_optimizer_steps`` optimizer steps, without assembling batches
        — deterministic resume (with pretrain.py's step-keyed rng, a
        restored run is bit-identical to one that never stopped). The
        reference cannot do this: its TrainingRestorer restarts the
        dataloader stream from scratch (utils/save.py:164-213 restores
        model/optimizer only). Single-process only: under sync_buckets
        the bucket sequence depends on host-0 draws, so multi-host resume
        keeps stream-restart semantics."""
        assert not self.sync_buckets, (
            "fast_forward is single-process only (multi-host bucket sync "
            "makes the stream depend on host-0 runtime draws)")
        target = n_optimizer_steps * self.accum_steps
        while self.step < target:
            name = self._pick(self.step // self.accum_steps)
            loader = self.loaders[name]
            if self.stack:
                self.step += self.accum_steps
                loader.skip_stacked(self.accum_steps)
            else:
                self.step += 1
                loader.skip_batch()
        self._snapshot()


class PrefetchLoader:
    """Wraps an iterator, running it in a worker thread with a small queue
    and (optionally) placing arrays on device ahead of use."""

    def __init__(self, it: Iterator, depth: int = 2,
                 device_put: Optional[Callable[[Any], Any]] = None):
        self.it = it
        self.q: "queue.Queue" = queue.Queue(maxsize=depth)
        self.device_put = device_put
        self._done = object()
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._worker, daemon=True)
        self.thread.start()

    def _put(self, item) -> bool:
        # bounded put that yields to close(): a plain q.put would leave the
        # worker blocked forever (holding device-placed batches alive) once
        # the consumer stops reading
        while not self._stop.is_set():
            try:
                self.q.put(item, timeout=0.2)
                return True
            except queue.Full:
                pass
        return False

    def _worker(self):
        try:
            for item in self.it:
                if self._stop.is_set():
                    break
                if self.device_put is not None:
                    item = self.device_put(item)
                if not self._put(item):
                    break
        except Exception as e:  # surface worker errors to the consumer
            self._put(e)
        self._put(self._done)

    def close(self):
        """Stop the worker thread and release any buffered batches.

        Drivers call this when the train loop exits (the underlying
        iterator is usually infinite, so the worker never finishes on its
        own — without close() every finished run leaks a live thread plus
        depth+1 assembled, possibly device-resident batches)."""
        self._stop.set()
        while self.thread.is_alive():
            try:  # unblock a worker stuck in q.put
                self.q.get_nowait()
            except queue.Empty:
                pass
            self.thread.join(timeout=0.05)
        while True:  # drop whatever stayed buffered
            try:
                self.q.get_nowait()
            except queue.Empty:
                break

    def __iter__(self):
        return self

    def __next__(self):
        item = self.q.get()
        if item is self._done:
            raise StopIteration
        if isinstance(item, Exception):
            raise item
        return item
