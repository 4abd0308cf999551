"""Multi-host control-plane collectives.

Reference: utils/distributed.py:150-230 — `all_gather_list` / `any_broadcast`
serialize arbitrary Python objects into byte tensors with hand-rolled length
headers over Horovod. Their TPU-native remaining uses are thin: the task
schedule is already a pure function of the step (loader.py), and gradient
sync is GSPMD's job. What's left is metric aggregation and eval-id gathering
across hosts, built on jax.experimental.multihost_utils.

On a single-process setup these degenerate to identity — tests exercise that
path; multi-process behavior rides the documented jax collectives.
"""

from __future__ import annotations

import pickle
from typing import Any, List

import numpy as np


def maybe_initialize(coordinator_address: str = None,
                     num_processes: int = None,
                     process_id: int = None) -> bool:
    """`jax.distributed.initialize` when a coordinator is configured —
    the TPU-native replacement for hvd.init() (reference pretrain.py:384-388).
    Flags may also come from the standard JAX env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID); with
    neither flags nor env set, this is a no-op (single-process)."""
    import os
    import jax
    coordinator_address = (coordinator_address
                           or os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if coordinator_address is None:
        return False
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def process_count() -> int:
    import jax
    return jax.process_count()


def process_index() -> int:
    import jax
    return jax.process_index()


def all_gather_object(obj: Any, max_bytes: int = 1 << 20) -> List[Any]:
    """Gather a picklable object from every host (reference all_gather_list,
    utils/distributed.py:150-200: pickle → length-prefixed byte tensor →
    allgather)."""
    import jax
    if jax.process_count() == 1:
        return [obj]
    from jax.experimental import multihost_utils
    payload = pickle.dumps(obj)
    assert len(payload) + 8 <= max_bytes, "object too large; raise max_bytes"
    buf = np.zeros(max_bytes, np.uint8)
    buf[:8] = np.frombuffer(np.int64(len(payload)).tobytes(), np.uint8)
    buf[8:8 + len(payload)] = np.frombuffer(payload, np.uint8)
    gathered = multihost_utils.process_allgather(buf)
    out = []
    for row in np.asarray(gathered).reshape(jax.process_count(), max_bytes):
        n = int(np.frombuffer(row[:8].tobytes(), np.int64)[0])
        out.append(pickle.loads(row[8:8 + n].tobytes()))
    return out


def broadcast_object(obj: Any, root: int = 0, max_bytes: int = 1 << 20) -> Any:
    """Broadcast a picklable object from `root` (reference any_broadcast,
    utils/distributed.py:203-230)."""
    import jax
    if jax.process_count() == 1:
        return obj
    from jax.experimental import multihost_utils
    if jax.process_index() == root:
        payload = pickle.dumps(obj)
        buf = np.zeros(max_bytes, np.uint8)
        buf[:8] = np.frombuffer(np.int64(len(payload)).tobytes(), np.uint8)
        buf[8:8 + len(payload)] = np.frombuffer(payload, np.uint8)
    else:
        buf = np.zeros(max_bytes, np.uint8)
    row = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    n = int(np.frombuffer(row[:8].tobytes(), np.int64)[0])
    return pickle.loads(row[8:8 + n].tobytes())


def kv_broadcast_object(key: str, obj: Any = None, root: int = 0,
                        timeout_ms: int = 600_000) -> Any:
    """Broadcast a small picklable object from ``root`` via the
    jax.distributed coordination-service key-value store.

    Unlike broadcast_object (multihost_utils.broadcast_one_to_all, a DEVICE
    collective), this is a pure RPC to the coordinator: it dispatches no
    device program, so it is safe to call from a background/prefetch thread
    while the main thread runs mesh programs — device collectives stay
    identically ordered on every host no matter how the threads interleave.
    Used for the per-window bucket-choice sync (data/loader.py), which is
    what lets multi-host input prefetch overlap batch assembly with the
    device step. ``key`` must be unique per broadcast (e.g. include the
    step counter).
    """
    import base64
    import jax
    if jax.process_count() == 1:
        return obj
    from jax._src import distributed
    client = distributed.global_state.client
    assert client is not None, "jax.distributed not initialized"
    if jax.process_index() == root:
        client.key_value_set(key, base64.b64encode(
            pickle.dumps(obj)).decode("ascii"))
        return obj
    payload = client.blocking_key_value_get(key, timeout_ms)
    return pickle.loads(base64.b64decode(payload))


def kv_delete(key: str) -> None:
    """Delete a coordination-service key (idempotent; missing keys are
    fine). Producers of per-step keys must retire old ones — the store
    lives for the whole job, and one leaked entry per window is hundreds
    of thousands over a pretraining run (ADVICE r3)."""
    import jax
    if jax.process_count() == 1:
        return
    from jax._src import distributed
    client = distributed.global_state.client
    if client is None:
        return
    try:
        client.key_value_delete(key)
    except Exception:
        pass


def sum_across_hosts(value: float) -> float:
    """Scalar metric reduction (reference sums all_gather_list results,
    pretrain.py:707-709)."""
    return float(sum(all_gather_object(float(value))))
