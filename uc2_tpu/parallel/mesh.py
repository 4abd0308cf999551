"""Device mesh + sharding rules (the TPU replacement for Horovod DP).

Reference distributed layer (utils/distributed.py): hand-rolled flattened
all-reduce of gradients over NCCL (:15-42), chunked parameter broadcast
(:99-147), pickled object collectives (:150-230). On TPU the entire layer
collapses into GSPMD: place params/batches with NamedShardings over a
Mesh('data','model') and jit — XLA inserts the psum for data-parallel
gradients (fused into the backward), all-gathers for tensor-parallel
matmuls, and schedules them on ICI. No communication code to write or
maintain.

The reference is pure DP (SURVEY.md §2.5). We additionally provide
Megatron-style tensor parallelism over the 'model' axis (QKV/FFN column →
row sharding, vocab-sharded embedding/LM-head) because v4+ pods make
model-axis sharding nearly free for a 768-hidden encoder — it keeps per-chip
matmuls MXU-shaped at global batch sizes DP alone couldn't reach.
"""

from __future__ import annotations

import re
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data: Optional[int] = None, n_model: int = 1,
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, (n_data, n_model, n)
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# Param-path regex → PartitionSpec. Paths are '/'-joined tree keys.
_RULES = [
    # attention: fused qkv column-parallel, output row-parallel
    (r"attention/qkv/kernel$", P(None, "model")),
    (r"attention/qkv/bias$", P("model")),
    (r"attention_output_dense/kernel$", P("model", None)),
    # FFN: up column-parallel, down row-parallel
    (r"intermediate_dense/kernel$", P(None, "model")),
    (r"intermediate_dense/bias$", P("model")),
    (r"output_dense/kernel$", P("model", None)),
    # embeddings / LM head: vocab-sharded (the 250k-row table dominates
    # parameter memory; logits stay sharded over vocab until the loss)
    (r"embeddings/word_embeddings$", P("model", None)),
    (r"^cls/bias$", P("model")),
    # default: replicated
]


def param_pspec(path: str) -> P:
    for pat, spec in _RULES:
        if re.search(pat, path):
            return spec
    return P()


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def param_shardings(mesh: Mesh, params) -> Any:
    """NamedSharding tree for a param tree (rules above)."""
    def f(path, _):
        return NamedSharding(mesh, param_pspec(_path_str(path)))
    return jax.tree_util.tree_map_with_path(f, params)


def batch_shardings(mesh: Mesh, batch, stacked: bool = False,
                    ragged: str = "raise") -> Any:
    """Batch arrays shard over 'data' on the batch axis; scalars replicate.

    Arrays whose batch dim the data axis doesn't divide (e.g. ragged
    trailing eval batches) replicate in single-process mode — one host,
    so every device sees the same values. In MULTI-process mode each
    host's batch contents differ, and a 'replicated' array assembled from
    per-host data would silently hold inconsistent values across hosts —
    params would then diverge host-by-host with no error. So multi-process
    ragged batch leaves **raise** unless the caller asserts the data is
    provably identical on every host (``ragged="replicate"`` — lockstep
    validation only).

    ``ragged="replicate_all"`` replicates EVERY leaf (divisible ones too):
    for host-identical final prediction sweeps under multi-process, where
    data-sharding divisible leaves would concatenate the hosts' identical
    copies into a duplicated-content global batch (and make the outputs
    span non-addressable devices).

    ``stacked``: the batch carries a leading [accum] micro-batch axis
    (lax.scan gradient accumulation) — the data axis is then axis 1.
    """
    n_data = mesh.shape["data"]
    # multi-process: each host holds only its local slice of the batch, so
    # divisibility is judged against the host-local share of the data axis
    n_local = max(1, n_data // jax.process_count())
    axis = 1 if stacked else 0
    multi = jax.process_count() > 1
    def f(x):
        if hasattr(x, "ndim") and getattr(x, "ndim", 0) >= axis + 1:
            if ragged == "replicate_all":
                return NamedSharding(mesh, P())
            if x.shape[axis] % n_local == 0:
                return NamedSharding(mesh, P(*([None] * axis), "data"))
            if multi and ragged != "replicate":
                raise ValueError(
                    f"multi-process batch leaf with batch axis {axis} of "
                    f"size {x.shape[axis]} not divisible by the host-local "
                    f"data share {n_local}: replicating per-host-distinct "
                    f"data would silently diverge across hosts. Pad the "
                    f"batch, drop the ragged tail, or pass "
                    f"ragged='replicate' if every host provably holds "
                    f"identical values (lockstep validation only).")
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map(f, batch)


def shard_params(mesh: Mesh, params):
    """Place a param tree onto the mesh. Every host holds the full fp32
    copy (same seed / same checkpoint → identical, replacing the reference's
    start-of-training broadcast, pretrain.py:457); in multi-process mode
    each host serves only its addressable shards via callback."""
    shardings = param_shardings(mesh, params)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), params, shardings)

    def put(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s,
                                            lambda idx: x[idx])
    return jax.tree_util.tree_map(put, params, shardings)


def shard_batch(mesh: Mesh, batch, stacked: bool = False,
                ragged: str = "raise"):
    """Place a host-local numpy batch onto the mesh.

    Single-process: plain device_put per sharding. Multi-process: each host
    contributes its local slice of the global batch (the per-host data
    shard, reference data/data.py:201-203) via
    ``jax.make_array_from_process_local_data`` — the global batch is the
    concatenation of every host's arrays along the data axis. ``ragged``:
    see batch_shardings — non-divisible batch leaves raise in multi-process
    mode unless the caller passes "replicate".
    """
    shardings = batch_shardings(mesh, batch, stacked=stacked, ragged=ragged)
    if jax.process_count() == 1:
        return jax.tree_util.tree_map(
            lambda x, s: jax.device_put(x, s), batch, shardings)

    def put(x, s):
        return jax.make_array_from_process_local_data(s, np.asarray(x))
    return jax.tree_util.tree_map(put, batch, shardings)


def replicate(mesh: Mesh, tree):
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def opt_shardings(mesh: Mesh, opt_state) -> Any:
    """ZeRO-1-style sharding for optimizer state: every Adam-moment-sized
    leaf shards over the 'data' axis on its first divisible dimension.

    The reference replicates optimizer state on every GPU (plain Horovod
    DP). On a mesh the Adam update is elementwise, so GSPMD runs it
    shard-local when the moments are sharded — the apply program's HBM
    traffic and memory drop by the data-axis size, and XLA inserts the
    (reduce-)scatter/all-gather around it automatically. Scalars (step
    counts) and non-divisible leaves replicate.
    """
    n_data = mesh.shape["data"]

    def f(x):
        shape = getattr(x, "shape", ())
        for axis, dim in enumerate(shape):
            if dim % n_data == 0 and dim >= n_data:
                spec = [None] * len(shape)
                spec[axis] = "data"
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())
    return jax.tree_util.tree_map(f, opt_state)


def shard_opt_state(mesh: Mesh, opt_state):
    """Re-place an optimizer-state tree with ZeRO-1 shardings."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), opt_state,
        opt_shardings(mesh, opt_state))
