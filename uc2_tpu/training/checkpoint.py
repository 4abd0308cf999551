"""Checkpoint / preemption-safe restore.

Reference: utils/save.py — ModelSaver (milestone ``model_step_{N}.pt``, :58-80)
and TrainingRestorer (auto-save every ``save_steps`` with two-file
rename-rotation + hyperparameter equality check on resume, :164-213).

TPU-native: trees are saved via flax msgpack serialization (params fp32,
optimizer state included — the reference checkpoints amp loss-scaler state,
which has no bf16 equivalent). Arrays are pulled host-side before writing
(single-controller save; for multi-host sharded params swap in
orbax.checkpoint — the API here is deliberately orbax-shaped).
The two-file rotation (write new → rename over backup) survives preemption
mid-write exactly like the reference's restore.pt / restore_backup.pt.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def _to_host(tree):
    """Pull a tree host-side. Process-sharded leaves (multi-host ZeRO-1
    moments: only a 1/N shard is addressable locally) are collectively
    gathered — EVERY process must therefore enter this function together
    (drivers call restorer.step on all hosts; only the writer touches
    disk). np.asarray alone raises on non-addressable jax.Arrays, which
    crashed the first periodic save of any multi-host --zero1 run
    (ADVICE r3 medium)."""
    def pull(x):
        if isinstance(x, jax.Array) and not (
                x.is_fully_addressable or x.is_fully_replicated):
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(
                x, tiled=True))
        return np.asarray(x)
    return jax.tree_util.tree_map(pull, tree)


def save_tree(path: str, tree: Any):
    data = serialization.to_bytes(_to_host(tree))
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def load_tree(path: str, target: Any) -> Any:
    with open(path, "rb") as f:
        return serialization.from_bytes(target, f.read())


def save_training_meta(output_dir: str, hps: Dict):
    """reference utils/save.py:17-55 (log/ckpt dirs + hps dump)."""
    os.makedirs(os.path.join(output_dir, "log"), exist_ok=True)
    os.makedirs(os.path.join(output_dir, "ckpt"), exist_ok=True)
    with open(os.path.join(output_dir, "log", "hps.json"), "w") as f:
        json.dump(hps, f, indent=2, default=str)


class ModelSaver:
    """Milestone saver: ckpt/model_step_{N}.msgpack (+ optional train state)
    (reference utils/save.py:58-80)."""

    def __init__(self, output_dir: str, prefix: str = "model_step"):
        self.dir = os.path.join(output_dir, "ckpt")
        os.makedirs(self.dir, exist_ok=True)
        self.prefix = prefix

    def save(self, params, step: int, opt_state=None):
        save_tree(os.path.join(self.dir, f"{self.prefix}_{step}.msgpack"),
                  params)
        if opt_state is not None:
            save_tree(os.path.join(self.dir, f"train_state_{step}.msgpack"),
                      opt_state)


class OrbaxCheckpointer:
    """Sharded/async checkpointing via orbax for multi-host runs where
    pulling the full tree to one host (save_tree) is impractical.

    Same two-tier role as ModelSaver/TrainingRestorer; backend is
    orbax.checkpoint.StandardCheckpointer (handles jax.Array shards,
    atomic finalization, and restore-with-sharding).
    """

    def __init__(self, directory: str):
        import orbax.checkpoint as ocp
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._ckptr = ocp.StandardCheckpointer()

    def save(self, step: int, tree: Any, force: bool = False):
        path = os.path.join(self.directory, f"step_{step}")
        self._ckptr.save(path, tree, force=force)

    def restore(self, step: int, target: Any) -> Any:
        path = os.path.join(self.directory, f"step_{step}")
        return self._ckptr.restore(path, target=target)

    def latest_step(self) -> Optional[int]:
        steps = []
        for name in os.listdir(self.directory):
            if name.startswith("step_"):
                try:
                    steps.append(int(name.split("_")[1]))
                except ValueError:
                    pass
        return max(steps) if steps else None

    def wait(self):
        self._ckptr.wait_until_finished()


class TrainingRestorer:
    """Preemption-safe restorer with two-file rotation + hps check
    (reference utils/save.py:164-213)."""

    def __init__(self, output_dir: str, hps: Dict, save_steps: int = 200,
                 write: bool = True):
        """``write=False`` (non-main hosts): participates in the
        collective state gather inside save() — required when leaves are
        process-sharded — but never touches the filesystem. ALL hosts
        must call step()/save() in lockstep (same cadence as the
        reference's rank0 NoOp swap, pretrain.py:472-473, except the
        gather makes participation mandatory rather than optional)."""
        self.restore_path = os.path.join(output_dir, "restore.ckpt")
        self.backup_path = os.path.join(output_dir, "restore_backup.ckpt")
        self.hps_path = os.path.join(output_dir, "restore_hps.json")
        # per-PROCESS input-stream state (MetaLoader.state_dict): written
        # by EVERY host regardless of self.write — the stream is
        # host-local, unlike the replicated model state. Same two-file
        # rotation; the stored global_step pairs it with its model ckpt.
        proc = jax.process_index()
        self.stream_path = os.path.join(
            output_dir, f"restore_stream_p{proc}.json")
        self.stream_backup = os.path.join(
            output_dir, f"restore_stream_backup_p{proc}.json")
        self.save_steps = save_steps
        self.write = write
        self.hps = {k: v for k, v in hps.items()}
        if os.path.exists(self.restore_path) or os.path.exists(
                self.backup_path):
            with open(self.hps_path) as f:
                saved = json.load(f)
            same = saved == json.loads(json.dumps(self.hps, default=str))
            assert same, "hyperparameters changed across restore"
            self.restore_pending = True
        else:
            if write:
                os.makedirs(output_dir, exist_ok=True)
                with open(self.hps_path, "w") as f:
                    json.dump(self.hps, f, default=str)
            self.restore_pending = False

    def step(self, global_step: int, state, stream: Any = None) -> None:
        if global_step % self.save_steps == 0:
            self.save(state, global_step=global_step, stream=stream)

    def save(self, state, global_step: Optional[int] = None,
             stream: Any = None):
        # stream FIRST: a preemption between the two writes then leaves a
        # stream file whose global_step doesn't match the model ckpt, and
        # restore_stream() detects the mismatch and falls back to
        # stream-restart semantics (never a silent desync)
        if stream is not None and global_step is not None:
            payload = json.dumps({"global_step": int(global_step),
                                  "meta": stream})
            tmp = self.stream_path + ".tmp"
            with open(tmp, "w") as f:
                f.write(payload)
            if os.path.exists(self.stream_path):
                os.replace(self.stream_path, self.stream_backup)
            os.replace(tmp, self.stream_path)
        host_state = _to_host(state)      # collective when sharded
        if not self.write:
            return
        if os.path.exists(self.restore_path):
            os.replace(self.restore_path, self.backup_path)
        save_tree(self.restore_path, host_state)

    def restore(self, target):
        for path in (self.restore_path, self.backup_path):
            if os.path.exists(path):
                try:
                    tree = load_tree(path, target)
                except Exception:
                    continue
                # re-place every leaf on its target sharding: without this
                # a resumed run silently loses ZeRO-1 moment sharding (the
                # numpy leaves would re-commit replicated on first use)
                def put(x, t):
                    if isinstance(t, jax.Array):
                        return jax.device_put(x, t.sharding)
                    return x
                return jax.tree_util.tree_map(put, tree, target)
        raise FileNotFoundError("no restore checkpoint found")

    def restore_stream(self, expected_step: int) -> Optional[Any]:
        """This host's input-stream state (MetaLoader.state_dict) paired
        with the model checkpoint restored at ``expected_step``; None if
        absent or from a different step (pre-stream-state checkpoints,
        or a preemption between the stream and model writes) — callers
        then fall back to fast_forward / stream-restart."""
        for path in (self.stream_path, self.stream_backup):
            if not os.path.exists(path):
                continue
            try:
                with open(path) as f:
                    payload = json.load(f)
            except Exception:
                continue
            if int(payload.get("global_step", -1)) == int(expected_step):
                return payload["meta"]
        return None
