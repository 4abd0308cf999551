"""Real 2-process multi-host rehearsal over jax.distributed on localhost:
each process trains the pretrain driver on its own data shard (distinct
per-host batches, synced bucket schedule), then runs the host-sharded
retrieval eval and both produce the SAME merged metrics as a 1-process run.

Reference behaviors exercised: horovod N-process init (pretrain.py:384-388),
in-dataset rank sharding (data/data.py:201-203), score-matrix allgather
(itm.py:498-501)."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from uc2_tpu.data.synth import synth_corpus

WORKER = r'''
import json, os, sys
pid = int(sys.argv[1]); coord = sys.argv[2]; tmp = sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax
jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=coord, num_processes=2,
                           process_id=pid)
assert jax.process_count() == 2
assert len(jax.devices()) == 4

meta = json.load(open(os.path.join(tmp, "meta.json")))

# ---- part 1: 2 driver steps on per-host-sharded data
import pretrain
argv = [
    "--model_config", meta["model_config"],
    "--output_dir", os.path.join(tmp, "out"),
    "--train_datasets", json.dumps([
        {"name": "s", "language": "en", "db": [meta["txt_db"]],
         "img": [meta["img_db"]], "tasks": ["mlm", "itm"],
         "mix_ratio": [1, 1]}]),
    "--max_txt_len", "20", "--max_bb", "12", "--min_bb", "4",
    "--train_batch_size", "256", "--num_train_steps", "2",
    "--warmup_steps", "1", "--valid_steps", "0", "--save_steps", "2",
    "--log_steps", "1", "--dtype", "float32", "--seed", "0",
    "--zero1",      # ZeRO-1 moment sharding under multi-process too
]
# save_steps=2 → the periodic restorer save FIRES at step 2 with
# process-sharded zero1 moments (the ADVICE r3 medium crash path: _to_host
# must collectively gather non-addressable leaves, all hosts participating)
opts = pretrain.parse_with_config(pretrain.build_parser(), argv)
state = pretrain.main(opts)
assert int(state.step) == 2, int(state.step)
assert os.path.exists(os.path.join(tmp, "out", "restore.ckpt"))
# resume: restore the zero1-sharded state on BOTH hosts and run 1 more step
argv2 = list(argv)
argv2[argv2.index("--num_train_steps") + 1] = "3"
opts2 = pretrain.parse_with_config(pretrain.build_parser(), argv2)
state2 = pretrain.main(opts2)
assert int(state2.step) == 3, int(state2.step)
# per-host data really is distinct
from uc2_tpu.data.db import TxtTokDb
ids0 = TxtTokDb(meta["txt_db"], max_txt_len=20, shard=(0, 2)).ids
ids1 = TxtTokDb(meta["txt_db"], max_txt_len=20, shard=(1, 2)).ids
assert not set(ids0) & set(ids1) and ids0 and ids1

# ---- part 1b: the coordination-service KV broadcast (the primitive that
# makes multi-host input prefetch safe) from a BACKGROUND thread while the
# main thread dispatches device programs — no device collective involved,
# so the interleave cannot desynchronize hosts
import threading
from uc2_tpu.parallel import multihost as MH
res = {}
def bg():
    for i in range(3):
        res[i] = MH.kv_broadcast_object(
            f"uc2/test/thread/{i}", {"win": i, "val": 42} if pid == 0
            else None)
t = threading.Thread(target=bg)
t.start()
import jax.numpy as jnp
for _ in range(8):
    jnp.sum(jnp.ones((128, 128))).block_until_ready()
t.join(timeout=120)
assert not t.is_alive(), "kv broadcast deadlocked"
assert res == {i: {"win": i, "val": 42} for i in range(3)}, res

# ---- part 1c: itm rank finetune, MULTI-DB + hard-neg mining under 2
# processes: texts shard per host per db; the initial mining pass writes
# per-db per-HOST artifacts (one shared filename would race writers on
# the shared output_dir)
import itm
itm_argv = [
    "--model_config", meta["model_config"],
    "--output_dir", os.path.join(tmp, "itm_out"),
    "--train_txt_db", json.dumps([meta["txt_db"], meta["txt_db2"]]),
    "--train_img_db", json.dumps([meta["img_db"], meta["img_db2"]]),
    "--max_txt_len", "18", "--max_bb", "12", "--min_bb", "4",
    "--train_batch_size", "14", "--eval_batch_size", "8",
    "--num_train_steps", "2", "--warmup_steps", "1",
    "--valid_steps", "0", "--save_steps", "5", "--log_steps", "1",
    "--hard_neg_size", "2",
    "--dtype", "float32", "--seed", "0",
]
iopts = itm.parse_with_config(itm.build_parser(), itm_argv)
istate, _ = itm.main(iopts)
assert int(istate.step) == 2, int(istate.step)
for k in (0, 1):
    mine = os.path.join(tmp, "itm_out", f"hard_negs_0.db{k}.host{pid}.json")
    assert os.path.exists(mine), mine
    pools = json.load(open(mine))
    assert pools["txt2hardimgs"] and pools["img2hardtxts"]

# ---- part 2: host-sharded retrieval eval == 1-process metrics
from uc2_tpu.config import UC2Config
from uc2_tpu.data.db import DetectFeatDb
from uc2_tpu.evalu.retrieval import full_retrieval_eval
from uc2_tpu.models.finetune import UC2ForImageTextRetrieval
import numpy as np
cfg = UC2Config(**json.load(open(meta["model_config"])), dtype="float32")
model = UC2ForImageTextRetrieval(cfg)
params = jax.device_get(model.init_params(jax.random.PRNGKey(0)))
tdb = TxtTokDb(meta["txt_db"], max_txt_len=18)
idb = DetectFeatDb(meta["img_db"], 0.2, 12, 4, 12)
log, (m_merged, t_ids, i_ids) = full_retrieval_eval(
    model, params, tdb, idb, 20, 12, batch_size=8, return_matrix=True)
with open(os.path.join(tmp, f"eval_{pid}.json"), "w") as f:
    json.dump(log, f)
np.save(os.path.join(tmp, f"merged_{pid}.npy"), m_merged)
# this host's stride of the merged matrix must be BITWISE equal to an
# unsharded computation in this process — proves row placement exactly.
# Rows computed by the peer process may drift ~3e-5 (CPU XLA produces
# tiny fp differences across concurrently-running identical processes —
# an artifact of the CPU simulation, not of the gather), so they get a
# tolerance instead.
from uc2_tpu.evalu.retrieval import score_matrix
m_full = score_matrix(model, params, tdb, idb, t_ids, i_ids, 20, 12,
                      batch_size=8)
own = np.arange(pid, len(t_ids), 2)
np.testing.assert_array_equal(m_merged[own], m_full[own])
np.testing.assert_allclose(m_merged, m_full, atol=2e-4)
print("worker", pid, "done")
'''


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_train_and_eval(tmp_path):
    corpus = synth_corpus(str(tmp_path / "c"), n_imgs=16, txt_per_img=2,
                          min_bb=4, max_bb=12, img_dim=16, n_classes=11,
                          seed=5, max_words=7, vocab=512)
    model_cfg = {
        "vocab_size": 512, "hidden_size": 32, "num_hidden_layers": 1,
        "num_attention_heads": 2, "intermediate_size": 64,
        "max_position_embeddings": 64, "img_dim": 16, "img_label_dim": 11,
        "use_pallas_attention": False}
    cfgp = tmp_path / "tiny.json"
    cfgp.write_text(json.dumps(model_cfg))
    corpus2 = synth_corpus(str(tmp_path / "c2"), n_imgs=12, txt_per_img=2,
                           min_bb=4, max_bb=12, img_dim=16, n_classes=11,
                           seed=23, max_words=7, vocab=512)
    (tmp_path / "meta.json").write_text(json.dumps({
        "txt_db": corpus["txt_db"], "img_db": corpus["img_db"],
        "txt_db2": corpus2["txt_db"], "img_db2": corpus2["img_db"],
        "model_config": str(cfgp)}))
    wpath = tmp_path / "worker.py"
    wpath.write_text(WORKER)

    coord = f"127.0.0.1:{_free_port()}"
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.getcwd()
    procs = [subprocess.Popen(
        [sys.executable, str(wpath), str(i), coord, str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        cwd=os.getcwd()) for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out.decode(errors="replace"))
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    # both hosts must hold the identical merged metrics (same gathered
    # matrix on every process — reference hvd.allgather semantics);
    # sharded-vs-unsharded matrix parity is asserted inside each worker
    # where the fp environment is identical
    with open(tmp_path / "eval_0.json") as f:
        got0 = json.load(f)
    with open(tmp_path / "eval_1.json") as f:
        got1 = json.load(f)
    assert got0 == got1
    assert {"img_r1", "img_r5", "img_r10", "txt_r1", "txt_r5",
            "txt_r10"} <= set(got0)
    # both hosts assembled the identical matrix from the same gather
    m0 = np.load(tmp_path / "merged_0.npy")
    m1 = np.load(tmp_path / "merged_1.npy")
    np.testing.assert_array_equal(m0, m1)
