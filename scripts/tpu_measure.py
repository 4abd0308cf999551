"""One-shot TPU measurement job: train-step throughput + scoring bench.
Run detached; appends results to bench_results.txt. Never interrupt it —
the axon tunnel wedges for ~30min if a client dies mid-RPC."""
import sys, time, tempfile, numpy as np
sys.path.insert(0, "/root/repo")
LOG = open("/root/repo/bench_results.txt", "a")
def log(*a):
    print(*a, file=LOG, flush=True)
    print(*a, flush=True)

log("=== tpu_measure start", time.strftime("%H:%M:%S"))
import jax, jax.numpy as jnp
t0=time.time()
_ = float(jnp.sum(jnp.ones((8,8))))
log("tunnel ready after", round(time.time()-t0,1), "s")

from uc2_tpu.config import UC2Config
from uc2_tpu.data.synth import synth_corpus
from uc2_tpu.data.db import DetectFeatDb, TxtTokDb
from uc2_tpu.data.collate import default_buckets
from uc2_tpu.data.loader import TaskLoader
from uc2_tpu.data import datasets as D
from uc2_tpu.models.pretraining import UC2ForPretraining
from uc2_tpu.training import optim as O
from uc2_tpu.training.step import create_train_state, make_train_step

out = tempfile.mkdtemp()
corpus = synth_corpus(out, n_imgs=120, txt_per_img=2, min_bb=10, max_bb=100, img_dim=2048, n_classes=1601, seed=1)
txt = TxtTokDb(corpus["txt_db"]); img = DetectFeatDb(corpus["img_db"])
buckets = default_buckets(60, 100, 10240)
tl = TaskLoader("mlm", D.MlmDataset(txt, img), buckets, seed=0)
cfg = UC2Config(dtype="bfloat16")
model = UC2ForPretraining(cfg)
t0=time.time()
params = model.init_params(jax.random.PRNGKey(0))
log("init params", round(time.time()-t0,1), "s")
tx = O.build_optimizer(params, O.constant(4e-5), grad_norm=5.0)
t0=time.time()
state = jax.jit(lambda p: create_train_state(p, tx))(params)
log("opt init", round(time.time()-t0,1), "s")
step = jax.jit(make_train_step(model, "mlm", tx))
while True:
    b = tl.next_batch()
    if b.pop("_bucket") == 2: break
B, M = b["input_ids"].shape[0], b["masked_pos"].shape[1]
t0=time.time()
state, m = step(state, b, jax.random.PRNGKey(0)); float(m["loss"])
log("train step compile+first:", round(time.time()-t0,1), "s")
n=10
t0=time.perf_counter()
for i in range(n):
    state, m = step(state, b, jax.random.PRNGKey(i))
_ = float(m["loss"])
dt=time.perf_counter()-t0
log(f"RESULT mlm train step (Lt=62,Nb=100,B={B},M={M}): {n/dt:.2f} steps/s, {B*n/dt:.0f} ex/s")

# middle bucket too (Lt=42,Nb=64)
tl2 = TaskLoader("mlm", D.MlmDataset(txt, img), buckets, seed=1)
while True:
    b2 = tl2.next_batch()
    if b2.pop("_bucket") == 1: break
B2, M2 = b2["input_ids"].shape[0], b2["masked_pos"].shape[1]
t0=time.time()
state, m = step(state, b2, jax.random.PRNGKey(0)); float(m["loss"])
log("bucket-1 compile:", round(time.time()-t0,1), "s")
t0=time.perf_counter()
for i in range(n):
    state, m = step(state, b2, jax.random.PRNGKey(i))
_ = float(m["loss"])
dt=time.perf_counter()-t0
log(f"RESULT mlm train step (Lt=42,Nb=64,B={B2},M={M2}): {n/dt:.2f} steps/s, {B2*n/dt:.0f} ex/s")
log("=== tpu_measure done", time.strftime("%H:%M:%S"))
