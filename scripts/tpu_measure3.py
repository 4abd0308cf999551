"""TPU measurement batch 3: itm-ot + vmlm-soft train steps (split programs),
bucketed vs flat retrieval eval, final bench.py verification."""
import sys, time, tempfile, numpy as np, functools, json
sys.path.insert(0, "/root/repo")
LOG = open("/root/repo/bench_results.txt", "a")
def log(*a):
    print(*a, file=LOG, flush=True); print(*a, flush=True)
log("=== tpu_measure3 start", time.strftime("%H:%M:%S"))
import jax, jax.numpy as jnp, optax
t0=time.time(); _ = float(jnp.sum(jnp.ones((8,8)))); log("tunnel ready", round(time.time()-t0,1))

from uc2_tpu.config import UC2Config
from uc2_tpu.models.pretraining import UC2ForPretraining
from uc2_tpu.training import optim as O
from uc2_tpu.training.step import make_split_train_step

rng = np.random.default_rng(0)
cfg = UC2Config(dtype="bfloat16")
model = UC2ForPretraining(cfg)
params = model.init_params(jax.random.PRNGKey(0))
tx = O.build_optimizer(params, O.constant(4e-5), grad_norm=5.0)
opt_state = jax.jit(tx.init)(params)

def batch_for(task, B=56, Lt=62, Nb=100):
    ids = rng.integers(4, cfg.vocab_size, (B, Lt)).astype(np.int32); ids[:,0]=0
    b = {"input_ids": jnp.asarray(ids),
        "img_feat": jnp.asarray(rng.standard_normal((B,Nb,2048)).astype(np.float32)),
        "img_pos_feat": jnp.asarray(rng.random((B,Nb,7)).astype(np.float32)),
        "attn_mask": jnp.ones((B,Lt+Nb), jnp.int32)}
    if task == "itm-ot":
        b["targets"] = jnp.asarray(rng.integers(0,2,B).astype(np.int32))
    if task == "vmlm-soft":
        M = 40
        b["img_masks"] = jnp.asarray(rng.random((B,Nb)) < 0.15)
        b["masked_pos"] = jnp.asarray(Lt + rng.integers(0,Nb,(B,M)).astype(np.int32))
        b["masked_weight"] = jnp.ones((B,M), jnp.float32)
        t = rng.random((B,M,1366)).astype(np.float32); t/= t.sum(-1,keepdims=True)
        b["label_targets"] = jnp.asarray(t)
    return b

valid_ids = np.sort(rng.choice(cfg.vocab_size, 1366, replace=False)).astype(np.int32)
for task in ("itm-ot", "vmlm-soft"):
    g, a = make_split_train_step(model, task, tx, valid_ids=valid_ids, itm_ot_lambda=0.1)
    gj = jax.jit(g)
    b = batch_for(task)
    t0=time.time()
    grads, m = gj(params, b, jax.random.PRNGKey(0)); float(m["loss"])
    log(f"{task} grad compile+first:", round(time.time()-t0,1))
    n=8
    t0=time.perf_counter()
    for i in range(n):
        grads, m = gj(params, b, jax.random.PRNGKey(i))
    _ = float(m["loss"])
    dt=time.perf_counter()-t0
    B = b["input_ids"].shape[0]
    log(f"RESULT {task} grad step: {n/dt:.2f} steps/s, {B*n/dt:.0f} ex/s (grad only)")
    del grads

# bucketed vs flat retrieval eval on realistic nbb distribution
del opt_state
from uc2_tpu.data.synth import synth_corpus
from uc2_tpu.data.db import DetectFeatDb, TxtTokDb
from uc2_tpu.evalu.retrieval import score_matrix
from uc2_tpu.models.finetune import UC2ForImageTextRetrieval
out = tempfile.mkdtemp()
corpus = synth_corpus(out, n_imgs=128, txt_per_img=1, min_bb=10, max_bb=100, img_dim=2048, n_classes=1601, seed=3)
txt_db = TxtTokDb(corpus["txt_db"]); img_db = DetectFeatDb(corpus["img_db"])
rmodel = UC2ForImageTextRetrieval(cfg)
rparams = rmodel.init_params(jax.random.PRNGKey(1))
txt_ids = list(txt_db.ids)[:8]
img_ids = sorted({txt_db.txt2img[t] for t in txt_db.ids}, key=lambda im: img_db.name2nbb[im])
for name, buckets in (("flat", ()), ("bucketed", (36, 64))):
    sfn = jax.jit(lambda p, b: rmodel.scores(p, b, deterministic=True))
    t0=time.time()
    m = score_matrix(rmodel, rparams, txt_db, img_db, txt_ids, img_ids, 62, 100,
                     batch_size=64, score_fn=sfn, nbb_buckets=buckets)
    # warm (includes compile)
    t0=time.perf_counter()
    m = score_matrix(rmodel, rparams, txt_db, img_db, txt_ids, img_ids, 62, 100,
                     batch_size=64, score_fn=sfn, nbb_buckets=buckets)
    dt=time.perf_counter()-t0
    log(f"RESULT eval {name}: {len(txt_ids)*len(img_ids)/dt:.0f} pairs/s")

log("=== tpu_measure3 done", time.strftime("%H:%M:%S"))
