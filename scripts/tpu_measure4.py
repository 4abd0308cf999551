"""Measure retrieval eval throughput after device-resident gallery."""
import sys, time, tempfile, numpy as np
sys.path.insert(0, "/root/repo")
LOG = open("/root/repo/bench_results.txt", "a")
def log(*a):
    print(*a, file=LOG, flush=True); print(*a, flush=True)
log("=== tpu_measure4 start", time.strftime("%H:%M:%S"))
import jax, jax.numpy as jnp
t0=time.time(); _ = float(jnp.sum(jnp.ones((8,8)))); log("tunnel ready", round(time.time()-t0,1))
from uc2_tpu.config import UC2Config
from uc2_tpu.data.synth import synth_corpus
from uc2_tpu.data.db import DetectFeatDb, TxtTokDb
from uc2_tpu.evalu.retrieval import score_matrix
from uc2_tpu.models.finetune import UC2ForImageTextRetrieval
cfg = UC2Config(dtype="bfloat16")
out = tempfile.mkdtemp()
corpus = synth_corpus(out, n_imgs=128, txt_per_img=1, min_bb=10, max_bb=100, img_dim=2048, n_classes=1601, seed=3)
txt_db = TxtTokDb(corpus["txt_db"]); img_db = DetectFeatDb(corpus["img_db"])
rmodel = UC2ForImageTextRetrieval(cfg)
rparams = rmodel.init_params(jax.random.PRNGKey(1))
txt_ids = list(txt_db.ids)[:8]
img_ids = sorted({txt_db.txt2img[t] for t in txt_db.ids}, key=lambda im: img_db.name2nbb[im])
for name, buckets in (("flat", ()), ("bucketed", (36, 64))):
    sfn = jax.jit(lambda p, b: rmodel.scores(p, b, deterministic=True))
    m = score_matrix(rmodel, rparams, txt_db, img_db, txt_ids, img_ids, 62, 100,
                     batch_size=64, score_fn=sfn, nbb_buckets=buckets)  # compile
    t0=time.perf_counter()
    m = score_matrix(rmodel, rparams, txt_db, img_db, txt_ids, img_ids, 62, 100,
                     batch_size=64, score_fn=sfn, nbb_buckets=buckets)
    dt=time.perf_counter()-t0
    log(f"RESULT eval {name} (device-resident gallery): {len(txt_ids)*len(img_ids)/dt:.0f} pairs/s")
log("=== tpu_measure4 done", time.strftime("%H:%M:%S"))
