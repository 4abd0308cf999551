"""Compare attention backends on the ITM scoring chain: xla vs stock flash."""
import sys, time, numpy as np
sys.path.insert(0, "/root/repo")
LOG = open("/root/repo/bench_results.txt", "a")
def log(*a):
    print(*a, file=LOG, flush=True); print(*a, flush=True)
log("=== tpu_measure5 start", time.strftime("%H:%M:%S"))
import jax, jax.numpy as jnp
t0=time.time(); _ = float(jnp.sum(jnp.ones((8,8)))); log("tunnel ready", round(time.time()-t0,1))
from uc2_tpu.config import UC2Config
from uc2_tpu.models.finetune import UC2ForImageTextRetrieval
rng = np.random.default_rng(0)
B = 64
for impl in ("flash",):
    cfg = UC2Config(dtype="bfloat16", use_pallas_attention=impl if impl != "xla" else False)
    model = UC2ForImageTextRetrieval(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    ids = rng.integers(4, cfg.vocab_size, (B, 62)).astype(np.int32); ids[:,0]=0
    am = np.ones((B,162), np.int32); am[:, 150:162] = 0  # some padding, realistic
    batch = {"input_ids": jnp.asarray(ids),
             "img_feat": jnp.asarray(rng.standard_normal((B,100,2048)).astype(np.float32)),
             "img_pos_feat": jnp.asarray(rng.random((B,100,7)).astype(np.float32)),
             "attn_mask": jnp.asarray(am)}
    nit=10
    @jax.jit
    def chain(params, batch):
        def body(c,_):
            b=dict(batch); b["img_feat"]=batch["img_feat"]+c*1e-30
            s=model.scores(params,b,deterministic=True)
            return jnp.mean(s), None
        last,_=jax.lax.scan(body, jnp.float32(0.),None,length=nit)
        return last
    try:
        t0=time.time(); v1 = float(chain(params,batch)); log(impl, "compile:", round(time.time()-t0,1))
        t0=time.perf_counter(); v2 = float(chain(params,batch)); dt=time.perf_counter()-t0
        log(f"RESULT scoring attention={impl}: {B*nit/dt:.0f} pairs/s (chain val {v1:.5f})")
    except Exception as e:
        log(impl, "FAILED:", type(e).__name__, str(e)[:300])
log("=== tpu_measure5 done", time.strftime("%H:%M:%S"))
