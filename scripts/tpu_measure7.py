"""In-process A/B: end-to-end scoring with xla vs pallas-v3 attention."""
import sys, time, numpy as np
sys.path.insert(0, "/root/repo")
LOG = open("/root/repo/bench_results.txt", "a")
def log(*a):
    print(*a, file=LOG, flush=True); print(*a, flush=True)
log("=== tpu_measure7 start", time.strftime("%H:%M:%S"))
import jax, jax.numpy as jnp
t0=time.time(); _ = float(jnp.sum(jnp.ones((8,8)))); log("tunnel ready", round(time.time()-t0,1))
from uc2_tpu.config import UC2Config
from uc2_tpu.models.finetune import UC2ForImageTextRetrieval
import uc2_tpu.ops.flash_attention as F
from uc2_tpu.ops.flash_attention import _fwd_pallas_v3
F.flash_attention = lambda q,k,v,bias: _fwd_pallas_v3(q,k,v,bias)
rng = np.random.default_rng(0)
B = 64
nit = 10
models = {}
for impl in (False, True):
    cfg = UC2Config(dtype="bfloat16", use_pallas_attention=impl)
    models[impl] = UC2ForImageTextRetrieval(cfg)
params = models[False].init_params(jax.random.PRNGKey(0))
ids = rng.integers(4, 250002, (B, 62)).astype(np.int32); ids[:,0]=0
batch = {"input_ids": jnp.asarray(ids),
         "img_feat": jnp.asarray(rng.standard_normal((B,100,2048)).astype(np.float32)),
         "img_pos_feat": jnp.asarray(rng.random((B,100,7)).astype(np.float32)),
         "attn_mask": jnp.ones((B,162), jnp.int32)}
chains = {}
for impl, model in models.items():
    @jax.jit
    def chain(params, batch, model=model):
        def body(c,_):
            bb=dict(batch); bb["img_feat"]=batch["img_feat"]+c*1e-30
            s=model.scores(params,bb,deterministic=True)
            return jnp.mean(s), None
        last,_=jax.lax.scan(body, jnp.float32(0.),None,length=nit)
        return last
    float(chain(params,batch))
    chains[impl] = chain
for trial in range(3):
    row = []
    for impl, chain in chains.items():
        t0=time.perf_counter(); float(chain(params,batch)); dt=time.perf_counter()-t0
        row.append(f"{'v3' if impl else 'xla'}={B*nit/dt:.0f}")
    log(f"RESULT A/B trial {trial}: " + " ".join(row) + " pairs/s")
log("=== tpu_measure7 done", time.strftime("%H:%M:%S"))
