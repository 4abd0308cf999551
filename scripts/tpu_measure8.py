"""Train-step batch scaling at uc2-base (split grad/apply)."""
import sys, time, numpy as np
sys.path.insert(0, "/root/repo")
LOG = open("/root/repo/bench_results.txt", "a")
def log(*a):
    print(*a, file=LOG, flush=True); print(*a, flush=True)
log("=== tpu_measure8c (remat=full + chunked CE) start", time.strftime("%H:%M:%S"))
import jax, jax.numpy as jnp, optax, functools
t0=time.time(); _ = float(jnp.sum(jnp.ones((8,8)))); log("tunnel ready", round(time.time()-t0,1))
from uc2_tpu.config import UC2Config
from uc2_tpu.models.pretraining import UC2ForPretraining
from uc2_tpu.training import optim as O
from uc2_tpu.training.step import make_split_train_step
rng = np.random.default_rng(0)
cfg = UC2Config(dtype="bfloat16", remat="full")
model = UC2ForPretraining(cfg, lm_ce_chunks=8)
params = model.init_params(jax.random.PRNGKey(0))
tx = O.build_optimizer(params, O.constant(4e-5), grad_norm=5.0)
g, a = make_split_train_step(model, "mlm", tx)
gj = jax.jit(g)
aj = jax.jit(a, donate_argnums=(0,1,2))
opt_state = jax.jit(tx.init)(params)
Lt, Nb, M = 62, 100, 24
for B in (112, 224, 448):
    ids = rng.integers(4, cfg.vocab_size, (B, Lt)).astype(np.int32); ids[:,0]=0
    batch = {"input_ids": jnp.asarray(ids),
        "img_feat": jnp.asarray(rng.standard_normal((B,Nb,2048)).astype(np.float32)),
        "img_pos_feat": jnp.asarray(rng.random((B,Nb,7)).astype(np.float32)),
        "attn_mask": jnp.ones((B,Lt+Nb), jnp.int32),
        "masked_pos": jnp.asarray(rng.integers(1,Lt,(B,M)).astype(np.int32)),
        "masked_weight": jnp.ones((B,M), jnp.float32),
        "txt_labels": jnp.asarray(rng.integers(4,cfg.vocab_size,(B,M)).astype(np.int32))}
    try:
        t0=time.time()
        grads, m = gj(params, batch, jax.random.PRNGKey(0)); float(m["loss"])
        params, opt_state = aj(grads, opt_state, params)
        log(f"B={B} compile:", round(time.time()-t0,1))
        n=8
        p, s = params, opt_state
        t0=time.perf_counter()
        for i in range(n):
            grads, m = gj(p, batch, jax.random.PRNGKey(i))
            p, s = aj(grads, s, p)
        _ = float(m["loss"])
        dt=time.perf_counter()-t0
        params, opt_state = p, s
        log(f"RESULT mlm train B={B}: {n/dt:.2f} steps/s, {B*n/dt:.0f} ex/s")
    except Exception as e:
        log(f"B={B} FAILED:", type(e).__name__, str(e)[:200])
        break
log("=== tpu_measure8 done", time.strftime("%H:%M:%S"))
