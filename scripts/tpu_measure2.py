"""Split-program TPU measurement: grad step and adam apply jitted separately
(smaller programs; the fused train step's remote compile hung >60min)."""
import sys, time, tempfile, numpy as np
sys.path.insert(0, "/root/repo")
LOG = open("/root/repo/bench_results.txt", "a")
def log(*a):
    print(*a, file=LOG, flush=True); print(*a, flush=True)
log("=== tpu_measure2 start", time.strftime("%H:%M:%S"))
import jax, jax.numpy as jnp
t0=time.time(); _ = float(jnp.sum(jnp.ones((8,8)))); log("tunnel ready", round(time.time()-t0,1))
from uc2_tpu.config import UC2Config
from uc2_tpu.models.pretraining import UC2ForPretraining
from uc2_tpu.training import optim as O
from uc2_tpu.training.step import make_loss_fn
import optax
rng = np.random.default_rng(0)
B, Lt, Nb, M = 56, 62, 100, 24
cfg = UC2Config(dtype="bfloat16")
model = UC2ForPretraining(cfg)
params = model.init_params(jax.random.PRNGKey(0))
ids = rng.integers(4, cfg.vocab_size, (B, Lt)).astype(np.int32); ids[:,0]=0
batch = {"input_ids": jnp.asarray(ids),
    "img_feat": jnp.asarray(rng.standard_normal((B,Nb,2048)).astype(np.float32)),
    "img_pos_feat": jnp.asarray(rng.random((B,Nb,7)).astype(np.float32)),
    "attn_mask": jnp.ones((B,Lt+Nb), jnp.int32),
    "masked_pos": jnp.asarray(rng.integers(1,Lt,(B,M)).astype(np.int32)),
    "masked_weight": jnp.ones((B,M), jnp.float32),
    "txt_labels": jnp.asarray(rng.integers(4,cfg.vocab_size,(B,M)).astype(np.int32))}
lf = make_loss_fn(model, "mlm")
tx = O.build_optimizer(params, O.constant(4e-5), grad_norm=5.0)
opt_state = jax.jit(tx.init)(params)
log("opt init done")
@jax.jit
def grad_step(p, b, key):
    (loss, m), g = jax.value_and_grad(lambda pp: lf(pp, b, key), has_aux=True)(p)
    return g, loss
@__import__("functools").partial(jax.jit, donate_argnums=(0,1,2))
def apply_step(g, opt_state, p):
    updates, opt_state = tx.update(g, opt_state, p)
    return optax.apply_updates(p, updates), opt_state
t0=time.time()
g, loss = grad_step(params, batch, jax.random.PRNGKey(0)); float(loss)
log("grad compile+first:", round(time.time()-t0,1))
t0=time.time()
params, opt_state = apply_step(g, opt_state, params)
_ = float(jax.tree_util.tree_leaves(params)[0].ravel()[0])
log("apply compile+first:", round(time.time()-t0,1))
n=10
t0=time.perf_counter()
p, s = params, opt_state
del params, opt_state
for i in range(n):
    g, loss = grad_step(p, batch, jax.random.PRNGKey(i))
    p, s = apply_step(g, s, p)
_ = float(loss)
dt=time.perf_counter()-t0
log(f"RESULT mlm split train step (Lt=62,Nb=100,B={B},M={M}): {n/dt:.2f} steps/s, {B*n/dt:.0f} ex/s")
log("=== tpu_measure2 done", time.strftime("%H:%M:%S"))
