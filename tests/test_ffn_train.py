"""Training-path fused FFN block (ops/ffn_train.py): interpret-mode parity
of forward AND custom_vjp backward against a plain-jax reference, with and
without in-kernel dropout (mask reconstructed from the same (seed, cell)
derivation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uc2_tpu.ops.ffn_train import (_pick_tile, fused_ffn_block_train)
from uc2_tpu.ops.flash_attention import _keep_mask

B, L, H, F = 2, 16, 64, 128
EPS = 1e-12


def _args(seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, L, H)).astype(np.float32))
    w1 = jnp.asarray(rng.standard_normal((H, F)).astype(np.float32) * 0.05)
    b1 = jnp.asarray(rng.standard_normal(F).astype(np.float32) * 0.01)
    w2 = jnp.asarray(rng.standard_normal((F, H)).astype(np.float32) * 0.05)
    b2 = jnp.asarray(rng.standard_normal(H).astype(np.float32) * 0.01)
    g = jnp.asarray(1.0 + rng.standard_normal(H).astype(np.float32) * 0.1)
    be = jnp.asarray(rng.standard_normal(H).astype(np.float32) * 0.1)
    return x, w1, b1, w2, b2, g, be


def _full_keep(seed, rows, rate):
    """Reassemble the per-cell keep mask exactly as the kernels derive it
    (shared row tile, padded rows included then sliced)."""
    R = _pick_tile(rows)
    pad_rows = rows + ((-rows) % R)
    parts = [np.asarray(_keep_mask(seed, i, (R, H), rate, interpret=True))
             for i in range(pad_rows // R)]
    return jnp.asarray(np.concatenate(parts)[:rows])


def _ref(x, w1, b1, w2, b2, gamma, beta, keep, rate):
    a = x.reshape(-1, H) @ w1 + b1
    h = 0.5 * a * (1.0 + jax.scipy.special.erf(a / np.sqrt(2.0)))
    y2 = h @ w2 + b2
    if rate > 0.0:
        y2 = jnp.where(keep, y2 / (1.0 - rate), 0.0)
    y = y2 + x.reshape(-1, H)
    mu = jnp.mean(y, -1, keepdims=True)
    var = jnp.mean(jnp.square(y - mu), -1, keepdims=True)
    return ((y - mu) * jax.lax.rsqrt(var + EPS) * gamma
            + beta).reshape(x.shape)


@pytest.mark.parametrize("rate", [0.0, 0.3])
def test_fwd_and_grads_match_reference(rate):
    x, w1, b1, w2, b2, g, be = _args()
    seed = 17
    keep = _full_keep(seed, B * L, rate)

    out = fused_ffn_block_train(x, w1, b1, w2, b2, g, be, seed, rate, EPS,
                                True)
    ref = _ref(x, w1, b1, w2, b2, g, be, keep, rate)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss_k(*a):
        return jnp.sum(jnp.sin(fused_ffn_block_train(
            *a, seed, rate, EPS, True)))

    def loss_r(*a):
        return jnp.sum(jnp.sin(_ref(*a, keep, rate)))

    gk = jax.grad(loss_k, argnums=tuple(range(7)))(x, w1, b1, w2, b2, g, be)
    gr = jax.grad(loss_r, argnums=tuple(range(7)))(x, w1, b1, w2, b2, g, be)
    for got, want, name in zip(gk, gr,
                               ("x", "w1", "b1", "w2", "b2", "g", "be")):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=5e-4, rtol=5e-4, err_msg=name)


def test_dropout_determinism_and_rate():
    x, w1, b1, w2, b2, g, be = _args(1)
    a1 = fused_ffn_block_train(x, w1, b1, w2, b2, g, be, 5, 0.5, EPS, True)
    a2 = fused_ffn_block_train(x, w1, b1, w2, b2, g, be, 5, 0.5, EPS, True)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    a3 = fused_ffn_block_train(x, w1, b1, w2, b2, g, be, 6, 0.5, EPS, True)
    assert np.abs(np.asarray(a1) - np.asarray(a3)).max() > 1e-3
    keep = np.asarray(_full_keep(5, B * L, 0.5))
    assert 0.3 < keep.mean() < 0.7


def test_in_graph_grads_match_xla_chain(monkeypatch):
    """Full pretraining MLM grad with the training FFN block dispatched
    in-graph (UC2_FFN_TRAIN=1, interpret on CPU) vs the stock XLA chain —
    dropout zeroed so the two paths are numerically comparable."""
    from uc2_tpu.config import UC2Config
    from uc2_tpu.models.pretraining import UC2ForPretraining
    from uc2_tpu.training.step import make_loss_fn

    cfg = UC2Config(vocab_size=256, hidden_size=32, num_hidden_layers=2,
                    num_attention_heads=2, intermediate_size=64,
                    max_position_embeddings=64, img_dim=16,
                    img_label_dim=11, dtype="float32",
                    hidden_dropout_prob=0.0,
                    attention_probs_dropout_prob=0.0,
                    use_pallas_attention="pallas-train")
    rng = np.random.default_rng(0)
    Bx, Lt, Nb, M = 4, 10, 6, 4
    ids = rng.integers(4, 256, (Bx, Lt)).astype(np.int32)
    ids[:, 0] = 0
    batch = {
        "input_ids": jnp.asarray(ids),
        "img_feat": jnp.asarray(
            rng.standard_normal((Bx, Nb, 16)).astype(np.float32)),
        "img_pos_feat": jnp.asarray(rng.random((Bx, Nb, 7))
                                    .astype(np.float32)),
        "attn_mask": jnp.ones((Bx, Lt + Nb), jnp.int32),
        "masked_pos": jnp.asarray(
            rng.integers(1, Lt, (Bx, M)).astype(np.int32)),
        "masked_weight": jnp.ones((Bx, M), jnp.float32),
        "txt_labels": jnp.asarray(
            rng.integers(4, 256, (Bx, M)).astype(np.int32)),
    }
    model = UC2ForPretraining(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    loss_fn = make_loss_fn(model, "mlm")

    def grads(env):
        monkeypatch.setenv("UC2_FFN_TRAIN", env)
        (_, _), g = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, jax.random.PRNGKey(1))
        return g

    g_k = grads("1")
    g_x = grads("0")
    for a, b in zip(jax.tree_util.tree_leaves(g_k),
                    jax.tree_util.tree_leaves(g_x)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-3)


def test_ragged_rows_pad_exact():
    """rows not divisible by the tile: pad rows must not leak into the
    weight-gradient accumulators."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 9, H)).astype(np.float32))
    _, w1, b1, w2, b2, g, be = _args(4)

    def loss_k(w):
        return jnp.sum(fused_ffn_block_train(x, w, b1, w2, b2, g, be,
                                             0, 0.0, EPS, True))

    def loss_r(w):
        a = x.reshape(-1, H) @ w + b1
        h = 0.5 * a * (1.0 + jax.scipy.special.erf(a / np.sqrt(2.0)))
        y = h @ w2 + b2 + x.reshape(-1, H)
        mu = jnp.mean(y, -1, keepdims=True)
        var = jnp.mean(jnp.square(y - mu), -1, keepdims=True)
        return jnp.sum((y - mu) * jax.lax.rsqrt(var + EPS) * g + be)

    np.testing.assert_allclose(np.asarray(jax.grad(loss_k)(w1)),
                               np.asarray(jax.grad(loss_r)(w1)),
                               atol=5e-4, rtol=5e-4)
