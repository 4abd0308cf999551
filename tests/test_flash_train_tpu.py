"""flash_attention_train on REAL TPU hardware: the pltpu PRNG dropout path
(the CPU interpreter substitutes jax.random — see _keep_mask). Skipped off
TPU; exercised manually/driver-side on the chip."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

# default_backend() reports 'tpu' through this image's axon tunnel (that is
# what routes the production kernels), while devices()[0].platform reports
# 'axon' — gate on the backend so the test RUNS on the tunneled chip
pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="needs a real TPU (pltpu PRNG)")


def test_tpu_dropout_stats_and_grads():
    from uc2_tpu.ops.attention import _xla_attention
    from uc2_tpu.ops.flash_attention import flash_attention_train

    # dropped-prob matrix exposed via v = I at q=k=0 (p uniform)
    rate, Ld = 0.5, 128
    q = jnp.zeros((1, Ld, 1, Ld), jnp.float32)
    v = jnp.eye(Ld, dtype=jnp.float32).reshape(1, Ld, 1, Ld)
    bias = jnp.zeros((1, 1, 1, Ld), jnp.float32)
    out = flash_attention_train(q, q, v, bias, jnp.int32(3), rate=rate)
    pd = np.asarray(out).reshape(Ld, Ld)
    nz = pd[pd > 1e-9]
    assert np.allclose(nz, 1.0 / (Ld * (1.0 - rate)), rtol=1e-3)
    assert abs((pd > 1e-9).mean() - (1.0 - rate)) < 0.03
    out3 = flash_attention_train(q, q, v, bias, jnp.int32(3), rate=rate)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out3))

    # rate=0 grads == XLA grads on the chip
    rng = np.random.default_rng(0)
    B, L, n, d = 2, 162, 12, 64
    qq = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.float32)
    kk = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.float32)
    vv = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.float32)
    bb = jnp.zeros((B, 1, 1, L), jnp.float32)
    w = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.float32)
    fa = functools.partial(flash_attention_train, rate=0.0)
    g = jax.grad(lambda q, k, v: jnp.sum(
        fa(q, k, v, bb, jnp.int32(1)) * w), argnums=(0, 1, 2))(qq, kk, vv)
    gr = jax.grad(lambda q, k, v: jnp.sum(
        _xla_attention(q, k, v, bb) * w), argnums=(0, 1, 2))(qq, kk, vv)
    for a, b in zip(g, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
