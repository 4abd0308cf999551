"""Pallas flash-attention kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from uc2_tpu.ops.attention import _xla_attention


def _run_interpret(q, k, v, bias):
    from jax.experimental.pallas import tpu as pltpu
    from uc2_tpu.ops.flash_attention import _fwd_pallas
    with pltpu.force_tpu_interpret_mode():
        return _fwd_pallas(q, k, v, bias)


@pytest.mark.parametrize("L", [64, 162])
def test_kernel_matches_xla(L):
    rng = np.random.default_rng(0)
    B, n, d = 2, 4, 64
    q = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.float32)
    mask = np.ones((B, L))
    mask[:, L - 7:] = 0
    bias = jnp.asarray(((1 - mask) * -10000.0)[:, None, None, :], jnp.float32)
    out_p = np.asarray(_run_interpret(q, k, v, bias))
    out_x = np.asarray(_xla_attention(q, k, v, bias))
    np.testing.assert_allclose(out_p, out_x, rtol=2e-5, atol=2e-5)


def test_vjp_matches_xla():
    from uc2_tpu.ops.flash_attention import flash_attention
    # custom_vjp backward recomputes via XLA → gradients must agree exactly
    rng = np.random.default_rng(1)
    B, L, n, d = 1, 16, 2, 64
    q = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, L, n, d)), jnp.float32)
    bias = jnp.zeros((B, 1, 1, L), jnp.float32)

    def loss_x(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, bias) ** 2)

    gx = jax.grad(loss_x, argnums=(0, 1, 2))(q, k, v)

    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        def loss_p(q, k, v):
            return jnp.sum(flash_attention(q, k, v, bias) ** 2)
        gp = jax.grad(loss_p, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-5)
