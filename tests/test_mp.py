"""uc2_tpu.ops.mp.einsum_f32 numeric contract (unit-level; the lowered
dtype/FLOPs consequences are pinned program-wide in test_hlo_invariants).

Contract: forward bit-identical to ``jnp.einsum(...,
preferred_element_type=f32)``; backward runs the transpose contractions in
the OPERAND dtype over the downcast cotangent (in fp32 configs that makes
the whole op bit-identical to plain einsum, backward included)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uc2_tpu.ops.mp import einsum_f32

SPEC = "nh,vh->nv"


def _operands(dtype):
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((8, 16)), dtype)
    b = jnp.asarray(rng.standard_normal((32, 16)), dtype)
    return a, b


@pytest.mark.parametrize("dtype", [jnp.bfloat16, jnp.float32])
def test_forward_bit_identical(dtype):
    a, b = _operands(dtype)
    got = einsum_f32(SPEC, a, b)
    want = jnp.einsum(SPEC, a, b, preferred_element_type=jnp.float32)
    assert got.dtype == jnp.float32
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_fp32_backward_bit_identical_to_plain_einsum():
    # the parity-test configuration: the custom vjp must be a no-op
    a, b = _operands(jnp.float32)
    g = jnp.asarray(np.random.default_rng(1).standard_normal((8, 32)),
                    jnp.float32)

    def f_ours(a, b):
        return jnp.vdot(einsum_f32(SPEC, a, b), g)

    def f_plain(a, b):
        return jnp.vdot(jnp.einsum(SPEC, a, b,
                                   preferred_element_type=jnp.float32), g)

    da1, db1 = jax.grad(f_ours, argnums=(0, 1))(a, b)
    da2, db2 = jax.grad(f_plain, argnums=(0, 1))(a, b)
    np.testing.assert_array_equal(np.asarray(da1), np.asarray(da2))
    np.testing.assert_array_equal(np.asarray(db1), np.asarray(db2))


def test_bf16_backward_equals_downcast_cotangent_transpose():
    # the rounding must land on g BEFORE the transpose dots (so they run
    # operand-dtype), not on da/db after f32xf32 dots
    a, b = _operands(jnp.bfloat16)
    gf = jnp.asarray(np.random.default_rng(2).standard_normal((8, 32)),
                     jnp.float32)
    _, vjp = jax.vjp(lambda x, y: einsum_f32(SPEC, x, y), a, b)
    da, db = vjp(gf)
    g16 = gf.astype(jnp.bfloat16)
    want_da = jnp.einsum("nv,vh->nh", g16, b,
                         preferred_element_type=jnp.bfloat16)
    want_db = jnp.einsum("nv,nh->vh", g16, a,
                         preferred_element_type=jnp.bfloat16)
    assert da.dtype == jnp.bfloat16 and db.dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(da, np.float32),
                                  np.asarray(want_da, np.float32))
    np.testing.assert_array_equal(np.asarray(db, np.float32),
                                  np.asarray(want_db, np.float32))


def test_grad_of_grad_composes():
    # double-vjp through the custom rule (hessian-vector products reach
    # it via the NLVR2 CrossAttention path under jax.grad of jax.grad)
    a, b = _operands(jnp.float32)

    def loss(a):
        return jnp.sum(einsum_f32(SPEC, a, b) ** 2)

    hvp = jax.grad(lambda x: jnp.vdot(jax.grad(loss)(x), jnp.ones_like(x)))
    out = hvp(a)
    assert out.shape == a.shape and bool(jnp.all(jnp.isfinite(out)))
