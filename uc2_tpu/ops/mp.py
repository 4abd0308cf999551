"""Mixed-precision matmul boundary: f32 forward, compute-dtype backward.

``jnp.einsum(..., preferred_element_type=f32)`` over bf16 operands keeps
the MXU's fp32 accumulation visible in the output — right for softmax
scores and LM logits — but it has a hidden cost under autodiff: the
cotangent of the f32 output is f32, and jax's dot transpose rules then
UPCAST the bf16 saved operands so the backward matmuls run f32×f32 at
half MXU rate and double HBM traffic. For the 250k-vocab LM head those
are the two largest matmuls in the whole grad program (`dW = gᵀ·h` and
`dx = g·W`, each 2·B·M·H·V FLOPs ≈ 16% of an mlm step at uc2-base —
measured site: tests/test_hlo_invariants.py caught them as
``8x4x512xf32 @ …`` dots).

``einsum_f32`` keeps the f32 forward bit-identical and casts the
cotangent to the operands' dtype before the transpose matmuls — the
backward then runs exactly like every other layer in the model (DenseP
dots emit compute-dtype outputs, so their backwards are already bf16;
this restores consistency rather than adding a new precision tier). The
difference vs default autodiff is only WHERE the bf16 rounding lands:
on g before the transpose dots instead of on dx/dW after them. The
reference trains its heads under apex O2 fp16 end-to-end (pretrain.py
amp wrapping), so a bf16 backward here is parity-or-better.

In fp32 configs (``dtype="float32"``, the parity-test configuration) the
cast is a no-op and the whole op is bit-identical to plain einsum.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def einsum_f32(spec: str, a, b):
    """einsum with fp32 output whose backward runs in the operand dtype."""
    return jnp.einsum(spec, a, b, preferred_element_type=jnp.float32)


def _fwd(spec, a, b):
    return einsum_f32(spec, a, b), (a, b)


def _bwd(spec, res, g):
    a, b = res
    # jax derives the correct transpose contractions for us: vjp of the
    # same einsum, but emitting the COMPUTE dtype, fed the downcast g —
    # so da/db come out of bf16×bf16 dots (with the MXU still
    # accumulating fp32 internally)
    f = lambda x, y: jnp.einsum(spec, x, y, preferred_element_type=a.dtype)
    _, vjp = jax.vjp(f, a, b)
    return vjp(g.astype(a.dtype))


einsum_f32.defvjp(_fwd, _bwd)
