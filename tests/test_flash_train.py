"""flash_attention_train (in-kernel dropout + full Pallas backward) —
correctness in interpreter mode on the CPU mesh.

  * rate=0: forward and all gradients match the XLA einsum attention.
  * rate>0: dropout statistics (keep fraction, 1/(1-rate) scaling) via an
    identity-value trick that exposes the dropped prob matrix.
  * rate>0: the custom backward IS the gradient of the forward (directional
    finite differences) — which also proves fwd/bwd regenerate the same
    mask from the seed.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uc2_tpu.ops.attention import _xla_attention
from uc2_tpu.ops.flash_attention import flash_attention_train

B, L, n, d = 2, 128, 2, 32


def _inputs_shaped(seed, B, L, n, d, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, L, n, d)), dtype)
    k = jnp.asarray(rng.standard_normal((B, L, n, d)), dtype)
    v = jnp.asarray(rng.standard_normal((B, L, n, d)), dtype)
    mask = (rng.random((B, L)) < 0.8).astype(np.float32)
    mask[:, :4] = 1.0
    bias = jnp.asarray(((1.0 - mask) * -10000.0)[:, None, None, :],
                       jnp.float32)
    return q, k, v, bias


def _inputs(seed=0, dtype=jnp.float32):
    return _inputs_shaped(seed, B, L, n, d, dtype)


def test_rate0_matches_xla_forward_and_grads():
    q, k, v, bias = _inputs()
    fa = functools.partial(flash_attention_train, rate=0.0, interpret=True)
    out = fa(q, k, v, bias, jnp.int32(7))
    ref = _xla_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)

    w = jnp.asarray(np.random.default_rng(1).standard_normal(out.shape),
                    jnp.float32)
    g = jax.grad(lambda q, k, v, bias: jnp.sum(
        fa(q, k, v, bias, jnp.int32(7)) * w), argnums=(0, 1, 2, 3))
    gr = jax.grad(lambda q, k, v, bias: jnp.sum(
        _xla_attention(q, k, v, bias) * w), argnums=(0, 1, 2, 3))
    for a, b, name in zip(g(q, k, v, bias), gr(q, k, v, bias),
                          ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_dropout_statistics():
    """q=k=0, bias=0 → p uniform 1/L; v=I (L==d padding trick is avoided by
    reading context of basis vectors) — instead use L==d via a reshaped
    identity on the first head."""
    rate = 0.5
    Ld = 128
    q = jnp.zeros((1, Ld, 1, Ld), jnp.float32)
    k = jnp.zeros((1, Ld, 1, Ld), jnp.float32)
    v = jnp.eye(Ld, dtype=jnp.float32).reshape(1, Ld, 1, Ld)
    bias = jnp.zeros((1, 1, 1, Ld), jnp.float32)
    out = flash_attention_train(q, k, v, bias, jnp.int32(3), rate=rate,
                                interpret=True)
    pd = np.asarray(out).reshape(Ld, Ld)   # dropped-and-scaled prob matrix
    expected = 1.0 / (Ld * (1.0 - rate))
    nz = pd[pd > 1e-9]
    assert np.allclose(nz, expected, rtol=1e-4), (nz[:4], expected)
    keep_frac = (pd > 1e-9).mean()
    assert abs(keep_frac - (1.0 - rate)) < 0.03, keep_frac
    # different seed → different mask
    out2 = flash_attention_train(q, k, v, bias, jnp.int32(4), rate=rate,
                                 interpret=True)
    assert not np.array_equal(np.asarray(out), np.asarray(out2))
    # same seed → identical mask
    out3 = flash_attention_train(q, k, v, bias, jnp.int32(3), rate=rate,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out3))


@pytest.mark.parametrize("rate", [0.0, 0.3])
def test_backward_is_gradient_of_forward(rate):
    _check_backward_is_gradient(rate, B, L, n, d)


def test_backward_mask_consistency_at_bb_divergent_shape(monkeypatch):
    """Regression: fwd used to size its batch block with tensors=2 while
    bwd used tensors=4, so at shapes where those differ (here: old fwd
    BB=4, bwd BB=2) the backward regenerated a DIFFERENT dropout mask and
    returned silently wrong gradients. The shared _train_bb fixes it; this
    pins the fix with finite differences through the dropout mask. Runs
    under the legacy 16 MiB limit — the divergence precondition is a
    property of the legacy sizing heuristic (the shipped 64 MiB default's
    BB-target-4 lands on 4 at this shape, erasing the setup)."""
    monkeypatch.setenv("UC2_ATTN_TRAIN_VMEM_MB", "16")
    from uc2_tpu.ops.flash_attention import _train_bb
    Bx, Lx, nx, dx = 4, 256, 2, 32
    # the shape must be one where the OLD tensors=2 sizing disagreed
    old_fwd_bb = __import__("math").gcd(
        max(1, (4 * 1024 * 1024) // (2 * nx * Lx * Lx * 4)), Bx)
    assert old_fwd_bb != _train_bb(Bx, nx, Lx, dx, 0.3, False), \
        "shape no longer divergent"
    _check_backward_is_gradient(0.3, Bx, Lx, nx, dx)


def _check_backward_is_gradient(rate, B, L, n, d):
    q, k, v, bias = _inputs_shaped(2, B, L, n, d)
    w = jnp.asarray(np.random.default_rng(3).standard_normal(
        (B, L, n, d)), jnp.float32)

    def f(q, k, v):
        return jnp.sum(flash_attention_train(
            q, k, v, bias, jnp.int32(11), rate=rate, interpret=True) * w)

    grads = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    rng = np.random.default_rng(4)
    eps = 1e-3
    for arg_idx, name in ((0, "q"), (1, "k"), (2, "v")):
        direction = jnp.asarray(
            rng.standard_normal(q.shape).astype(np.float32))
        args_p = [q, k, v]
        args_m = [q, k, v]
        args_p[arg_idx] = args_p[arg_idx] + eps * direction
        args_m[arg_idx] = args_m[arg_idx] - eps * direction
        fd = (f(*args_p) - f(*args_m)) / (2 * eps)
        an = jnp.sum(grads[arg_idx] * direction)
        assert float(fd) == pytest.approx(float(an), rel=2e-2, abs=2e-2), \
            (name, float(fd), float(an))


@pytest.mark.parametrize("rate", [0.0, 0.25])
def test_native_layout_arm_bitwise_equal(rate, monkeypatch):
    """UC2_ATTN_TRAIN_LAYOUT=native (head-axis move in VMEM instead of
    host-side HBM transposes around the custom call) is the SAME program:
    same BB, same program_id, same [BB*n, L, L] mask shape — forward and
    every gradient must match the default arm bitwise."""
    q, k, v, bias = _inputs(seed=3)
    w = jnp.asarray(np.random.default_rng(4).standard_normal((B, L, n, d)),
                    jnp.float32)

    def run():
        fa = functools.partial(flash_attention_train, rate=rate,
                               interpret=True)
        out = fa(q, k, v, bias, jnp.int32(11))
        grads = jax.grad(lambda q, k, v, bias: jnp.sum(
            fa(q, k, v, bias, jnp.int32(11)) * w),
            argnums=(0, 1, 2, 3))(q, k, v, bias)
        return out, grads

    monkeypatch.delenv("UC2_ATTN_TRAIN_LAYOUT", raising=False)
    out0, g0 = run()
    monkeypatch.setenv("UC2_ATTN_TRAIN_LAYOUT", "native")
    out1, g1 = run()
    np.testing.assert_array_equal(np.asarray(out0), np.asarray(out1))
    for a, b, name in zip(g0, g1, ("dq", "dk", "dv", "dbias")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=name)


def test_bwd_vmem_model_calibration(monkeypatch):
    """Pin tiles' bwd VMEM model to the two on-chip Mosaic OOMs it was
    calibrated against (v5e, 2026-08-19) plus the known-good production
    config — so a model edit that would re-admit an OOM'ing tile fails
    here instead of in a 50-minute chip job. The calibration is against
    Mosaic's own 16 MiB accounting, so pin the legacy limit (the shipped
    default has been 64 MiB since r5o; test_vmem_raise covers it)."""
    from uc2_tpu.ops.tiles import (VMEM_SCOPED_LIMIT, VMEM_TRAIN_BUDGET,
                                   attn_train_bwd_vmem_bytes, max_train_bb)
    monkeypatch.setenv("UC2_ATTN_TRAIN_VMEM_MB", "16")
    n, L, d = 12, 162, 64
    # known-good: standard layout BB=1 at the production bucket compiles
    assert attn_train_bwd_vmem_bytes(1, n, L, d, False, 0.1) \
        <= VMEM_TRAIN_BUDGET
    # observed OOM: standard BB=2 hit 21.49M > 16M; model must reject it
    # and must not under-predict the observed footprint's excess
    assert attn_train_bwd_vmem_bytes(2, n, L, d, False, 0.1) \
        > VMEM_SCOPED_LIMIT
    # observed OOM: native layout at BB=1 hit 24.10M; model must reject
    assert attn_train_bwd_vmem_bytes(1, n, L, d, True, 0.1) \
        > VMEM_SCOPED_LIMIT
    # so at the production bucket: standard caps at BB=1, native at 0
    assert max_train_bb(128, n, L, d, False, 0.1) == 1
    assert max_train_bb(128, n, L, d, True, 0.1) == 0
    # smaller bucket (L=98): BB=2 and the native layout become legal
    assert max_train_bb(128, n, 98, d, False, 0.1) >= 2
    assert max_train_bb(128, n, 98, d, True, 0.1) >= 1


def test_train_bb_clamps_env_request(monkeypatch):
    """An explicit UC2_ATTN_TRAIN_BB above the modeled budget is clamped
    before compile (round 4's BB=2 sweep arm died on chip instead)."""
    from uc2_tpu.ops.flash_attention import _train_bb, _train_layout
    # legacy-limit behavior (the clamp data below was calibrated at 16
    # MiB; the shipped 64 MiB default's geometry is pinned in
    # test_vmem_raise.test_default_geometry_is_the_raced_peak)
    monkeypatch.setenv("UC2_ATTN_TRAIN_VMEM_MB", "16")
    monkeypatch.setenv("UC2_ATTN_TRAIN_BB", "2")
    assert _train_bb(128, 12, 162, 64, 0.1, False) == 1
    monkeypatch.delenv("UC2_ATTN_TRAIN_BB")
    # the default geometry at the production bucket is unchanged by the
    # head-split feature: standard layout, full-head cells, BB=1
    native, bb, hb = _train_layout(128, 12, 162, 64, 0.1)
    assert (native, bb, hb) == (False, 1, 12)
    # native at the production bucket falls back to standard: the only
    # VMEM-fitting head-blocks (HB=6,4,...) put a dim that is neither
    # divisible by 8 nor == n second-to-last in the block, which Mosaic
    # rejects (r5b chip race, output/tab_r5b_native.log), and the only
    # Mosaic-legal ones (HB=12; HB=8 doesn't divide 12) model over
    # budget at L=162
    monkeypatch.setenv("UC2_ATTN_TRAIN_LAYOUT", "native")
    native, bb, hb = _train_layout(128, 12, 162, 64, 0.1)
    assert (native, bb, hb) == (False, 1, 12)
    # ...but stays native at full-head cells where that fits (L=98)
    native98, _, hb98 = _train_layout(128, 12, 98, 64, 0.1)
    assert native98 is True and hb98 == 12


def test_train_hb_resolution(monkeypatch):
    """UC2_ATTN_TRAIN_HB sweeps the head block: snapped to a divisor of
    n, clamped to the modeled budget; 0/unset keeps the largest fitting
    divisor (= n whenever the pre-round-5 batch-only grid was safe)."""
    from uc2_tpu.ops.flash_attention import _train_layout
    monkeypatch.setenv("UC2_ATTN_TRAIN_VMEM_MB", "16")
    monkeypatch.setenv("UC2_ATTN_TRAIN_HB", "6")
    assert _train_layout(128, 12, 162, 64, 0.1)[2] == 6
    monkeypatch.setenv("UC2_ATTN_TRAIN_HB", "8")   # not a divisor → gcd 4
    assert _train_layout(128, 12, 162, 64, 0.1)[2] == 4
    monkeypatch.setenv("UC2_ATTN_TRAIN_HB", "12")
    monkeypatch.setenv("UC2_ATTN_TRAIN_LAYOUT", "native")
    # native has NO legal in-budget grid at L=162 (Mosaic head-axis
    # constraint) → the resolver falls back to standard, where HB=12
    # fits; the env request passes through un-clamped
    native162, _, hb162 = _train_layout(128, 12, 162, 64, 0.1)
    assert native162 is False and hb162 == 12


@pytest.mark.parametrize("native", [False, True])
def test_head_split_grid_matches_xla(native, monkeypatch):
    """Forced HB < n (the footprint-shrinking head-split grid): rate=0
    forward/grads still match XLA, and rate>0 backward is still the
    gradient of the forward (fwd/bwd mask streams agree across the 2D
    grid's cell ids)."""
    if native:
        monkeypatch.setenv("UC2_ATTN_TRAIN_LAYOUT", "native")
    monkeypatch.setenv("UC2_ATTN_TRAIN_HB", "1")   # n=2 → 2 head cells
    q, k, v, bias = _inputs(seed=5)
    fa = functools.partial(flash_attention_train, rate=0.0, interpret=True)
    out = fa(q, k, v, bias, jnp.int32(7))
    ref = _xla_attention(q, k, v, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
    w = jnp.asarray(np.random.default_rng(1).standard_normal(out.shape),
                    jnp.float32)
    g = jax.grad(lambda q, k, v, bias: jnp.sum(
        fa(q, k, v, bias, jnp.int32(7)) * w), argnums=(0, 1, 2, 3))
    gr = jax.grad(lambda q, k, v, bias: jnp.sum(
        _xla_attention(q, k, v, bias) * w), argnums=(0, 1, 2, 3))
    for a, b, name in zip(g(q, k, v, bias), gr(q, k, v, bias),
                          ("dq", "dk", "dv", "dbias")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
    _check_backward_is_gradient(0.3, B, L, n, d)
