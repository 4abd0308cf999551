"""Compile-time perf invariants, pinned as tests.

The measured headlines (BASELINE.md) rest on compile-level properties
that nothing else guards: every hot matmul must reach the MXU with bf16
operands (an accidental fp32 upcast halves matmul throughput and doubles
HBM traffic silently — the numbers would drop with no failing test), and
the word-embedding backward must stay a scatter-add (a one-hot matmul
"simplification" would add a [B·L, vocab]-sized FLOPs bomb). These are
properties of OUR tracing, so they are asserted on the lowered StableHLO
— platform-independent, visible operand dtypes — not on backend-optimized
HLO. Reference comparison surface: the fp16 autocast the reference gets
from apex O2 (its train loop wraps amp, pretrain.py:556-566); here the
dtype discipline is explicit in the model code and this test keeps it.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uc2_tpu.config import UC2Config
from uc2_tpu.models.finetune import UC2ForImageTextRetrieval
from uc2_tpu.models.pretraining import UC2ForPretraining
from uc2_tpu.training.step import make_loss_fn

CFG = UC2Config(vocab_size=512, hidden_size=64, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=128,
                max_position_embeddings=64, img_dim=16, img_label_dim=11,
                dtype="bfloat16", use_pallas_attention=False)

DOT = re.compile(
    r"stablehlo\.dot_general.*?:\s*\(tensor<([^>]*)>,\s*tensor<([^>]*)>\)")


def _batch(rng, B=8, Lt=12, Nb=8, M_=4):
    ids = rng.integers(4, 512, (B, Lt)).astype(np.int32)
    ids[:, 0] = 0
    return {
        "input_ids": jnp.asarray(ids),
        "img_feat": jnp.asarray(
            rng.standard_normal((B, Nb, 16)).astype(np.float32)),
        "img_pos_feat": jnp.asarray(rng.random((B, Nb, 7))
                                    .astype(np.float32)),
        "attn_mask": jnp.ones((B, Lt + Nb), jnp.int32),
    }


def _mlm_extras(rng, B=8, Lt=12, M_=4):
    return {
        "masked_pos": jnp.asarray(
            rng.integers(1, Lt, (B, M_)).astype(np.int32)),
        "masked_weight": jnp.ones((B, M_), np.float32),
        "txt_labels": jnp.asarray(
            rng.integers(4, 512, (B, M_)).astype(np.int32)),
    }


def _dot_operand_dtypes(stablehlo_text):
    """[(lhs_dtype, rhs_dtype)] for every dot_general in the module."""
    out = []
    for m in DOT.finditer(stablehlo_text):
        out.append(tuple(t.split("x")[-1] for t in m.groups()))
    assert out, "no dot_general found — lowering format changed?"
    return out


def test_scoring_dots_are_bf16():
    """Every matmul in the jitted ITM scoring program takes bf16 operands
    (fp32 accumulation via the result type is fine and expected)."""
    model = UC2ForImageTextRetrieval(CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(np.random.default_rng(0))
    txt = jax.jit(
        lambda p, b: model.scores(p, b)).lower(params, batch).as_text()
    bad = [d for d in _dot_operand_dtypes(txt) if d != ("bf16", "bf16")]
    assert not bad, f"non-bf16 matmul operands in scoring: {bad}"


def test_mlm_grad_dots_are_bf16_and_emb_bwd_is_scatter():
    """The mlm grad program: (a) every dot runs on bf16 operands — the
    backward's dW/dx matmuls included; (b) the word-embedding gradient is
    a scatter-add of used rows, not a dense one-hot matmul (which would
    cost an extra 2·B·L·H·vocab FLOPs and show up here as a dot with a
    512-sized operand dim beyond the three legitimate LM-head dots)."""
    model = UC2ForPretraining(CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    batch = {**_batch(rng), **_mlm_extras(rng)}
    loss_fn = make_loss_fn(model, "mlm")

    def grad_fn(p, b, key):
        (_, aux), g = jax.value_and_grad(
            loss_fn, has_aux=True)(p, b, key)
        return g, aux

    txt = jax.jit(grad_fn).lower(
        params, batch, jax.random.PRNGKey(0)).as_text()
    bad = [d for d in _dot_operand_dtypes(txt) if d != ("bf16", "bf16")]
    assert not bad, f"non-bf16 matmul operands in the grad program: {bad}"
    assert "stablehlo.scatter" in txt, (
        "no scatter in the grad program — embedding bwd was rewritten?")
    # the only dots touching the vocab dim are the LM head's: logits fwd,
    # d(logits)·W^T, and the tied decoder dW — a 4th would be a one-hot
    # embedding bwd
    n_vocab_dots = sum(
        1 for m in DOT.finditer(txt)
        if any("512" in t.split("x")[:-1] for t in m.groups()))
    assert n_vocab_dots <= 3, (
        f"{n_vocab_dots} vocab-sized matmuls (expect ≤3: LM-head fwd, "
        "dx, tied dW) — embedding bwd turned into a one-hot matmul?")


def test_mrfr_and_nlvr2_grad_dots_are_bf16():
    """The other two fixed leak sites stay fixed: the tied
    RegionFeatureRegression output (mrfr) and the NLVR2 paired-attn
    CrossAttention scores einsum — both previously emitted f32 backward
    matmuls through the preferred_element_type=f32 cotangent (ops/mp.py)."""
    from uc2_tpu.models.finetune import UC2ForNlvr2

    rng = np.random.default_rng(2)
    model = UC2ForPretraining(CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = {**_batch(rng), **_mlm_extras(rng),
             "img_masks": jnp.asarray(rng.random((8, 8)) < 0.3),
             "feat_targets": jnp.asarray(
                 rng.standard_normal((8, 4, 16)).astype(np.float32))}
    loss_fn = make_loss_fn(model, "mrfr")
    txt = jax.jit(lambda p, b, k: jax.value_and_grad(
        loss_fn, has_aux=True)(p, b, k)[1]).lower(
        params, batch, jax.random.PRNGKey(0)).as_text()
    bad = [d for d in _dot_operand_dtypes(txt) if d != ("bf16", "bf16")]
    assert not bad, f"non-bf16 matmul operands in mrfr grad: {bad}"

    m3 = UC2ForNlvr2(CFG, fmt="paired-attn")
    p3 = m3.init_params(jax.random.PRNGKey(0))
    b3 = {**_batch(rng),
          "img_type_ids": jnp.asarray(
              np.where(np.arange(8) % 2, 2, 1)[:, None]
              * np.ones((1, 8), np.int32)),
          "targets": jnp.asarray(rng.integers(0, 2, (4,)).astype(np.int32))}
    txt = jax.jit(lambda p, b, k: jax.grad(lambda pp: jnp.mean(
        m3.loss(pp, b, deterministic=False, rngs={"dropout": k})))(p)
    ).lower(p3, b3, jax.random.PRNGKey(0)).as_text()
    bad = [d for d in _dot_operand_dtypes(txt) if d != ("bf16", "bf16")]
    assert not bad, f"non-bf16 matmul operands in nlvr2 grad: {bad}"


DOTFULL = re.compile(
    r"stablehlo\.dot_general [^,]+, [^,]+,"
    r"(?: batching_dims = \[([0-9, ]*)\] x \[[0-9, ]*\],)?"
    r" contracting_dims = \[([0-9, ]*)\] x \[[0-9, ]*\][^:]*:"
    r" \(tensor<([^>]*)>, tensor<([^>]*)>\) -> tensor<([^>]*)>")


def _hlo_dot_flops(stablehlo_text) -> int:
    """Σ 2·prod(out)·prod(contracting) over every dot_general."""
    import math
    total = 0
    for m in DOTFULL.finditer(stablehlo_text):
        _, cdims, lhs, _rhs, out = m.groups()
        lshape = [int(x) for x in lhs.split("x")[:-1]]
        oshape = [int(x) for x in out.split("x")[:-1]]
        cont = [int(x) for x in cdims.replace(" ", "").split(",") if x]
        total += (2 * math.prod(oshape or [1])
                  * math.prod(lshape[c] for c in cont))
    return total


def test_flops_model_matches_lowered_grad_program():
    """Cross-validates utils/flops.grad_flops_per_example — the model
    every MFU / implied-TF/s headline divides by (DESIGN.md post-mortems:
    'every absolute number needs a FLOPs cross-check') — against the
    ACTUAL lowered mlm grad program: Σ 2·prod(out)·prod(contract) over
    its dot_generals. Measured ratio 0.9998 at this config; the ±5% band
    catches both directions of drift — a remat/duplicate-compute
    regression inflates program FLOPs, a dead-code or model change
    deflates them — without tripping on elementwise-op noise (non-dot
    ops carry negligible FLOPs)."""
    model = UC2ForPretraining(CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    B, Lt, Nb, M_ = 8, 12, 8, 4
    batch = {**_batch(rng, B=B, Lt=Lt, Nb=Nb), **_mlm_extras(rng, B=B,
                                                             Lt=Lt, M_=M_)}
    loss_fn = make_loss_fn(model, "mlm")
    txt = jax.jit(lambda p, b, k: jax.value_and_grad(
        loss_fn, has_aux=True)(p, b, k)[1]).lower(
        params, batch, jax.random.PRNGKey(0)).as_text()
    from uc2_tpu.utils.flops import grad_flops_per_example
    got = _hlo_dot_flops(txt)
    want = B * grad_flops_per_example(Lt, Nb, M_, n_layers=2, H=64,
                                      F=128, V=512, img_dim=16)
    assert 0.95 < got / want < 1.05, (got, want, got / want)


def test_flops_per_pair_matches_lowered_scoring_program():
    """Same cross-check for the scoring side: bench.py's per-bucket MFU
    fields divide measured rates by encoder_fwd_flops_per_pair — pin that
    model to the actual lowered scoring program. The program additionally
    carries the img/pos embedding projections, pooler and rank head the
    model deliberately omits (sub-% at production shapes, a few % at this
    tiny config), so the band is one-sided: the program may exceed the
    model slightly, never undershoot it."""
    from uc2_tpu.utils.flops import encoder_fwd_flops_per_pair
    model = UC2ForImageTextRetrieval(CFG)
    params = model.init_params(jax.random.PRNGKey(0))
    B, Lt, Nb = 8, 12, 8
    batch = _batch(np.random.default_rng(3), B=B, Lt=Lt, Nb=Nb)
    txt = jax.jit(
        lambda p, b: model.scores(p, b)).lower(params, batch).as_text()
    got = _hlo_dot_flops(txt)
    want = B * encoder_fwd_flops_per_pair(Lt + Nb, n_layers=2, H=64, F=128)
    assert 1.0 <= got / want < 1.15, (got, want, got / want)


def test_fp32_mode_has_no_bf16_dots():
    """The inverse guard: dtype=float32 (the fp32 parity configuration)
    must not silently downcast any matmul — parity tests depend on it."""
    cfg = CFG.replace(dtype="float32")
    model = UC2ForImageTextRetrieval(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    batch = _batch(np.random.default_rng(1))
    txt = jax.jit(
        lambda p, b: model.scores(p, b)).lower(params, batch).as_text()
    bad = [d for d in _dot_operand_dtypes(txt) if d != ("f32", "f32")]
    assert not bad, f"non-f32 matmul operands in fp32 mode: {bad}"
