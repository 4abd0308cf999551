"""Jitted train/eval steps for every task.

Reference hot loop: pretrain.py:514-648 (forward → per-task loss reduction →
amp backward → flattened NCCL all-reduce → clip → AdamW step). Here each
task is ONE jitted function: forward + loss + grad + psum (inserted by GSPMD
from the batch sharding) + AdamW update, all fused by XLA. Per-task loss
scalers disappear (bf16 needs none); the per-task *reductions* are preserved
exactly (mean over unreduced elements; vmlm-soft ×1000, pretrain.py:549-550;
ITM+OT combination, :524-548).

Gradient accumulation: batches may carry a leading micro-batch axis
[A, B, ...]; the step lax.scan's over it accumulating grads — semantically
the reference's ``gradient_accumulation_steps`` without leaving the device.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from uc2_tpu.models.pretraining import UC2ForPretraining


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any


def create_train_state(params, tx: optax.GradientTransformation) -> TrainState:
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params))


# ------------------------------------------------------------ task losses
def make_loss_fn(model: UC2ForPretraining, task: str,
                 valid_ids: Optional[np.ndarray] = None,
                 itm_ot_lambda: float = 0.1, ot_pos_only: bool = False
                 ) -> Callable:
    """Returns loss_fn(params, batch, rng) → (scalar loss, metrics dict).

    Reductions follow pretrain.py:524-553: flat mean over the unreduced
    loss elements; vmlm-soft scaled ×1000; itm = xe.mean() + λ·ot.
    """
    base = task.split("_")[0]

    def lf(params, batch, rng):
        rngs = {"dropout": rng} if rng is not None else None
        det = rng is None
        if base in ("mlm", "tlm"):
            s, n = model.forward_mlm(params, batch, det, rngs)
            loss = s / jnp.maximum(n, 1.0)
            return loss, {"loss": loss, "n_units": n}
        if base == "tlm-ni":
            s, n = model.forward_mlm(params, batch, det, rngs,
                                     with_image=False)
            loss = s / jnp.maximum(n, 1.0)
            return loss, {"loss": loss, "n_units": n}
        if base in ("mmxlm", "vmlm"):
            s, n = model.forward_mmxlm(params, batch, det, rngs)
            loss = s / jnp.maximum(n, 1.0)
            return loss, {"loss": loss, "n_units": n}
        if base in ("mmxlm-soft", "vmlm-soft"):
            s, n = model.forward_mmxlm_soft(params, batch, valid_ids, det,
                                            rngs)
            loss = 1000.0 * s / jnp.maximum(n, 1.0)
            return loss, {"loss": loss, "n_units": n}
        if base == "mrfr":
            s, n = model.forward_mrfr(params, batch, det, rngs)
            loss = s / jnp.maximum(n, 1.0)
            return loss, {"loss": loss, "n_units": n}
        if base == "mrm-nce":
            s, n, correct = model.forward_mrm_nce(params, batch, det, rngs)
            loss = s / jnp.maximum(n, 1.0)
            return loss, {"loss": loss, "n_units": n,
                          "acc": correct / jnp.maximum(n, 1.0)}
        if base in ("mrc", "mrc-kl"):
            s, n = model.forward_mrc(params, batch, kl=(base == "mrc-kl"),
                                     deterministic=det, rngs=rngs)
            loss = s / jnp.maximum(n, 1.0)
            return loss, {"loss": loss, "n_units": n}
        if base == "itm":
            s, b, ot = model.forward_itm(params, batch, det, rngs,
                                         compute_ot=False)
            loss = s / jnp.maximum(b, 1)
            return loss, {"loss": loss, "n_units": jnp.asarray(b)}
        if base == "itm-ot":
            s, b, ot = model.forward_itm(params, batch, det, rngs,
                                         compute_ot=True)
            xe = s / jnp.maximum(b, 1)
            pos = batch["targets"] == 1
            neg = batch["targets"] == 0
            n_pos = jnp.sum(pos)
            n_neg = jnp.sum(neg)
            if ot_pos_only:
                ot_loss = jnp.sum(jnp.where(pos, ot, 0.0)) / jnp.maximum(
                    n_pos, 1)
            else:
                # (Σpos − Σneg) / (n_pos + n_neg), pretrain.py:531-534
                ot_loss = (jnp.sum(jnp.where(pos, ot, 0.0))
                           - jnp.sum(jnp.where(neg, ot, 0.0))
                           ) / jnp.maximum(n_pos + n_neg, 1)
            loss = xe + itm_ot_lambda * ot_loss
            return loss, {"loss": loss, "xe": xe, "ot": ot_loss,
                          "ot_pos": jnp.sum(jnp.where(pos, ot, 0.0))
                          / jnp.maximum(n_pos, 1),
                          "ot_neg": jnp.sum(jnp.where(neg, ot, 0.0))
                          / jnp.maximum(n_neg, 1),
                          "n_units": jnp.asarray(b)}
        raise ValueError(f"unknown task {task}")

    return lf


# ------------------------------------------------------------- train step
def _is_stacked(batch) -> bool:
    """True when the batch carries a leading [accum] micro-batch axis."""
    return (isinstance(batch, dict) and "input_ids" in batch
            and batch["input_ids"].ndim == 3)


def accumulated_grads(loss_fn: Callable, params, batch, rng):
    """(grads, metrics) for a plain batch, or the mean over a leading
    [accum] micro-batch axis via lax.scan — gradient accumulation that
    never leaves the device (reference gradient_accumulation_steps +
    delay_unscale, pretrain.py:556-566)."""

    def micro_grads(mb, r):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, mb, r)
        return grads, metrics

    if not _is_stacked(batch):
        return micro_grads(batch, rng)

    A = batch["input_ids"].shape[0]
    rngs = jax.random.split(rng, A)

    def body(carry, xs):
        g_acc, m_acc = carry
        mb, r = xs
        g, m = micro_grads(mb, r)
        g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
        m_acc = jax.tree_util.tree_map(jnp.add, m_acc, m)
        return (g_acc, m_acc), None

    zero_g = jax.tree_util.tree_map(lambda p: jnp.zeros_like(p), params)
    mb0 = jax.tree_util.tree_map(lambda x: x[0], batch)
    _, m0 = jax.eval_shape(lambda: micro_grads(mb0, rngs[0]))
    zero_m = jax.tree_util.tree_map(
        lambda s: jnp.zeros(s.shape, s.dtype), m0)
    (grads, metrics), _ = jax.lax.scan(body, (zero_g, zero_m), (batch, rngs))
    grads = jax.tree_util.tree_map(lambda g: g / A, grads)
    metrics = jax.tree_util.tree_map(lambda m: m / A, metrics)
    return grads, metrics


def zero1_out_shardings(mesh, params, opt_state):
    """Output-sharding pytrees that pin the ZeRO-1 step's layout:
    ``{"fused": ..., "split": ...}`` for jitting make_train_step /
    make_split_train_step's apply respectively.

    Without an explicit out_shardings, ZeRO-1 silently becomes ZeRO-3:
    GSPMD propagates the data-sharded moment layout onto the OUTPUT
    params (measured on the 8-device mesh: params in P('model', None)
    came back P('data')), so every later grad step all-gathers the
    weights per layer. with_sharding_constraint inside the function is
    NOT equivalent: it compiles to 2x all-gather traffic where
    out_shardings compiles to the textbook 1x — shard-local elementwise
    update, ONE param-sized gather of the updates, moments never
    materialized full-size (pinned by tests/test_zero1.py HLO
    accounting)."""
    from jax.sharding import NamedSharding, PartitionSpec
    from uc2_tpu.parallel import mesh as M
    p_sh = M.param_shardings(mesh, params)
    o_sh = M.opt_shardings(mesh, opt_state)
    rep = NamedSharding(mesh, PartitionSpec())
    return {"split": (p_sh, o_sh),
            "fused": (TrainState(step=rep, params=p_sh, opt_state=o_sh),
                      None)}


def make_train_step(model: UC2ForPretraining, task: str,
                    tx: optax.GradientTransformation,
                    valid_ids: Optional[np.ndarray] = None,
                    itm_ot_lambda: float = 0.1, ot_pos_only: bool = False,
                    donate: bool = True) -> Callable:
    """fn(state, batch, rng) → (state, metrics). Jit with appropriate
    shardings at the call site (see parallel/mesh.py); under ZeRO-1 pass
    ``out_shardings=zero1_out_shardings(...)["fused"]`` to the jit.
    Batches with a leading [accum] axis scan-accumulate in-step."""
    loss_fn = make_loss_fn(model, task, valid_ids, itm_ot_lambda, ot_pos_only)

    def step_fn(state: TrainState, batch, rng):
        grads, metrics = accumulated_grads(loss_fn, state.params, batch, rng)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        return TrainState(state.step + 1, params, opt_state), metrics

    return step_fn


def make_split_train_step(model: UC2ForPretraining, task: str,
                          tx: optax.GradientTransformation,
                          valid_ids: Optional[np.ndarray] = None,
                          itm_ot_lambda: float = 0.1,
                          ot_pos_only: bool = False):
    """(grad_fn, apply_fn) as two separately-jittable programs.

    Functionally identical to make_train_step but split at the grad/update
    boundary: two smaller XLA programs (jit apply_fn with
    donate_argnums=(0, 1, 2) for in-place updates). Exists because some
    runtimes (this image's axon remote compiler) choke on the fused
    program; also halves peak temp memory via donation.
    """
    loss_fn = make_loss_fn(model, task, valid_ids, itm_ot_lambda, ot_pos_only)

    def grad_fn(params, batch, rng):
        grads, metrics = accumulated_grads(loss_fn, params, batch, rng)
        metrics["grad_norm"] = optax.global_norm(grads)
        return grads, metrics

    def apply_fn(grads, opt_state, params):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    return grad_fn, apply_fn


def make_eval_step(model: UC2ForPretraining, task: str,
                   valid_ids: Optional[np.ndarray] = None) -> Callable:
    """Validation forward: returns per-task metrics (loss + accuracy where
    the reference computes one, pretrain.py:658-1051)."""

    def ev(params, batch):
        base = task.split("_")[0]
        if base in ("mlm", "tlm", "tlm-ni", "mmxlm", "vmlm"):
            with_image = base != "tlm-ni"
            logits = model.forward_mlm(
                params, batch, True, None, with_image=with_image,
                compute_loss=False) if base in ("mlm", "tlm", "tlm-ni") else \
                model.forward_mmxlm(params, batch, True, None,
                                    compute_loss=False)
            labels = batch["txt_labels"]
            w = batch["masked_weight"]
            from uc2_tpu.models.heads import cross_entropy_with_logits
            loss = jnp.sum(cross_entropy_with_logits(logits, labels, w))
            correct = jnp.sum((jnp.argmax(logits, -1) == labels) * w)
            return {"loss": loss, "n_correct": correct, "n_word": jnp.sum(w)}
        if base in ("mmxlm-soft", "vmlm-soft"):
            logits = model.forward_mmxlm_soft(params, batch, valid_ids, True,
                                              None, compute_loss=False)
            t = batch["label_targets"]
            w = batch["masked_weight"]
            logp = jax.nn.log_softmax(logits, -1)
            elem = jnp.where(t > 0, t * (jnp.log(jnp.clip(t, 1e-30)) - logp),
                             0.0)
            loss = jnp.sum(elem * w[:, :, None])
            # argmax agreement (pretrain.py:700-706)
            correct = jnp.sum((jnp.argmax(logits, -1) == jnp.argmax(t, -1))
                              * w * (jnp.sum(t, -1) > 0))
            return {"loss": loss, "n_correct": correct, "n_word": jnp.sum(w)}
        if base == "mrfr":
            pred = model.forward_mrfr(params, batch, True, None,
                                      compute_loss=False)
            w = batch["masked_weight"][:, :, None]
            loss = jnp.sum(jnp.square(pred - batch["feat_targets"]) * w)
            return {"loss": loss, "n_feat": jnp.sum(batch["masked_weight"])}
        if base == "mrm-nce":
            # acc + per-slot L2/cosine, matching the reference's
            # validate_mrm_nce scalars (pretrain.py:901-943)
            s, n, correct, l2, cos = model.forward_mrm_nce(
                params, batch, True, None, with_stats=True)
            return {"loss": s, "n_correct": correct, "n_feat": n,
                    "l2_sum": l2, "cos_sum": cos}
        if base in ("mrc", "mrc-kl"):
            logits = model.forward_mrc(params, batch, kl="kl" in base,
                                       deterministic=True, rngs=None,
                                       compute_loss=False)
            w = batch["masked_weight"]
            t = batch["label_targets"]
            labels = jnp.argmax(t[..., 1:], -1) + 1
            correct = jnp.sum((jnp.argmax(logits[..., 1:], -1) + 1 == labels)
                              * w)
            if "kl" in base:
                logp = jax.nn.log_softmax(logits, -1)
                elem = jnp.where(t > 0,
                                 t * (jnp.log(jnp.clip(t, 1e-30)) - logp), 0.0)
                loss = jnp.sum(elem * w[:, :, None])
            else:
                from uc2_tpu.models.heads import cross_entropy_with_logits
                loss = jnp.sum(cross_entropy_with_logits(logits, labels, w))
            return {"loss": loss, "n_correct": correct, "n_feat": jnp.sum(w)}
        if base.startswith("itm"):
            scores, ot = model.forward_itm(params, batch, True, None,
                                           compute_ot=base == "itm-ot",
                                           compute_loss=False)
            from uc2_tpu.models.heads import cross_entropy_with_logits
            # exclude trailing-batch padding rows (ex_mask from the collator)
            w = batch.get("ex_mask",
                          jnp.ones(scores.shape[0], jnp.float32))
            loss = jnp.sum(cross_entropy_with_logits(scores,
                                                     batch["targets"]) * w)
            correct = jnp.sum(
                (jnp.argmax(scores, -1) == batch["targets"]) * w)
            out = {"loss": loss, "n_correct": correct, "n_ex": jnp.sum(w)}
            if ot is not None:
                pos = (batch["targets"] == 1) & (w > 0)
                neg = (batch["targets"] == 0) & (w > 0)
                out["ot_pos"] = jnp.sum(jnp.where(pos, ot, 0.0))
                out["ot_neg"] = jnp.sum(jnp.where(neg, ot, 0.0))
                out["n_pos"] = jnp.sum(pos)
                out["n_neg"] = jnp.sum(neg)
            return out
        raise ValueError(base)

    return ev
