"""Optimizer + LR schedules (optax).

Reference: optim/adamw.py (HF decoupled-weight-decay AdamW — optax.adamw is
the same algorithm), optim/misc.py:9-32 build_optimizer (two groups: decay vs
no-decay on bias/LayerNorm), :48-100 build_xlmr_optimizer (4 groups giving
pretrained XLM-R layers a smaller lr), optim/sched.py (warmup-linear, noam,
constant, MCAN VQA staircase).

The reference assigns the LR *manually into param_group['lr']* each step
(pretrain.py:574-576); here schedules are pure functions of the step baked
into the optax chain — same values, no mutation.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Optional, Sequence

import jax.numpy as jnp
import optax


# -------------------------------------------------------------- schedules
def warmup_linear(lr: float, warmup: int, total: int) -> Callable:
    """reference optim/sched.py:13-16 (+ the 1e-8 floor at :49-51)."""
    def f(step):
        step = jnp.asarray(step, jnp.float32)
        w = jnp.maximum(warmup, 1)
        warm = step / w
        decay = jnp.maximum(0.0, (total - step) / jnp.maximum(total - warmup,
                                                              1))
        return jnp.maximum(lr * jnp.where(step < warmup, warm, decay), 1e-8)
    return f


def noam(lr: float, warmup: int) -> Callable:
    """invsqrt schedule (reference optim/sched.py:7-10)."""
    def f(step):
        step = jnp.asarray(step, jnp.float32)
        w = jnp.maximum(warmup, 1)
        return jnp.maximum(
            lr * jnp.where(step <= w, step / w,
                           (w ** 0.5) * jnp.maximum(step, 1.0) ** -0.5),
            1e-8)
    return f


def constant(lr: float) -> Callable:
    return lambda step: jnp.asarray(lr, jnp.float32)


def vqa_schedule(lr: float, warm_int: int, decay_int: int, decay_start: int,
                 decay_rate: float) -> Callable:
    """MCAN staircase (reference optim/sched.py:20-31)."""
    def f(step):
        step = jnp.asarray(step, jnp.float32)
        num_decay = jnp.ceil((step - decay_start) / decay_int)
        mult = jnp.where(
            step < warm_int, 0.25,
            jnp.where(step < 2 * warm_int, 0.5,
                      jnp.where(step < 3 * warm_int, 0.75,
                                jnp.where(step >= decay_start,
                                          decay_rate ** num_decay, 1.0))))
        return jnp.maximum(lr * mult, 1e-8)
    return f


def get_lr_schedule(decay: str, lr: float, warmup_steps: int = 0,
                    num_train_steps: int = 0, **vqa_kw) -> Callable:
    """reference get_lr_sched dispatch (optim/sched.py:35-52)."""
    if decay == "linear":
        return warmup_linear(lr, warmup_steps, num_train_steps)
    if decay == "invsqrt":
        return noam(lr, warmup_steps)
    if decay == "constant":
        return constant(lr)
    if decay == "vqa":
        return vqa_schedule(lr, vqa_kw["warm_int"], vqa_kw["decay_int"],
                            vqa_kw["decay_st"], vqa_kw["decay_rate"])
    raise ValueError(f"unknown decay {decay}")


# ------------------------------------------------------------- param masks
_NO_DECAY = re.compile(r"(LayerNorm|layer_norm)")


def path_str(path) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in path)


def decay_mask(params) -> Any:
    """True where weight decay applies: everything except biases and
    LayerNorm params (reference optim/misc.py:11-19)."""
    import jax
    def f(path, _):
        p = path_str(path)
        leaf = p.rsplit("/", 1)[-1]
        return not (leaf == "bias" or _NO_DECAY.search(p))
    return __import__("jax").tree_util.tree_map_with_path(f, params)


def pretrained_mask(params, load_layer: Optional[int] = None) -> Any:
    """True for params initialized from XLM-R (embeddings + encoder layers
    ≤ load_layer, or just embeddings when load_layer is None) — the group
    that gets xlmr_lr (reference optim/misc.py:34-100)."""
    import jax
    def f(path, _):
        p = path_str(path)
        if "roberta/embeddings" in p:
            return True
        if load_layer is not None:
            m = re.search(r"roberta/layer_(\d+)/", p)
            if m and int(m.group(1)) <= load_layer:
                return True
        return False
    return jax.tree_util.tree_map_with_path(f, params)


# -------------------------------------------------------------- optimizers
def build_optimizer(params, learning_rate_fn: Callable,
                    weight_decay: float = 0.01,
                    betas: Sequence[float] = (0.9, 0.98),
                    eps: float = 1e-6,
                    grad_norm: float = -1.0,
                    optim: str = "adamw") -> optax.GradientTransformation:
    """Optimizer with bias/LN exempt from decay + optional global-norm
    clipping (reference build_optimizer optim/misc.py:9-32 — adam / adamax /
    adamw selected by ``--optim``; clip at pretrain.py:610). The published
    configs only exercise adamw (config/uc2_pretrain.json:23); adam/adamax
    here share the decoupled masked decay rather than torch's coupled L2.
    """
    chain = []
    if grad_norm and grad_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_norm))
    if optim == "adamw":
        chain.append(optax.adamw(
            learning_rate=learning_rate_fn, b1=betas[0], b2=betas[1],
            eps=eps, weight_decay=weight_decay, mask=decay_mask(params)))
    elif optim in ("adam", "adamax"):
        scale_by = (optax.scale_by_adam if optim == "adam"
                    else optax.scale_by_adamax)
        # same composition optax.adamw uses internally: scale_by_* →
        # +wd·param → ×(−lr)
        chain.append(optax.chain(
            scale_by(b1=betas[0], b2=betas[1], eps=eps),
            optax.add_decayed_weights(weight_decay,
                                      mask=decay_mask(params)),
            optax.scale_by_learning_rate(learning_rate_fn)))
    else:
        raise ValueError(f"invalid optimizer {optim!r}")
    return optax.chain(*chain)


def build_xlmr_optimizer(params, learning_rate_fn: Callable,
                         xlmr_lr_fn: Callable, weight_decay: float = 0.01,
                         betas: Sequence[float] = (0.9, 0.98),
                         eps: float = 1e-6, grad_norm: float = -1.0,
                         load_layer: Optional[int] = None,
                         optim: str = "adamw"
                         ) -> optax.GradientTransformation:
    """Two-LR optimizer: pretrained XLM-R subtree at xlmr_lr, the rest at
    the main lr (reference build_xlmr_optimizer, optim/misc.py:48-100 — same
    adam/adamax/adamw choice as build_optimizer — driven by --separate_lr at
    itm.py:216-219)."""
    import jax
    pre = pretrained_mask(params, load_layer)
    labels = jax.tree_util.tree_map(lambda is_pre: "pre" if is_pre else "new",
                                    pre)
    def adamw_for(lr_fn):
        if optim == "adamw":
            return optax.adamw(learning_rate=lr_fn, b1=betas[0], b2=betas[1],
                               eps=eps, weight_decay=weight_decay,
                               mask=decay_mask(params))
        if optim not in ("adam", "adamax"):
            raise ValueError(f"invalid optimizer {optim!r}")
        scale_by = (optax.scale_by_adam if optim == "adam"
                    else optax.scale_by_adamax)
        return optax.chain(
            scale_by(b1=betas[0], b2=betas[1], eps=eps),
            optax.add_decayed_weights(weight_decay,
                                      mask=decay_mask(params)),
            optax.scale_by_learning_rate(lr_fn))
    chain = []
    if grad_norm and grad_norm > 0:
        chain.append(optax.clip_by_global_norm(grad_norm))
    chain.append(optax.multi_transform(
        {"pre": adamw_for(xlmr_lr_fn), "new": adamw_for(learning_rate_fn)},
        labels))
    return optax.chain(*chain)
