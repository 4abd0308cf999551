"""IPOT optimal-transport alignment distance (ITM regularizer).

Reference: model/ot.py (cost_matrix_cosine :8-18, ipot :32-63,
optimal_transport_dist :66-82). TPU-native notes:

  * The 50-iteration multiplicative IPOT update runs under ``lax.fori_loop``
    inside the jitted step (the reference runs it under @torch.no_grad();
    here the transport plan is wrapped in ``stop_gradient`` so gradients flow
    only through the cost matrix, identically).
  * All OT math is kept in fp32 ("fp32 island"): the update multiplies by
    1e4-scaled pad masks which underflow/overflow in bf16.
  * ``trace(C @ T)`` is contracted directly as einsum('bmn,bnm->b') —
    O(M·N) instead of the reference's O(M²·N) matmul-then-trace.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cost_matrix_cosine(x, y, eps: float = 1e-5):
    """Pairwise cosine distance [B,M,D],[B,N,D] -> [B,M,N]
    (reference model/ot.py:8-18; F.normalize semantics: x / max(||x||, eps))."""
    x = x.astype(jnp.float32)
    y = y.astype(jnp.float32)
    xn = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), eps)
    yn = y / jnp.maximum(jnp.linalg.norm(y, axis=-1, keepdims=True), eps)
    sim = jnp.einsum("bmd,bnd->bmn", xn, yn)
    return 1.0 - sim


def ipot(C, x_len, x_pad, y_len, y_pad, joint_pad,
         beta: float = 0.5, iteration: int = 50, k: int = 1):
    """Inexact proximal point OT (reference model/ot.py:32-63).

    C [B,M,N] fp32 cost; x_pad [B,M], y_pad [B,N] bool (True = pad);
    joint_pad [B,M,N]. Returns transport plan T [B,N,M] (note the transpose,
    matching the reference).
    """
    b, m, n = C.shape
    C = C.astype(jnp.float32)
    sigma = jnp.ones((b, m), jnp.float32) / x_len[:, None]
    sigma = jnp.where(x_pad, 0.0, sigma)[..., None]          # [B,M,1]
    joint_pad_T = jnp.swapaxes(joint_pad, 1, 2)              # [B,N,M]
    T = jnp.where(joint_pad_T, 0.0, jnp.ones((b, n, m), jnp.float32))
    A = jnp.where(joint_pad_T, 0.0, jnp.exp(-jnp.swapaxes(C, 1, 2) / beta))

    x_len_b = x_len[:, None, None]                           # [B,1,1]
    y_len_b = y_len[:, None, None]
    x_mask = (x_pad.astype(jnp.float32) * 1e4)[:, None, :]   # [B,1,M]
    y_mask = (y_pad.astype(jnp.float32) * 1e4)[:, None, :]   # [B,1,N]

    # The reference computes delta from the current sigma, then updates sigma,
    # inside the inner loop; the T update reuses the *last* delta. Replicate
    # that exact order.
    def outer_exact(_, carry):
        T, sigma = carry
        Q = A * T

        def inner(_, carry2):
            sigma, _ = carry2
            delta = 1.0 / (y_len_b * jnp.swapaxes(
                jnp.einsum("bnm,bmo->bno", Q, sigma), 1, 2) + y_mask)
            sigma_new = 1.0 / (x_len_b * jnp.einsum("bon,bnm->bom", delta, Q)
                               + x_mask)
            return jnp.swapaxes(sigma_new, 1, 2), delta

        sigma, delta = jax.lax.fori_loop(
            0, k, inner, (sigma, jnp.zeros((b, 1, n), jnp.float32)))
        T = jnp.swapaxes(delta, 1, 2) * Q * jnp.swapaxes(sigma, 1, 2)
        return T, sigma

    T, _ = jax.lax.fori_loop(0, iteration, outer_exact, (T, sigma))
    return jnp.where(joint_pad_T, 0.0, T)


def optimal_transport_dist(txt_emb, img_emb, txt_pad, img_pad,
                           beta: float = 0.5, iteration: int = 50, k: int = 1):
    """OT distance per example [B] (reference model/ot.py:66-82).

    txt_pad/img_pad: bool, True = padding. Gradients flow only through the
    cost matrix (transport plan is stop_gradient'ed, as in the reference's
    detach()).
    """
    cost = cost_matrix_cosine(txt_emb, img_emb)
    joint_pad = txt_pad[:, :, None] | img_pad[:, None, :]
    cost = jnp.where(joint_pad, 0.0, cost)

    txt_len = (txt_pad.shape[1] - jnp.sum(txt_pad, axis=1)).astype(jnp.float32)
    img_len = (img_pad.shape[1] - jnp.sum(img_pad, axis=1)).astype(jnp.float32)

    T = ipot(jax.lax.stop_gradient(cost), txt_len, txt_pad, img_len, img_pad,
             joint_pad, beta, iteration, k)
    distance = jnp.einsum("bmn,bnm->b", cost, jax.lax.stop_gradient(T))
    return distance
