"""UC2 pretraining model: encoder + task heads + per-task forward/loss fns.

Reference: VLXLMRForPretraining (model/model.py:460-775) and the loss
reductions in the driver (pretrain.py:514-553).

Composition is functional: the param tree is
``{"roberta": <encoder>, "cls": ..., "feat_regress": ...,
"region_classifier": ..., "itm_output": ...}`` and weight tying (LM decoder ↔
word embeddings, region regression ↔ img_linear) happens by passing the tied
subtree arrays into head applies — the JAX analog of the reference's parameter
aliasing.

TPU-native masked-head design: the reference gathers a *variable* number of
masked positions across the batch (`_compute_masked_hidden`,
model/model.py:653-657) — a dynamic shape. Here every batch carries a
static-size index array ``masked_pos [B, M]`` (+ ``masked_weight`` 0/1) built
by the collator; heads run on the gathered ``[B, M, H]`` block and losses are
weighted sums. Identical math, fully static shapes.

Batch schema (all collators produce a superset of):
  input_ids    [B, Lt]   position_ids [B, Lt] (tlm only, else None)
  img_feat     [B, Nb, 2048]   img_pos_feat [B, Nb, 7]
  attn_mask    [B, Lt+Nb]  (1 = valid)
  img_masks    [B, Nb] bool (mrm-family tasks)
  masked_pos   [B, M] int32 — joint-sequence indices of prediction slots
  masked_weight[B, M] float32 — 1 for real slots
  txt_labels   [B, M] int32 (mlm/tlm/mmxlm/vmlm: token targets)
  label_targets[B, M, C] float32 (soft targets; mrc/soft-mrtm)
  feat_targets [B, M, 2048] (mrfr)
  targets      [B] int (itm)
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from uc2_tpu.config import UC2Config
from uc2_tpu.models.encoder import UC2Model
from uc2_tpu.models import heads as H
from uc2_tpu.models.ot import optimal_transport_dist


def gather_slots(seq: jnp.ndarray, pos: jnp.ndarray) -> jnp.ndarray:
    """seq [B, L, Hd], pos [B, M] -> [B, M, Hd]."""
    return jnp.take_along_axis(seq, pos[:, :, None], axis=1)


class UC2ForPretraining:
    """Functional composition of encoder and pretraining heads.

    Not an nn.Module on purpose: task dispatch stays in Python (each task is
    its own jitted step; reference dispatches inside forward,
    model/model.py:495-568), and tying is explicit.
    """

    def __init__(self, config: UC2Config, ot_pos_only: bool = False,
                 nce_temp: float = 1.0, lm_ce_chunks: int = 0):
        self.config = config
        self.ot_pos_only = ot_pos_only
        self.nce_temp = nce_temp
        # >0 → MLM CE streams the 250k-vocab decoder in chunks (identical
        # values, O(N·V/chunks) memory; heads.chunked_softmax_cross_entropy)
        self.lm_ce_chunks = lm_ce_chunks
        self.encoder = UC2Model(config)
        self.cls = H.RobertaLMHead(config)
        self.feat_regress = H.RegionFeatureRegression(config)
        self.region_classifier = H.RegionClassification(config)
        self.itm_output = H.ItmHead(config)
        self.nce_output = H.NceHead(config)

    # ------------------------------------------------------------------ init
    def init_params(self, rng: jax.Array, txt_len: int = 8,
                    num_bb: int = 4) -> Dict[str, Any]:
        cfg = self.config
        r_enc, r_cls, r_fr, r_rc, r_itm = jax.random.split(rng, 5)
        ids = jnp.ones((1, txt_len), jnp.int32)
        feat = jnp.zeros((1, num_bb, cfg.img_dim))
        pos = jnp.zeros((1, num_bb, 7))
        mask = jnp.ones((1, txt_len + num_bb), jnp.int32)
        enc_vars = self.encoder.init(
            {"params": r_enc}, input_ids=ids, img_feat=feat, img_pos_feat=pos,
            attn_mask=mask, img_masks=jnp.zeros((1, num_bb), jnp.int32))
        h = jnp.zeros((1, 2, cfg.hidden_size))
        pooled = jnp.zeros((1, cfg.hidden_size))
        emb_table = enc_vars["params"]["embeddings"]["word_embeddings"]
        img_kernel = enc_vars["params"]["img_embeddings"]["img_linear"]["kernel"]
        return {
            "roberta": enc_vars["params"],
            "cls": self.cls.init({"params": r_cls}, h, emb_table)["params"],
            "feat_regress": self.feat_regress.init(
                {"params": r_fr}, h, img_kernel)["params"],
            "region_classifier": self.region_classifier.init(
                {"params": r_rc}, h)["params"],
            "itm_output": self.itm_output.init({"params": r_itm}, pooled)["params"],
            "nce_output": self.nce_output.init(
                {"params": jax.random.fold_in(r_itm, 1)}, h)["params"],
        }

    # ------------------------------------------------------------- encoding
    def _encode(self, params, batch, deterministic, rngs,
                with_image=True, img_masks=None):
        return self.encoder.apply(
            {"params": params["roberta"]},
            input_ids=batch.get("input_ids"),
            position_ids=batch.get("position_ids"),
            img_feat=batch.get("img_feat") if with_image else None,
            img_pos_feat=batch.get("img_pos_feat") if with_image else None,
            attn_mask=batch["attn_mask"],
            img_masks=img_masks,
            img_type_ids=batch.get("img_type_ids"),
            deterministic=deterministic,
            rngs=rngs,
        )

    def _lm_logits(self, params, h, valid_ids=None):
        emb_table = params["roberta"]["embeddings"]["word_embeddings"]
        return self.cls.apply({"params": params["cls"]}, h, emb_table,
                              valid_ids)

    # ----------------------------------------------------------------- MLM
    def forward_mlm(self, params, batch, deterministic=True, rngs=None,
                    with_image=True, compute_loss=True):
        """MLM / TLM (with image unless `tlm-ni`): predict masked text tokens.

        Reference model/model.py:571-598. Returns (loss_sum, n_slots) so the
        caller reduces as mean-over-masked (reference reduces with .mean()).
        """
        seq, _ = self._encode(params, batch, deterministic, rngs,
                              with_image=with_image)
        h = gather_slots(seq, batch["masked_pos"])
        if compute_loss and self.lm_ce_chunks:
            return self._chunked_lm_loss(params, h, batch)
        logits = self._lm_logits(params, h)
        if not compute_loss:
            return logits
        loss = H.cross_entropy_with_logits(
            logits, batch["txt_labels"], batch["masked_weight"])
        return jnp.sum(loss), jnp.sum(batch["masked_weight"])

    def _chunked_lm_loss(self, params, h, batch):
        B, M, _ = h.shape
        emb = params["roberta"]["embeddings"]["word_embeddings"]
        x = self.cls.apply({"params": params["cls"]}, h, emb,
                           transform_only=True)
        loss = H.chunked_softmax_cross_entropy(
            x.reshape(B * M, -1), emb, params["cls"]["bias"],
            batch["txt_labels"].reshape(B * M),
            batch["masked_weight"].reshape(B * M),
            n_chunks=self.lm_ce_chunks)
        return jnp.sum(loss), jnp.sum(batch["masked_weight"])

    # --------------------------------------------------------- MMXLM / VMLM
    def forward_mmxlm(self, params, batch, deterministic=True, rngs=None,
                      compute_loss=True):
        """Masked-region-to-token, hard targets (reference model/model.py:600-625).

        Image regions are masked (mask_embedding added) and the LM head
        predicts label-word tokens at those slots; mmxlm additionally masks
        text (all folded into masked_pos/txt_labels by the collator).
        """
        seq, _ = self._encode(params, batch, deterministic, rngs,
                              img_masks=batch["img_masks"])
        h = gather_slots(seq, batch["masked_pos"])
        if compute_loss and self.lm_ce_chunks:
            return self._chunked_lm_loss(params, h, batch)
        logits = self._lm_logits(params, h)
        if not compute_loss:
            return logits
        loss = H.cross_entropy_with_logits(
            logits, batch["txt_labels"], batch["masked_weight"])
        return jnp.sum(loss), jnp.sum(batch["masked_weight"])

    def forward_mmxlm_soft(self, params, batch, valid_ids,
                           deterministic=True, rngs=None, compute_loss=True):
        """Soft MRTM: KL between label-token distribution and LM logits
        restricted to VALID_XLMR_TOKEN_IDS (reference model/model.py:627-651).

        The reference reduces with .mean() over (slots × valid-vocab); we
        return (elementwise_sum, n_elements) to match exactly.
        """
        seq, _ = self._encode(params, batch, deterministic, rngs,
                              img_masks=batch["img_masks"])
        h = gather_slots(seq, batch["masked_pos"])
        logits = self._lm_logits(params, h, valid_ids=valid_ids)
        if not compute_loss:
            return logits
        logp = jax.nn.log_softmax(logits, axis=-1)
        t = batch["label_targets"].astype(jnp.float32)
        elem = jnp.where(t > 0, t * (jnp.log(jnp.clip(t, 1e-30)) - logp), 0.0)
        elem = elem * batch["masked_weight"][:, :, None]
        n = jnp.sum(batch["masked_weight"]) * logits.shape[-1]
        return jnp.sum(elem), n

    # ---------------------------------------------------------------- MRFR
    def forward_mrfr(self, params, batch, deterministic=True, rngs=None,
                     compute_loss=True):
        """Masked-region feature regression (reference model/model.py:668-688).

        Reduction matches the reference's .mean() over (slots × 2048).
        """
        seq, _ = self._encode(params, batch, deterministic, rngs,
                              img_masks=batch["img_masks"])
        h = gather_slots(seq, batch["masked_pos"])
        img_kernel = params["roberta"]["img_embeddings"]["img_linear"]["kernel"]
        pred = self.feat_regress.apply(
            {"params": params["feat_regress"]}, h, img_kernel)
        if not compute_loss:
            return pred
        err = jnp.square(pred.astype(jnp.float32)
                         - batch["feat_targets"].astype(jnp.float32))
        err = err * batch["masked_weight"][:, :, None]
        n = jnp.sum(batch["masked_weight"]) * pred.shape[-1]
        return jnp.sum(err), n

    # -------------------------------------------------------------- MRM-NCE
    def forward_mrm_nce(self, params, batch, deterministic=True, rngs=None,
                        compute_loss=True, with_stats=False):
        """Masked-region contrastive objective (completes the reference's
        unimplemented mrm-nce, model/model.py:1237): project masked-slot
        hiddens to feature space; CE over [own target | other in-batch
        targets | sampled negative features] by dot-product similarity.

        Returns (loss_sum, n_slots, n_correct); with ``with_stats`` also
        the per-slot L2-distance and cosine-similarity sums the
        reference's validate_mrm_nce logs (pretrain.py:901-943).
        """
        seq, _ = self._encode(params, batch, deterministic, rngs,
                              img_masks=batch["img_masks"])
        h = gather_slots(seq, batch["masked_pos"])          # [B, M, H]
        pred = self.nce_output.apply({"params": params["nce_output"]}, h)
        B, M, D = pred.shape
        pred = pred.reshape(B * M, D).astype(jnp.float32)
        w = batch["masked_weight"].reshape(B * M)
        targets = batch["feat_targets"].reshape(B * M, D).astype(jnp.float32)
        negs = batch["neg_feats"].astype(jnp.float32)       # [N, D]
        cands = jnp.concatenate([targets, negs], axis=0)
        logits = pred @ cands.T / self.nce_temp             # [BM, BM+N]
        # padded slots are not valid candidates (their target rows are zero)
        col_mask = jnp.concatenate(
            [(1.0 - w) * -1e4, jnp.zeros(negs.shape[0])])
        logits = logits + col_mask[None, :]
        labels = jnp.arange(B * M)
        # own column must stay a valid candidate even for padded slots
        diag = jnp.einsum("nd,nd->n", pred, targets) / self.nce_temp
        logits = logits.at[labels, labels].set(diag)
        if not compute_loss:
            return logits
        loss = H.cross_entropy_with_logits(logits, labels, w)
        correct = jnp.sum((jnp.argmax(logits, -1) == labels) * w)
        if with_stats:
            l2 = jnp.sqrt(jnp.sum(jnp.square(pred - targets), -1) + 1e-12)
            cos = (jnp.einsum("nd,nd->n", pred, targets)
                   / (jnp.linalg.norm(pred, axis=-1)
                      * jnp.linalg.norm(targets, axis=-1) + 1e-12))
            return (jnp.sum(loss), jnp.sum(w), correct,
                    jnp.sum(l2 * w), jnp.sum(cos * w))
        return jnp.sum(loss), jnp.sum(w), correct

    # ----------------------------------------------------------------- MRC
    def forward_mrc(self, params, batch, kl: bool, deterministic=True,
                    rngs=None, compute_loss=True):
        """Masked-region classification over 1601 detector classes
        (reference model/model.py:738-775). ``kl`` selects mrc-kl."""
        seq, _ = self._encode(params, batch, deterministic, rngs,
                              img_masks=batch["img_masks"])
        h = gather_slots(seq, batch["masked_pos"])
        logits = self.region_classifier.apply(
            {"params": params["region_classifier"]}, h)
        if not compute_loss:
            return logits
        w = batch["masked_weight"]
        if kl:
            elem = H.kl_div_with_logits(
                logits, batch["label_targets"], elementwise=True)
            elem = elem * w[:, :, None]
            n = jnp.sum(w) * logits.shape[-1]
            return jnp.sum(elem), n
        # hard CE: target = argmax over non-background classes, shifted by 1
        # (reference model/model.py:768-772)
        labels = jnp.argmax(batch["label_targets"][..., 1:], axis=-1) + 1
        loss = H.cross_entropy_with_logits(logits, labels, w)
        return jnp.sum(loss), jnp.sum(w)

    # ----------------------------------------------------------------- ITM
    def forward_itm(self, params, batch, deterministic=True, rngs=None,
                    compute_ot=False, compute_loss=True):
        """Image-text matching + optional OT alignment
        (reference model/model.py:690-735).

        In the static layout the OT scatter (reference model/model.py:701-727)
        is a plain slice: text block at seq[:, :Lt], image at seq[:, Lt:].
        Returns (itm_loss_sum, B, ot_dist [B] or None).
        """
        seq, pooled = self._encode(params, batch, deterministic, rngs)
        scores = self.itm_output.apply({"params": params["itm_output"]}, pooled)
        ot_dist = None
        if compute_ot:
            tl = batch["input_ids"].shape[1]
            txt_emb = seq[:, :tl]
            img_emb = seq[:, tl:]
            txt_pad = batch["attn_mask"][:, :tl] == 0
            img_pad = batch["attn_mask"][:, tl:] == 0
            ot_dist = optimal_transport_dist(txt_emb, img_emb, txt_pad, img_pad)
        if not compute_loss:
            return scores, ot_dist
        loss = H.cross_entropy_with_logits(scores, batch["targets"])
        return jnp.sum(loss), scores.shape[0], ot_dist
