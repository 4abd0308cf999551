"""Static-shape batch assembly (the TPU replacement for the reference's
ragged collators, data/mlm.py:761+, data/mrm.py:73+, data/itm.py:205+).

The reference pads each batch to its own max length and builds per-batch
``gather_index`` compaction — every batch is a new shape, every shape a new
CUDA kernel launch config. XLA compiles one program per shape, so here each
batch is padded to one of a small set of **bucket shapes** (Lt, Nb) and all
prediction slots are fixed-size index arrays:

  masked_pos    [B, M] int32 — joint-sequence indices ([txt | img] layout)
  masked_weight [B, M] float32 — 1 for live slots
  plus per-task targets aligned to those slots.

≤ len(buckets) compiled programs per task, zero dynamic shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


@dataclasses.dataclass(frozen=True)
class BucketSpec:
    """One static compilation shape."""
    txt_len: int          # Lt: combined text length incl. CLS/SEP
    num_bb: int           # Nb: max regions
    batch_size: int
    max_masked: int = 0   # M: prediction slots (0 → task has none)

    @property
    def joint_len(self):
        return self.txt_len + self.num_bb


def default_buckets(max_txt_len: int = 60, max_bb: int = 100,
                    tokens_per_batch: int = 10240,
                    mask_frac: float = 0.5) -> List[BucketSpec]:
    """Three shape buckets with ~equal token budget per batch, mirroring the
    reference's token-count batching (TokenBucketSampler, data/sampler.py:11
    with batch_size=10240 tokens) at fixed shapes.

    Batch sizes are rounded to multiples of 8 (MXU sublane alignment; the
    reference used size_multiple=8 for tensor cores).
    """
    shapes = [(max_txt_len // 3 + 2, min(36, max_bb)),
              (max_txt_len * 2 // 3 + 2, min(64, max_bb)),
              (max_txt_len + 2, max_bb)]
    out = []
    for lt, nb in shapes:
        b = max(8, int(tokens_per_batch / (lt + nb)) // 8 * 8)
        m = max(8, int((lt + nb) * mask_frac) // 8 * 8)
        out.append(BucketSpec(lt, nb, b, m))
    return out


def pick_bucket(buckets: Sequence[BucketSpec], txt_len: int,
                num_bb: int) -> Optional[int]:
    """Smallest bucket that fits (buckets must be sorted ascending)."""
    for i, s in enumerate(buckets):
        if txt_len <= s.txt_len and num_bb <= s.num_bb:
            return i
    return None


def _fit(arr: np.ndarray, n: int, pad_value=0) -> np.ndarray:
    """Pad/truncate axis 0 to length n."""
    arr = np.asarray(arr)
    if arr.shape[0] >= n:
        return arr[:n]
    pad_shape = (n - arr.shape[0],) + arr.shape[1:]
    return np.concatenate(
        [arr, np.full(pad_shape, pad_value, arr.dtype)], axis=0)


def collate_batch(examples: List[Dict[str, Any]], spec: BucketSpec,
                  pad_token_id: int = 1,
                  slot_target_keys: Sequence[str] = ()) -> Dict[str, np.ndarray]:
    """Assemble a static-shape batch.

    Per-example fields consumed (all optional except input_ids):
      input_ids [L], position_ids [L], img_feat [nbb, D], img_pos_feat
      [nbb, 7], img_masks [nbb] bool (MRM), txt_labels [L] (-1 = ignore),
      img_txt_labels [nbb] (region token targets, -1 = ignore),
      img_mask_tgt [nbb] bool (regions whose slots get targets),
      feat_targets [nbb, D], label_targets [nbb, C], target (scalar),
      plus any scalar passthroughs.

    Prediction slots: text positions with txt_labels != -1, then region
    positions (img_mask_tgt if present else img_masks) at joint index
    Lt + i. ``slot_target_keys`` selects which per-region target arrays are
    gathered into slot-aligned [B, M, ...] arrays.
    """
    B = spec.batch_size
    Lt, Nb, M = spec.txt_len, spec.num_bb, spec.max_masked
    n = len(examples)
    assert n <= B, (n, B)

    has_img = any("img_feat" in e for e in examples)
    img_dim = (np.asarray(examples[0]["img_feat"]).shape[-1]
               if has_img else 0)
    # the feature slab follows the examples' dtype: fp16-on-disk features
    # stay fp16 through collate and H2D (DetectFeatDb.keep_fp16) — the
    # model upcasts on device
    img_dtype = (np.asarray(examples[0]["img_feat"]).dtype
                 if has_img else np.float32)

    out: Dict[str, np.ndarray] = {
        "input_ids": np.full((B, Lt), pad_token_id, np.int32),
        "attn_mask": np.zeros((B, Lt + Nb if has_img else Lt), np.int32),
        # 1 for real rows; trailing-batch padding rows stay 0 so per-example
        # losses/metrics (ITM, VQA) can exclude them
        "ex_mask": np.zeros((B,), np.float32),
    }
    if has_img:
        out["img_feat"] = np.zeros((B, Nb, img_dim), img_dtype)
        out["img_pos_feat"] = np.zeros((B, Nb, 7), np.float32)
        # big copies ([nbb, 2048] per example) go through the native
        # threaded packer when layouts allow (csrc u2s_pack); the
        # per-example loop below skips whatever was packed here
        from uc2_tpu.data.native_build import pack_ragged
        feats = [np.asarray(e["img_feat"])[:Nb] if "img_feat" in e
                 else np.zeros((0, img_dim), img_dtype) for e in examples]
        packed_feat = pack_ragged(feats, out["img_feat"])
        pos = [np.asarray(e["img_pos_feat"])[:Nb] if "img_pos_feat" in e
               else np.zeros((0, 7), np.float32) for e in examples]
        packed_pos = pack_ragged(pos, out["img_pos_feat"])
    else:
        packed_feat = packed_pos = False
    if any("position_ids" in e for e in examples):
        out["position_ids"] = np.full((B, Lt), pad_token_id, np.int32)
    if any("img_masks" in e for e in examples):
        out["img_masks"] = np.zeros((B, Nb), bool)
    if any("target" in e for e in examples):
        out["targets"] = np.zeros((B,), np.int32)
    if any("soft_target" in e for e in examples):
        C = np.asarray(examples[0]["soft_target"]).shape[-1]
        out["soft_targets"] = np.zeros((B, C), np.float32)

    if M:
        out["masked_pos"] = np.zeros((B, M), np.int32)
        out["masked_weight"] = np.zeros((B, M), np.float32)
        out["txt_labels"] = np.zeros((B, M), np.int32)
        for key in slot_target_keys:
            ex0 = next((e for e in examples if key in e), None)
            if ex0 is None:
                continue
            tgt0 = np.asarray(ex0[key])
            # slot targets keep the source dtype (fp16 features stay fp16
            # through H2D; losses upcast on device)
            out[key] = np.zeros((B, M, tgt0.shape[-1]),
                                tgt0.dtype if tgt0.dtype == np.float16
                                else np.float32)

    for b, e in enumerate(examples):
        ids = np.asarray(e["input_ids"])[:Lt]
        L = ids.shape[0]
        out["input_ids"][b, :L] = ids
        out["attn_mask"][b, :L] = 1
        out["ex_mask"][b] = 1.0
        if "position_ids" in e and "position_ids" in out:
            out["position_ids"][b, :L] = np.asarray(e["position_ids"])[:Lt]
        nbb = 0
        if "img_feat" in e:
            feat = np.asarray(e["img_feat"])[:Nb]
            nbb = feat.shape[0]
            if not packed_feat:
                out["img_feat"][b, :nbb] = feat
            if not packed_pos:
                out["img_pos_feat"][b, :nbb] = \
                    np.asarray(e["img_pos_feat"])[:Nb]
            out["attn_mask"][b, Lt:Lt + nbb] = 1
        if "img_masks" in e and "img_masks" in out:
            out["img_masks"][b, :nbb] = np.asarray(e["img_masks"])[:Nb]
            # zero masked input features (reference _mask_img_feat,
            # data/mrm.py:36-39; the model adds mask_embedding on top)
            out["img_feat"][b, :nbb][np.asarray(e["img_masks"])[:nbb]] = 0.0
        if "target" in e:
            out["targets"][b] = e["target"]
        if "soft_target" in e:
            out["soft_targets"][b] = np.asarray(e["soft_target"])

        if M:
            txt_pos: List[int] = []
            txt_lab: List[int] = []
            if "txt_labels" in e:
                tl = np.asarray(e["txt_labels"])[:Lt]
                p = np.flatnonzero(tl != -1)
                txt_pos = p.tolist()
                txt_lab = tl[p].tolist()
            region_idx: List[int] = []
            reg_lab: List[int] = []
            tgt_mask_key = ("img_mask_tgt" if "img_mask_tgt" in e
                            else "img_masks" if "img_masks" in e else None)
            if tgt_mask_key is not None and any(
                    key in e for key in ("img_txt_labels", "feat_targets",
                                         "label_targets")):
                im = np.asarray(e[tgt_mask_key])[:Nb]
                region_idx = np.flatnonzero(im).tolist()
                if "img_txt_labels" in e:
                    reg_lab = np.asarray(
                        e["img_txt_labels"])[region_idx].tolist()
                else:
                    reg_lab = [0] * len(region_idx)
            # slots: text first, then regions (truncate at M — statistically
            # negligible with the default M sizing)
            n_txt = min(len(txt_pos), M)
            n_reg = min(len(region_idx), M - n_txt)
            k = n_txt + n_reg
            pos = txt_pos[:n_txt] + [Lt + i for i in region_idx[:n_reg]]
            lab = txt_lab[:n_txt] + reg_lab[:n_reg]
            out["masked_pos"][b, :k] = pos
            out["masked_weight"][b, :k] = 1.0
            # label padding stays 0; weight 0 kills the padded-slot loss
            out["txt_labels"][b, :k] = lab
            for key in slot_target_keys:
                if key not in out:
                    continue
                if key.startswith("txt_"):
                    # text-position-aligned soft targets (mmxlm-soft one-hots)
                    if key in e and n_txt:
                        tgt = np.asarray(e[key])
                        out[key][b, :n_txt] = tgt[txt_pos[:n_txt]]
                    continue
                tgt = np.asarray(e[key])
                take = region_idx[:n_reg]
                if take:
                    out[key][b, n_txt:n_txt + len(take)] = tgt[take]
    return out
