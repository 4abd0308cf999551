"""Task datasets: per-example assembly + masking for every objective.

Reference: data/mlm.py (MLM/TLM/VTLM/MRTM), data/mrm.py (MRFR/MRC),
data/itm.py (ITM/ITM-rank/eval), data/vqa.py, data/ve.py, data/nlvr2.py.

Differences from the reference (TPU-first):
  * Examples are numpy dicts; batches are assembled by collate.py into one
    of a few static bucket shapes (no per-batch max-length padding, no
    gather_index).
  * All randomness flows through an explicit np.random.Generator handed to
    ``get_example(i, rng)`` / ``new_epoch(rng)`` — reproducible, per-host
    independent (the reference used the unseeded global `random`).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from uc2_tpu.data import masking
from uc2_tpu.data.collate import BucketSpec, collate_batch
from uc2_tpu.data.db import DetectFeatDb, SoftLabelDb, TxtTokDb, get_ids_and_lens
from uc2_tpu.data.labels import LabelVocab


class ConcatDataset:
    """Concatenation of same-task datasets with merged lens (reference
    ConcatDatasetWithLens, data/data.py:344-360)."""

    def __init__(self, datasets: Sequence["VLDataset"]):
        self.datasets = list(datasets)
        self.lens = [l for d in self.datasets for l in d.lens]
        self.txt_lens = [l for d in self.datasets for l in d.txt_lens]
        self._offsets = []
        off = 0
        for d in self.datasets:
            self._offsets.append(off)
            off += len(d)
        self._total = off
        self.pad_token_id = self.datasets[0].pad_token_id
        self.slot_target_keys = self.datasets[0].slot_target_keys

    def __len__(self):
        return self._total

    def _route(self, i):
        for k in range(len(self.datasets) - 1, -1, -1):
            if i >= self._offsets[k]:
                return self.datasets[k], i - self._offsets[k]
        raise IndexError(i)

    def get_example(self, i, rng):
        ds, j = self._route(i)
        return ds.get_example(j, rng)

    def new_epoch(self, rng):
        for d in self.datasets:
            if hasattr(d, "new_epoch"):
                d.new_epoch(rng)
        self.lens = [l for d in self.datasets for l in d.lens]
        # hard-neg caption swaps change per-epoch TEXT lengths too
        self.txt_lens = [l for d in self.datasets for l in d.txt_lens]

    def collate(self, examples, spec):
        return self.datasets[0].collate(examples, spec)


class VLDataset:
    """Base: paired text + image-region access (reference
    DetectFeatTxtTokDataset, data/data.py:317-341)."""

    pad_token_id = 1
    slot_target_keys: Sequence[str] = ()
    # which blocks this task's prediction slots cover; sizes the static
    # masked-slot arrays (M). 15% masking ⇒ 0.35×len covers the binomial
    # tail to ~1e-6; oversizing M is expensive for full-vocab LM-head tasks
    # (logits are [B·M, 250002]).
    mask_span = None  # "txt" | "img" | "joint" | None

    @classmethod
    def slot_budget(cls, txt_len: int, num_bb: int) -> int:
        span = {"txt": txt_len, "img": num_bb,
                "joint": txt_len + num_bb}.get(cls.mask_span, 0)
        if not span:
            return 0
        return max(8, -(-int(span * 0.35) // 8) * 8)

    def __init__(self, txt_db: TxtTokDb, img_db: DetectFeatDb):
        self.txt_db = txt_db
        self.img_db = img_db
        txt_lens, self.ids = get_ids_and_lens(txt_db)
        txt2img = txt_db.txt2img
        self.txt2img = txt2img
        self.lens = [tl + img_db.name2nbb[txt2img[i]]
                     for tl, i in zip(txt_lens, self.ids)]
        self.txt_lens = txt_lens

    def __len__(self):
        return len(self.ids)

    def _img_feat(self, fname: str):
        feat, bb7 = self.img_db[fname]
        return feat, bb7, feat.shape[0]

    def example_record(self, i: int) -> Dict:
        return self.txt_db[self.ids[i]]

    def batch_fnames(self, indices: Sequence[int]) -> List[str]:
        """Image files a batch will touch (for native-thread-pool prefetch)."""
        return [self.txt2img[self.ids[i]] for i in indices]

    def prefetch(self, indices: Sequence[int]):
        if hasattr(self.img_db, "prefetch"):
            self.img_db.prefetch(self.batch_fnames(indices))

    def collate(self, examples: List[Dict], spec: BucketSpec):
        return collate_batch(examples, spec, self.pad_token_id,
                             self.slot_target_keys)


# --------------------------------------------------------------------- MLM
class MlmDataset(VLDataset):
    """Plain MLM over caption + image (reference MlmDataset,
    data/mlm.py:680-758)."""

    mask_span = "txt"
    def __init__(self, txt_db, img_db, mask_prob: float = 0.15):
        super().__init__(txt_db, img_db)
        self.mask_prob = mask_prob

    def get_example(self, i: int, rng: np.random.Generator) -> Dict:
        rec = self.example_record(i)
        # mask the raw caption tokens, THEN wrap with CLS/SEP — special
        # tokens are never masking candidates (reference create_mlm_io,
        # data/mlm.py:708-717)
        raw, raw_labels = masking.mask_tokens(
            np.asarray(rec["input_ids"]), self.txt_db.v_range,
            self.txt_db.mask, rng, self.mask_prob)
        new_ids = np.concatenate([[self.txt_db.cls_], raw,
                                  [self.txt_db.sep]]).astype(np.int64)
        labels = np.concatenate([[-1], raw_labels, [-1]]).astype(np.int64)
        feat, bb7, nbb = self._img_feat(rec["img_fname"])
        return {"input_ids": new_ids, "txt_labels": labels,
                "img_feat": feat, "img_pos_feat": bb7}


class TlmDataset(VLDataset):
    """TLM / VTLM with cross-lingual co-masking over `[CLS] l1 [SEP][SEP] l2
    [SEP]` pairs (reference MlmDataset_Dmasking, data/mlm.py:361-440).

    ``text_only=True`` gives the `tlm-ni` variant (no image attended).
    The explicit position ids replicate the reference's construction
    (data/mlm.py:420-432): start at 2, +1 per token, reset at token id 0.
    """

    mask_span = "txt"
    def __init__(self, txt_db, img_db, comasking_mode: str = "random",
                 text_only: bool = False, mask_prob: float = 0.15):
        super().__init__(txt_db, img_db)
        assert comasking_mode in ("random", "full", "mix")
        self.mode = comasking_mode
        self.text_only = text_only
        self.mask_prob = mask_prob

    def get_example(self, i, rng):
        rec = self.example_record(i)
        if self.mode == "mix" and rng.random() < 0.5:
            raw_ids, raw_labels = masking.mask_tokens(
                np.asarray(rec["input_ids"]), self.txt_db.v_range,
                self.txt_db.mask, rng, self.mask_prob)
        else:
            # reference 'mix' uses random_word_dmasking — the single-subtoken
            # 'random' co-mask variant (data/mlm.py:405-410), not 'full'
            mode = "random" if self.mode == "mix" else self.mode
            raw_ids, raw_labels = masking.comask_tokens(
                rec, self.txt_db.v_range, self.txt_db.mask, rng, mode,
                self.mask_prob)
        ids = np.concatenate([[self.txt_db.cls_], raw_ids,
                              [self.txt_db.sep]]).astype(np.int64)
        labels = np.concatenate([[-1], raw_labels, [-1]]).astype(np.int64)
        pos, p = [], 2
        for t in ids.tolist():
            if t == 0:
                p = 2
            else:
                p += 1
            pos.append(p)
        ex = {"input_ids": ids, "txt_labels": labels,
              "position_ids": np.asarray(pos, np.int64)}
        if not self.text_only:
            feat, bb7, nbb = self._img_feat(rec["img_fname"])
            ex.update({"img_feat": feat, "img_pos_feat": bb7})
        return ex


# -------------------------------------------------------------------- MRTM
class VmlmDataset(VLDataset):
    """Hard MRTM: mask regions, predict label-word tokens (reference
    VmlmDataset data/mlm.py:490-531; MmxlmDataset :439-488 additionally
    masks text)."""

    mask_span = "img"
    def __init__(self, txt_db, img_db, mask_prob: float = 0.15,
                 label_vocab: Optional[LabelVocab] = None, lang: str = "en",
                 mask_text: bool = False):
        super().__init__(txt_db, img_db)
        self.mask_prob = mask_prob
        self.vocab = label_vocab or LabelVocab()
        self.lang = lang
        self.mask_text = mask_text

    def get_example(self, i, rng):
        rec = self.example_record(i)
        if self.mask_text:
            # raw tokens masked before CLS/SEP wrap (data/mlm.py:708-717)
            raw, raw_labels = masking.mask_tokens(
                np.asarray(rec["input_ids"]), self.txt_db.v_range,
                self.txt_db.mask, rng, self.mask_prob)
            ids = np.concatenate([[self.txt_db.cls_], raw,
                                  [self.txt_db.sep]]).astype(np.int64)
            txt_labels = np.concatenate(
                [[-1], raw_labels, [-1]]).astype(np.int64)
        else:
            ids = self.txt_db.combine_inputs(rec["input_ids"])
            txt_labels = np.full(ids.shape[0], -1, np.int64)
        fname = rec["img_fname"]
        feat, bb7, nbb = self._img_feat(fname)
        soft = self.img_db.get_dump(fname)["soft_labels"]
        img_masks, img_labels = masking.region_mask_with_token_labels(
            rng, nbb, soft, self.vocab, self.lang, self.mask_prob)
        return {"input_ids": ids, "txt_labels": txt_labels,
                "img_feat": feat, "img_pos_feat": bb7,
                "img_masks": img_masks, "img_txt_labels": img_labels}


class MmxlmDataset(VmlmDataset):
    mask_span = "joint"

    def __init__(self, txt_db, img_db, mask_prob=0.15, label_vocab=None,
                 lang="en"):
        super().__init__(txt_db, img_db, mask_prob, label_vocab, lang,
                         mask_text=True)


class VmlmSoftDataset(VLDataset):
    """Soft MRTM: target = detector soft labels projected to label-token
    space (reference Vmlm_Softlabel_Dataset data/mlm.py:533-578;
    Mmxlm_Softlabel_Dataset :580-678 additionally masks text with one-hot
    soft targets). Precomputed per-image token soft labels (SoftLabelDb) are
    used when given, matching the img_token_soft_label DBs in the reference
    config."""

    mask_span = "img"
    slot_target_keys = ("txt_soft_targets", "label_targets")

    def __init__(self, txt_db, img_db, mask_prob: float = 0.15,
                 label_vocab: Optional[LabelVocab] = None,
                 soft_label_db: Optional[SoftLabelDb] = None,
                 mask_text: bool = False):
        super().__init__(txt_db, img_db)
        self.mask_prob = mask_prob
        self.vocab = label_vocab or LabelVocab()
        self.soft_label_db = soft_label_db
        self.mask_text = mask_text
        self.n_valid = len(self.vocab.valid_ids)

    def get_example(self, i, rng):
        rec = self.example_record(i)
        ids = self.txt_db.combine_inputs(rec["input_ids"])
        fname = rec["img_fname"]
        feat, bb7, nbb = self._img_feat(fname)
        img_masks = masking.region_mask(rng, nbb, self.mask_prob)
        if self.soft_label_db is not None:
            token_soft = self.soft_label_db[fname][:nbb]
        else:
            soft = self.img_db.get_dump(fname)["soft_labels"]
            token_soft = self.vocab.project_soft_labels(soft)
        ex = {"input_ids": ids, "img_feat": feat, "img_pos_feat": bb7,
              "img_masks": img_masks, "label_targets": token_soft}
        if self.mask_text:
            raw, raw_labels = masking.mask_tokens(
                np.asarray(rec["input_ids"]), self.txt_db.v_range,
                self.txt_db.mask, rng, self.mask_prob)
            ids2 = np.concatenate([[self.txt_db.cls_], raw,
                                   [self.txt_db.sep]]).astype(np.int64)
            txt_labels = np.concatenate(
                [[-1], raw_labels, [-1]]).astype(np.int64)
            ex["input_ids"] = ids2
            ex["txt_labels"] = txt_labels
            # one-hot soft targets in valid-token space; tokens outside the
            # label vocabulary yield all-zero rows — matching the reference,
            # which builds full-vocab one-hots then slices to valid ids
            # (data/mlm.py:346-358, model/model.py:642)
            onehot = np.zeros((ids2.shape[0], self.n_valid), np.float32)
            pos = np.flatnonzero(txt_labels != -1)
            for p in pos:
                j = np.searchsorted(self.vocab.valid_ids, txt_labels[p])
                if (j < self.n_valid
                        and self.vocab.valid_ids[j] == txt_labels[p]):
                    onehot[p, j] = 1.0
            ex["txt_soft_targets"] = onehot
        else:
            # text slots must not exist: no txt_labels key
            pass
        return ex

    def collate(self, examples, spec):
        batch = super().collate(examples, spec)
        if "txt_soft_targets" in batch:
            # merge text one-hots and region projections into one slot array
            batch["label_targets"] = (batch.pop("txt_soft_targets")
                                      + batch["label_targets"])
        return batch


class MmxlmSoftDataset(VmlmSoftDataset):
    mask_span = "joint"

    def __init__(self, txt_db, img_db, mask_prob=0.15, label_vocab=None,
                 soft_label_db=None):
        super().__init__(txt_db, img_db, mask_prob, label_vocab,
                         soft_label_db, mask_text=True)


# -------------------------------------------------------------------- MRFR
class MrfrDataset(VLDataset):
    """Masked-region feature regression (reference MrfrDataset,
    data/mrm.py:42-71)."""

    mask_span = "img"
    slot_target_keys = ("feat_targets",)

    def __init__(self, txt_db, img_db, mask_prob: float = 0.15):
        super().__init__(txt_db, img_db)
        self.mask_prob = mask_prob

    def get_example(self, i, rng):
        rec = self.example_record(i)
        ids = self.txt_db.combine_inputs(rec["input_ids"])
        feat, bb7, nbb = self._img_feat(rec["img_fname"])
        img_masks = masking.region_mask(rng, nbb, self.mask_prob)
        return {"input_ids": ids, "img_feat": feat, "img_pos_feat": bb7,
                "img_masks": img_masks, "img_mask_tgt": img_masks,
                "feat_targets": feat.copy()}


class MrcDataset(VLDataset):
    """Masked-region classification over 1601 detector classes (reference
    MrcDataset, data/mrm.py:221-251). ``kl`` handled at the loss."""

    mask_span = "img"
    slot_target_keys = ("label_targets",)

    def __init__(self, txt_db, img_db, mask_prob: float = 0.15):
        super().__init__(txt_db, img_db)
        self.mask_prob = mask_prob

    def get_example(self, i, rng):
        rec = self.example_record(i)
        ids = self.txt_db.combine_inputs(rec["input_ids"])
        fname = rec["img_fname"]
        feat, bb7, nbb = self._img_feat(fname)
        soft = self.img_db.get_dump(fname)["soft_labels"]
        img_masks = masking.region_mask(rng, nbb, self.mask_prob)
        return {"input_ids": ids, "img_feat": feat, "img_pos_feat": bb7,
                "img_masks": img_masks, "img_mask_tgt": img_masks,
                "label_targets": soft}


class NegativeImageSampler:
    """Samples negative region features from random other images (reference
    NegativeImageSampler, data/mrm_nce.py:61-95)."""

    def __init__(self, img_db: DetectFeatDb, neg_size: int = 128):
        self.img_db = img_db
        self.neg_size = neg_size
        self.fnames = sorted(img_db.name2nbb.keys())

    def sample(self, rng: np.random.Generator, exclude: str) -> np.ndarray:
        out = []
        total = 0
        while total < self.neg_size:
            f = self.fnames[int(rng.integers(0, len(self.fnames)))]
            if f == exclude:
                continue
            feat, _ = self.img_db[f]
            out.append(feat)
            total += feat.shape[0]
        return np.concatenate(out, axis=0)[:self.neg_size]


class MrmNceDataset(MrfrDataset):
    """Masked-region contrastive learning (reference MrmNceDataset,
    data/mrm_nce.py:37-59 + mrm_nce_collate :97-140).

    NOTE: the reference's model path is broken end-to-end (forward raises
    NotImplementedError, model/model.py:1237; the NCE head is commented
    out). This implementation completes the objective: 10%/10%
    noop/feature-swap input corruption (:16-34), `neg_size` sampled negative
    region features + in-batch negatives, and a working NCE head/loss in
    models/pretraining.py::forward_mrm_nce.
    """

    slot_target_keys = ("feat_targets",)

    def __init__(self, txt_db, img_db, mask_prob: float = 0.15,
                 neg_size: int = 128, noop_prob: float = 0.1,
                 swap_prob: float = 0.1):
        super().__init__(txt_db, img_db, mask_prob)
        self.neg_sampler = NegativeImageSampler(img_db, neg_size)
        self.noop_prob = noop_prob
        self.swap_prob = swap_prob

    def get_example(self, i, rng):
        rec = self.example_record(i)
        ids = self.txt_db.combine_inputs(rec["input_ids"])
        feat, bb7, nbb = self._img_feat(rec["img_fname"])
        img_masks = masking.region_mask(rng, nbb, self.mask_prob)
        targets = feat.copy()
        # input corruption (reference _mask_img_feat_for_nce semantics):
        # 10% keep the original feature visible, 10% swap in a random other
        # region's feature; otherwise zero (the collator zeroes via
        # img_masks, so noop/swap slots are carried separately)
        u = rng.random(nbb)
        visible = img_masks & (u < self.noop_prob)
        swap = img_masks & (u >= self.noop_prob) \
            & (u < self.noop_prob + self.swap_prob)
        feat_in = feat.copy()
        if swap.any():
            src = rng.integers(0, nbb, int(swap.sum()))
            feat_in[np.flatnonzero(swap)] = feat[src]
        # img_masks passed to the model covers only truly-zeroed slots;
        # prediction targets (img_mask_tgt) cover all masked slots
        zero_mask = img_masks & ~visible & ~swap
        return {"input_ids": ids, "img_feat": feat_in, "img_pos_feat": bb7,
                "img_masks": zero_mask, "img_mask_tgt": img_masks,
                "feat_targets": targets,
                "neg_feats": self.neg_sampler.sample(rng,
                                                     rec["img_fname"])}

    def collate(self, examples, spec):
        batch = collate_batch(examples, spec, self.pad_token_id,
                              self.slot_target_keys)
        # one shared negative pool per batch (the reference concatenates all
        # sampled negatives, data/mrm_nce.py:123-128); take the first
        # example's pool + one row per example for diversity
        pools = [e["neg_feats"] for e in examples]
        batch["neg_feats"] = np.concatenate(
            [pools[0]] + [p[:8] for p in pools[1:]], axis=0)
        return batch


# --------------------------------------------------------------------- ITM
def sample_negative(rng: np.random.Generator, pool: List, exclude) -> Any:
    while True:
        cand = pool[int(rng.integers(0, len(pool)))]
        if cand not in exclude:
            return cand


class ItmDataset(VLDataset):
    """Binary image-text matching with per-epoch negative resampling
    (reference ItmDataset, data/itm.py:151-203)."""

    def __init__(self, txt_db, img_db, neg_sample_p: float = 0.5):
        super().__init__(txt_db, img_db)
        self.neg_sample_p = neg_sample_p
        self.all_imgs = sorted({self.txt2img[i] for i in self.ids})
        self.train_imgs: Optional[List[str]] = None
        self.labels: Optional[np.ndarray] = None

    def new_epoch(self, rng: np.random.Generator):
        self.labels = (rng.random(len(self.ids))
                       >= self.neg_sample_p).astype(np.int32)
        self.train_imgs = []
        lens = []
        for i, id_ in enumerate(self.ids):
            fname = self.txt2img[id_]
            if self.labels[i] == 0:
                fname = sample_negative(rng, self.all_imgs, [fname])
            self.train_imgs.append(fname)
            lens.append(self.txt_lens[i] + self.img_db.name2nbb[fname])
        self.lens = lens

    def batch_fnames(self, indices):
        if self.train_imgs is None:
            return super().batch_fnames(indices)
        return [self.train_imgs[i] for i in indices]

    def get_example(self, i, rng):
        assert self.train_imgs is not None, "call new_epoch(rng) first"
        rec = self.example_record(i)
        ids = self.txt_db.combine_inputs(rec["input_ids"])
        feat, bb7, nbb = self._img_feat(self.train_imgs[i])
        return {"input_ids": ids, "img_feat": feat, "img_pos_feat": bb7,
                "target": int(self.labels[i])}


class ItmHardNegDataset(ItmDataset):
    """Cross-lingual hard negatives: 50% wrong image / 25% wrong lang1 /
    25% wrong lang2 caption swap (reference ItmDataset_HardNeg,
    data/itm.py:84-148). Requires paired-translation records."""

    def __init__(self, txt_db, img_db, neg_sample_p: float = 0.5,
                 neg_img: float = 0.5, neg_lang1: float = 0.25,
                 neg_lang2: float = 0.25):
        assert abs(neg_img + neg_lang1 + neg_lang2 - 1) < 1e-6
        self.neg_split = (neg_img, neg_lang1, neg_lang2)
        super().__init__(txt_db, img_db, neg_sample_p)

    def new_epoch(self, rng):
        self.labels = (rng.random(len(self.ids))
                       >= self.neg_sample_p).astype(np.int32)
        self.train_imgs, self.train_raw_ids = [], []
        txt_lens, lens = [], []
        neg_img, neg_l1, neg_l2 = self.neg_split
        for i, id_ in enumerate(self.ids):
            rec = self.example_record(i)
            fname = rec["img_fname"]
            raw = list(rec["input_ids"])
            if self.labels[i] == 0:
                u = rng.random()
                if u < neg_img:
                    fname = sample_negative(rng, self.all_imgs, [fname])
                else:
                    lang_key = ("input_ids_lang1" if u < neg_img + neg_l1
                                else "input_ids_lang2")
                    j = int(rng.integers(0, len(self.ids)))
                    other = self.example_record(j)[lang_key]
                    l1, l2 = (list(rec["input_ids_lang1"]),
                              list(rec["input_ids_lang2"]))
                    if lang_key == "input_ids_lang1":
                        l1 = list(other)
                    else:
                        l2 = list(other)
                    sep = self.txt_db.sep
                    raw = l1 + [sep, sep] + l2
            self.train_imgs.append(fname)
            self.train_raw_ids.append(raw)
            # base-class convention: txt_lens = RAW token count (the loader
            # adds +2 for CLS/SEP), lens = txt + nbb. Both must track the
            # per-epoch swaps: a caption swap changes the text length and
            # an image swap changes nbb — stale dims mis-bucket the example
            # and collate then silently TRUNCATES the tail of the longer
            # swapped caption (regression: test_data_pipeline's
            # hard-neg dims test; bug found round 4, derived nbb was +2 on
            # every example and eff-txt was stale on every caption swap)
            txt_lens.append(len(raw))
            lens.append(len(raw) + self.img_db.name2nbb[fname])
        self.txt_lens = txt_lens
        self.lens = lens

    def get_example(self, i, rng):
        assert self.train_imgs is not None
        ids = self.txt_db.combine_inputs(self.train_raw_ids[i])
        feat, bb7, nbb = self._img_feat(self.train_imgs[i])
        return {"input_ids": ids, "img_feat": feat, "img_pos_feat": bb7,
                "target": int(self.labels[i])}


class ItmRankDataset(VLDataset):
    """Retrieval finetuning groups: 1 positive + neg images + neg texts per
    anchor (reference ItmRankDataset, data/itm.py:508-559). Emits flattened
    groups; 'sample_size' rides in the batch for the triplet loss."""

    def __init__(self, txt_db, img_db, neg_sample_size: int = 1):
        super().__init__(txt_db, img_db)
        assert neg_sample_size > 0
        self.neg_sample_size = neg_sample_size
        self.img2txts = txt_db.img2txts
        self.all_imgs = sorted(self.img2txts.keys())
        self.all_txts = list(self.ids)

    @property
    def sample_size(self):
        return 1 + 2 * self.neg_sample_size

    def get_example(self, i, rng):
        id_ = self.ids[i]
        rec = self.example_record(i)
        gt_img = self.txt2img[id_]
        ids = self.txt_db.combine_inputs(rec["input_ids"])
        group = []
        feat, bb7, _ = self._img_feat(gt_img)
        group.append({"input_ids": ids, "img_feat": feat,
                      "img_pos_feat": bb7, "target": 1})
        for _ in range(self.neg_sample_size):  # negative images
            neg_img = sample_negative(rng, self.all_imgs,
                                      [gt_img])
            f2, b2, _ = self._img_feat(neg_img)
            group.append({"input_ids": ids, "img_feat": f2,
                          "img_pos_feat": b2, "target": 0})
        gt_txts = self.img2txts[gt_img]
        for _ in range(self.neg_sample_size):  # negative texts
            neg_txt = sample_negative(rng, self.all_txts, gt_txts)
            nrec = self.txt_db[neg_txt]
            nids = self.txt_db.combine_inputs(nrec["input_ids"])
            group.append({"input_ids": nids, "img_feat": feat,
                          "img_pos_feat": bb7, "target": 0})
        return group


class ItmRankHardNegDataset(ItmRankDataset):
    """Rank groups with *mined* hard negatives (reference
    ItmRankDatasetHardNeg, data/itm.py:561-613): each group is
    [pos, hard_neg_size hard images, hard_neg_size hard texts,
    neg_sample_size random images, neg_sample_size random texts] —
    hard negatives are ADDED to the random ones, not substituted
    (assert at data/itm.py:609-612), and each slot is sampled from the
    mined pool (``--hard_neg_pool_size`` entries per id). Until the first
    mining pass fills the pools, hard slots fall back to random sampling
    so the group size (and the jitted loss shape) stays static."""

    def __init__(self, txt_db, img_db, neg_sample_size: int = 1,
                 hard_neg_size: int = 1,
                 hard_negs: Optional[Dict[str, Dict[str, List[str]]]] = None):
        super().__init__(txt_db, img_db, neg_sample_size)
        self.hard_neg_size = hard_neg_size
        self.txt2hardimgs: Dict[str, List[str]] = {}
        self.img2hardtxts: Dict[str, List[str]] = {}
        if hard_negs:
            self.reload_hard_negs(hard_negs)

    @property
    def sample_size(self):
        return 1 + 2 * (self.neg_sample_size + self.hard_neg_size)

    def reload_hard_negs(self, path_or_dict):
        if isinstance(path_or_dict, str):
            import json as _json
            with open(path_or_dict) as f:
                path_or_dict = _json.load(f)
        d = dict(path_or_dict)
        if "txt2hardimgs" in d or "img2hardtxts" in d:
            self.txt2hardimgs = dict(d.get("txt2hardimgs", {}))
            self.img2hardtxts = dict(d.get("img2hardtxts", {}))
        else:   # legacy flat format: txt→hard images only
            self.txt2hardimgs = d
            self.img2hardtxts = {}

    def _append_img_neg(self, group, ids, neg_img):
        f2, b2, _ = self._img_feat(neg_img)
        group.append({"input_ids": ids, "img_feat": f2,
                      "img_pos_feat": b2, "target": 0})

    def _append_txt_neg(self, group, feat, bb7, neg_txt):
        nids = self.txt_db.combine_inputs(
            self.txt_db[neg_txt]["input_ids"])
        group.append({"input_ids": nids, "img_feat": feat,
                      "img_pos_feat": bb7, "target": 0})

    def get_example(self, i, rng):
        id_ = self.ids[i]
        rec = self.example_record(i)
        gt_img = self.txt2img[id_]
        gt_txts = self.img2txts[gt_img]
        ids = self.txt_db.combine_inputs(rec["input_ids"])
        feat, bb7, _ = self._img_feat(gt_img)
        group = [{"input_ids": ids, "img_feat": feat, "img_pos_feat": bb7,
                  "target": 1}]
        img_pool = self.txt2hardimgs.get(id_) or []
        txt_pool = self.img2hardtxts.get(gt_img) or []
        for _ in range(self.hard_neg_size):     # hard image negatives
            neg_img = (img_pool[int(rng.integers(0, len(img_pool)))]
                       if img_pool
                       else sample_negative(rng, self.all_imgs, [gt_img]))
            self._append_img_neg(group, ids, neg_img)
        for _ in range(self.hard_neg_size):     # hard text negatives
            neg_txt = (txt_pool[int(rng.integers(0, len(txt_pool)))]
                       if txt_pool
                       else sample_negative(rng, self.all_txts, gt_txts))
            self._append_txt_neg(group, feat, bb7, neg_txt)
        for _ in range(self.neg_sample_size):   # random image negatives
            self._append_img_neg(
                group, ids, sample_negative(rng, self.all_imgs, [gt_img]))
        for _ in range(self.neg_sample_size):   # random text negatives
            self._append_txt_neg(
                group, feat, bb7,
                sample_negative(rng, self.all_txts, gt_txts))
        return group


class ItmEvalDataset(VLDataset):
    """Full retrieval eval: every text scored against every image
    (reference ItmEvalDataset, data/itm.py:891+). Iteration is handled by
    eval code — this class provides image access sorted by nbb (compute
    efficiency, as the reference sorts by nbb)."""

    def __init__(self, txt_db, img_db):
        super().__init__(txt_db, img_db)
        self.all_img_ids = sorted({self.txt2img[i] for i in self.ids},
                                  key=lambda x: img_db.name2nbb[x])

    def text_example(self, i):
        rec = self.example_record(i)
        return self.txt_db.combine_inputs(rec["input_ids"])


# --------------------------------------------------------------- VQA / VE
class VqaDataset(VLDataset):
    """VQA with soft-score targets (reference data/vqa.py:20-99)."""

    def __init__(self, txt_db, img_db, num_answers: int):
        super().__init__(txt_db, img_db)
        self.num_answers = num_answers

    def get_example(self, i, rng):
        rec = self.example_record(i)
        ids = self.txt_db.combine_inputs(rec["input_ids"])
        feat, bb7, nbb = self._img_feat(rec["img_fname"])
        target = np.zeros(self.num_answers, np.float32)
        labels = rec.get("target", {})
        for lbl, score in zip(labels.get("labels", []),
                              labels.get("scores", [])):
            target[int(lbl)] = float(score)
        return {"input_ids": ids, "img_feat": feat, "img_pos_feat": bb7,
                "soft_target": target}


class VeDataset(VqaDataset):
    """Visual entailment = 3-answer VQA (reference data/ve.py:8-19)."""

    def __init__(self, txt_db, img_db):
        super().__init__(txt_db, img_db, num_answers=3)


class Nlvr2TwoRowDataset(VLDataset):
    """NLVR2 'paired' format: each example becomes TWO rows (statement +
    left image, statement + right image), consumed by the paired /
    paired-attn heads which operate on row pairs (reference
    data/nlvr2.py:18-96 with UniterForNlvr2Paired)."""

    def __init__(self, txt_db, img_db, use_img_type: bool = True):
        super().__init__(txt_db, img_db)
        self.use_img_type = use_img_type

    def get_example(self, i, rng):
        rec = self.example_record(i)
        ids = self.txt_db.combine_inputs(rec["input_ids"])
        fnames = rec.get("img_fnames", [rec.get("img_fname")] * 2)
        rows = []
        for k, fn in enumerate(fnames[:2]):
            f, b, n = self._img_feat(fn)
            row = {"input_ids": ids, "img_feat": f, "img_pos_feat": b,
                   "target": int(rec.get("target", 0))}
            if self.use_img_type:
                row["img_type_ids"] = np.full(n, k + 1, np.int32)
            rows.append(row)
        return rows  # grouped: loader flattens, keeping pairs adjacent

    @property
    def sample_size(self):
        return 2

    def collate(self, examples, spec):
        batch = collate_batch(examples, spec, self.pad_token_id)
        if self.use_img_type:
            B, Nb = spec.batch_size, spec.num_bb
            t = np.ones((B, Nb), np.int32)
            for b, e in enumerate(examples):
                ti = np.asarray(e.get("img_type_ids", []))[:Nb]
                t[b, :ti.shape[0]] = ti
            batch["img_type_ids"] = t
        # per-pair targets (rows come in (left, right) pairs)
        batch["targets"] = batch["targets"][::2]
        return batch


class Nlvr2PairedDataset(VLDataset):
    """NLVR2: one statement, two images; img_type_ids distinguish them
    (reference data/nlvr2.py:18-96). Emits both images concatenated along
    the region axis with type ids 1/2."""

    def __init__(self, txt_db, img_db, use_img_type: bool = True):
        super().__init__(txt_db, img_db)
        self.use_img_type = use_img_type
        # two images per example: lens doubles the nbb share
        self.lens = [tl + 2 * self.img_db.name2nbb[self.txt2img[i]]
                     for tl, i in zip(self.txt_lens, self.ids)]

    def get_example(self, i, rng):
        rec = self.example_record(i)
        ids = self.txt_db.combine_inputs(rec["input_ids"])
        fnames = rec.get("img_fnames", [rec.get("img_fname")] * 2)
        feats, bbs, types = [], [], []
        for k, fn in enumerate(fnames[:2]):
            f, b, n = self._img_feat(fn)
            feats.append(f)
            bbs.append(b)
            types.append(np.full(n, k + 1, np.int32))
        ex = {"input_ids": ids,
              "img_feat": np.concatenate(feats, 0),
              "img_pos_feat": np.concatenate(bbs, 0),
              "target": int(rec.get("target", 0))}
        if self.use_img_type:
            ex["img_type_ids"] = np.concatenate(types, 0)
        return ex

    def collate(self, examples, spec):
        batch = collate_batch(examples, spec, self.pad_token_id)
        if self.use_img_type:
            B, Nb = spec.batch_size, spec.num_bb
            t = np.zeros((B, Nb), np.int32)
            for b, e in enumerate(examples):
                ti = np.asarray(e["img_type_ids"])[:Nb]
                t[b, :ti.shape[0]] = ti
            # padded regions keep type 0 (they're attention-masked anyway)
            t[t == 0] = 1
            batch["img_type_ids"] = t
        return batch
