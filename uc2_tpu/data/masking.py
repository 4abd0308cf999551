"""Masking logic for all pretraining objectives — vectorized numpy.

Reference semantics (data/mlm.py, data/mrm.py) reproduced under a keyed
``np.random.Generator`` instead of the reference's unseeded global `random`
module, so masking is reproducible per (seed, epoch, example) yet independent
across hosts:

  * BERT 80/10/10 token masking with at-least-one guarantee
    (random_word, data/mlm.py:30-67).
  * VTLM cross-lingual co-masking: mask an EN token, then co-mask the aligned
    word in the other language — 'full' (all subtokens of both words,
    data/mlm.py:101-181), 'random' (one aligned subtoken, :202-258), 'mix'
    (50/50 *random*-co-masking vs plain MLM, :406-415 at the dataset level).
  * Region masking w.p. mrm_prob with at-least-one (:355-360 _get_img_mask).
  * MRTM hard-target selection: a random subword of the argmax detector class
    in the dataset's language (:262-308).
  * Soft-label projection to label-token space (:310-345) — see labels.py.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import numpy as np

from uc2_tpu.data.labels import LabelVocab

IGNORE = -1


def mask_tokens(ids: np.ndarray, v_range: Tuple[int, int], mask_id: int,
                rng: np.random.Generator, prob: float = 0.15,
                maskable: Optional[np.ndarray] = None
                ) -> Tuple[np.ndarray, np.ndarray]:
    """BERT 80/10/10 masking. ids: int array [L]. Returns (new_ids, labels)
    with labels = original token at masked slots, -1 elsewhere.

    ``maskable`` restricts candidate positions (e.g. exclude CLS/SEP — note
    the reference does NOT exclude them for plain MLM; pass None to match).
    """
    ids = np.asarray(ids)
    L = ids.shape[0]
    u = rng.random(L)
    if maskable is None:
        maskable = np.ones(L, bool)
    sel = (u < prob) & maskable
    if not sel.any():
        # at least mask 1 (reference masks position 0 deterministically)
        first = int(np.flatnonzero(maskable)[0]) if maskable.any() else 0
        labels = np.full(L, IGNORE, ids.dtype)
        labels[first] = ids[first]
        out = ids.copy()
        out[first] = mask_id
        return out, labels
    labels = np.where(sel, ids, IGNORE)
    # sub-probability decides replacement (u/prob < .8 → mask, < .9 → random)
    sub = u / prob
    out = ids.copy()
    rand_tok = rng.integers(v_range[0], v_range[1], L)
    out[sel & (sub < 0.8)] = mask_id
    repl = sel & (sub >= 0.8) & (sub < 0.9)
    out[repl] = rand_tok[repl]
    return out, labels.astype(np.int64)


def _word_of(pos: int, word2ids: Sequence[Sequence[int]]) -> int:
    for w_idx, toks in enumerate(word2ids):
        if pos in toks:
            return w_idx
    return 0


def comask_tokens(example: Dict, v_range, mask_id: int,
                  rng: np.random.Generator, mode: str = "full",
                  prob: float = 0.15) -> Tuple[np.ndarray, np.ndarray]:
    """VTLM co-masking over `[CLS] lang1 [SEP] lang2 [SEP]` inputs.

    example fields (reference txt_db schema, data/mlm.py:111-119):
      input_ids (already combined), input_ids_lang1, word2ids_lang1,
      word2ids_lang2, lang1_lang2_walign (dict word-idx → [word-idx...]).
    Positions: lang1 token i sits at combined position i (the reference masks
    indices into the *combined* sequence directly for lang1 and offsets lang2
    by len(lang1)+2).
    """
    tokens = np.asarray(example["input_ids"]).copy()
    L = tokens.shape[0]
    labels = np.full(L, IGNORE, np.int64)
    len1 = len(example["input_ids_lang1"])
    w2i_1 = example["word2ids_lang1"]
    w2i_2 = example["word2ids_lang2"]
    walign = {int(k): v for k, v in example["lang1_lang2_walign"].items()}

    def aligned(i_lang1: int):
        w1 = _word_of(i_lang1, w2i_1)
        ids1 = list(w2i_1[w1]) if mode == "full" else None
        w2 = walign.get(w1)
        if mode == "full":
            ids2 = list(w2i_2[w2[0]]) if w2 is not None else list(w2i_2[0])
            return ids1, ids2
        if w2 is None:
            return None, [0]
        toks2 = w2i_2[w2[0]]
        return None, [toks2[int(rng.integers(0, len(toks2)))]]

    any_masked = False
    for i in range(min(len1, L)):
        u = rng.random()
        if u < prob:
            ids1, ids2 = aligned(i)
            # capture originals first
            pos1 = ids1 if ids1 is not None else [i]
            pos2 = [j + len1 + 2 for j in ids2]
            orig = {p: tokens[p] for p in pos1 + pos2 if p < L}
            sub = u / prob
            if sub < 0.8:
                for p in orig:
                    tokens[p] = mask_id
            elif sub < 0.9:
                for p in orig:
                    tokens[p] = int(rng.integers(v_range[0], v_range[1]))
            for p, t in orig.items():
                labels[p] = t
            any_masked = True

    if not any_masked:
        ids1, ids2 = aligned(0)
        pos1 = ids1 if ids1 is not None else [0]
        pos2 = [j + len1 + 2 for j in ids2]
        for p in pos1 + pos2:
            if p < L:
                labels[p] = tokens[p]
                tokens[p] = mask_id
    return tokens, labels


def region_mask(rng: np.random.Generator, num_bb: int,
                prob: float = 0.15) -> np.ndarray:
    """Bool [num_bb] with ≥1 True (reference _get_img_mask,
    data/mlm.py:355-360)."""
    m = rng.random(num_bb) < prob
    if not m.any():
        m[int(rng.integers(0, num_bb))] = True
    return m


def region_mask_with_token_labels(
        rng: np.random.Generator, num_bb: int, soft_labels: np.ndarray,
        vocab: LabelVocab, lang: str = "en", prob: float = 0.15
) -> Tuple[np.ndarray, np.ndarray]:
    """MRTM hard targets: for each masked region, a uniformly-sampled subword
    token of the argmax detector class in `lang`
    (reference _get_img_mask_mmxlm, data/mlm.py:262-308)."""
    mask = np.zeros(num_bb, bool)
    labels = np.full(num_bb, IGNORE, np.int64)

    def sample_label(i):
        top1 = int(np.argmax(soft_labels[i]))
        cand = vocab.class_token_ids(top1, lang)
        return int(cand[int(rng.integers(0, len(cand)))])

    for i in range(num_bb):
        if rng.random() < prob:
            mask[i] = True
            labels[i] = sample_label(i)
    if not mask.any():
        i = int(rng.integers(0, num_bb))
        mask[i] = True
        labels[i] = sample_label(i)
    return mask, labels


def mix_comask(example, v_range, mask_id, rng, prob=0.15):
    """'mix' dmasking: 50/50 random-co-masking vs plain MLM over the combined
    pair (reference data/mlm.py:406-415 calls random_word_dmasking — the
    single-subtoken 'random' variant — in the co-mask branch)."""
    if rng.random() < 0.5:
        return comask_tokens(example, v_range, mask_id, rng, "random", prob)
    ids = np.asarray(example["input_ids"])
    return mask_tokens(ids, v_range, mask_id, rng, prob)
