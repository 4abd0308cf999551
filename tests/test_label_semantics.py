"""Pinned label-bridge semantics with a CONTROLLED tokenizer (exact ids,
no hash fallback) — locks the indexing/projection behavior the hash-based
statistical tests could mask (VERDICT weak #7):

  * class 0 → the literal word at BACKGROUND_INDEX in the label list
    (reference data/mlm.py:269-276: IMG_LABEL_OBJECTS[background_index]);
  * class c>0 → word c-1 (reference uses IMG_LABEL_OBJECTS[top1-1] against
    the raw list, which equals our background-prepended list at index c);
  * LABEL2TOKEN row 0 = tokenize('background') itself
    (reference model/const_variable.py:9 prepends 'background');
  * the valid-token-space projection is EXACTLY the reference's full-vocab
    matmul + renormalize (data/mlm.py:336-338) restricted to its support.
"""

import numpy as np

from uc2_tpu.data.labels import BACKGROUND_INDEX, LabelVocab

VOCAB = 4096
N_CLASSES = 1201  # > BACKGROUND_INDEX so the background row exists


def _tok(word: str):
    """Deterministic, human-checkable ids: word 'w<i>' → [10+i, 10+i+1]
    for even i, [10+i] for odd; 'background' → [7, 8]."""
    if word == "background":
        return [7, 8]
    i = int(word[1:])
    return [10 + 2 * i, 11 + 2 * i] if i % 2 == 0 else [10 + 2 * i]


def _vocab():
    words = [f"w{i}" for i in range(N_CLASSES - 1)]
    return LabelVocab(tokenize=_tok, words={"en": words}), words


def test_background_and_class_indexing():
    lv, words = _vocab()
    # class 0 → the *word* at BACKGROUND_INDEX, not the synthetic entry
    assert lv.class_token_ids(0) == _tok(words[BACKGROUND_INDEX])
    for c in (1, 2, 957, N_CLASSES - 1):
        assert lv.class_token_ids(c) == _tok(words[c - 1]), c


def test_matrix_row0_is_literal_background():
    lv, _ = _vocab()
    row0 = np.flatnonzero(lv.label2token_valid[0])
    assert [int(lv.valid_ids[j]) for j in row0] == _tok("background")


def test_valid_ids_are_sorted_union():
    lv, words = _vocab()
    expect = sorted({t for w in ["background"] + words for t in _tok(w)})
    assert lv.valid_ids.tolist() == expect


def test_projection_equals_reference_full_vocab_math():
    lv, words = _vocab()
    # reference: [*, C] @ [C, vocab] 0/1 matrix → renormalize → slice valid
    full = np.zeros((N_CLASSES, VOCAB), np.float32)
    for c, w in enumerate(["background"] + words):
        full[c, _tok(w)] = 1.0
    rng = np.random.default_rng(0)
    soft = rng.dirichlet(np.ones(N_CLASSES) * 0.05, 8).astype(np.float32)
    ref = soft @ full
    ref = ref / ref.sum(-1, keepdims=True)
    ref_valid = ref[:, lv.valid_ids]
    got = lv.project_soft_labels(soft)
    np.testing.assert_allclose(got, ref_valid, rtol=1e-6, atol=1e-7)
    # everything outside the valid support is zero in the reference too —
    # the compact space loses nothing
    mask = np.ones(VOCAB, bool)
    mask[lv.valid_ids] = False
    assert ref[:, mask].sum() == 0.0
