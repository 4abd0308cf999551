"""Statistical semantics of samplers/masking: ITM negative rate, comask
mode structure, mmxlm-soft text one-hot merging."""

import numpy as np
import pytest

from uc2_tpu.data import masking
from uc2_tpu.data.collate import BucketSpec
from uc2_tpu.data.db import DetectFeatDb, TxtTokDb
from uc2_tpu.data.labels import LabelVocab, hash_tokenize
from uc2_tpu.data.loader import TaskLoader
from uc2_tpu.data.synth import synth_corpus
from uc2_tpu.data import datasets as D


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    return synth_corpus(str(tmp_path_factory.mktemp("stats")), n_imgs=40,
                        txt_per_img=4, min_bb=4, max_bb=10, img_dim=16,
                        n_classes=11, seed=29, vocab=512)


def test_itm_negative_rate(corpus):
    txt = TxtTokDb(corpus["txt_db"], max_txt_len=30)
    img = DetectFeatDb(corpus["img_db"], conf_th=0.2, max_bb=10, min_bb=4)
    ds = D.ItmDataset(txt, img, neg_sample_p=0.5)
    rng = np.random.default_rng(0)
    ds.new_epoch(rng)
    labels = np.asarray(ds.labels)
    # ~50% negatives (reference neg_sample_p semantics, data/itm.py:170-173)
    assert 0.35 < labels.mean() < 0.65
    # negatives must have a *different* image than ground truth
    for i, id_ in enumerate(ds.ids):
        if labels[i] == 0:
            assert ds.train_imgs[i] != ds.txt2img[id_]
        else:
            assert ds.train_imgs[i] == ds.txt2img[id_]


def test_comask_modes_mask_both_languages(corpus):
    paired = synth_corpus(str(__import__("tempfile").mkdtemp()), n_imgs=8,
                          txt_per_img=2, paired=True, min_bb=4, max_bb=8,
                          img_dim=16, n_classes=11, seed=31, vocab=512)
    txt = TxtTokDb(paired["txt_db"], max_txt_len=40)
    rng = np.random.default_rng(2)
    lang1_hits = lang2_hits = 0
    for tid in txt.ids:
        rec = txt[tid]
        len1 = len(rec["input_ids_lang1"])
        for mode in ("random", "full"):
            _, labels = masking.comask_tokens(rec, txt.v_range, txt.mask,
                                              rng, mode)
            sel = np.flatnonzero(labels != -1)
            lang1_hits += int((sel < len1).sum() > 0)
            lang2_hits += int((sel >= len1 + 2).sum() > 0)
    # over many draws both sides get co-masked
    assert lang1_hits > 0 and lang2_hits > 0
    # lang2 is masked in the vast majority of draws (alignment p=0.8 +
    # fallback-to-word-0 semantics)
    assert lang2_hits >= lang1_hits * 0.5


def test_mmxlm_soft_text_onehot_merge(corpus):
    vocab = LabelVocab(tokenize=lambda w: hash_tokenize(w, vocab_size=512),
                       words={"en": [f"c{i}" for i in range(10)]})
    txt = TxtTokDb(corpus["txt_db"], max_txt_len=30)
    img = DetectFeatDb(corpus["img_db"], conf_th=0.2, max_bb=10, min_bb=4)
    ds = D.MmxlmSoftDataset(txt, img, label_vocab=vocab)
    tl = TaskLoader("mmxlm-soft", ds, [BucketSpec(32, 10, 8, 0)], seed=1)
    b = tl.next_batch()
    w = b["masked_weight"]
    t = b["label_targets"]
    # every live slot's target sums to 1 (region projection or text one-hot)
    # or 0 (text token outside the label vocabulary — reference quirk)
    sums = t[w > 0].sum(-1)
    assert np.all((np.abs(sums - 1) < 1e-4) | (np.abs(sums) < 1e-6))
    # region rows (image-block positions) always sum to 1
    spec_lt = 32
    pos = b["masked_pos"]
    region = (pos >= spec_lt) & (w > 0)
    np.testing.assert_allclose(t[region].sum(-1), 1.0, rtol=1e-4)
