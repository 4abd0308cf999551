"""Edge cases: slot overflow truncation, comask near-boundary positions,
empty-region guards, bucket routing of oversized examples."""

import numpy as np
import pytest

from uc2_tpu.data import masking
from uc2_tpu.data.collate import BucketSpec, collate_batch, pick_bucket
from uc2_tpu.data.sampler import BucketBatcher


def test_slot_overflow_truncates():
    """More masked positions than M → first M kept, weights exact."""
    spec = BucketSpec(txt_len=8, num_bb=4, batch_size=1, max_masked=4)
    labels = np.arange(8)  # every position masked
    ex = {"input_ids": np.arange(8), "txt_labels": labels,
          "img_feat": np.zeros((4, 5)), "img_pos_feat": np.zeros((4, 7))}
    b = collate_batch([ex], spec)
    assert b["masked_weight"].sum() == 4
    np.testing.assert_array_equal(b["masked_pos"][0], [0, 1, 2, 3])
    np.testing.assert_array_equal(b["txt_labels"][0], [0, 1, 2, 3])


def test_text_plus_region_slot_split():
    """Region slots follow text slots; region targets land after text."""
    spec = BucketSpec(txt_len=6, num_bb=4, batch_size=1, max_masked=8)
    txt_labels = np.full(6, -1)
    txt_labels[2] = 42
    img_masks = np.array([True, False, True, False])
    ex = {"input_ids": np.arange(6), "txt_labels": txt_labels,
          "img_feat": np.zeros((4, 5)), "img_pos_feat": np.zeros((4, 7)),
          "img_masks": img_masks, "img_mask_tgt": img_masks,
          "feat_targets": np.arange(20).reshape(4, 5).astype(np.float32)}
    b = collate_batch([ex], spec, slot_target_keys=("feat_targets",))
    w = b["masked_weight"][0]
    assert w.sum() == 3
    np.testing.assert_array_equal(b["masked_pos"][0][:3], [2, 6 + 0, 6 + 2])
    # region targets at slots 1,2 = rows 0 and 2 of feat_targets
    np.testing.assert_array_equal(b["feat_targets"][0, 1],
                                  np.arange(5))
    np.testing.assert_array_equal(b["feat_targets"][0, 2],
                                  np.arange(10, 15))


def test_comask_lang2_out_of_range():
    """Aligned lang2 positions beyond the truncated sequence are skipped."""
    rng = np.random.default_rng(0)
    rec = {
        "input_ids": [10, 11, 2, 2, 20, 21],
        "input_ids_lang1": [10, 11],
        "word2ids_lang1": [[0], [1]],
        "word2ids_lang2": [[0], [1]],
        "lang1_lang2_walign": {"0": [1], "1": [0]},
    }
    for _ in range(10):
        new, labels = masking.comask_tokens(rec, (4, 100), 99, rng, "full")
        assert new.shape == (6,)
        sel = np.flatnonzero(labels != -1)
        assert len(sel) >= 1


def test_pick_bucket_oversize():
    buckets = [BucketSpec(10, 10, 4, 0), BucketSpec(20, 20, 4, 0)]
    assert pick_bucket(buckets, 25, 5) is None
    bb = BucketBatcher([25], [5], buckets)
    assert bb.n_skipped == 1
    assert list(bb.epoch(0)) == []


def test_region_mask_single_region():
    rng = np.random.default_rng(1)
    m = masking.region_mask(rng, 1, prob=0.0)
    assert m.tolist() == [True]  # at-least-one fires
