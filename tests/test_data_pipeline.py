"""Data layer tests: synth corpus → DBs → task datasets → static batches."""

import numpy as np
import pytest

from uc2_tpu.data import masking
from uc2_tpu.data.collate import BucketSpec, collate_batch, default_buckets, pick_bucket
from uc2_tpu.data.db import DetectFeatDb, TxtTokDb
from uc2_tpu.data.labels import LabelVocab, hash_tokenize
from uc2_tpu.data.loader import MetaLoader, PrefetchLoader, TaskLoader, deterministic_task_schedule
from uc2_tpu.data.sampler import BucketBatcher
from uc2_tpu.data.synth import synth_corpus
from uc2_tpu.data import datasets as D

BUCKETS = [BucketSpec(18, 40, 8, 16), BucketSpec(30, 100, 8, 32)]


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("corpus")
    paths = synth_corpus(str(out), n_imgs=12, txt_per_img=2, min_bb=5,
                         max_bb=30, img_dim=64, n_classes=11, seed=1)
    return paths


@pytest.fixture(scope="module")
def paired_corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("paired")
    return synth_corpus(str(out), n_imgs=8, txt_per_img=2, paired=True,
                        min_bb=5, max_bb=20, img_dim=64, n_classes=11, seed=2)


@pytest.fixture(scope="module")
def vocab():
    """11-class label vocab matching the synth corpus' n_classes=11."""
    words = {"en": [f"class{i}" for i in range(10)]}
    return LabelVocab(tokenize=lambda w: hash_tokenize(w, vocab_size=500,
                                                       reserved=4),
                      words=words)


def dbs(paths, **kw):
    return (TxtTokDb(paths["txt_db"], **kw),
            DetectFeatDb(paths["img_db"], conf_th=0.2, max_bb=30, min_bb=5))


def test_db_roundtrip(corpus):
    txt, img = dbs(corpus)
    assert len(txt.ids) > 0
    rec = txt[txt.ids[0]]
    assert "input_ids" in rec and "img_fname" in rec
    feat, bb7 = img[rec["img_fname"]]
    assert feat.shape[1] == 64 and bb7.shape[1] == 7
    np.testing.assert_allclose(bb7[:, 6], bb7[:, 4] * bb7[:, 5], rtol=1e-5)
    # sharding: ids[rank::world]
    txt0 = TxtTokDb(corpus["txt_db"], shard=(0, 2))
    txt1 = TxtTokDb(corpus["txt_db"], shard=(1, 2))
    assert set(txt0.ids) | set(txt1.ids) == set(txt.ids)
    assert not set(txt0.ids) & set(txt1.ids)


def test_mask_tokens_semantics():
    rng = np.random.default_rng(0)
    n_masked, n_masktok, n_rand, n_keep, total = 0, 0, 0, 0, 0
    for _ in range(300):
        ids = rng.integers(4, 500, 40)
        new, labels = masking.mask_tokens(ids, (4, 500), 999, rng)
        sel = labels != -1
        assert sel.any()  # at least one masked
        np.testing.assert_array_equal(labels[sel], ids[sel])
        np.testing.assert_array_equal(new[~sel], ids[~sel])
        n_masked += sel.sum()
        n_masktok += (new[sel] == 999).sum()
        keep = new[sel] == ids[sel]
        n_keep += keep.sum()
        n_rand += (sel.sum() - (new[sel] == 999).sum() - keep.sum())
        total += len(ids)
    assert 0.12 < n_masked / total < 0.18
    assert 0.75 < n_masktok / n_masked < 0.85
    assert 0.05 < n_rand / n_masked < 0.15
    assert 0.05 < n_keep / n_masked < 0.15


def test_comask_full(paired_corpus):
    txt, img = dbs(paired_corpus)
    rng = np.random.default_rng(3)
    rec = txt[txt.ids[0]]
    for _ in range(20):
        new, labels = masking.comask_tokens(rec, txt.v_range, txt.mask, rng,
                                            "full")
        sel = np.flatnonzero(labels != -1)
        assert len(sel) >= 1
        len1 = len(rec["input_ids_lang1"])
        # masked lang1 positions must be < len1; lang2 ≥ len1+2
        for p in sel:
            assert p < len1 or p >= len1 + 2


def test_region_mask_with_labels(vocab):
    rng = np.random.default_rng(4)
    soft = rng.random((20, 11)).astype(np.float32)
    mask, labels = masking.region_mask_with_token_labels(rng, 20, soft, vocab)
    assert mask.any()
    assert (labels[mask] >= 0).all()
    assert (labels[~mask] == -1).all()


def test_label_vocab(vocab):
    assert vocab.label2token_valid.shape[0] == 11
    assert len(vocab.valid_ids) == vocab.label2token_valid.shape[1]
    proj = vocab.project_soft_labels(np.ones((3, 11), np.float32) / 11)
    np.testing.assert_allclose(proj.sum(-1), 1.0, rtol=1e-5)


def test_label_vocab_full_assets():
    """Full 1601-class build from the vendored label lists (hash fallback)."""
    full = LabelVocab(tokenize=hash_tokenize)
    assert full.label2token_valid.shape[0] == 1601
    for lang in ("en", "de", "ja", "zh", "fr", "cs"):
        assert len(full.token_ids[lang]) == 1601
    assert full.source in ("hash", "tokenizer", "asset")


def run_task_batches(ds, n=3, buckets=BUCKETS):
    tl = TaskLoader("t", ds, buckets, seed=0)
    out = []
    for _ in range(n):
        out.append(tl.next_batch())
    return out


def test_mlm_dataset(corpus):
    txt, img = dbs(corpus)
    ds = D.MlmDataset(txt, img)
    for batch in run_task_batches(ds):
        spec = BUCKETS[batch["_bucket"]]
        assert batch["input_ids"].shape == (spec.batch_size, spec.txt_len)
        assert batch["attn_mask"].shape == (spec.batch_size, spec.joint_len)
        M = ds.slot_budget(spec.txt_len, spec.num_bb)
        assert batch["masked_pos"].shape == (spec.batch_size, M)
        w = batch["masked_weight"]
        assert (w.sum(1) >= 1).all()
        # masked positions point into the text block
        assert (batch["masked_pos"][w > 0] < spec.txt_len).all()


def test_tlm_dataset(paired_corpus):
    txt, img = dbs(paired_corpus)
    ds = D.TlmDataset(txt, img, comasking_mode="full")
    batch = run_task_batches(ds, 1)[0]
    assert "position_ids" in batch
    ni = D.TlmDataset(txt, img, comasking_mode="random", text_only=True)
    batch = run_task_batches(ni, 1)[0]
    assert "img_feat" not in batch
    spec = BUCKETS[batch["_bucket"]]
    assert batch["attn_mask"].shape == (spec.batch_size, spec.txt_len)


def test_vmlm_and_soft(corpus, vocab):
    txt, img = dbs(corpus)
    ds = D.VmlmDataset(txt, img, label_vocab=vocab)
    batch = run_task_batches(ds, 1)[0]
    spec = BUCKETS[batch["_bucket"]]
    w = batch["masked_weight"]
    assert (batch["masked_pos"][w > 0] >= spec.txt_len).all()  # regions only
    assert batch["img_masks"].any()
    # masked input features are zeroed
    assert (batch["img_feat"][batch["img_masks"]] == 0).all()

    ds2 = D.MmxlmDataset(txt, img, label_vocab=vocab)
    b2 = run_task_batches(ds2, 1)[0]
    spec2 = BUCKETS[b2["_bucket"]]
    w2 = b2["masked_weight"]
    assert (b2["masked_pos"][w2 > 0] < spec2.txt_len).any()  # some text slots

    ds3 = D.VmlmSoftDataset(txt, img, label_vocab=vocab)
    b3 = run_task_batches(ds3, 1)[0]
    n_valid = len(vocab.valid_ids)
    spec3 = BUCKETS[b3["_bucket"]]
    assert b3["label_targets"].shape == (spec3.batch_size, spec3.max_masked,
                                         n_valid)
    w3 = b3["masked_weight"]
    sums = b3["label_targets"][w3 > 0].sum(-1)
    np.testing.assert_allclose(sums, 1.0, rtol=1e-4)


def test_mrfr_mrc(corpus):
    txt, img = dbs(corpus)
    b = run_task_batches(D.MrfrDataset(txt, img), 1)[0]
    w = b["masked_weight"] > 0
    assert b["feat_targets"][w].std() > 0  # real features captured
    assert (b["img_feat"][b["img_masks"]] == 0).all()
    b = run_task_batches(D.MrcDataset(txt, img), 1)[0]
    assert b["label_targets"].shape[-1] == 11


def test_itm_datasets(corpus):
    txt, img = dbs(corpus)
    ds = D.ItmDataset(txt, img, neg_sample_p=0.5)
    batches = run_task_batches(ds, 2)
    t = np.concatenate([b["targets"] for b in batches])
    assert set(np.unique(t)) <= {0, 1}
    rank = D.ItmRankDataset(txt, img, neg_sample_size=1)
    tl = TaskLoader("rank", rank, BUCKETS, seed=0)
    b = tl.next_batch()
    ss = b["sample_size"]
    assert ss == 3
    # groups flattened: targets pattern 1,0,0 repeating
    t = b["targets"].reshape(-1, ss)
    assert (t[:, 0] == 1).all() and (t[:, 1:] == 0).all()


def test_hardneg_itm(paired_corpus):
    txt, img = dbs(paired_corpus)
    ds = D.ItmHardNegDataset(txt, img)
    batches = run_task_batches(ds, 2)
    assert all(b["input_ids"].shape[0] == b["targets"].shape[0]
               for b in batches)


def test_epoch_dims_track_examples(corpus, paired_corpus):
    """The batcher routes on (txt_lens + 2, lens - txt_lens); both must
    equal the ACTUAL example dims after every new_epoch, or swapped
    examples mis-bucket and collate silently truncates the longer
    swapped caption's tail. Regression for a round-4 bug: hard-neg lens
    used `len(raw) + 2 + nbb` (derived nbb was +2 on EVERY example) and
    never refreshed txt_lens after caption swaps (reference per-epoch
    relen: data/itm.py:84-148)."""
    for paths, cls in ((corpus, D.ItmDataset),
                       (paired_corpus, D.ItmHardNegDataset)):
        txt, img = dbs(paths)
        ds = cls(txt, img)
        for epoch in range(2):
            rng = np.random.default_rng(epoch)
            ds.new_epoch(rng)
            for i in range(len(ds)):
                ex = ds.get_example(i, rng)
                assert ds.txt_lens[i] + 2 == len(ex["input_ids"]), (
                    cls.__name__, epoch, i)
                assert ds.lens[i] - ds.txt_lens[i] \
                    == ex["img_feat"].shape[0], (cls.__name__, epoch, i)


def test_rank_hardneg_group_semantics(corpus):
    """Reference ItmRankDatasetHardNeg (data/itm.py:561-613): hard negs
    ADD to the random ones (group = 1 + 2*hard + 2*rand), image slots
    sample from the mined txt2hardimgs pool, text slots from
    img2hardtxts; empty pools fall back to random with the SAME group
    size (static shapes for the jitted loss)."""
    txt, img = dbs(corpus)
    rank = D.ItmRankHardNegDataset(txt, img, neg_sample_size=1,
                                   hard_neg_size=2)
    assert rank.sample_size == 1 + 2 * (1 + 2)
    rng = np.random.default_rng(0)
    # before mining: random fallback, same group size
    g = rank.get_example(0, rng)
    assert len(g) == rank.sample_size
    assert g[0]["target"] == 1 and all(x["target"] == 0 for x in g[1:])
    # after mining: hard image slots draw from the pool
    tid = rank.ids[0]
    gt_img = rank.txt2img[tid]
    pool_imgs = [i for i in rank.all_imgs if i != gt_img][:3]
    pool_txts = [t for t in rank.all_txts
                 if t not in rank.img2txts[gt_img]][:3]
    rank.reload_hard_negs({"txt2hardimgs": {tid: pool_imgs},
                           "img2hardtxts": {gt_img: pool_txts}})
    g = rank.get_example(0, rng)
    assert len(g) == rank.sample_size
    # slots 1..hard_neg_size are hard images: same text as positive
    assert all((x["input_ids"] == g[0]["input_ids"]).all()
               for x in g[1:3])
    # slots hard+1..2*hard are hard texts over the gt image
    pos_feat = g[0]["img_feat"]
    assert all(np.array_equal(x["img_feat"], pos_feat) for x in g[3:5])
    # legacy flat format still loads (txt2hardimgs only)
    rank.reload_hard_negs({tid: pool_imgs})
    assert rank.txt2hardimgs[tid] == pool_imgs
    assert rank.img2hardtxts == {}
    g = rank.get_example(0, rng)
    assert len(g) == rank.sample_size


def test_vqa_nlvr(corpus):
    txt, img = dbs(corpus)
    b = run_task_batches(D.VqaDataset(txt, img, num_answers=13), 1)[0]
    assert b["soft_targets"].shape[-1] == 13
    b = run_task_batches(D.Nlvr2PairedDataset(txt, img),
                         1, [BucketSpec(18, 80, 8, 0),
                             BucketSpec(30, 200, 8, 0)])[0]
    assert "img_type_ids" in b
    assert set(np.unique(b["img_type_ids"])) <= {1, 2}


def test_meta_loader_determinism(corpus):
    txt, img = dbs(corpus)
    def make():
        loaders = {
            "mlm": TaskLoader("mlm", D.MlmDataset(txt, img), BUCKETS, seed=7),
            "itm": TaskLoader("itm", D.ItmDataset(txt, img), BUCKETS, seed=7),
        }
        return MetaLoader(loaders, ratios={"mlm": 2, "itm": 1},
                          accum_steps=2, seed=11)
    a, b = make(), make()
    for _ in range(8):
        (na, ba), (nb, bb) = next(a), next(b)
        assert na == nb
        np.testing.assert_array_equal(ba["input_ids"], bb["input_ids"])
    # accumulation windows share the task
    m = make()
    names = [next(m)[0] for _ in range(8)]
    for i in range(0, 8, 2):
        assert names[i] == names[i + 1]


def test_meta_loader_fast_forward_equivalence(corpus):
    """fast_forward(n) leaves the stream in EXACTLY the state of having
    consumed n optimizer steps — same task picks, same bucket draws, same
    epoch rollovers, same masking-rng keying (deterministic resume)."""
    txt, img = dbs(corpus)

    def make(accum, stacked):
        loaders = {
            "mlm": TaskLoader("mlm", D.MlmDataset(txt, img), BUCKETS,
                              seed=7),
            "itm": TaskLoader("itm", D.ItmDataset(txt, img), BUCKETS,
                              seed=7),
        }
        return MetaLoader(loaders, ratios={"mlm": 2, "itm": 1},
                          accum_steps=accum, seed=11,
                          stack_microbatches=stacked)

    for accum, stacked, n_steps in ((1, False, 9), (2, True, 6),
                                    (2, False, 6)):
        a, b = make(accum, stacked), make(accum, stacked)
        draws = n_steps if (stacked or accum == 1) else n_steps * accum
        for _ in range(draws):
            next(a)
        b.fast_forward(n_steps)
        assert a.step == b.step, (accum, stacked)
        for _ in range(5):
            (na, ba), (nb, bb) = next(a), next(b)
            assert na == nb, (accum, stacked)
            assert set(ba) == set(bb)
            for k in ba:
                np.testing.assert_array_equal(ba[k], bb[k],
                                              err_msg=f"{k} {accum}")


def test_loader_state_dict_roundtrip(corpus):
    """load_state_dict(state_dict()) lands a FRESH loader in exactly the
    same stream state — same future batches — including: mid-epoch
    cursors, epoch-rollover boundaries, pending deferrals, and dataset
    epoch state (ItmDataset's sampled negatives, which new_epoch rebuilds
    from its pure per-epoch rng). O(1) counterpart of fast_forward."""
    txt, img = dbs(corpus)

    def make(accum, stacked):
        loaders = {
            "mlm": TaskLoader("mlm", D.MlmDataset(txt, img), BUCKETS,
                              seed=7),
            "itm": TaskLoader("itm", D.ItmDataset(txt, img), BUCKETS,
                              seed=7),
        }
        return MetaLoader(loaders, ratios={"mlm": 2, "itm": 1},
                          accum_steps=accum, seed=11,
                          stack_microbatches=stacked)

    # n_draws chosen to cross epoch boundaries (12 imgs x 2 txt, B=8)
    for accum, stacked, n_draws in ((1, False, 3), (1, False, 11),
                                    (2, True, 5), (2, False, 9)):
        a = make(accum, stacked)
        for _ in range(n_draws):
            next(a)
        b = make(accum, stacked)
        b.load_state_dict(a.state_dict())
        assert b.step == a.step
        for _ in range(5):
            (na, ba), (nb, bb) = next(a), next(b)
            assert na == nb, (accum, stacked, n_draws)
            for k in ba:
                np.testing.assert_array_equal(
                    ba[k], bb[k], err_msg=f"{k} {accum} {stacked}")
        # round-trip of the ROUND-TRIPPED loader (cursor bookkeeping
        # survives a second generation)
        c = make(accum, stacked)
        c.load_state_dict(b.state_dict())
        (nb, bb), (nc, bc) = next(b), next(c)
        assert nb == nc
        for k in bb:
            np.testing.assert_array_equal(bb[k], bc[k])


def test_meta_loader_snapshots_trail_prefetch(corpus):
    """snapshot_for(k) returns the state at batch-step k even while a
    PrefetchLoader worker runs AHEAD of the consumer — the checkpoint
    reads a trailing snapshot matching the optimizer step it saves, not
    the worker's current position."""
    txt, img = dbs(corpus)

    def make():
        return MetaLoader(
            {"mlm": TaskLoader("mlm", D.MlmDataset(txt, img), BUCKETS,
                               seed=3)}, accum_steps=1, seed=5)

    a = make()
    pf = PrefetchLoader(a, depth=2)
    drawn = [next(pf) for _ in range(6)]
    sd = a.snapshot_for(4)
    assert sd is not None and sd["step"] == 4
    b = make()
    b.load_state_dict(sd)
    # b must reproduce the stream from batch-step 4 on — compare with the
    # already-drawn items 5..6 and fresh draws beyond them
    (n5, b5) = drawn[4]
    (nb5, bb5) = next(b)
    assert n5 == nb5
    for k in b5:
        np.testing.assert_array_equal(b5[k], bb5[k])
    (n6, b6), (nb6, bb6) = drawn[5], next(b)
    assert n6 == nb6
    for k in b6:
        np.testing.assert_array_equal(b6[k], bb6[k])


def test_meta_loader_kv_namespace_and_retirement(corpus, monkeypatch):
    """sync_buckets keys live in a run-unique namespace and the root
    retires keys older than the 256-step rolling window (ADVICE r3: one
    leaked key per window is hundreds of thousands over a run)."""
    from uc2_tpu.parallel import multihost as MH
    stored, deleted = {}, []
    monkeypatch.setattr(MH, "kv_broadcast_object",
                        lambda key, obj=None, root=0, **kw:
                        stored.setdefault(key, obj) or obj)
    monkeypatch.setattr(MH, "kv_delete", lambda key: deleted.append(key))
    txt, img = dbs(corpus)
    loaders = {"mlm": TaskLoader("mlm", D.MlmDataset(txt, img), BUCKETS,
                                 seed=7)}
    a = MetaLoader(loaders, seed=11, sync_buckets=True)
    b = MetaLoader(loaders, seed=11, sync_buckets=True)
    assert a.kv_ns != b.kv_ns          # run-unique: no resume collision
    for _ in range(260):
        next(a)
    assert all(k.startswith(f"uc2/bucket/{a.kv_ns}/") for k in stored)
    # steps 256..259 retired keys 0..3
    assert deleted == [f"uc2/bucket/{a.kv_ns}/{i}" for i in range(4)]


def test_meta_loader_kv_retirement_stacked_stride(corpus, monkeypatch):
    """Stacked accumulation writes keys at step stride accum_steps — the
    retired key must be offset by 256*stride or it NEVER matches a written
    key and every key leaks (code-review r4: a flat `step - 256` with
    accum=3 deleted keys ≡ 2 (mod 3), none of which ever existed)."""
    from uc2_tpu.parallel import multihost as MH
    stored, deleted = {}, []
    monkeypatch.setattr(MH, "kv_broadcast_object",
                        lambda key, obj=None, root=0, **kw:
                        stored.setdefault(key, obj) or obj)
    monkeypatch.setattr(MH, "kv_delete", lambda key: deleted.append(key))
    txt, img = dbs(corpus)
    loaders = {"mlm": TaskLoader("mlm", D.MlmDataset(txt, img), BUCKETS,
                                 seed=7)}
    a = MetaLoader(loaders, seed=11, sync_buckets=True, accum_steps=3,
                   stack_microbatches=True)
    for _ in range(260):                  # windows at steps 0, 3, ..., 777
        next(a)
    assert deleted, "no keys retired under stacked accumulation"
    assert all(k in stored for k in deleted), \
        "retired keys were never written (stride misalignment)"
    # exactly the writes older than the 256-write rolling window retired
    assert deleted == [f"uc2/bucket/{a.kv_ns}/{3 * i}" for i in range(4)]


def test_prefetch_loader_close_unblocks_worker():
    """close() releases a worker blocked on a full queue (infinite source —
    the driver case): the thread must exit and buffered items be dropped,
    otherwise every finished run leaks a live thread + depth+1 batches."""
    import itertools
    import time as _t
    pf = PrefetchLoader(({"i": i} for i in itertools.count()), depth=2)
    assert next(pf)["i"] == 0
    pf.close()
    for _ in range(100):                  # worker exits promptly
        if not pf.thread.is_alive():
            break
        _t.sleep(0.05)
    assert not pf.thread.is_alive()
    assert pf.q.empty()


def test_prefetch_loader():
    src = iter(range(10))
    pf = PrefetchLoader(iter([{"x": np.ones(3)} for _ in range(5)]), depth=2)
    out = list(pf)
    assert len(out) == 5


def test_prefetch_loader_device_put_hook():
    # the hook runs IN the worker thread (pretrain.py moves shard_batch
    # H2D there — measured +32% sustained, BASELINE.md r4) and must
    # preserve order and apply exactly once per item
    import threading
    seen_threads = set()

    def hook(item):
        seen_threads.add(threading.get_ident())
        return {**item, "tagged": item["i"] * 10}

    pf = PrefetchLoader(iter([{"i": i} for i in range(6)]), depth=2,
                        device_put=hook)
    out = list(pf)
    assert [b["tagged"] for b in out] == [0, 10, 20, 30, 40, 50]
    assert threading.get_ident() not in seen_threads  # ran off-thread


def test_prefetch_loader_propagates_worker_error():
    def gen():
        yield {"i": 0}
        raise RuntimeError("boom in worker")

    pf = PrefetchLoader(gen(), depth=2)
    assert next(pf)["i"] == 0
    import pytest
    with pytest.raises(RuntimeError, match="boom in worker"):
        next(pf)


def test_prefetch_loader_hook_error_propagates():
    def hook(item):
        if item["i"] == 2:
            raise ValueError("bad H2D")
        return item

    pf = PrefetchLoader(iter([{"i": i} for i in range(4)]), depth=2,
                        device_put=hook)
    assert next(pf)["i"] == 0
    assert next(pf)["i"] == 1
    import pytest
    with pytest.raises(ValueError, match="bad H2D"):
        next(pf)


def test_bucket_batcher():
    txt_lens = [10, 12, 25, 28, 10, 11, 12, 25, 10, 10, 10, 10, 10, 10, 10,
                10, 10]
    num_bbs = [20] * len(txt_lens)
    buckets = [BucketSpec(18, 40, 8, 8), BucketSpec(30, 100, 4, 8)]
    bb = BucketBatcher(txt_lens, num_bbs, buckets, seed=0)
    for bi, idx in bb.epoch(0):
        assert len(idx) == buckets[bi].batch_size
        for i in idx:
            assert txt_lens[i] <= buckets[bi].txt_len
