"""COCO-CN split-spanning retrieval: one text DB whose captions reference
images living in TWO feature DBs (train2014 + val2014), routed by filename
substring — reference ItmRankDataset_COCO_CN / ItmValDataset_COCO_CN /
ItmEvalDataset_COCO_CN (data/itm.py:363-506) and
DetectFeatTxtTokDataset_COCO_CN._get_img_feat (data/data.py:308-315).

TPU-native shape: no special dataset classes — the datasets and eval only
touch the image store through the db object, so RoutingImageDb composes
with the plain ItmRankDataset/full_retrieval_eval unchanged. These tests
lock that end-to-end."""

import json
import os
import shutil

import numpy as np
import pytest

from uc2_tpu.data.collate import BucketSpec
from uc2_tpu.data.db import DetectFeatDb, RoutingImageDb, TxtTokDb
from uc2_tpu.data.loader import TaskLoader
from uc2_tpu.data.store import StoreReader, StoreWriter
from uc2_tpu.data.synth import synth_corpus
from uc2_tpu.data import datasets as D


@pytest.fixture(scope="module")
def split_corpus(tmp_path_factory):
    """A merged txt DB spanning a train2014 img db and a val2014 img db."""
    root = tmp_path_factory.mktemp("coco_cn")
    a = synth_corpus(str(root / "a"), n_imgs=8, txt_per_img=2, min_bb=4,
                     max_bb=10, img_dim=16, n_classes=11, seed=11,
                     max_words=6, vocab=512, fname_prefix="train2014")
    b = synth_corpus(str(root / "b"), n_imgs=6, txt_per_img=2, min_bb=4,
                     max_bb=10, img_dim=16, n_classes=11, seed=12,
                     max_words=6, vocab=512, fname_prefix="val2014")

    merged = root / "merged_txt_db"
    os.makedirs(merged, exist_ok=True)
    id2len, txt2img, img2txts = {}, {}, {}
    with StoreWriter(str(merged / "txt.u2s")) as w:
        for tag, src in (("a", a), ("b", b)):
            r = StoreReader(os.path.join(src["txt_db"], "txt.u2s"))
            with open(os.path.join(src["txt_db"], "id2len.json")) as f:
                src_len = json.load(f)
            for k in r.keys():
                rec = r[k]
                nk = f"{tag}_{k}"
                w.put(nk, rec)
                id2len[nk] = src_len[k]
                txt2img[nk] = rec["img_fname"]
                img2txts.setdefault(rec["img_fname"], []).append(nk)
    for name, obj in (("id2len.json", id2len), ("txt2img.json", txt2img),
                      ("img2txts.json", img2txts)):
        with open(merged / name, "w") as f:
            json.dump(obj, f)
    shutil.copy(os.path.join(a["txt_db"], "meta.json"),
                merged / "meta.json")

    txt_db = TxtTokDb(str(merged), max_txt_len=18)
    img_db = RoutingImageDb({
        "train2014": DetectFeatDb(a["img_db"], 0.2, 10, 4, 10),
        "val2014": DetectFeatDb(b["img_db"], 0.2, 10, 4, 10),
    })
    txt_db.paths = {"txt": str(merged), "img_a": a["img_db"],
                    "img_b": b["img_db"]}
    return txt_db, img_db


def test_routing_get(split_corpus):
    txt_db, img_db = split_corpus
    fnames = {txt_db.txt2img[t] for t in txt_db.ids}
    assert any("train2014" in f for f in fnames)
    assert any("val2014" in f for f in fnames)
    for f in sorted(fnames):
        feat, bb7 = img_db[f]
        assert feat.shape[1] == 16 and bb7.shape[1] == 7
        assert img_db.name2nbb[f] == feat.shape[0]


def test_itm_rank_batches_span_both_dbs(split_corpus):
    """Rank-loss training groups draw positives and negatives across both
    image DBs in one batch (reference ItmRankDataset_COCO_CN.__getitem__,
    data/itm.py:380-398)."""
    txt_db, img_db = split_corpus
    ds = D.ItmRankDataset(txt_db, img_db, neg_sample_size=1)
    tl = TaskLoader("itm-rank", ds, [BucketSpec(20, 10, 4, 0)], seed=0)
    feats_seen = set()
    for _ in range(6):
        batch = tl.next_batch()
        assert batch["input_ids"].shape[0] % ds.sample_size == 0
        assert np.isfinite(batch["img_feat"]).all()
        feats_seen.add(batch["img_feat"].shape[1:])
    assert feats_seen  # batches assembled across the routed gallery


def test_itm_driver_routed_img_dbs(split_corpus, tmp_path):
    """The --mscoco_cn case through the real driver: --train_img_db as a
    JSON [train2014_db, val2014_db] pair builds a RoutingImageDb
    (reference itm.py:140-147 selects the COCO-CN dataset variants when
    'itm_coco_zh' is in the txt path)."""
    import itm
    paths = split_corpus[0].paths
    routed = json.dumps([paths["img_a"], paths["img_b"]])
    cfg_path = tmp_path / "tiny.json"
    cfg_path.write_text(json.dumps({
        "vocab_size": 512, "hidden_size": 32, "num_hidden_layers": 1,
        "num_attention_heads": 2, "intermediate_size": 64,
        "max_position_embeddings": 64, "img_dim": 16, "img_label_dim": 11,
        "use_pallas_attention": False}))
    argv = [
        "--model_config", str(cfg_path),
        "--output_dir", str(tmp_path / "out"),
        "--train_txt_db", paths["txt"], "--train_img_db", routed,
        "--val_txt_db", paths["txt"], "--val_img_db", routed,
        "--test_datasets", json.dumps(
            [{"name": "cn", "db": paths["txt"], "img": json.loads(routed)}]),
        "--max_txt_len", "16", "--max_bb", "10", "--min_bb", "4",
        "--train_batch_size", "12", "--eval_batch_size", "8",
        "--num_train_steps", "2", "--warmup_steps", "1",
        "--valid_steps", "0", "--eval_txt_limit", "4",
        "--save_steps", "2", "--log_steps", "1",
        "--dtype", "float32", "--seed", "0",
    ]
    opts = itm.parse_with_config(itm.build_parser(), argv)
    state, results = itm.main(opts)
    assert int(state.step) == 2
    assert "cn" in results and 0.0 <= results["cn"]["txt_r1"] <= 1.0


def test_full_eval_over_routed_gallery(split_corpus):
    import jax
    from uc2_tpu.config import UC2Config
    from uc2_tpu.evalu.retrieval import full_retrieval_eval
    from uc2_tpu.models.finetune import UC2ForImageTextRetrieval
    txt_db, img_db = split_corpus
    cfg = UC2Config(vocab_size=512, hidden_size=32, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=64,
                    max_position_embeddings=64, img_dim=16,
                    img_label_dim=11, dtype="float32",
                    use_pallas_attention=False)
    model = UC2ForImageTextRetrieval(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    log = full_retrieval_eval(model, params, txt_db, img_db, 20, 10,
                              batch_size=8)
    assert {"img_r1", "img_r5", "img_r10", "txt_r1"} <= set(log)
    assert all(0.0 <= v <= 1.0 or k == "med_rank" or "mean" in k
               for k, v in log.items())
