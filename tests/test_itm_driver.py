"""End-to-end retrieval finetune + full eval on synthetic data (CPU)."""

import json
import os

import numpy as np
import pytest

from uc2_tpu.data.synth import synth_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("itm_corpus")
    return synth_corpus(str(out), n_imgs=10, txt_per_img=2, min_bb=4,
                        max_bb=8, img_dim=16, n_classes=11, seed=9,
                        max_words=6, vocab=512)


@pytest.fixture(scope="module")
def model_config(tmp_path_factory):
    path = tmp_path_factory.mktemp("cfg") / "tiny.json"
    path.write_text(json.dumps({
        "vocab_size": 512, "hidden_size": 32, "num_hidden_layers": 1,
        "num_attention_heads": 2, "intermediate_size": 64,
        "max_position_embeddings": 64, "img_dim": 16, "img_label_dim": 11,
        "use_pallas_attention": False}))
    return str(path)


def test_itm_finetune_and_eval(corpus, model_config, tmp_path):
    import itm
    argv = [
        "--model_config", model_config,
        "--output_dir", str(tmp_path / "out"),
        "--train_txt_db", corpus["txt_db"],
        "--train_img_db", corpus["img_db"],
        "--val_txt_db", corpus["txt_db"],
        "--val_img_db", corpus["img_db"],
        "--test_datasets", json.dumps(
            [{"name": "synth", "db": corpus["txt_db"],
              "img": corpus["img_db"]}]),
        "--max_txt_len", "16", "--max_bb", "8", "--min_bb", "4",
        "--train_batch_size", "12", "--eval_batch_size", "8",
        "--num_train_steps", "4", "--warmup_steps", "1",
        "--valid_steps", "4", "--eval_txt_limit", "6",
        "--hard_neg_size", "3", "--hard_neg_steps", "2",
        "--save_steps", "2", "--log_steps", "2",
        "--dtype", "float32", "--seed", "0",
    ]
    opts = itm.parse_with_config(itm.build_parser(), argv)
    state, results = itm.main(opts)
    assert int(state.step) == 4
    assert "synth" in results
    log = results["synth"]
    for k in ("txt_r1", "img_r1", "r_mean"):
        assert 0.0 <= log[k] <= 1.0
    # hard negative mining artifacts exist: initial pass (step 0,
    # reference itm.py:233-235) + periodic; pools carry BOTH directions
    # (reference get_hard_negs returns txt2hardimgs AND img2hardtxts)
    mined = sorted(f for f in os.listdir(opts.output_dir)
                   if f.startswith("hard_negs"))
    assert "hard_negs_0.json" in mined and len(mined) >= 2
    hard = json.load(open(os.path.join(opts.output_dir, mined[0])))
    assert set(hard) == {"txt2hardimgs", "img2hardtxts"}
    assert all(len(v) <= opts.hard_neg_pool_size
               for v in hard["txt2hardimgs"].values())
    assert hard["img2hardtxts"]


def test_itm_hard_negs_without_periodic_mining(corpus, model_config,
                                               tmp_path):
    """--hard_neg_size alone (default --hard_neg_steps 0) must still run
    the initial mining pass — the dataset selects hard slots on
    hard_neg_size, so skipping the seed mine would leave every hard slot
    on the random fallback forever (code-review r4)."""
    import itm
    argv = [
        "--model_config", model_config,
        "--output_dir", str(tmp_path / "out_nostep"),
        "--train_txt_db", corpus["txt_db"],
        "--train_img_db", corpus["img_db"],
        "--max_txt_len", "16", "--max_bb", "8", "--min_bb", "4",
        "--train_batch_size", "12", "--eval_batch_size", "8",
        "--num_train_steps", "2", "--warmup_steps", "1",
        "--valid_steps", "0", "--save_steps", "5", "--log_steps", "1",
        "--hard_neg_size", "2",
        "--dtype", "float32", "--seed", "0",
    ]
    opts = itm.parse_with_config(itm.build_parser(), argv)
    assert opts.hard_neg_steps == 0
    state, _ = itm.main(opts)
    assert int(state.step) == 2
    mined = os.path.join(opts.output_dir, "hard_negs_0.json")
    assert os.path.exists(mined), "initial mining pass did not run"
    hard = json.load(open(mined))
    assert hard["txt2hardimgs"] and hard["img2hardtxts"]


def test_itm_finetune_with_accumulation(corpus, model_config, tmp_path):
    """--gradient_accumulation_steps routes through the in-step lax.scan
    (reference itm accumulates 8 micro-batches, config/uc2_mscoco_itm.json)."""
    import itm
    argv = [
        "--model_config", model_config,
        "--output_dir", str(tmp_path / "out_accum"),
        "--train_txt_db", corpus["txt_db"],
        "--train_img_db", corpus["img_db"],
        "--max_txt_len", "16", "--max_bb", "8", "--min_bb", "4",
        "--train_batch_size", "12",
        "--num_train_steps", "2", "--warmup_steps", "1",
        "--valid_steps", "0", "--save_steps", "5", "--log_steps", "1",
        "--dtype", "float32", "--seed", "0",
        "--gradient_accumulation_steps", "2",
    ]
    opts = itm.parse_with_config(itm.build_parser(), argv)
    state, results = itm.main(opts)
    assert int(state.step) == 2


@pytest.fixture(scope="module")
def corpus2(tmp_path_factory):
    out = tmp_path_factory.mktemp("itm_corpus2")
    return synth_corpus(str(out), n_imgs=8, txt_per_img=2, min_bb=4,
                        max_bb=8, img_dim=16, n_classes=11, seed=31,
                        max_words=6, vocab=512)


def test_itm_multidb_train_and_mining(corpus, corpus2, model_config,
                                      tmp_path):
    """Reference parity: train over a LIST of (txt, img) db pairs — the
    multilingual COCO recipe concatenates 4 of them
    (config/uc2_mscoco_itm.json:41-57) — with hard-negative pools mined
    per pair (negatives must come from the same db its anchors train
    against)."""
    import itm
    argv = [
        "--model_config", model_config,
        "--output_dir", str(tmp_path / "out_multidb"),
        "--train_txt_db", json.dumps([corpus["txt_db"], corpus2["txt_db"]]),
        "--train_img_db", json.dumps([corpus["img_db"], corpus2["img_db"]]),
        "--max_txt_len", "16", "--max_bb", "8", "--min_bb", "4",
        "--train_batch_size", "12", "--eval_batch_size", "8",
        "--num_train_steps", "4", "--warmup_steps", "1",
        "--hard_neg_size", "2", "--hard_neg_steps", "2",
        "--valid_steps", "0",
        "--save_steps", "4", "--log_steps", "2",
        "--dtype", "float32", "--seed", "0",
    ]
    opts = itm.parse_with_config(itm.build_parser(), argv)
    state, _ = itm.main(opts)
    assert int(state.step) == 4
    mined = sorted(f for f in os.listdir(opts.output_dir)
                   if f.startswith("hard_negs"))
    # initial (step 0) + periodic (steps 2, 4), each per db
    for step in (0, 2, 4):
        for k in (0, 1):
            assert f"hard_negs_{step}.db{k}.json" in mined
    # each db's pool is mined over its OWN corpus (synthetic ids are
    # deterministic so names overlap across dbs — what must differ is the
    # population: corpus has 10 imgs x 2 txts, corpus2 has 8 x 2)
    h0 = json.load(open(os.path.join(opts.output_dir,
                                     "hard_negs_0.db0.json")))
    h1 = json.load(open(os.path.join(opts.output_dir,
                                     "hard_negs_0.db1.json")))
    assert len(h0["txt2hardimgs"]) == 20
    assert len(h1["txt2hardimgs"]) == 16
    db1_imgs = {f"coco_{i:06d}.npz" for i in range(8)}
    assert all(set(v) <= db1_imgs for v in h1["txt2hardimgs"].values())
    assert any(im not in db1_imgs
               for v in h0["txt2hardimgs"].values() for im in v)


def test_reference_config_compat(tmp_path):
    """itm.py accepts the reference's own config keys
    (/root/reference/config/uc2_mscoco_itm.json shape): plural db lists,
    1-element val lists, test_txt_db/test_img_db pairs,
    steps_per_hard_neg, inf_minibatch_size. CLI still wins."""
    import itm
    ref_cfg = {
        "train_txt_dbs": ["/db/a.db/", "/db/b.db/"],
        "train_img_dbs": ["/img/x/", ["/img/x/", "/img/y/"]],
        "val_txt_db": ["/db/val.db/"],
        "val_img_db": ["/img/y/"],
        "test_txt_db": ["/db/t0.db/", "/db/t1.db/"],
        "test_img_db": ["/img/y/", "/img/y/"],
        "steps_per_hard_neg": 500,
        "inf_minibatch_size": 300,
        "margin": 0.3,
        "train_loss": "rank",
    }
    p = tmp_path / "ref_itm.json"
    p.write_text(json.dumps(ref_cfg))
    parser = itm.build_parser()
    argv = ["--config", str(p)]
    opts = itm.parse_with_config(parser, argv)
    itm.apply_reference_config_compat(opts, parser, argv)
    assert opts.train_txt_db == ["/db/a.db/", "/db/b.db/"]
    assert opts.train_img_db[1] == ["/img/x/", "/img/y/"]
    assert opts.val_txt_db == "/db/val.db/"
    assert opts.val_img_db == "/img/y/"
    assert [t["db"] for t in opts.test_datasets] == ["/db/t0.db/",
                                                     "/db/t1.db/"]
    assert opts.test_datasets[0]["name"] == "t0.db"
    assert opts.hard_neg_steps == 500
    assert opts.eval_batch_size == 300
    assert opts.margin == 0.3
    # CLI wins over every mapped key (reference utils/misc.py:23-33)
    argv2 = ["--config", str(p), "--eval_batch_size", "64",
             "--hard_neg_steps", "7",
             "--train_txt_db", "/db/cli.db/"]
    opts2 = itm.parse_with_config(parser, argv2)
    itm.apply_reference_config_compat(opts2, parser, argv2)
    assert opts2.eval_batch_size == 64
    assert opts2.hard_neg_steps == 7
    assert opts2.train_txt_db == "/db/cli.db/"


def test_shipped_mscoco_itm_config_parses():
    """config/uc2_mscoco_itm.json (the translated reference recipe) loads
    through the real parser: hyperparameters land on the right flags and
    the 4-pair multilingual train spec round-trips."""
    import itm
    parser = itm.build_parser()
    argv = ["--config", "config/uc2_mscoco_itm.json"]
    opts = itm.parse_with_config(parser, argv)
    itm.apply_reference_config_compat(opts, parser, argv)
    assert len(opts.train_txt_db) == 4 and len(opts.train_img_db) == 4
    assert isinstance(opts.train_img_db[3], list)   # COCO-CN routing pair
    assert opts.margin == 0.2 and opts.learning_rate == 1e-4
    assert opts.gradient_accumulation_steps == 8
    assert opts.num_train_steps == 50000 and opts.warmup_steps == 5000
    assert len(opts.test_datasets) == 11            # en 5 + ja 5 + zh 1
    assert not hasattr(opts, "_comment")            # dropped by the loader
