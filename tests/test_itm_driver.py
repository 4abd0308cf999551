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
