"""VQA driver + NLVR2 two-row dataset end-to-end smoke tests (CPU)."""

import json

import numpy as np
import pytest

from uc2_tpu.data.synth import synth_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("vqa_corpus")
    return synth_corpus(str(out), n_imgs=10, txt_per_img=2, min_bb=4,
                        max_bb=8, img_dim=16, n_classes=11, seed=13,
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


def test_vqa_driver(corpus, model_config, tmp_path):
    import vqa
    argv = [
        "--model_config", model_config,
        "--output_dir", str(tmp_path / "out"),
        "--train_txt_db", corpus["txt_db"],
        "--train_img_db", corpus["img_db"],
        "--val_txt_db", corpus["txt_db"],
        "--val_img_db", corpus["img_db"],
        "--num_answer", "9",
        "--max_txt_len", "16", "--max_bb", "8", "--min_bb", "4",
        "--train_batch_size", "8", "--num_train_steps", "3",
        "--warmup_steps", "1", "--valid_steps", "3", "--val_batches", "1",
        "--save_steps", "2", "--log_steps", "2",
        "--dtype", "float32", "--seed", "0",
    ]
    opts = vqa.parse_with_config(vqa.build_parser(), argv)
    state = vqa.main(opts)
    assert int(state.step) == 3


def test_nlvr2_two_row(corpus):
    import jax
    from uc2_tpu.config import UC2Config
    from uc2_tpu.data.collate import BucketSpec
    from uc2_tpu.data.db import DetectFeatDb, TxtTokDb
    from uc2_tpu.data.loader import TaskLoader
    from uc2_tpu.data import datasets as D
    from uc2_tpu.models.finetune import UC2ForNlvr2

    cfg = UC2Config(vocab_size=512, hidden_size=32, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=64,
                    max_position_embeddings=64, img_dim=16, img_label_dim=11,
                    dtype="float32", use_pallas_attention=False)
    txt = TxtTokDb(corpus["txt_db"], max_txt_len=16)
    img = DetectFeatDb(corpus["img_db"], conf_th=0.2, max_bb=8, min_bb=4)
    ds = D.Nlvr2TwoRowDataset(txt, img)
    tl = TaskLoader("nlvr2", ds, [BucketSpec(18, 8, 4, 0)], seed=0)
    batch = tl.next_batch()
    batch.pop("_bucket")
    batch.pop("sample_size")
    B = batch["input_ids"].shape[0]
    assert B % 2 == 0
    assert batch["targets"].shape == (B // 2,)
    # rows pair up: 2i and 2i+1 share the statement
    np.testing.assert_array_equal(batch["input_ids"][0],
                                  batch["input_ids"][1])
    assert set(np.unique(batch["img_type_ids"])) <= {1, 2}

    for fmt in ("paired", "paired-attn"):
        model = UC2ForNlvr2(cfg, fmt=fmt)
        params = model.init_params(jax.random.PRNGKey(0))
        logits = model.logits(params, batch)
        assert logits.shape == (B // 2, 2)
        loss = model.loss(params, batch, deterministic=True)
        assert np.isfinite(np.asarray(loss)).all()
