"""Driver-level gradient accumulation: accum batches per optimizer step."""

import json
import os

import pytest

from uc2_tpu.data.synth import synth_corpus


def test_driver_accumulation(tmp_path):
    import pretrain
    corpus = synth_corpus(str(tmp_path / "c"), n_imgs=12, txt_per_img=2,
                          min_bb=4, max_bb=10, img_dim=16, n_classes=11,
                          seed=7, max_words=6, vocab=512)
    cfgp = tmp_path / "tiny.json"
    cfgp.write_text(json.dumps({
        "vocab_size": 512, "hidden_size": 32, "num_hidden_layers": 1,
        "num_attention_heads": 2, "intermediate_size": 64,
        "max_position_embeddings": 64, "img_dim": 16, "img_label_dim": 11,
        "use_pallas_attention": False}))
    argv = [
        "--model_config", str(cfgp),
        "--output_dir", str(tmp_path / "out"),
        "--train_datasets", json.dumps([
            {"name": "s", "language": "en", "db": [corpus["txt_db"]],
             "img": [corpus["img_db"]], "tasks": ["mlm", "itm"],
             "mix_ratio": [1, 1]}]),
        "--max_txt_len", "20", "--max_bb", "10", "--min_bb", "4",
        "--train_batch_size", "256", "--num_train_steps", "3",
        "--warmup_steps", "1", "--valid_steps", "0", "--save_steps", "3",
        "--log_steps", "1", "--dtype", "float32", "--seed", "0",
        "--gradient_accumulation_steps", "2",
    ]
    opts = pretrain.parse_with_config(pretrain.build_parser(), argv)
    state = pretrain.main(opts)
    # 3 optimizer steps, each consuming 2 accumulated batches
    assert int(state.step) == 3
