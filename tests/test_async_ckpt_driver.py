"""--async_ckpt routes milestone saves through OrbaxCheckpointer."""

import json
import os

from uc2_tpu.data.synth import synth_corpus


def test_pretrain_async_ckpt(tmp_path):
    import pretrain
    corpus = synth_corpus(str(tmp_path / "c"), n_imgs=8, txt_per_img=2,
                          min_bb=4, max_bb=10, img_dim=16, n_classes=11,
                          seed=7, max_words=6, vocab=512)
    cfgp = tmp_path / "tiny.json"
    cfgp.write_text(json.dumps({
        "vocab_size": 512, "hidden_size": 32, "num_hidden_layers": 1,
        "num_attention_heads": 2, "intermediate_size": 64,
        "max_position_embeddings": 64, "img_dim": 16, "img_label_dim": 11,
        "use_pallas_attention": False}))
    out = tmp_path / "out"
    argv = [
        "--model_config", str(cfgp),
        "--output_dir", str(out),
        "--train_datasets", json.dumps([
            {"name": "s", "language": "en", "db": [corpus["txt_db"]],
             "img": [corpus["img_db"]], "tasks": ["mlm"],
             "mix_ratio": [1]}]),
        "--max_txt_len", "20", "--max_bb", "10", "--min_bb", "4",
        "--train_batch_size", "256", "--num_train_steps", "2",
        "--warmup_steps", "1", "--valid_steps", "2", "--save_steps", "10",
        "--log_steps", "1", "--dtype", "float32", "--seed", "0",
        "--async_ckpt",
    ]
    opts = pretrain.parse_with_config(pretrain.build_parser(), argv)
    state = pretrain.main(opts)
    assert int(state.step) == 2
    # an orbax milestone exists and restores to the same tree
    import jax
    import numpy as np
    from uc2_tpu.training.checkpoint import OrbaxCheckpointer
    ockpt = OrbaxCheckpointer(str(out / "orbax"))
    step = ockpt.latest_step()
    assert step == 2
    restored = ockpt.restore(step, jax.device_get(state.params))
    a = jax.tree_util.tree_leaves(restored)
    b = jax.tree_util.tree_leaves(jax.device_get(state.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
