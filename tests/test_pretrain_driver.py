"""End-to-end pretraining driver test on a synthetic corpus (CPU mesh)."""

import json
import os

import numpy as np
import pytest

from uc2_tpu.data.synth import synth_corpus


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    out = tmp_path_factory.mktemp("driver_corpus")
    return synth_corpus(str(out), n_imgs=12, txt_per_img=2, min_bb=4,
                        max_bb=10, img_dim=16, n_classes=11, seed=7,
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


def run_driver(corpus, model_config, tmp_path, extra=None):
    import pretrain
    argv = [
        "--model_config", model_config,
        "--output_dir", str(tmp_path / "out"),
        "--train_datasets", json.dumps([
            {"name": "synth_en", "language": "en",
             "db": [corpus["txt_db"]], "img": [corpus["img_db"]],
             "tasks": ["mlm", "itm", "mrfr"], "mix_ratio": [2, 1, 1]}]),
        "--val_datasets", json.dumps([
            {"name": "synth_val", "language": "en",
             "db": [corpus["txt_db"]], "img": [corpus["img_db"]],
             "tasks": ["mlm"], "mix_ratio": [1]}]),
        "--max_txt_len", "20", "--max_bb", "10", "--min_bb", "4",
        "--train_batch_size", "256",
        "--num_train_steps", "6", "--warmup_steps", "2",
        "--valid_steps", "6", "--val_batches", "2", "--save_steps", "3",
        "--log_steps", "2", "--dtype", "float32", "--seed", "0",
    ] + (extra or [])
    opts = pretrain.parse_with_config(pretrain.build_parser(), argv)
    return pretrain.main(opts), opts


def test_pretrain_end_to_end(corpus, model_config, tmp_path):
    state, opts = run_driver(corpus, model_config, tmp_path)
    assert int(state.step) == 6
    # artifacts: hps, log, checkpoint, restore file
    assert os.path.exists(os.path.join(opts.output_dir, "log", "hps.json"))
    assert os.path.exists(os.path.join(opts.output_dir, "restore.ckpt"))
    ckpts = os.listdir(os.path.join(opts.output_dir, "ckpt"))
    assert any("model_step" in c for c in ckpts)
    scalars = open(os.path.join(opts.output_dir, "log",
                                "scalars.jsonl")).read()
    assert "loss/" in scalars and "perf/ex_per_s" in scalars


def test_pretrain_tlm_and_soft(corpus, model_config, tmp_path,
                               tmp_path_factory):
    """tlm (paired co-masking) + vmlm-soft through the full driver."""
    import pretrain
    paired = synth_corpus(str(tmp_path_factory.mktemp("paired")), n_imgs=8,
                          txt_per_img=2, paired=True, min_bb=4, max_bb=10,
                          img_dim=16, n_classes=11, seed=8, max_words=5,
                          vocab=512)
    argv = [
        "--model_config", model_config,
        "--output_dir", str(tmp_path / "out2"),
        "--train_datasets", json.dumps([
            {"name": "pair_de", "language": "en",
             "db": [paired["txt_db"]], "img": [paired["img_db"]],
             "tasks": ["tlm", "tlm-ni"], "mix_ratio": [1, 1]},
            {"name": "synth_en", "language": "en",
             "db": [corpus["txt_db"]], "img": [corpus["img_db"]],
             "tasks": ["vmlm-soft", "mrc"], "mix_ratio": [1, 1]}]),
        "--max_txt_len", "24", "--max_bb", "10", "--min_bb", "4",
        "--train_batch_size", "256", "--num_train_steps", "4",
        "--label_classes", "11",
        "--warmup_steps", "1", "--valid_steps", "0", "--save_steps", "4",
        "--log_steps", "2", "--dtype", "float32", "--seed", "0",
    ]
    opts = pretrain.parse_with_config(pretrain.build_parser(), argv)
    state = pretrain.main(opts)
    assert int(state.step) == 4


def test_pretrain_reference_flag_variants(corpus, model_config, tmp_path,
                                          tmp_path_factory):
    """The reference's secondary pretraining switches, all in one run:
    --itm_hard_neg (pretrain.py:261-272 → ItmDataset_HardNeg),
    --no_co_masking (tlm falls back to plain MLM, pretrain.py:142-144),
    --no_multilingual_vmlm (EN label list, pretrain.py:301-311),
    --optim adamax (optim/misc.py:21-29), --dropout (utils/misc.py:54-60).
    """
    import pretrain
    paired = synth_corpus(str(tmp_path_factory.mktemp("paired_hn")),
                          n_imgs=8, txt_per_img=2, paired=True, min_bb=4,
                          max_bb=10, img_dim=16, n_classes=11, seed=9,
                          max_words=5, vocab=512)
    argv = [
        "--model_config", model_config,
        "--output_dir", str(tmp_path / "out_flags"),
        "--train_datasets", json.dumps([
            {"name": "pair_de", "language": "de",
             "db": [paired["txt_db"]], "img": [paired["img_db"]],
             "tasks": ["itm", "tlm", "vmlm"], "mix_ratio": [1, 1, 1]}]),
        "--max_txt_len", "24", "--max_bb", "10", "--min_bb", "4",
        "--train_batch_size", "256", "--num_train_steps", "3",
        "--label_classes", "11",
        "--itm_hard_neg", "--no_co_masking", "--no_multilingual_vmlm",
        "--optim", "adamax", "--dropout", "0.05",
        "--warmup_steps", "1", "--valid_steps", "0", "--save_steps", "3",
        "--log_steps", "1", "--dtype", "float32", "--seed", "0",
    ]
    opts = pretrain.parse_with_config(pretrain.build_parser(), argv)
    state = pretrain.main(opts)
    assert int(state.step) == 3


def test_pretrain_rbg_rng_deterministic(corpus, model_config, tmp_path):
    """--rng_impl rbg (TPU hardware RngBitGenerator dropout masks) trains
    and stays run-to-run deterministic: the base key is typed but every
    step still derives its key as fold_in(base, step), so two identical
    runs are bit-identical (the streams differ from threefry — that is
    expected and documented)."""
    import jax
    s1, _ = run_driver(corpus, model_config, tmp_path / "r1",
                       extra=["--rng_impl", "rbg", "--num_train_steps", "3",
                              "--valid_steps", "0", "--save_steps", "3"])
    s2, _ = run_driver(corpus, model_config, tmp_path / "r2",
                       extra=["--rng_impl", "rbg", "--num_train_steps", "3",
                              "--valid_steps", "0", "--save_steps", "3"])
    assert int(s1.step) == int(s2.step) == 3
    for x, y in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        a = np.asarray(x)
        assert np.all(np.isfinite(a))
        np.testing.assert_array_equal(a, np.asarray(y))


def test_pretrain_resume(corpus, model_config, tmp_path):
    """Kill at step 6 → restart → restorer resumes past step 6."""
    state, opts = run_driver(corpus, model_config, tmp_path)
    assert int(state.step) == 6
    state2, _ = run_driver(corpus, model_config, tmp_path,
                           extra=["--num_train_steps", "8"])
    assert int(state2.step) == 8


def test_pretrain_exact_resume(corpus, model_config, tmp_path):
    """A run killed at step 6 and resumed to 8 is BIT-IDENTICAL to one
    that ran 8 steps uninterrupted, through BOTH resume paths: the O(1)
    stream-state restore (restore_stream → MetaLoader.load_state_dict,
    saved alongside restore.ckpt) and the fast_forward replay fallback
    (stream files deleted, as for a pre-stream-state checkpoint). The
    per-step rng is fold_in(base, step), a pure function of the step
    index. Beyond the reference, whose TrainingRestorer restarts the
    dataloader stream on resume (utils/save.py:164-213 restores
    model/optimizer state only)."""
    import glob
    import shutil

    import jax
    # "preempted" at 6 with the schedule targeting 8 (a bare 6-step run
    # would train under a DIFFERENT linear-decay slope than the straight
    # 8-step run — the schedule closes over num_train_steps)
    run_driver(corpus, model_config, tmp_path / "a",
               extra=["--num_train_steps", "8", "--stop_after_steps", "6"])
    # paired stream state was written at the step-6 save
    stream_files = glob.glob(str(tmp_path / "a" / "out"
                                 / "restore_stream_p*.json"))
    assert stream_files, "no stream-state file written at the save point"
    # variant c: same interrupted run, stream files removed → replay path
    shutil.copytree(tmp_path / "a", tmp_path / "c")
    for f in glob.glob(str(tmp_path / "c" / "out"
                           / "restore_stream_*.json")):
        os.remove(f)
    s_resumed, _ = run_driver(corpus, model_config, tmp_path / "a",
                              extra=["--num_train_steps", "8"])
    s_replay, _ = run_driver(corpus, model_config, tmp_path / "c",
                             extra=["--num_train_steps", "8"])
    s_straight, _ = run_driver(corpus, model_config, tmp_path / "b",
                               extra=["--num_train_steps", "8"])
    assert int(s_resumed.step) == int(s_replay.step) \
        == int(s_straight.step) == 8
    la = jax.tree_util.tree_leaves(s_resumed.params)
    lc = jax.tree_util.tree_leaves(s_replay.params)
    lb = jax.tree_util.tree_leaves(s_straight.params)
    assert len(la) == len(lb) == len(lc)
    for x, c, y in zip(la, lc, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
        np.testing.assert_array_equal(np.asarray(c), np.asarray(y))


def test_pretrain_reference_config_compat(tmp_path):
    """pretrain.py maps the reference's renamed config keys
    (co_masking_mode → comasking_mode, neg_size → nce_neg_size) with
    CLI-wins semantics (reference loader: utils/misc.py:23-33)."""
    import json as _json
    import pretrain
    p = tmp_path / "ref_pretrain.json"
    p.write_text(_json.dumps({"co_masking_mode": "full",
                              "neg_size": 256}))
    argv = ["--config", str(p)]
    opts = pretrain.parse_with_config(pretrain.build_parser(), argv)
    pretrain.apply_reference_config_compat(opts, argv)
    assert opts.comasking_mode == "full"
    assert opts.nce_neg_size == 256
    argv2 = ["--config", str(p), "--comasking_mode", "mix"]
    opts2 = pretrain.parse_with_config(pretrain.build_parser(), argv2)
    pretrain.apply_reference_config_compat(opts2, argv2)
    assert opts2.comasking_mode == "mix"
    assert opts2.nce_neg_size == 256


def test_resolve_checkpoint_path(tmp_path):
    """--checkpoint accepts an output_dir / ckpt dir and resolves to the
    newest milestone; an empty directory is a hard, useful error (the
    round-4 chip batch collapsed an empty glob to the bare dir and hit
    IsADirectoryError downstream)."""
    import pytest
    import pretrain
    # plain file: pass-through
    f = tmp_path / "m.msgpack"
    f.write_bytes(b"x")
    assert pretrain.resolve_checkpoint_path(str(f)) == str(f)
    # output_dir with ckpt/ subdir: newest numeric milestone wins
    out = tmp_path / "run"
    ck = out / "ckpt"
    ck.mkdir(parents=True)
    for step in (5, 10, 2):
        (ck / f"model_step_{step}.msgpack").write_bytes(b"x")
    (ck / "train_state_10.msgpack").write_bytes(b"x")
    want = str(ck / "model_step_10.msgpack")
    assert pretrain.resolve_checkpoint_path(str(out)) == want
    assert pretrain.resolve_checkpoint_path(str(ck)) == want
    # empty dir: loud error naming the path
    empty = tmp_path / "empty" / "ckpt"
    empty.mkdir(parents=True)
    with pytest.raises(FileNotFoundError, match="no.*milestones"):
        pretrain.resolve_checkpoint_path(str(empty.parent))
