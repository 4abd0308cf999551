"""Dry run of the real-artifact parity runbook (scripts/verify_real_ckpt.py)
over synthetic stand-ins in the EXACT artifact formats: a torch .pt state
dict in the reference's key layout (tests/torch_oracle.py) + reference
LMDB environments (lmdbio writer, lz4-frame msgpack / compressed-npz
values). Proves the one-command chain — import → convert → logit parity →
full retrieval eval — executes end-to-end, so running it on real released
artifacts is purely a data-availability question.
"""

import importlib.util
import json
import os

import numpy as np
import pytest
import torch

from uc2_tpu.data.synth import synth_corpus
from tests.test_lmdb_import import u2s_to_reference_lmdb
from tests.torch_oracle import OracleUC2


def _load_runbook():
    spec = importlib.util.spec_from_file_location(
        "verify_real_ckpt",
        os.path.join(os.path.dirname(__file__), "..", "scripts",
                     "verify_real_ckpt.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_runbook_end_to_end(tmp_path):
    # synthetic corpus re-encoded into the reference's LMDB wire format
    corpus = synth_corpus(str(tmp_path / "u2s"), n_imgs=10, txt_per_img=2,
                          min_bb=4, max_bb=10, img_dim=32, n_classes=11,
                          seed=7, max_words=6, vocab=1000)
    lmdb_txt, lmdb_img = u2s_to_reference_lmdb(
        corpus["txt_db"], corpus["img_db"], str(tmp_path / "lmdb"))

    # a reference-format torch checkpoint (oracle keys == reference keys),
    # params perturbed away from init so parity is a strong check
    torch.manual_seed(0)
    oracle = OracleUC2(vocab=1000, h=64, n_layers=2, n_heads=4, ffn=128,
                       max_pos=66, img_dim=32, img_label_dim=11)
    with torch.no_grad():
        for p in oracle.parameters():
            p.add_(torch.randn_like(p) * 0.02)
    ckpt = tmp_path / "oracle.pt"
    torch.save(oracle.state_dict(), str(ckpt))

    model_cfg = {
        "vocab_size": 1000, "hidden_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 128,
        "max_position_embeddings": 66, "img_dim": 32, "img_label_dim": 11,
        "use_pallas_attention": False, "hidden_dropout_prob": 0.0,
        "attention_probs_dropout_prob": 0.0}
    cfgp = tmp_path / "tiny.json"
    cfgp.write_text(json.dumps(model_cfg))

    mod = _load_runbook()
    report = mod.main([
        "--checkpoint", str(ckpt),
        "--txt_db", lmdb_txt, "--img_db", lmdb_img,
        "--model_config", str(cfgp),
        "--workdir", str(tmp_path / "work"),
        "--max_txt_len", "16", "--max_bb", "10", "--min_bb", "4",
        "--num_bb", "10", "--batch_size", "8", "--parity_batch", "6",
    ])

    # converter + both forwards agree at fp32 tolerance (test_parity bar)
    assert report["logit_max_abs_diff"] < 1e-3, report
    assert report["logit_pearson"] > 0.999, report
    # no encoder/head weight may be silently unloaded on the oracle side
    core_missing = [k for k in report["oracle_missing_keys"]
                    if not k.startswith(("rank_output", "vqa_output"))]
    assert core_missing == [], core_missing
    # the eval stage really ran over the imported DBs
    assert {"img_r1", "img_r5", "img_r10", "txt_r1", "txt_r5",
            "txt_r10"} <= set(report["retrieval"])


def test_runbook_accepts_imported_u2s_dirs(tmp_path):
    """Passing already-imported u2s dirs skips the LMDB stage."""
    corpus = synth_corpus(str(tmp_path / "u2s"), n_imgs=6, txt_per_img=1,
                          min_bb=4, max_bb=8, img_dim=32, n_classes=11,
                          seed=8, max_words=6, vocab=1000)
    torch.manual_seed(1)
    oracle = OracleUC2(vocab=1000, h=64, n_layers=2, n_heads=4, ffn=128,
                       max_pos=66, img_dim=32, img_label_dim=11)
    ckpt = tmp_path / "oracle.pt"
    torch.save(oracle.state_dict(), str(ckpt))
    model_cfg = {
        "vocab_size": 1000, "hidden_size": 64, "num_hidden_layers": 2,
        "num_attention_heads": 4, "intermediate_size": 128,
        "max_position_embeddings": 66, "img_dim": 32, "img_label_dim": 11,
        "use_pallas_attention": False, "hidden_dropout_prob": 0.0,
        "attention_probs_dropout_prob": 0.0}
    cfgp = tmp_path / "tiny.json"
    cfgp.write_text(json.dumps(model_cfg))
    mod = _load_runbook()
    report = mod.main([
        "--checkpoint", str(ckpt),
        "--txt_db", corpus["txt_db"], "--img_db", corpus["img_db"],
        "--model_config", str(cfgp),
        "--workdir", str(tmp_path / "work"),
        "--max_txt_len", "16", "--max_bb", "8", "--min_bb", "4",
        "--num_bb", "8", "--batch_size", "8", "--parity_batch", "4",
        "--txt_limit", "4",
    ])
    assert report["logit_max_abs_diff"] < 1e-3
    assert "retrieval" in report
