"""End-to-end real-data path: a fixture in the reference's EXACT on-disk
format (LMDB B+tree env, lz4-frame msgpack text values, compressed-npz
image values, sidecar jsons — reference data/data.py:45-178) goes through
scripts/import_lmdb.py and then drives training + retrieval eval.

The LMDB environments are written by uc2_tpu.data.lmdbio (pure-python mdb
writer) and the lz4 frames by uc2_tpu.data.lz4frame (system liblz4) — the
same modules the importer falls back to when the lmdb/lz4 wheels are
absent, so this also locks the wire formats against each other."""

import io
import json
import os
import shutil

import msgpack
import numpy as np
import pytest

from uc2_tpu.data import lz4frame
from uc2_tpu.data.lmdbio import LmdbReader, LmdbWriter
from uc2_tpu.data.store import StoreReader
from uc2_tpu.data.synth import synth_corpus


def u2s_to_reference_lmdb(txt_dir, img_dir, out_dir):
    """Re-encode a synthetic u2s corpus into the reference LMDB layout."""
    lmdb_txt = os.path.join(out_dir, "txt_db")
    lmdb_img = os.path.join(out_dir, "img_db")
    os.makedirs(lmdb_txt, exist_ok=True)
    os.makedirs(lmdb_img, exist_ok=True)

    # text: values = lz4.frame(msgpack) (reference TxtLmdb.__setitem__,
    # data/data.py:167-173)
    r = StoreReader(os.path.join(txt_dir, "txt.u2s"))
    with LmdbWriter(lmdb_txt) as w:
        for key in r.keys():
            rec = r[key]
            w.put(key, lz4frame.compress(
                msgpack.dumps(rec, use_bin_type=True)))
    for side in ("id2len.json", "meta.json", "txt2img.json",
                 "img2txts.json"):
        shutil.copy(os.path.join(txt_dir, side),
                    os.path.join(lmdb_txt, side))

    # image: values = compressed npz (reference DetectFeatLmdb compress=True
    # path, data/data.py:113-121), plus a json __keys__ record
    ri = StoreReader(os.path.join(img_dir, "feat.u2s"))
    keys = ri["__keys__"]
    with LmdbWriter(lmdb_img) as w:
        for fname in keys:
            rec = ri[fname]
            buf = io.BytesIO()
            np.savez_compressed(
                buf,
                features=np.asarray(rec["features"], np.float16),
                norm_bb=np.asarray(rec["norm_bb"], np.float32),
                conf=np.asarray(rec["conf"], np.float32),
                soft_labels=np.asarray(rec["soft_labels"], np.float32))
            w.put(fname, buf.getvalue())
        w.put("__keys__", json.dumps(list(keys)).encode("utf-8"))
    return lmdb_txt, lmdb_img


@pytest.fixture(scope="module")
def pipeline(tmp_path_factory):
    root = tmp_path_factory.mktemp("lmdb_e2e")
    corpus = synth_corpus(str(root / "u2s"), n_imgs=12, txt_per_img=2,
                          min_bb=4, max_bb=10, img_dim=16, n_classes=11,
                          seed=3, max_words=6, vocab=512)
    lmdb_txt, lmdb_img = u2s_to_reference_lmdb(
        corpus["txt_db"], corpus["img_db"], str(root / "lmdb"))

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "import_lmdb", os.path.join(os.path.dirname(__file__), "..",
                                    "scripts", "import_lmdb.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    out_txt = str(root / "imported" / "txt_db")
    out_img = str(root / "imported" / "img_db")
    mod.import_txt(lmdb_txt, out_txt)
    mod.import_img(lmdb_img, out_img, npz=True)
    return {"corpus": corpus, "lmdb_txt": lmdb_txt, "lmdb_img": lmdb_img,
            "out_txt": out_txt, "out_img": out_img}


def test_lmdb_roundtrip_records(pipeline):
    """Imported u2s records are bit-identical to the originals."""
    orig = StoreReader(os.path.join(pipeline["corpus"]["txt_db"],
                                    "txt.u2s"))
    new = StoreReader(os.path.join(pipeline["out_txt"], "txt.u2s"))
    assert sorted(orig.keys()) == sorted(new.keys())
    for k in orig.keys():
        assert orig[k] == new[k], k

    oi = StoreReader(os.path.join(pipeline["corpus"]["img_db"], "feat.u2s"))
    ni = StoreReader(os.path.join(pipeline["out_img"], "feat.u2s"))
    assert list(oi["__keys__"]) == list(ni["__keys__"])
    for f in oi["__keys__"]:
        a, b = oi[f], ni[f]
        for field in ("features", "norm_bb", "conf", "soft_labels"):
            np.testing.assert_array_equal(np.asarray(a[field]),
                                          np.asarray(b[field]), err_msg=f)


def test_lmdb_reader_spot_checks(pipeline):
    """The LMDB env itself decodes with the reference's exact recipe."""
    r = LmdbReader(pipeline["lmdb_txt"])
    orig = StoreReader(os.path.join(pipeline["corpus"]["txt_db"],
                                    "txt.u2s"))
    some = sorted(orig.keys())[:5]
    for k in some:
        raw = r.get(k.encode("utf-8"))
        rec = msgpack.loads(lz4frame.decompress(raw), raw=False)
        assert rec == orig[k]


def test_train_and_eval_from_imported(pipeline):
    """2 pretrain steps + retrieval eval, starting from the LMDB import."""
    import jax
    from uc2_tpu.config import UC2Config
    from uc2_tpu.data.collate import BucketSpec
    from uc2_tpu.data.db import DetectFeatDb, TxtTokDb
    from uc2_tpu.data.loader import TaskLoader
    from uc2_tpu.data import datasets as D
    from uc2_tpu.evalu.retrieval import full_retrieval_eval
    from uc2_tpu.models.finetune import UC2ForImageTextRetrieval
    from uc2_tpu.models.pretraining import UC2ForPretraining
    from uc2_tpu.training import optim as O
    from uc2_tpu.training.step import create_train_state, make_train_step

    cfg = UC2Config(vocab_size=512, hidden_size=32, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=64,
                    max_position_embeddings=64, img_dim=16, img_label_dim=11,
                    dtype="float32", use_pallas_attention=False)
    txt_db = TxtTokDb(pipeline["out_txt"], max_txt_len=18)
    img_db = DetectFeatDb(pipeline["out_img"], 0.2, 10, 4, 10)

    model = UC2ForPretraining(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    tx = O.build_optimizer(params, O.warmup_linear(1e-4, 2, 10), 0.01)
    state = create_train_state(params, tx)
    step = jax.jit(make_train_step(model, "mlm", tx))
    tl = TaskLoader("mlm", D.MlmDataset(txt_db, img_db, 0.15),
                    [BucketSpec(20, 10, 4, 12)], seed=0)
    for i in range(2):
        b = tl.next_batch()
        b.pop("_bucket", None)
        state, m = step(state, b, jax.random.PRNGKey(i))
        assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 2

    rmodel = UC2ForImageTextRetrieval(cfg)
    rparams = rmodel.init_params(jax.random.PRNGKey(1))
    log = full_retrieval_eval(rmodel, rparams, txt_db, img_db, 20, 10,
                              batch_size=8)
    assert {"img_r1", "txt_r1"} <= set(log)
