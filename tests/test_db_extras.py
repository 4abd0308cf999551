"""RoutingImageDb / ConcatDataset / quick_validate tests."""

import numpy as np
import pytest

from uc2_tpu.data.db import DetectFeatDb, RoutingImageDb, TxtTokDb
from uc2_tpu.data.synth import synth_corpus
from uc2_tpu.data import datasets as D


@pytest.fixture(scope="module")
def two_corpora(tmp_path_factory):
    a = synth_corpus(str(tmp_path_factory.mktemp("ca")), n_imgs=6,
                     txt_per_img=2, min_bb=4, max_bb=8, img_dim=16,
                     n_classes=11, seed=21, vocab=512)
    b = synth_corpus(str(tmp_path_factory.mktemp("cb")), n_imgs=6,
                     txt_per_img=2, min_bb=4, max_bb=8, img_dim=16,
                     n_classes=11, seed=22, vocab=512)
    return a, b


def test_routing_image_db(two_corpora):
    a, b = two_corpora
    db_a = DetectFeatDb(a["img_db"], conf_th=0.2, max_bb=8, min_bb=4)
    db_b = DetectFeatDb(b["img_db"], conf_th=0.2, max_bb=8, min_bb=4)
    routed = RoutingImageDb({"coco_": db_a}, default=db_b)
    f1, bb1 = routed["coco_000001.npz"]
    f2, bb2 = db_a["coco_000001.npz"]
    np.testing.assert_array_equal(f1, f2)
    assert routed.name2nbb["coco_000001.npz"] == db_a.name2nbb[
        "coco_000001.npz"]
    assert len(routed.name2nbb.keys()) >= len(db_a.name2nbb)


def test_concat_dataset(two_corpora):
    a, b = two_corpora
    dsets = []
    for c in (a, b):
        txt = TxtTokDb(c["txt_db"], max_txt_len=20)
        img = DetectFeatDb(c["img_db"], conf_th=0.2, max_bb=8, min_bb=4)
        dsets.append(D.MlmDataset(txt, img))
    cat = D.ConcatDataset(dsets)
    assert len(cat) == len(dsets[0]) + len(dsets[1])
    assert len(cat.lens) == len(cat)
    rng = np.random.default_rng(0)
    e_first = cat.get_example(0, rng)
    e_second = cat.get_example(len(dsets[0]), rng)
    assert "input_ids" in e_first and "input_ids" in e_second


def test_quick_validate(two_corpora):
    import jax
    from uc2_tpu.config import UC2Config
    from uc2_tpu.evalu.retrieval import quick_validate
    from uc2_tpu.models.finetune import UC2ForImageTextRetrieval
    a, _ = two_corpora
    cfg = UC2Config(vocab_size=512, hidden_size=32, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=64,
                    max_position_embeddings=64, img_dim=16, img_label_dim=11,
                    dtype="float32", use_pallas_attention=False)
    model = UC2ForImageTextRetrieval(cfg)
    params = model.init_params(jax.random.PRNGKey(0))
    txt = TxtTokDb(a["txt_db"], max_txt_len=20)
    img = DetectFeatDb(a["img_db"], conf_th=0.2, max_bb=8, min_bb=4)
    log = quick_validate(model, params, txt, img, txt_len=22, num_bb=8,
                         n_imgs=4, n_txts=6, batch_size=4)
    for k in ("img_r1", "img_r5", "img_r10", "med_rank"):
        assert k in log
    assert 0 <= log["img_r1"] <= 1
