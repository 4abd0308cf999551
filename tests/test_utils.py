"""Utility-layer tests: VQA answer normalization, VE targets, m3p tokenizer
gating, logger meters."""

import numpy as np
import pytest

from uc2_tpu.utils import vqa_answers as V
from uc2_tpu.utils.logger import RunningMeter


def test_get_score():
    assert V.get_score(0) == 0.0
    assert V.get_score(1) == 0.3
    assert V.get_score(3) == 0.9
    assert V.get_score(7) == 1.0


def test_preprocess_answer():
    assert V.preprocess_answer("Two") == "2"
    assert V.preprocess_answer("the dog") == "dog"
    assert V.preprocess_answer("isnt") == "isn't"
    assert V.preprocess_answer("yes!") == "yes"
    assert V.preprocess_answer("1,000") == "1000"


def test_filter_and_ans2label():
    answers = [{"multiple_choice_answer": "cat", "question_id": i}
               for i in range(10)]
    answers += [{"multiple_choice_answer": "dog", "question_id": 100}]
    occ = V.filter_answers(answers, min_occurrence=9)
    assert "cat" in occ and "dog" not in occ
    a2l = V.create_ans2label(occ)
    assert a2l == {"cat": 0}


def test_compute_target():
    a2l = {"cat": 0, "dog": 1}
    ans = [{"answer": "cat"}] * 3 + [{"answer": "dog"}] * 1 + \
        [{"answer": "bird"}]
    t = V.compute_target(ans, a2l)
    d = dict(zip(t["labels"], t["scores"]))
    assert d[0] == 0.9 and d[1] == 0.3


def test_ve_target():
    t = V.compute_target_ve(["entailment", "entailment", "neutral"])
    d = dict(zip(t["labels"], t["scores"]))
    assert d[1] == pytest.approx(2 / 3)
    assert d[2] == pytest.approx(1 / 3)


def test_shipped_ans2label_assets():
    for name in ("ans2label.json", "ans2label_ja.json", "ans2label_vg.json",
                 "ans2label_en_trans2_ja.json", "ans2label_ja_trans2_en.json"):
        m = V.load_ans2label(name)
        assert len(m) > 100
        assert all(isinstance(v, int) for v in list(m.values())[:10])


def test_m3p_tokenizer_gating():
    from uc2_tpu.utils.m3p_tokenizer import M3PTokenizer
    tok = M3PTokenizer()  # no spm model; HF fallback likely absent here
    assert tok.bos_id == 0 and tok.pad_id == 1 and tok.eos_id == 2
    assert tok.mask_id == 250001
    if tok.sp is None and tok._hf is None:
        with pytest.raises(RuntimeError):
            tok.encode("hello")


def test_running_meter():
    m = RunningMeter("x", smooth=0.5)
    m(1.0)
    m(3.0)
    assert m.val == pytest.approx(2.0)
    m(float("nan"))  # ignored
    assert m.val == pytest.approx(2.0)


def test_mt_alignment_to_word_map():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from scripts.mt_translate import alignment_to_word_map
    src = "a small cat"
    tgt = "eine kleine Katze"
    # char spans: a=0:0 small=2:6 cat=8:10 | eine=0:3 kleine=5:10 Katze=12:16
    proj = "0:0-0:3 2:6-5:10 8:10-12:16"
    m = alignment_to_word_map(src, tgt, proj)
    assert m == {0: [0], 1: [1], 2: [2]}


def test_bert_position_style():
    import jax
    import jax.numpy as jnp
    from uc2_tpu.config import UC2Config
    from uc2_tpu.models.encoder import UC2Model
    cfg = UC2Config(vocab_size=100, hidden_size=16, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=32,
                    max_position_embeddings=20, img_dim=8, dtype="float32",
                    position_style="bert", pad_token_id=0,
                    use_pallas_attention=False)
    model = UC2Model(cfg)
    ids = jnp.asarray(np.random.randint(1, 100, (2, 6)), jnp.int32)
    b = {"input_ids": ids,
         "img_feat": jnp.zeros((2, 3, 8)), "img_pos_feat": jnp.zeros((2, 3, 7)),
         "attn_mask": jnp.ones((2, 9), jnp.int32)}
    params = model.init(jax.random.PRNGKey(0), **b)["params"]
    seq, _ = model.apply({"params": params}, **b)
    assert np.isfinite(np.asarray(seq)).all()
