"""Tensor-parallel correctness: the same train step over dp-only and dp×tp
meshes must produce (numerically) identical losses and parameter updates —
the GSPMD shardings may not change math, only placement."""

import jax
import numpy as np
import pytest

from uc2_tpu.config import UC2Config
from uc2_tpu.data.collate import BucketSpec
from uc2_tpu.data.db import DetectFeatDb, TxtTokDb
from uc2_tpu.data.loader import TaskLoader
from uc2_tpu.data.synth import synth_corpus
from uc2_tpu.data import datasets as D
from uc2_tpu.models.pretraining import UC2ForPretraining
from uc2_tpu.parallel import mesh as M
from uc2_tpu.training import optim as O
from uc2_tpu.training.step import create_train_state, make_train_step

CFG = UC2Config(vocab_size=512, hidden_size=64, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=128,
                max_position_embeddings=64, img_dim=16, img_label_dim=11,
                dtype="float32", use_pallas_attention=False,
                hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)


def test_dp_vs_dptp_losses_match(tmp_path):
    corpus = synth_corpus(str(tmp_path), n_imgs=12, txt_per_img=2, min_bb=4,
                          max_bb=10, img_dim=16, n_classes=11, seed=23,
                          vocab=512)
    txt = TxtTokDb(corpus["txt_db"], max_txt_len=20)
    img = DetectFeatDb(corpus["img_db"], conf_th=0.2, max_bb=10, min_bb=4)
    tl = TaskLoader("mlm", D.MlmDataset(txt, img),
                    [BucketSpec(22, 10, 8, 8)], seed=9)
    batch = tl.next_batch()
    batch.pop("_bucket")

    model = UC2ForPretraining(CFG)
    params = jax.tree_util.tree_map(
        np.asarray, model.init_params(jax.random.PRNGKey(0)))
    tx = O.build_optimizer(params, O.constant(1e-3), grad_norm=5.0)

    results = {}
    for name, (nd, nm) in (("dp", (8, 1)), ("dp_tp", (2, 4))):
        mesh = M.make_mesh(n_data=nd, n_model=nm)
        with mesh:
            sharded = M.shard_params(mesh, params)
            state = jax.jit(lambda p: create_train_state(p, tx))(sharded)
            step = jax.jit(make_train_step(model, "mlm", tx))
            b = M.shard_batch(mesh, batch)
            losses = []
            for i in range(2):
                state, m = step(state, b, jax.random.PRNGKey(7))
                losses.append(float(m["loss"]))
            kernel = np.asarray(
                state.params["roberta"]["layer_0"]["intermediate_dense"]
                ["kernel"])
            results[name] = (losses, kernel)

    l_dp, k_dp = results["dp"]
    l_tp, k_tp = results["dp_tp"]
    np.testing.assert_allclose(l_dp, l_tp, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(k_dp, k_tp, rtol=1e-5, atol=1e-6)
