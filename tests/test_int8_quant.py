"""int8 serving quantization (encoder-block matmuls): accuracy envelope and
score agreement with the fp path."""

import jax
import jax.numpy as jnp
import numpy as np

from uc2_tpu.config import UC2Config
from uc2_tpu.models.encoder import int8_matmul
from uc2_tpu.models.finetune import UC2ForImageTextRetrieval


def test_int8_matmul_accuracy():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 768)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((768, 768)) * 0.02, jnp.float32)
    y_q = np.asarray(int8_matmul(x, w, jnp.float32))
    y = np.asarray(x @ w)
    rel = np.linalg.norm(y_q - y) / np.linalg.norm(y)
    assert rel < 0.02, rel          # ~1% relative Frobenius error


def test_int8_scores_track_fp_scores():
    """Same params, quant vs fp scoring: scores stay close and the ranking
    over a batch is preserved (the serving contract)."""
    rng = np.random.default_rng(1)
    base = dict(vocab_size=512, hidden_size=64, num_hidden_layers=2,
                num_attention_heads=4, intermediate_size=128,
                max_position_embeddings=64, img_dim=16, img_label_dim=11,
                dtype="float32", use_pallas_attention=False)
    fp = UC2ForImageTextRetrieval(UC2Config(**base))
    q8 = UC2ForImageTextRetrieval(UC2Config(**base, quant="int8"))
    params = fp.init_params(jax.random.PRNGKey(0))

    B, Lt, Nb = 16, 12, 8
    ids = rng.integers(4, 512, (B, Lt)).astype(np.int32)
    ids[:, 0] = 0
    batch = {
        "input_ids": jnp.asarray(ids),
        "img_feat": jnp.asarray(
            rng.standard_normal((B, Nb, 16)).astype(np.float32)),
        "img_pos_feat": jnp.asarray(rng.random((B, Nb, 7))
                                    .astype(np.float32)),
        "attn_mask": jnp.ones((B, Lt + Nb), jnp.int32),
    }
    s_fp = np.asarray(fp.scores(params, batch, deterministic=True)).ravel()
    s_q8 = np.asarray(q8.scores(params, batch, deterministic=True)).ravel()
    assert np.all(np.isfinite(s_q8))
    # scores drift but stay within a tight band of the fp spread
    spread = np.abs(s_fp).max() + 1e-6
    assert np.max(np.abs(s_q8 - s_fp)) < 0.15 * spread, (
        np.max(np.abs(s_q8 - s_fp)), spread)
    # rank correlation of the batch ordering
    r_fp = np.argsort(np.argsort(s_fp))
    r_q8 = np.argsort(np.argsort(s_q8))
    rho = np.corrcoef(r_fp, r_q8)[0, 1]
    assert rho > 0.95, rho
