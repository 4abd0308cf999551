"""Round-trip conversion: params → torch state dict → params (bit-equal)."""

import jax
import numpy as np

from uc2_tpu.config import UC2Config
from uc2_tpu.models.pretraining import UC2ForPretraining
from uc2_tpu.models import convert

CFG = UC2Config(vocab_size=300, hidden_size=32, num_hidden_layers=2,
                num_attention_heads=2, intermediate_size=64,
                max_position_embeddings=40, img_dim=16, img_label_dim=7,
                dtype="float32", use_pallas_attention=False)


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, p))
        else:
            out[p] = np.asarray(v)
    return out


def test_roundtrip():
    model = UC2ForPretraining(CFG)
    params = jax.tree_util.tree_map(
        np.asarray, model.init_params(jax.random.PRNGKey(3)))
    sd = convert.params_to_torch_state_dict(params)
    # tied weights present in the torch view
    assert "cls.decoder.weight" in sd and "feat_regress.weight" in sd
    back = convert.torch_to_params(sd)
    merged = convert.merge_params(params, back)
    a, b = _flatten(params), _flatten(merged)
    missing = []
    for k in a:
        if "nce_output" in k:
            continue  # extension head, not part of the torch format
        np.testing.assert_allclose(a[k], b[k], err_msg=k)
