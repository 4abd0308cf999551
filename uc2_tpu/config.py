"""Model and run configuration.

TPU-native rebuild of the reference's config system:
  * ``UC2Config``     — model architecture config (reference: VLXLMRConfig,
    model/model.py:45-141, and legacy UniterConfig, model/model.py:778+).
  * ``parse_with_config`` — argparse + JSON merge where CLI flags win
    (reference: utils/misc.py:23-33).

Unlike the reference (mutable attribute bag), the config here is a frozen
dataclass so it can be closed over by jitted functions and hashed as a static
argument.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Optional

# Reference constants (utils/const.py:1-4)
IMG_DIM = 2048
IMG_LABEL_DIM = 1601
BUCKET_SIZE = 8192


@dataclasses.dataclass(frozen=True)
class UC2Config:
    """Architecture config for the single-stream vision-language encoder.

    Defaults mirror uc2-base (reference config/uc2-base.json): XLM-R vocab,
    max_position_embeddings 514, LayerNorm eps 1e-5, pad token 1.

    Note on LayerNorm epsilons: the reference hardcodes eps=1e-12 inside the
    transformer blocks (model/layer.py:108,149,196) and the region heads
    (model/model.py:1148,1164) regardless of ``layer_norm_eps``, while the
    embedding and Roberta-LM-head LayerNorms use ``layer_norm_eps``
    (model/model.py:301, model/layer.py:242). We reproduce both so logits
    match to fp32 tolerance.
    """

    vocab_size: int = 250002
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    hidden_act: str = "gelu"
    hidden_dropout_prob: float = 0.1
    attention_probs_dropout_prob: float = 0.1
    max_position_embeddings: int = 514
    type_vocab_size: int = 2
    initializer_range: float = 0.02
    layer_norm_eps: float = 1e-5
    # eps used by the in-block (attention-output / FFN-output) LayerNorms and
    # the region heads; hardcoded to 1e-12 in the reference.
    block_layer_norm_eps: float = 1e-12
    pad_token_id: int = 1
    img_dim: int = IMG_DIM
    img_label_dim: int = IMG_LABEL_DIM
    # "xlmr": position ids recomputed from the pad mask (cumsum formula,
    # reference model/model.py:280-290); "bert": plain arange (legacy UNITER
    # twin, whose collators pass arange position ids — model/model.py:778+).
    position_style: str = "xlmr"

    # --- TPU-specific knobs (no reference equivalent) ---
    # Compute dtype for activations ("bfloat16" on TPU, "float32" for parity).
    dtype: str = "bfloat16"
    # Attention backend: True → the batch-blocked fused Pallas kernel
    # (ops/flash_attention.py v3; measured +24% on the raw op and +1.5%
    # end-to-end vs XLA on v5e at L=162 — in-process A/B, BASELINE.md),
    # False → XLA einsum path, "flash" → jax's stock TPU flash kernel
    # (measured slower here: 128-block padding). True (default) routes TPU
    # attention through our Pallas kernels everywhere: fused inference
    # kernels (incl. the attention-block/FFN-block fusions) and
    # flash_attention_train for dropout training (−31% grad-step time vs
    # XLA, chained A/B — BASELINE.md r3).
    use_pallas_attention: bool = True
    # Remat (activation checkpointing) policy for encoder layers: "none",
    # "full", or "dots" (save matmul outputs only).
    remat: str = "none"
    # Serving quantization for the encoder-block matmuls: "none" or "int8"
    # (per-output-channel weight + dynamic per-row activation scales).
    # Measured on v5e r3: loses or ties bf16 at every retrieval-eval bucket
    # (this workload is attention/memory-bound and int8 forgoes the fused
    # blocks) — keep "none" there; the option remains for MXU-bound
    # deployments and halves weight memory. NOT parity-preserving.
    quant: str = "none"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "UC2Config":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})

    @classmethod
    def from_json_file(cls, path: str) -> "UC2Config":
        with open(path, "r", encoding="utf-8") as f:
            return cls.from_dict(json.load(f))

    def replace(self, **kw) -> "UC2Config":
        return dataclasses.replace(self, **kw)

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)


RNG_IMPLS = ("threefry2x32", "rbg")

# Driver default. Flipped threefry2x32 -> rbg in round 5 after the
# end-to-end race (tpu_measure train_ab, B=128 L=162 mlm): the rbg arm
# measured 6.38 steps/s vs 5.78 for threefry (+10.4%, 75% vs 67% of the
# chip calibration) — consistent with grad_profile's nodrop delta showing
# dropout at ~17% of the step, most of it threefry mask GENERATION.
# ``--rng_impl threefry2x32`` restores the legacy streams bit-exactly.
DEFAULT_RNG_IMPL = "rbg"


def base_prng_key(seed: int, impl: str = DEFAULT_RNG_IMPL):
    """Driver-level base PRNG key, selectable via ``--rng_impl``.

    ``rbg`` generates random bits on the TPU's hardware RngBitGenerator
    instead of software threefry2x32 — dropout-mask generation at
    [B, L, H]-sized masks is effectively free on the VPU, where threefry
    costs real grad-step time (the ``nodrop`` arm of ``tpu_measure
    grad_profile`` measures the total; the reference has no equivalent
    knob — torch dropout rides cuRAND). The random STREAMS differ between
    impls, but exact-resume determinism holds for both: drivers key every
    step as a pure function of the step index (fold_in / split chains),
    never host entropy.
    """
    import jax
    if impl == "threefry2x32":
        # legacy uint32 key: keeps the default streams bit-identical with
        # all previously recorded runs/tests
        return jax.random.PRNGKey(seed)
    return jax.random.key(seed, impl=impl)


def parse_with_config(parser, argv: Optional[list] = None):
    """argparse wrapper: ``--config file.json`` fills flags not given on the CLI.

    Mirrors reference utils/misc.py:23-33 (CLI wins over JSON).
    """
    args = parser.parse_args(argv)
    if getattr(args, "config", None):
        with open(args.config, "r", encoding="utf-8") as f:
            config_args = json.load(f)
        override_keys = {
            arg[2:].split("=")[0]
            for arg in (argv if argv is not None else __import__("sys").argv[1:])
            if arg.startswith("--")
        }
        for k, v in config_args.items():
            if k not in override_keys:
                setattr(args, k, v)
    if hasattr(args, "conf_th") and hasattr(args, "num_bb"):
        del_keys = [k for k in vars(args) if k.startswith("_")]
        for k in del_keys:
            delattr(args, k)
    return args
