"""Model zoo: single-stream VL encoder, pretraining heads, finetune models.

Mirrors the reference export surface (model/__init__.py:1-8) — pretraining,
image-text retrieval, VQA, VE, NLVR2 — rebuilt TPU-native.
"""

from uc2_tpu.models.encoder import UC2Model, create_position_ids_from_input_ids
from uc2_tpu.models.pretraining import UC2ForPretraining
from uc2_tpu.models.finetune import (UC2ForImageTextRetrieval, UC2ForNlvr2,
                                     UC2ForVqa, expand_type_embeddings)
from uc2_tpu.models.ot import optimal_transport_dist
