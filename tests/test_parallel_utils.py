"""Multihost object collectives (single-process identity path), profiling
timer, and sharding rules."""

import numpy as np
import pytest

from uc2_tpu.parallel import multihost as mh
from uc2_tpu.parallel.mesh import param_pspec
from uc2_tpu.utils.profiling import StepTimer
from jax.sharding import PartitionSpec as P


def test_object_collectives_single_process():
    obj = {"task": "mlm", "ids": [1, 2, 3]}
    assert mh.all_gather_object(obj) == [obj]
    assert mh.broadcast_object(obj) == obj
    assert mh.sum_across_hosts(2.5) == 2.5


def test_param_pspec_rules():
    assert param_pspec("roberta/layer_0/attention/qkv/kernel") == \
        P(None, "model")
    assert param_pspec("roberta/layer_3/intermediate_dense/kernel") == \
        P(None, "model")
    assert param_pspec("roberta/layer_3/output_dense/kernel") == \
        P("model", None)
    assert param_pspec("roberta/embeddings/word_embeddings") == \
        P("model", None)
    assert param_pspec("roberta/embeddings/LayerNorm/weight") == P()
    assert param_pspec("cls/bias") == P("model")
    assert param_pspec("itm_output/out/kernel") == P()


def test_step_timer():
    t = StepTimer(smooth=0.5)
    for _ in range(5):
        with t:
            sum(range(1000))
    s = t.summary()
    assert s["mean_s"] > 0 and s["steps_per_s"] > 0
    assert len(t.samples) == 5
