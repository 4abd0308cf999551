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
    # the prefetch-safe KV broadcast degenerates to identity too
    assert mh.kv_broadcast_object("uc2/test/sp", obj) == obj


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


def test_batch_shardings_ragged_multiprocess(monkeypatch):
    """Multi-process + batch axis not divisible by the host-local data
    share must RAISE (silent replication of per-host-distinct data would
    diverge params across hosts — ADVICE r2); the lockstep-val escape
    hatch and the single-process fallback both still replicate."""
    import jax
    from uc2_tpu.parallel import mesh as M

    mesh = M.make_mesh()  # 8 CPU devices, data axis 8
    good = {"x": np.zeros((16, 4)), "step": np.float32(1)}
    ragged = {"x": np.zeros((13, 4))}

    # single-process: ragged replicates silently (one host, consistent)
    s = M.batch_shardings(mesh, ragged)
    assert s["x"].spec == P()

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    s = M.batch_shardings(mesh, good)   # 16 % (8/2) == 0 → sharded
    assert s["x"].spec == P("data")
    assert s["step"].spec == P()
    with pytest.raises(ValueError, match="diverge"):
        M.batch_shardings(mesh, ragged)
    # provably host-identical data may opt back into replication
    s = M.batch_shardings(mesh, ragged, ragged="replicate")
    assert s["x"].spec == P()
    # replicate_all: EVERY leaf replicates, including divisible ones —
    # final prediction sweeps over host-identical data (nlvr2 --pred_csv):
    # data-sharding a divisible leaf would concatenate the hosts'
    # identical copies into a duplicated-content global batch
    s = M.batch_shardings(mesh, good, ragged="replicate_all")
    assert s["x"].spec == P() and s["step"].spec == P()


def test_step_timer():
    t = StepTimer(smooth=0.5)
    for _ in range(5):
        with t:
            sum(range(1000))
    s = t.summary()
    assert s["mean_s"] > 0 and s["steps_per_s"] > 0
    assert len(t.samples) == 5
