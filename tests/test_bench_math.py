"""bench.py pure-math units: bucket weights, envelope, baseline scaling.

The driver parses bench.py's JSON line as the round's headline — these pin
the host-side math that turns per-bucket rates into that headline (the
chip-side _measure itself is exercised on hardware).
"""

import json

import numpy as np
import pytest

import bench


def test_uniform_weights_partition():
    ws = bench.uniform_weights()
    assert len(ws) == len(bench.BUCKET_EDGES)
    assert abs(sum(ws) - 1.0) < 1e-12
    # nbb uniform over [10, 100]: 27 / 30 / 34 values per bucket
    np.testing.assert_allclose(ws, [27 / 91, 30 / 91, 34 / 91], rtol=1e-12)


def test_hist_weights_counts_and_n(tmp_path):
    # 2 images ≤36, 1 in (36, 66], 1 in (66, 100]
    p = tmp_path / "nbb.json"
    p.write_text(json.dumps({"a": 10, "b": 36, "c": 50, "d": 100}))
    ws, n = bench.hist_weights(str(p))
    assert n == 4
    np.testing.assert_allclose(ws, [0.5, 0.25, 0.25])
    (tmp_path / "empty.json").write_text("{}")
    with pytest.raises(ValueError, match="empty"):
        bench.hist_weights(str(tmp_path / "empty.json"))


def test_envelope_weighted_harmonic_mean():
    # equal rates: the envelope is that rate regardless of weights
    assert abs(bench.envelope([100.0, 100.0], [0.3, 0.7]) - 100.0) < 1e-9
    # mixed-gallery semantics: time adds, pairs add
    r = bench.envelope([100.0, 50.0], [0.5, 0.5])
    assert abs(r - 1.0 / (0.5 / 100 + 0.5 / 50)) < 1e-12
    # dominated by the slow bucket as its weight → 1
    assert bench.envelope([1000.0, 10.0], [0.01, 0.99]) < 11.0


def test_v100_rate_flops_scaling():
    # at the flat L=162 shape the estimate is the documented baseline
    L_flat = bench.LT + bench.BUCKET_EDGES[-1]
    assert abs(bench.v100_rate(L_flat)
               - bench.V100_BASELINE_PAIRS_PER_SEC) < 1e-9
    # smaller joint length → proportionally more pairs/s (same utilization)
    assert bench.v100_rate(98) > bench.v100_rate(128) > bench.v100_rate(162)
    ratio = bench.v100_rate(98) / bench.v100_rate(162)
    assert abs(ratio - bench.flops_per_pair(162) / bench.flops_per_pair(98)) \
        < 1e-9


def test_flops_model_single_source():
    # bench and tpu_measure must share ONE FLOPs model (DESIGN.md
    # post-mortems: every rate needs a non-drifting roofline cross-check)
    from uc2_tpu.utils import flops as F
    assert bench.flops_per_pair is F.encoder_fwd_flops_per_pair
    assert bench.grad_flops_per_example is F.grad_flops_per_example
    assert bench.CHIP_CALIB_TFLOPS == F.CHIP_CALIB_TFLOPS
    # sanity: one L=162 pair is ~28 GFLOPs forward (12 layers × ~2.4G:
    # 8LH² proj + 4LHF ffn + 4L²H attn) — order-of-magnitude pin
    assert 1e10 < F.encoder_fwd_flops_per_pair(162) < 1e11


def test_backend_init_failure_predicate():
    # the round driver gets ONE bench run; on an init-class tunnel failure
    # bench re-execs itself (bounded) instead of losing the round's JSON.
    # Real bugs must NOT match — they propagate immediately.
    transient = RuntimeError(
        "Unable to initialize backend 'axon': UNAVAILABLE: "
        "TPU backend setup/compile error (Unavailable).")
    assert bench._is_backend_init_failure(transient)
    assert bench._is_backend_init_failure(RuntimeError("DEADLINE_EXCEEDED"))
    assert not bench._is_backend_init_failure(ValueError("bad shape"))
    assert not bench._is_backend_init_failure(KeyError("img_feat"))


def test_train_bucket_shapes_token_budget():
    """TRAIN_BUCKETS must be the scoring nbb buckets at their token-budget
    batch sizes (budget 20480, B=128 sweet spot at the flat bucket) and
    the envelope fields must mirror the scoring methodology (VERDICT r4
    #5: driver-captured, not BASELINE.md arithmetic)."""
    assert [b["Nb"] for b in bench.TRAIN_BUCKETS] == bench.BUCKET_EDGES
    assert bench.TRAIN_BUCKETS[-1]["B"] == 128
    for b in bench.TRAIN_BUCKETS:
        # within one example of the 20480-token budget at joint length,
        # snapped to multiples of 8 for TPU-friendly batch dims
        joint = bench.LT + b["Nb"]
        assert b["B"] % 8 == 0
        assert abs(b["B"] - 20480 / joint) / (20480 / joint) < 0.3
