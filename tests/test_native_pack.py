"""Native threaded ragged pack (csrc u2s_pack) — equality with the numpy
path and collate integration."""

import numpy as np
import pytest

from uc2_tpu.data import native_build
from uc2_tpu.data.collate import BucketSpec, collate_batch


def test_pack_ragged_matches_numpy():
    if native_build.load() is None:
        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    B, N, D = 16, 20, 64
    arrays = [rng.standard_normal((int(rng.integers(0, N + 1)), D))
              .astype(np.float32) for _ in range(B)]
    out_native = np.zeros((B, N, D), np.float32)
    assert native_build.pack_ragged(arrays, out_native)
    out_ref = np.zeros((B, N, D), np.float32)
    for i, a in enumerate(arrays):
        out_ref[i, :a.shape[0]] = a
    np.testing.assert_array_equal(out_native, out_ref)


def test_pack_ragged_rejects_bad_layout():
    if native_build.load() is None:
        pytest.skip("native lib unavailable")
    out = np.zeros((4, 8, 8), np.float32)
    # dtype mismatch → refuse (caller falls back to numpy)
    assert not native_build.pack_ragged(
        [np.zeros((2, 8), np.float16)] * 4, out)
    # non-contiguous source → refuse
    a = np.zeros((4, 16), np.float32)[:, ::2]
    assert not native_build.pack_ragged([a] * 4, out)


def test_collate_native_equals_fallback(monkeypatch):
    rng = np.random.default_rng(1)
    examples = []
    for _ in range(6):
        L = int(rng.integers(4, 12))
        nbb = int(rng.integers(2, 9))
        examples.append({
            "input_ids": rng.integers(4, 100, L).astype(np.int64),
            "img_feat": rng.standard_normal((nbb, 16)).astype(np.float32),
            "img_pos_feat": rng.random((nbb, 7)).astype(np.float32),
            "target": int(rng.integers(0, 2)),
        })
    spec = BucketSpec(12, 10, 8, 0)
    native = collate_batch(examples, spec)

    monkeypatch.setattr(native_build, "pack_ragged",
                        lambda arrays, out, n_threads=8: False)
    fallback = collate_batch(examples, spec)
    assert native.keys() == fallback.keys()
    for k in native:
        np.testing.assert_array_equal(native[k], fallback[k], err_msg=k)
