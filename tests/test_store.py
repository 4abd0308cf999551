"""U2S record store tests: roundtrip, compression, native/python agreement."""

import numpy as np
import pytest

from uc2_tpu.data.store import StoreReader, StoreWriter, pack_value, unpack_value
from uc2_tpu.data import native_build


def _write(tmp_path, compress):
    path = str(tmp_path / f"db_{compress}.u2s")
    rng = np.random.RandomState(0)
    records = {
        "a": {"input_ids": rng.randint(0, 100, 17).astype(np.int32),
              "img_fname": "img0.npz"},
        "b": {"features": rng.randn(36, 64).astype(np.float16),
              "norm_bb": rng.rand(36, 6).astype(np.float32),
              "soft_labels": rng.rand(36, 11).astype(np.float32)},
        "empty": {},
        "big": {"x": rng.randn(1000, 32).astype(np.float32)},
    }
    with StoreWriter(path, compress=compress) as w:
        for k, v in records.items():
            w.put(k, v)
    return path, records


def _check(reader, records):
    assert len(reader) == len(records)
    for k, v in records.items():
        got = reader[k]
        for field, val in v.items():
            if isinstance(val, np.ndarray):
                np.testing.assert_array_equal(got[field], val)
            else:
                assert got[field] == val
    assert reader.get("missing") is None
    batch = reader.batch_get(["b", "a", "missing", "big"])
    np.testing.assert_array_equal(batch[0]["features"],
                                  records["b"]["features"])
    assert batch[2] is None


@pytest.mark.parametrize("compress", [False, True])
def test_roundtrip_python_reader(tmp_path, compress):
    if compress and native_build.load() is None:
        pytest.skip("native lib unavailable")
    path, records = _write(tmp_path, compress)
    _check(StoreReader(path, native=False), records)


def test_roundtrip_native_reader(tmp_path):
    if native_build.load() is None:
        pytest.skip("native lib unavailable")
    path, records = _write(tmp_path, True)
    _check(StoreReader(path, native=True), records)


def test_pack_unpack_nested():
    v = {"a": [1, 2, 3], "b": {"c": np.arange(5, dtype=np.int64)},
         "s": "héllo", "f": 1.5}
    got = unpack_value(pack_value(v))
    assert got["a"] == [1, 2, 3]
    np.testing.assert_array_equal(got["b"]["c"], np.arange(5))
    assert got["s"] == "héllo" and got["f"] == 1.5
