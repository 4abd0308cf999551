"""U2S record store: Python writer + reader (native-accelerated).

Replaces the reference's LMDB(+lz4+msgpack) databases (data/data.py:141-178
TxtLmdb, :45-129 DetectFeatLmdb). Values are msgpack maps; numpy arrays are
encoded as ``{b"__nd__": 1, b"dtype": ..., b"shape": ..., b"data": raw}``
so decode is zero-copy-ish. See csrc/u2s.cpp for the binary layout.

The reader prefers the native mmap+LZ4 library (thread-pool batch fetch);
falls back to a pure-Python mmap reader when the native build is unavailable.
"""

from __future__ import annotations

import ctypes
import mmap
import os
import struct
from typing import Any, Dict, List, Optional, Sequence

import msgpack
import numpy as np

from uc2_tpu.data import native_build

MAGIC = b"U2S1"
CODEC_RAW = 0
CODEC_LZ4 = 1


# ---------------------------------------------------------------- msgpack
def _default(obj):
    if isinstance(obj, np.ndarray):
        return {b"__nd__": 1, b"dtype": obj.dtype.str,
                b"shape": list(obj.shape),
                b"data": obj.tobytes()}
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    raise TypeError(f"cannot pack {type(obj)}")


def _object_hook(obj):
    if obj.get(b"__nd__") == 1 or obj.get("__nd__") == 1:
        dtype = obj.get(b"dtype", obj.get("dtype"))
        shape = obj.get(b"shape", obj.get("shape"))
        data = obj.get(b"data", obj.get("data"))
        return np.frombuffer(data, dtype=np.dtype(dtype)).reshape(shape)
    return obj


def pack_value(value: Any) -> bytes:
    return msgpack.packb(value, default=_default, use_bin_type=True)


def unpack_value(buf: bytes) -> Any:
    return msgpack.unpackb(buf, object_hook=_object_hook, raw=False,
                           strict_map_key=False)


# ------------------------------------------------------------------ writer
class StoreWriter:
    """Append-only writer; call close() (or use as context manager)."""

    def __init__(self, path: str, compress: bool = True,
                 compress_threshold: int = 128):
        self.path = path
        self.f = open(path, "wb")
        self.f.write(MAGIC + struct.pack("<IQQ", 0, 0, 0))
        self.entries: List[tuple] = []
        self.offset = 24
        self.lib = native_build.load() if compress else None
        self.compress = compress and self.lib is not None
        self.threshold = compress_threshold

    def put(self, key: str, value: Any, raw: Optional[bytes] = None):
        blob = raw if raw is not None else pack_value(value)
        codec = CODEC_RAW
        out = blob
        if self.compress and len(blob) >= self.threshold:
            bound = self.lib.u2s_lz4_bound(len(blob))
            dst = ctypes.create_string_buffer(bound)
            n = self.lib.u2s_lz4_compress(blob, len(blob), dst, bound)
            if 0 < n < len(blob):
                out = dst.raw[:n]
                codec = CODEC_LZ4
        self.f.write(out)
        self.entries.append((key.encode(), self.offset, len(out), len(blob),
                             codec))
        self.offset += len(out)

    def close(self):
        index_offset = self.offset
        for key, off, stored, rawlen, codec in self.entries:
            self.f.write(struct.pack("<QQQBH", off, stored, rawlen, codec,
                                     len(key)))
            self.f.write(key)
        self.f.seek(4)
        self.f.write(struct.pack("<IQQ", 0, len(self.entries), index_offset))
        self.f.close()

    def __enter__(self):
        return self

    def __exit__(self, *a):
        self.close()


# ------------------------------------------------------------------ reader
class StoreReader:
    """Key-value reader over a U2S file.

    ``native=True`` uses the C++ mmap/LZ4 library with an internal thread
    pool for batch gets; otherwise a pure-Python mmap reader.
    """

    def __init__(self, path: str, native: bool = True, n_threads: int = 8):
        self.path = path
        self.lib = native_build.load() if native else None
        self.handle = None
        if self.lib is not None:
            self.handle = self.lib.u2s_open(path.encode(), n_threads)
            if not self.handle:
                raise IOError(f"u2s_open failed for {path}")
            self._index = None
            self._mm = None
        else:
            self._open_python()

    def _open_python(self):
        self._f = open(self.path, "rb")
        self._mm = mmap.mmap(self._f.fileno(), 0, access=mmap.ACCESS_READ)
        if self._mm[:4] != MAGIC:
            raise IOError(f"bad magic in {self.path}")
        n, index_offset = struct.unpack("<QQ", self._mm[8:24])
        self._index: Dict[bytes, tuple] = {}
        p = index_offset
        for _ in range(n):
            off, stored, rawlen, codec, klen = struct.unpack(
                "<QQQBH", self._mm[p:p + 27])
            key = self._mm[p + 27:p + 27 + klen]
            p += 27 + klen
            self._index[bytes(key)] = (off, stored, rawlen, codec)

    def __len__(self):
        if self.handle:
            return self.lib.u2s_num_records(self.handle)
        return len(self._index)

    def keys(self) -> List[str]:
        """All record keys (index order). The native handle doesn't expose
        enumeration, so this parses the file index with the python reader."""
        if self._index is None:
            tmp = StoreReader(self.path, native=False)
            try:
                return [k.decode("utf-8") for k in tmp._index]
            finally:
                tmp.close()
        return [k.decode("utf-8") for k in self._index]

    def get_raw(self, key: str) -> Optional[bytes]:
        if self.handle:
            k = key.encode()
            n = self.lib.u2s_raw_len(self.handle, k)
            if n < 0:
                return None
            buf = ctypes.create_string_buffer(int(n))
            got = self.lib.u2s_get(self.handle, k, buf, n)
            if got < 0:
                raise IOError(f"u2s_get({key}) -> {got}")
            return buf.raw[:got]
        ent = self._index.get(key.encode())
        if ent is None:
            return None
        off, stored, rawlen, codec = ent
        blob = self._mm[off:off + stored]
        if codec == CODEC_RAW:
            return bytes(blob)
        lib = native_build.load()
        if lib is None:
            raise RuntimeError("LZ4 record but native lib unavailable")
        dst = ctypes.create_string_buffer(rawlen)
        n = lib.u2s_lz4_decompress(bytes(blob), stored, dst, rawlen)
        if n < 0:
            raise IOError("lz4 decompress failed")
        return dst.raw[:n]

    def batch_get_raw(self, keys: Sequence[str]) -> List[Optional[bytes]]:
        if not self.handle:
            return [self.get_raw(k) for k in keys]
        n = len(keys)
        enc = [k.encode() for k in keys]
        lens = [self.lib.u2s_raw_len(self.handle, k) for k in enc]
        bufs = [ctypes.create_string_buffer(max(int(l), 1)) for l in lens]
        key_arr = (ctypes.c_char_p * n)(*enc)
        out_arr = (ctypes.c_char_p * n)(
            *[ctypes.cast(b, ctypes.c_char_p) for b in bufs])
        cap_arr = (ctypes.c_int64 * n)(*[max(int(l), 0) for l in lens])
        res_arr = (ctypes.c_int64 * n)()
        self.lib.u2s_batch_get(self.handle, key_arr, n, out_arr, cap_arr,
                               res_arr)
        out = []
        for i in range(n):
            out.append(bufs[i].raw[:res_arr[i]] if res_arr[i] >= 0 else None)
        return out

    def __getitem__(self, key: str):
        raw = self.get_raw(key)
        if raw is None:
            raise KeyError(key)
        return unpack_value(raw)

    def get(self, key: str, default=None):
        raw = self.get_raw(key)
        return default if raw is None else unpack_value(raw)

    def batch_get(self, keys: Sequence[str]) -> List[Any]:
        return [None if raw is None else unpack_value(raw)
                for raw in self.batch_get_raw(keys)]

    def close(self):
        if self.handle:
            self.lib.u2s_close(self.handle)
            self.handle = None
        elif self._mm is not None:
            self._mm.close()
            self._f.close()
            self._mm = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
