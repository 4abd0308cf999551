"""Build/load the native U2S store library (csrc/u2s.cpp) via g++ + ctypes.

No pybind11 in the image; the C ABI + ctypes keeps the binding surface tiny.
Build artifacts land in uc2_tpu/data/_native/.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_ROOT, "csrc", "u2s.cpp")
_OUT_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_native")
_OUT = os.path.join(_OUT_DIR, "libu2s.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def build(force: bool = False) -> Optional[str]:
    os.makedirs(_OUT_DIR, exist_ok=True)
    if (not force and os.path.exists(_OUT)
            and os.path.getmtime(_OUT) >= os.path.getmtime(_SRC)):
        return _OUT
    # No liblz4.so dev symlink in the image — link the runtime .so.1 directly.
    lz4_candidates = ["-llz4",
                      "/usr/lib/x86_64-linux-gnu/liblz4.so.1",
                      "/lib/x86_64-linux-gnu/liblz4.so.1"]
    last = None
    for lz4 in lz4_candidates:
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
               _SRC, "-o", _OUT, lz4]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
            return _OUT
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            last = getattr(e, "stderr", b"")
    raise RuntimeError(f"u2s native build failed: {last!r}")


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        try:
            path = build()
        except RuntimeError:
            _build_failed = True
            return None
        lib = ctypes.CDLL(path)
        lib.u2s_open.restype = ctypes.c_void_p
        lib.u2s_open.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.u2s_close.argtypes = [ctypes.c_void_p]
        lib.u2s_num_records.restype = ctypes.c_int64
        lib.u2s_num_records.argtypes = [ctypes.c_void_p]
        lib.u2s_raw_len.restype = ctypes.c_int64
        lib.u2s_raw_len.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.u2s_get.restype = ctypes.c_int64
        lib.u2s_get.argtypes = [ctypes.c_void_p, ctypes.c_char_p,
                                ctypes.c_char_p, ctypes.c_int64]
        lib.u2s_batch_get.restype = ctypes.c_int
        lib.u2s_batch_get.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.u2s_lz4_bound.restype = ctypes.c_int
        lib.u2s_lz4_bound.argtypes = [ctypes.c_int]
        lib.u2s_lz4_compress.restype = ctypes.c_int
        lib.u2s_lz4_compress.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                         ctypes.c_char_p, ctypes.c_int]
        lib.u2s_lz4_decompress.restype = ctypes.c_int
        lib.u2s_lz4_decompress.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                           ctypes.c_char_p, ctypes.c_int]
        lib.u2s_pack.restype = ctypes.c_int
        lib.u2s_pack.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
        _lib = lib
        return _lib


def pack_ragged(arrays, out, n_threads: int = 8) -> bool:
    """Threaded native pack of ragged row-major arrays into the padded
    batch buffer ``out`` ([B, N, ...]; rows beyond each array keep out's
    current contents). Returns False (caller should fall back to numpy) if
    the native lib is unavailable or an array needs a dtype/layout copy.
    """
    import numpy as np
    lib = load()
    if lib is None:
        return False
    stride = out.strides[0]
    if not out.flags.c_contiguous:
        return False
    for a in arrays:
        if not (isinstance(a, np.ndarray) and a.flags.c_contiguous
                and a.dtype == out.dtype and a.nbytes <= stride):
            return False
    n = len(arrays)
    srcs = (ctypes.c_void_p * n)(
        *[a.ctypes.data if a.size else 0 for a in arrays])
    sizes = (ctypes.c_int64 * n)(*[a.nbytes for a in arrays])
    lib.u2s_pack(srcs, sizes, n, out.ctypes.data_as(ctypes.c_void_p),
                 stride, n_threads)
    return True
