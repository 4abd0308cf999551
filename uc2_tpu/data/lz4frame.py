"""LZ4 *frame* codec over the system liblz4 — drop-in for the two
python-lz4 calls the reference makes (``from lz4.frame import compress,
decompress``, reference data/data.py:16) without needing the wheel.

The reference's text LMDBs store values as LZ4-frame-compressed msgpack
(data/data.py:104-118); this module lets the importer and fixtures speak
that exact wire format in an image that has liblz4.so but no python-lz4.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_lib = None


def _lz4():
    global _lib
    if _lib is None:
        name = ctypes.util.find_library("lz4") or "liblz4.so.1"
        lib = ctypes.CDLL(name)
        lib.LZ4F_compressFrameBound.restype = ctypes.c_size_t
        lib.LZ4F_compressFrameBound.argtypes = [ctypes.c_size_t,
                                                ctypes.c_void_p]
        lib.LZ4F_compressFrame.restype = ctypes.c_size_t
        lib.LZ4F_compressFrame.argtypes = [
            ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p,
            ctypes.c_size_t, ctypes.c_void_p]
        lib.LZ4F_isError.restype = ctypes.c_uint
        lib.LZ4F_isError.argtypes = [ctypes.c_size_t]
        lib.LZ4F_createDecompressionContext.restype = ctypes.c_size_t
        lib.LZ4F_createDecompressionContext.argtypes = [
            ctypes.POINTER(ctypes.c_void_p), ctypes.c_uint]
        lib.LZ4F_freeDecompressionContext.restype = ctypes.c_size_t
        lib.LZ4F_freeDecompressionContext.argtypes = [ctypes.c_void_p]
        lib.LZ4F_decompress.restype = ctypes.c_size_t
        lib.LZ4F_decompress.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_size_t), ctypes.c_void_p]
        _lib = lib
    return _lib


LZ4F_VERSION = 100


def compress(data: bytes) -> bytes:
    """lz4.frame.compress(data) equivalent (default preferences)."""
    lib = _lz4()
    n = len(data)
    bound = lib.LZ4F_compressFrameBound(n, None)
    out = ctypes.create_string_buffer(bound)
    written = lib.LZ4F_compressFrame(out, bound, data, n, None)
    if lib.LZ4F_isError(written):
        raise RuntimeError(f"LZ4F_compressFrame error code {written}")
    return out.raw[:written]


def decompress(data: bytes, chunk: int = 1 << 20) -> bytes:
    """lz4.frame.decompress(data) equivalent (streaming, any frame)."""
    lib = _lz4()
    ctx = ctypes.c_void_p()
    err = lib.LZ4F_createDecompressionContext(ctypes.byref(ctx),
                                              LZ4F_VERSION)
    if lib.LZ4F_isError(err):
        raise RuntimeError(f"LZ4F ctx error code {err}")
    try:
        src = ctypes.create_string_buffer(data, len(data))
        out_parts = []
        src_off = 0
        dst = ctypes.create_string_buffer(chunk)
        while src_off < len(data):
            src_size = ctypes.c_size_t(len(data) - src_off)
            dst_size = ctypes.c_size_t(chunk)
            rc = lib.LZ4F_decompress(
                ctx, dst, ctypes.byref(dst_size),
                ctypes.byref(src, src_off), ctypes.byref(src_size), None)
            if lib.LZ4F_isError(rc):
                raise RuntimeError(f"LZ4F_decompress error code {rc}")
            if dst_size.value:
                out_parts.append(dst.raw[:dst_size.value])
            if src_size.value == 0 and dst_size.value == 0:
                break  # stalled (truncated input)
            src_off += src_size.value
            if rc == 0 and src_off >= len(data):
                break
        return b"".join(out_parts)
    finally:
        lib.LZ4F_freeDecompressionContext(ctx)
