#!/usr/bin/env python
"""Convert reference-format LMDB databases into U2S stores.

The reference stores text as lz4-frame-compressed msgpack in LMDB
(data/data.py:141-178) and image features as compressed-npz (or
msgpack-numpy) values in LMDB (data/data.py:45-129). This importer reads
those and writes txt.u2s / feat.u2s plus the sidecar jsons, after which
training here needs no LMDB at all.

Dependency fallbacks (this image has no lmdb/lz4/msgpack_numpy wheels):
  * lmdb      → uc2_tpu.data.lmdbio.LmdbReader (pure-python mdb walker)
  * lz4.frame → uc2_tpu.data.lz4frame (ctypes over system liblz4)
  * msgpack_numpy → local decoder for its ndarray wire format

Usage:
  python scripts/import_lmdb.py txt  /path/to/txt_db  /out/txt_db
  python scripts/import_lmdb.py img  /path/to/img_db  /out/img_db [--npz]
"""

import argparse
import io
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uc2_tpu.data.store import StoreWriter

try:
    from lz4.frame import decompress
except ImportError:
    from uc2_tpu.data.lz4frame import decompress


def lmdb_items(src: str):
    """Iterate (str key, bytes value) from an LMDB environment dir."""
    try:
        import lmdb
    except ImportError:
        from uc2_tpu.data.lmdbio import LmdbReader
        for k, v in LmdbReader(src).items():
            yield k.decode("utf-8"), v
        return
    env = lmdb.open(src, readonly=True, create=False)
    with env.begin(buffers=True) as txn:
        for key, value in txn.cursor():
            yield bytes(key).decode("utf-8"), bytes(value)


def decode_msgpack_numpy(obj):
    """msgpack-numpy wire format → numpy (the reference patches msgpack
    globally via msgpack_numpy.patch(), data/data.py:20-21)."""
    if isinstance(obj, dict):
        if obj.get(b"nd") is True or obj.get("nd") is True:
            g = lambda k: obj.get(k.encode()) if obj.get(
                k.encode()) is not None else obj.get(k)
            return np.frombuffer(
                g("data"), dtype=np.dtype(g("type"))).reshape(g("shape"))
        return {k: decode_msgpack_numpy(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [decode_msgpack_numpy(v) for v in obj]
    return obj


def import_txt(src: str, dst: str):
    import msgpack
    os.makedirs(dst, exist_ok=True)
    n = 0
    with StoreWriter(os.path.join(dst, "txt.u2s")) as w:
        for k, value in lmdb_items(src):
            rec = msgpack.loads(decompress(bytes(value)), raw=False)
            w.put(k, rec)
            n += 1
    for side in ("id2len.json", "meta.json", "txt2img.json",
                 "img2txts.json"):
        if os.path.exists(os.path.join(src, side)):
            shutil.copy(os.path.join(src, side), os.path.join(dst, side))
    print(f"imported txt db {src} ({n} records) -> {dst}")


def import_img(src: str, dst: str, npz: bool = False):
    import msgpack
    os.makedirs(dst, exist_ok=True)
    keys = []
    with StoreWriter(os.path.join(dst, "feat.u2s")) as w:
        for k, value in lmdb_items(src):
            if k == "__keys__":
                continue
            if npz:
                with io.BytesIO(bytes(value)) as reader:
                    dump = np.load(reader, allow_pickle=True)
                    rec = {f: np.asarray(dump[f]) for f in dump.files}
            else:
                rec = decode_msgpack_numpy(
                    msgpack.loads(bytes(value), raw=False))
            w.put(k, rec)
            keys.append(k)
        w.put("__keys__", keys)
    # nbb sidecar lives one level up from the env dir in the reference
    # layout ({img_dir}/{db_name}/, data/data.py:53-61); accept both
    for root in (src, os.path.dirname(src.rstrip("/"))):
        for side in os.listdir(root) if os.path.isdir(root) else []:
            if side.startswith("nbb_") and side.endswith(".json"):
                shutil.copy(os.path.join(root, side),
                            os.path.join(dst, side))
    print(f"imported img db {src} ({len(keys)} images) -> {dst}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["txt", "img"])
    ap.add_argument("src")
    ap.add_argument("dst")
    ap.add_argument("--npz", action="store_true",
                    help="image values are compressed npz, not msgpack")
    args = ap.parse_args()
    if args.kind == "txt":
        import_txt(args.src, args.dst)
    else:
        import_img(args.src, args.dst, args.npz)
