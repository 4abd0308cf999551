#!/usr/bin/env python
"""Convert reference-format LMDB databases into U2S stores.

The reference stores text as lz4-compressed msgpack in LMDB
(data/data.py:141-178) and image features as msgpack/npz in LMDB
(data/data.py:45-129). This importer reads those (requires the `lmdb` and
`lz4` python packages — not in this image; run wherever the original data
lives) and writes txt.u2s / feat.u2s plus the sidecar jsons, after which
training here needs no LMDB at all.

Usage:
  python scripts/import_lmdb.py txt  /path/to/txt_db  /out/txt_db
  python scripts/import_lmdb.py img  /path/to/img_db  /out/img_db [--npz]
"""

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uc2_tpu.data.store import StoreWriter


def import_txt(src: str, dst: str):
    import lmdb
    import msgpack
    from lz4.frame import decompress
    os.makedirs(dst, exist_ok=True)
    env = lmdb.open(src, readonly=True, create=False)
    with env.begin(buffers=True) as txn, \
            StoreWriter(os.path.join(dst, "txt.u2s")) as w:
        for key, value in txn.cursor():
            k = bytes(key).decode("utf-8")
            rec = msgpack.loads(decompress(bytes(value)), raw=False)
            w.put(k, rec)
    for side in ("id2len.json", "meta.json", "txt2img.json",
                 "img2txts.json"):
        if os.path.exists(os.path.join(src, side)):
            shutil.copy(os.path.join(src, side), os.path.join(dst, side))
    print(f"imported txt db {src} -> {dst}")


def import_img(src: str, dst: str, npz: bool = False):
    import io
    import lmdb
    import msgpack
    import msgpack_numpy
    import numpy as np
    msgpack_numpy.patch()
    os.makedirs(dst, exist_ok=True)
    env = lmdb.open(src, readonly=True, create=False)
    keys = []
    with env.begin(buffers=True) as txn, \
            StoreWriter(os.path.join(dst, "feat.u2s")) as w:
        for key, value in txn.cursor():
            k = bytes(key).decode("utf-8")
            if k == "__keys__":
                continue
            if npz:
                with io.BytesIO(bytes(value)) as reader:
                    dump = np.load(reader, allow_pickle=True)
                    rec = {f: np.asarray(dump[f]) for f in dump.files}
            else:
                rec = msgpack.loads(bytes(value), raw=False)
            w.put(k, rec)
            keys.append(k)
        w.put("__keys__", keys)
    for side in os.listdir(src):
        if side.startswith("nbb_") and side.endswith(".json"):
            shutil.copy(os.path.join(src, side), os.path.join(dst, side))
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
