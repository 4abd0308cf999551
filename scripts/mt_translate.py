#!/usr/bin/env python
"""Offline caption translation via Azure Translator (with word alignments).

Reference capability: utils/ms_internal_mt.py (+ crash-restart wrapper
ms_internal_mt_popen.py). Produces, per caption, the translated text AND the
source↔target *word alignment* string that VTLM co-masking consumes
(data/mlm.py:111-119 expects ``lang1_lang2_walign`` word-index maps).

Usage:
  TRANSLATOR_TEXT_SUBSCRIPTION_KEY=... TRANSLATOR_TEXT_ENDPOINT=... \\
  python scripts/mt_translate.py --in captions.tsv --out captions_de.tsv \\
      --langs de [--auto-restart]

Input TSV: id<TAB>caption. Output TSV: id<TAB>src<TAB>lang<TAB>translation
<TAB>alignment. Resumes from an existing output file (the reference's
backup/resume logic, ms_internal_mt.py:73-128).
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import subprocess
import sys
import time
import uuid
from typing import Dict, List


def azure_translate(lines: List[str], langs: str, key: str, endpoint: str,
                    batch_size: int = 10):
    import requests
    langs = langs.replace("zh", "zh-Hans")
    params = "&".join(f"to={l}" for l in langs.split(","))
    url = (f"{endpoint}/translate?api-version=3.0&{params}"
           "&includeAlignment=true&includeSentenceLength=true")
    headers = {"Ocp-Apim-Subscription-Key": key,
               "Content-type": "application/json",
               "X-ClientTraceId": str(uuid.uuid4())}
    out = []
    for i in range(0, len(lines), batch_size):
        body = [{"text": t} for t in lines[i:i + batch_size]]
        r = requests.post(url, headers=headers, json=body, timeout=60)
        r.raise_for_status()
        out += r.json()
    return out


def alignment_to_word_map(src: str, tgt: str, proj: str) -> Dict[int, List[int]]:
    """Azure 'proj' alignment ('s0:s1-t0:t1 ...', char spans) → source-word
    index → [target-word indices], the format the VTLM datasets store."""
    def span_to_word(text):
        spans = []
        pos = 0
        for w in text.split():
            start = text.index(w, pos)
            spans.append((start, start + len(w) - 1))
            pos = start + len(w)
        return spans

    src_spans = span_to_word(src)
    tgt_spans = span_to_word(tgt)

    def find_word(spans, lo, hi):
        for i, (a, b) in enumerate(spans):
            if lo <= b and hi >= a:
                return i
        return None

    out: Dict[int, List[int]] = {}
    for pair in proj.split():
        s, t = pair.split("-")
        s0, s1 = map(int, s.split(":"))
        t0, t1 = map(int, t.split(":"))
        si = find_word(src_spans, s0, s1)
        ti = find_word(tgt_spans, t0, t1)
        if si is None or ti is None:
            continue
        out.setdefault(si, []).append(ti)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--langs", required=True)
    ap.add_argument("--batch-size", type=int, default=10)
    ap.add_argument("--auto-restart", action="store_true",
                    help="supervise and restart on crash (reference "
                         "ms_internal_mt_popen.py)")
    args = ap.parse_args()

    if args.auto_restart:
        cmd = [sys.executable, __file__, "--in", args.inp, "--out", args.out,
               "--langs", args.langs, "--batch-size", str(args.batch_size)]
        while True:
            rc = subprocess.Popen(cmd).wait()
            if rc == 0:
                print("translation done")
                return
            print("translation crashed; restarting...")
            time.sleep(5)

    key = os.environ.get("TRANSLATOR_TEXT_SUBSCRIPTION_KEY")
    endpoint = os.environ.get("TRANSLATOR_TEXT_ENDPOINT")
    if not key or not endpoint:
        sys.exit("set TRANSLATOR_TEXT_SUBSCRIPTION_KEY and "
                 "TRANSLATOR_TEXT_ENDPOINT")

    done = set()
    if os.path.exists(args.out):
        with open(args.out) as f:
            done = {row[0] for row in csv.reader(f, delimiter="\t") if row}
        print(f"resuming: {len(done)} rows already translated")

    rows = []
    with open(args.inp) as f:
        for row in csv.reader(f, delimiter="\t"):
            if row and row[0] not in done:
                rows.append(row)

    with open(args.out, "a") as fo:
        w = csv.writer(fo, delimiter="\t")
        for i in range(0, len(rows), args.batch_size):
            chunk = rows[i:i + args.batch_size]
            resp = azure_translate([r[1] for r in chunk], args.langs, key,
                                   endpoint, args.batch_size)
            for (rid, src), tr in zip(chunk, resp):
                for t in tr["translations"]:
                    align = t.get("alignment", {}).get("proj", "")
                    w.writerow([rid, src, t["to"], t["text"], align,
                                json.dumps(alignment_to_word_map(
                                    src, t["text"], align))])
            fo.flush()
    print("translation complete")


if __name__ == "__main__":
    main()
