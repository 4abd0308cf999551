#!/usr/bin/env python
"""Translate the 1600 detector label words into a target language.

Reference capability: utils/ms_internal_mt_label.py:53-76 — produces
object_labels/img_label_objects_{lang}.txt (one translated label word per
line, same order as the EN list) for MRTM target selection in that language
(data/mlm.py:264-274).

Usage:
  TRANSLATOR_TEXT_SUBSCRIPTION_KEY=... TRANSLATOR_TEXT_ENDPOINT=... \\
  python scripts/mt_translate_labels.py --lang ja \\
      [--out uc2_tpu/assets/object_labels/img_label_objects_ja.txt]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uc2_tpu.data.labels import ASSETS, label_words
from scripts.mt_translate import azure_translate


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lang", required=True)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    key = os.environ.get("TRANSLATOR_TEXT_SUBSCRIPTION_KEY")
    endpoint = os.environ.get("TRANSLATOR_TEXT_ENDPOINT")
    if not key or not endpoint:
        sys.exit("set TRANSLATOR_TEXT_SUBSCRIPTION_KEY and "
                 "TRANSLATOR_TEXT_ENDPOINT")
    words = label_words("en")
    resp = azure_translate(words, args.lang, key, endpoint, batch_size=50)
    out = args.out or os.path.join(ASSETS,
                                   f"img_label_objects_{args.lang}.txt")
    with open(out, "w", encoding="utf-8") as f:
        for tr in resp:
            f.write(tr["translations"][0]["text"].strip() + "\n")
    print(f"wrote {len(resp)} labels to {out}")


if __name__ == "__main__":
    main()
