#!/usr/bin/env python
"""Precompute label-word token ids (label_token_ids_{lang}.json).

Run on a machine with the XLM-R tokenizer available (sentencepiece + the
downloaded vocab). Ships the exact token ids so training environments never
need the tokenizer (uc2_tpu/data/labels.py loads these assets; reference
builds them at import time, model/const_variable.py:1-23).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uc2_tpu.data.labels import ASSETS, LANGS, LabelVocab, try_xlmr_tokenizer


def main():
    tok = try_xlmr_tokenizer()
    if tok is None:
        sys.exit("XLM-R tokenizer unavailable (needs sentencepiece + "
                 "downloaded vocab); run elsewhere")
    vocab = LabelVocab(tokenize=tok)
    for lang in LANGS:
        path = os.path.join(ASSETS, f"label_token_ids_{lang}.json")
        with open(path, "w") as f:
            json.dump(vocab.token_ids[lang], f)
        print("wrote", path)


if __name__ == "__main__":
    main()
