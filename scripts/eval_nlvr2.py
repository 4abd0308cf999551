#!/usr/bin/env python
"""Standalone NLVR2 accuracy + consistency scorer.

Reference: eval/nlvr2.py (official NLVR2 scorer over a prediction CSV and
the labeled-example jsonl). Same interface:

  python scripts/eval_nlvr2.py predictions.csv annotations.jsonl
"""

import csv
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uc2_tpu.evalu.itm_metrics import nlvr2_eval


def main(pred_csv: str, ann_jsonl: str):
    predictions = {}
    with open(pred_csv) as f:
        for row in csv.reader(f):
            if row:
                predictions[row[0]] = row[1].lower()
    labels = {}
    with open(ann_jsonl) as f:
        for line in f:
            if line.strip():
                ex = json.loads(line)
                labels[ex["identifier"]] = ex["label"].lower()
    missing = [k for k in labels if k not in predictions]
    if missing:
        print(f"Some predictions are missing! ({len(missing)})")
        for m in missing[:20]:
            print("Missing prediction for item", m)
        sys.exit(1)
    out = nlvr2_eval({k: predictions[k] for k in labels}, labels)
    print("accuracy=" + str(out["acc"]))
    print("consistency=" + str(out["consistency"]))


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
