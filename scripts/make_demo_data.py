#!/usr/bin/env python
"""Generate a small synthetic multilingual demo corpus under data/demo/.

Gives pretrain.py / itm.py / vqa.py something runnable out of the box:
  data/demo/en     — plain captions (mlm/itm/mrfr/mrc/vmlm tasks)
  data/demo/pair   — EN↔DE translation pairs with word alignments (tlm)
Then:  python pretrain.py --config config/demo_pretrain.json
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from uc2_tpu.data.synth import synth_corpus


def main(root="data/demo", n_imgs=64):
    en = synth_corpus(os.path.join(root, "en"), n_imgs=n_imgs,
                      txt_per_img=2, seed=1)
    pair = synth_corpus(os.path.join(root, "pair"), n_imgs=n_imgs // 2,
                        txt_per_img=2, paired=True, seed=2)
    print("demo data written:")
    for name, paths in (("en", en), ("pair", pair)):
        for k, v in paths.items():
            print(f"  {name}.{k}: {v}")


if __name__ == "__main__":
    main(*sys.argv[1:2])
