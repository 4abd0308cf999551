"""Visual-entailment finetuning driver.

Reference capability: UniterForVisualEntailment = the VQA model with 3
answers (model/ve.py:7-11, data/ve.py). This driver is exactly vqa.py with
num_answer pinned to 3 and VE class names (contradiction/entailment/neutral,
utils/misc.py VE_ENT2IDX).
"""

from uc2_tpu.config import parse_with_config
import vqa


def build_parser():
    p = vqa.build_parser()
    p.description = "UC2-TPU visual-entailment finetune"
    p.set_defaults(num_answer=3, output_dir="output/ve")
    return p


if __name__ == "__main__":
    opts = parse_with_config(build_parser())
    opts.num_answer = 3
    vqa.main(opts)
