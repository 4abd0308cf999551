"""Misc utilities (reference utils/misc.py).

``parse_with_config`` lives in uc2_tpu/config.py; NoOp in utils/logger.py.
Here: seeds, Struct, dropout override (a config.replace in this framework —
dropout rates are static config fields, not mutable module state).
"""

from __future__ import annotations

import random
from typing import Dict

import numpy as np

from uc2_tpu.config import UC2Config

VE_ENT2IDX = {"contradiction": 0, "entailment": 1, "neutral": 2}
VE_IDX2ENT = {0: "contradiction", 1: "entailment", 2: "neutral"}


class Struct:
    def __init__(self, dict_: Dict):
        self.__dict__.update(dict_)


def set_random_seed(seed: int):
    """Seed host-side RNGs (reference utils/misc.py:62-66). Device-side
    randomness flows through explicit jax PRNG keys instead."""
    random.seed(seed)
    np.random.seed(seed)


def set_dropout(config: UC2Config, drop_p: float) -> UC2Config:
    """Tune dropout for smaller datasets (reference set_dropout mutates
    torch modules, utils/misc.py:53-60; here dropout is config state)."""
    return config.replace(hidden_dropout_prob=drop_p,
                          attention_probs_dropout_prob=drop_p)
