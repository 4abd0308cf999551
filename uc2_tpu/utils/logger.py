"""Logging / metrics (reference utils/logger.py, utils/misc.py).

Same surface: global LOGGER, a TensorBoard wrapper with its own global_step,
EMA RunningMeter (smooth 0.99), and NoOp for non-leader hosts.
tensorboardX is optional (present in this image); degrades to JSONL scalars.
"""

from __future__ import annotations

import json
import logging
import math
import os
from typing import Dict, Optional

_LOG_FMT = "%(asctime)s - %(levelname)s - %(name)s -   %(message)s"
_DATE_FMT = "%m/%d/%Y %H:%M:%S"
logging.basicConfig(format=_LOG_FMT, datefmt=_DATE_FMT, level=logging.INFO)
LOGGER = logging.getLogger("uc2_tpu")


def add_log_to_file(log_path: str):
    fh = logging.FileHandler(log_path)
    fh.setFormatter(logging.Formatter(_LOG_FMT, _DATE_FMT))
    LOGGER.addHandler(fh)


class TensorboardLogger:
    """reference utils/logger.py:24-62 — global-step-carrying TB wrapper."""

    def __init__(self):
        self._logger = None
        self._jsonl = None
        self._global_step = 0

    def create(self, path: str):
        os.makedirs(path, exist_ok=True)
        try:
            from tensorboardX import SummaryWriter
            self._logger = SummaryWriter(path)
        except ImportError:
            pass
        self._jsonl = open(os.path.join(path, "scalars.jsonl"), "a")

    def noop(self, *args, **kwargs):
        return

    def step(self):
        self._global_step += 1

    @property
    def global_step(self):
        return self._global_step

    def add_scalar(self, name: str, value, step: Optional[int] = None):
        if self._jsonl is None:
            return
        step = self._global_step if step is None else step
        if self._logger is not None:
            self._logger.add_scalar(name, value, step)
        self._jsonl.write(json.dumps(
            {"step": step, name: float(value)}) + "\n")

    def log_scalar_dict(self, log_dict: Dict, prefix: str = ""):
        if self._jsonl is None:
            return
        if prefix:
            prefix = f"{prefix}_"
        for name, value in log_dict.items():
            if isinstance(value, dict):
                self.log_scalar_dict(value, f"{prefix}{name}")
            else:
                self.add_scalar(f"{prefix}{name}", value)
        self._jsonl.flush()

    def __getattr__(self, name):
        if self._logger is None:
            return self.noop
        return getattr(self._logger, name)


TB_LOGGER = TensorboardLogger()


class RunningMeter:
    """EMA loss meter, smooth=0.99 (reference utils/logger.py:65-91)."""

    def __init__(self, name: str, val: Optional[float] = None,
                 smooth: float = 0.99):
        self._name = name
        self._sm = smooth
        self._val = val

    def __call__(self, value: float):
        if math.isnan(value) or math.isinf(value):
            return
        self._val = (value if self._val is None
                     else value * (1 - self._sm) + self._val * self._sm)

    def __str__(self):
        return f"{self._name}: {self._val:.4f}"

    @property
    def val(self):
        return self._val

    @property
    def name(self):
        return self._name


class NoOp:
    """Rank-noop sink (reference utils/logger.py:94-100)."""

    def __getattr__(self, name):
        return self.noop

    def noop(self, *args, **kwargs):
        return
