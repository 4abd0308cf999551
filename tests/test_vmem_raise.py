"""Pin the raised scoped-VMEM plumbing for the training attention kernels.

Round 4 lost the BB=2 and native-layout races to Mosaic's 16 MiB
scoped-VMEM default (21.49M / 24.10M observed OOMs). Round 5m raises the
limit per-kernel via ``UC2_ATTN_TRAIN_VMEM_MB`` →
``pltpu.CompilerParams(vmem_limit_bytes=...)``; these tests pin the env
parsing, the budget scaling, the gate unlock at the production bucket,
and that the default path still hands Mosaic *no* compiler params (the
chip-proven program stays bit-identical when the env is unset).
"""
import os

import pytest

from uc2_tpu.ops.tiles import (VMEM_SCOPED_LIMIT, VMEM_TRAIN_BUDGET,
                               max_train_bb, train_vmem_budget,
                               train_vmem_limit)

PROD = dict(n=12, L=162, d=64, rate=0.1)  # uc2-base worst-case bucket


@pytest.fixture(autouse=True)
def _clean_env():
    old = os.environ.pop("UC2_ATTN_TRAIN_VMEM_MB", None)
    yield
    if old is None:
        os.environ.pop("UC2_ATTN_TRAIN_VMEM_MB", None)
    else:
        os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = old


def test_default_limit_and_budget():
    assert train_vmem_limit() == VMEM_SCOPED_LIMIT
    assert train_vmem_budget() == VMEM_TRAIN_BUDGET


def test_env_raises_limit_and_scales_budget():
    os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = "32"
    assert train_vmem_limit() == 32 * 1024 * 1024
    # same 15.5/16 safety ratio the default ships with
    assert train_vmem_budget() == int(32 * 1024 * 1024 * 15.5 / 16)


def test_env_clamps():
    os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = "200"
    assert train_vmem_limit() == 100 * 1024 * 1024
    os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = "8"
    assert train_vmem_limit() == 16 * 1024 * 1024
    os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = ""
    assert train_vmem_limit() == VMEM_SCOPED_LIMIT


def test_gate_unlocks_at_production_bucket():
    # default 16 MiB: full-head BB caps at 1, native infeasible (the
    # round-4 observations the model is calibrated to)
    assert max_train_bb(128, native=False, **PROD) == 1
    assert max_train_bb(128, native=True, **PROD) == 0
    # 32 MiB: BB=2 standard unlocks, native BB=1 unlocks
    os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = "32"
    assert max_train_bb(128, native=False, **PROD) >= 2
    assert max_train_bb(128, native=True, **PROD) >= 1
    # 64 MiB: BB=4 standard unlocks
    os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = "64"
    assert max_train_bb(128, native=False, **PROD) >= 4


def test_compiler_params_default_none():
    from uc2_tpu.ops.flash_attention import _train_compiler_params
    assert _train_compiler_params() is None
    os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = "32"
    cp = _train_compiler_params()
    assert cp is not None and cp.vmem_limit_bytes == 32 * 1024 * 1024
