"""Pin the raised scoped-VMEM plumbing for the training attention kernels.

Round 4 lost the BB=2 and native-layout races to Mosaic's 16 MiB
scoped-VMEM default (21.49M / 24.10M observed OOMs). Round 5m raised the
limit per-kernel via ``pltpu.CompilerParams(vmem_limit_bytes=...)`` and
raced the unlocked geometries (r5m/r5n/r5o, 2026-08-20): BB=4 at 64 MiB
wins-or-ties at every token-budget bucket (+1.6% at the worst case),
BB=8 at 100 MiB fits but LOSES, native loses 17%. The shipped default is
therefore 64 MiB + BB-target-4 (tiles.TRAIN_VMEM_DEFAULT_MB); these
tests pin the default, the env override parsing (``16`` restores the
legacy Mosaic default with *no* compiler params, bit-identical to the
pre-r5o program), the budget scaling, and the gate unlock/peak-targeting
at the production bucket.
"""
import os

import pytest

from uc2_tpu.ops.tiles import (TRAIN_VMEM_DEFAULT_MB, VMEM_SCOPED_LIMIT,
                               VMEM_TRAIN_BUDGET, max_train_bb,
                               train_vmem_budget, train_vmem_limit)

PROD = dict(n=12, L=162, d=64, rate=0.1)  # uc2-base worst-case bucket


@pytest.fixture(autouse=True)
def _clean_env():
    old = os.environ.pop("UC2_ATTN_TRAIN_VMEM_MB", None)
    yield
    if old is None:
        os.environ.pop("UC2_ATTN_TRAIN_VMEM_MB", None)
    else:
        os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = old


def test_default_is_the_raced_64mib():
    assert TRAIN_VMEM_DEFAULT_MB == 64
    assert train_vmem_limit() == 64 * 1024 * 1024
    # same 15.5/16 safety ratio the legacy budget shipped with
    assert train_vmem_budget() == int(64 * 1024 * 1024 * 15.5 / 16)


def test_env_16_restores_legacy():
    os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = "16"
    assert train_vmem_limit() == VMEM_SCOPED_LIMIT
    assert train_vmem_budget() == VMEM_TRAIN_BUDGET


def test_env_overrides_and_scales_budget():
    os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = "32"
    assert train_vmem_limit() == 32 * 1024 * 1024
    assert train_vmem_budget() == int(32 * 1024 * 1024 * 15.5 / 16)


def test_env_clamps():
    os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = "200"
    assert train_vmem_limit() == 100 * 1024 * 1024
    os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = "8"
    assert train_vmem_limit() == 16 * 1024 * 1024
    os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = ""
    assert train_vmem_limit() == TRAIN_VMEM_DEFAULT_MB * 1024 * 1024


def test_gate_at_production_bucket():
    # legacy 16 MiB: full-head BB caps at 1, native infeasible (the
    # round-4 observations the model is calibrated to)
    os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = "16"
    assert max_train_bb(128, native=False, **PROD) == 1
    assert max_train_bb(128, native=True, **PROD) == 0
    # 32 MiB: BB=2 standard unlocks, native BB=1 unlocks
    os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = "32"
    assert max_train_bb(128, native=False, **PROD) >= 2
    assert max_train_bb(128, native=True, **PROD) >= 1
    # shipped default (64 MiB): the raced-peak BB=4 fits; BB=8 does NOT
    # (r5n found BB=8 slower anyway — it needs 100 MiB)
    os.environ.pop("UC2_ATTN_TRAIN_VMEM_MB")
    assert max_train_bb(128, native=False, **PROD) == 4


def test_default_geometry_is_the_raced_peak():
    # the resolver lands exactly on the r5n peak at the production
    # bucket: standard layout, BB=4, full-head cells
    from uc2_tpu.ops.flash_attention import _train_layout
    assert _train_layout(128, **PROD) == (False, 4, 12)
    # legacy env restores the pre-r5o geometry bit-exactly
    os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = "16"
    assert _train_layout(128, **PROD) == (False, 1, 12)


def test_compiler_params_follow_the_limit():
    from uc2_tpu.ops.flash_attention import _train_compiler_params
    cp = _train_compiler_params()
    assert cp is not None and cp.vmem_limit_bytes == 64 * 1024 * 1024
    # legacy: Mosaic gets NO compiler params (its own 16 MiB accounting)
    os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = "16"
    assert _train_compiler_params() is None
    os.environ["UC2_ATTN_TRAIN_VMEM_MB"] = "32"
    cp = _train_compiler_params()
    assert cp is not None and cp.vmem_limit_bytes == 32 * 1024 * 1024
