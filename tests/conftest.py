"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

This substitutes for multi-chip TPU hardware (SURVEY.md §4): sharding and
collective behavior is validated on a host-platform mesh, the standard JAX
testing trick.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force off the TPU (axon) for tests
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np
import pytest

# fp32 parity tests need true-fp32 matmuls
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
