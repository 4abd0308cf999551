"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

This substitutes for multi-chip TPU hardware (SURVEY.md §4): sharding and
collective behavior is validated on a host-platform mesh, the standard JAX
testing trick.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np
import pytest

# The image's sitecustomize force-registers the axon (TPU-tunnel) backend and
# overrides JAX_PLATFORMS; the config update below wins over both. Tests must
# run on the 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")
# fp32 parity tests need true-fp32 matmuls
jax.config.update("jax_default_matmul_precision", "highest")
assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
