"""Orbax sharded-checkpoint wrapper test."""

import numpy as np
import jax
import pytest


def test_orbax_roundtrip(tmp_path):
    from uc2_tpu.training.checkpoint import OrbaxCheckpointer
    tree = {"a": np.arange(10.0), "b": {"c": np.ones((3, 4))}}
    ck = OrbaxCheckpointer(str(tmp_path / "orbax"))
    ck.save(5, tree)
    ck.wait()
    assert ck.latest_step() == 5
    out = ck.restore(5, target=jax.tree_util.tree_map(np.zeros_like, tree))
    np.testing.assert_array_equal(out["a"], tree["a"])
    np.testing.assert_array_equal(out["b"]["c"], tree["b"]["c"])
