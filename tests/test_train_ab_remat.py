"""Drive scripts/tpu_measure.py train_ab's remat arms on the CPU mesh.

The remat arms (round 5) race jax.checkpoint policies end-to-end on the
grad program (chip results in BASELINE.md round-5 table). CPU rates are
meaningless; what must stay correct is the arm plumbing: the +rematdots /
+rematfull suffixes must reach UC2Config.remat, the +rbg tag must still
select the rbg PRNG when combined with a remat suffix, params must stay
shareable across arms (remat changes checkpointing, not the tree), and
each arm must emit a finite RESULT row.
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_train_ab_remat_arms():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONUNBUFFERED="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tpu_measure.py"),
         "--log", "", "train_ab", "--batch", "2", "--txt_len", "16",
         "--num_bb", "8", "--masked", "4", "--iters", "2", "--trials", "1",
         "--dtype", "float32", "--layers", "2",
         "--arms",
         "pallas-train+rbg,pallas-train+rbg+rematdots,"
         "pallas-train+rbg+rematfull"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900)
    out = r.stdout + r.stderr
    assert r.returncode == 0, out[-3000:]
    rows = re.findall(
        r"RESULT train_ab\(grad-only,all-leaves-live\) mlm B=2 M=4 "
        r"arm=(\S+) trial0: ([0-9.]+) steps/s", out)
    arms = {k: float(v) for k, v in rows}
    assert set(arms) == {"pallas-train+rbg",
                         "pallas-train+rbg+rematdots",
                         "pallas-train+rbg+rematfull"}, out[-3000:]
    for v in arms.values():
        assert v > 0
    assert "ARM-FAILED" not in out, out[-3000:]
