"""Drive scripts/tpu_measure.py fused end-to-end on the CPU mesh.

The fused probe measures the single-program grad+AdamW train step — the
program a real TPU host runs (VERDICT r4 #8; chip results in BASELINE.md
round-5 table). CPU rates are meaningless; what must stay correct is the
construction: the chain survives jit + lax.scan with donated state, the
per-trial fresh-state re-init keeps donation legal, and a RESULT row with
a finite validated rate is printed per trial.
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_fused_cli_donate():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONUNBUFFERED="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tpu_measure.py"),
         "--log", "", "fused", "--batch", "2", "--txt_len", "16",
         "--num_bb", "8", "--masked", "4", "--iters", "2", "--trials", "2",
         "--dtype", "float32", "--layers", "2", "--donate"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900)
    out = r.stdout + r.stderr
    assert r.returncode == 0, out[-3000:]
    # compile line carries a finite loss (the chain's last-iteration loss
    # stays live through the scan — DCE discipline)
    m = re.search(r"loss=([-\d.]+)", out)
    assert m and float(m.group(1)) > 0, out[-2000:]
    rows = re.findall(
        r"RESULT fused mlm B=2 .*donate=1 trial\d: ([0-9.]+) steps/s", out)
    assert len(rows) == 2, out[-3000:]
    for v in rows:
        assert float(v) > 0
