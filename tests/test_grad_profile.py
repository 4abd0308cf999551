"""Drive scripts/tpu_measure.py grad_profile end-to-end on the CPU mesh.

The profiler attributes grad-step time by ablation (BASELINE.md round-4
MFU push); its CPU numbers are meaningless, but the arm *construction*
must stay correct: the frozenemb split/join must reproduce the full loss
exactly while excluding the word-embedding leaf from differentiation, and
every arm must survive jit + chained scan.
"""

import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_grad_profile_cli_arms():
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONUNBUFFERED="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tpu_measure.py"),
         "--log", "", "grad_profile", "--batch", "2", "--txt_len", "16",
         "--num_bb", "8", "--masked", "4", "--iters", "2", "--trials", "1",
         "--attention", "xla", "--dtype", "float32", "--layers", "2",
         "--arms", "full,frozenemb,fwd,nodrop"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900)
    out = r.stdout + r.stderr
    assert r.returncode == 0, out[-3000:]
    # one RESULT row per arm since the r5 per-arm isolation restructure
    rows = re.findall(
        r"RESULT grad_profile mlm B=2 .*trial0: (\S+)=([0-9.]+)ms", out)
    arms = {k: float(v) for k, v in rows}
    # nodrop must be a dropout-0 GRAD arm (not deterministic=True, which
    # would route onto the non-differentiable inference fused blocks —
    # the 2026-08-19 on-chip crash)
    assert set(arms) == {"full", "frozenemb", "fwd", "nodrop"}
    for v in arms.values():
        assert v > 0
    # deltas line prints only for arms present
    assert "delta full-frozenemb" in out and "delta full-fwd" in out
    # frozenemb's split/join must reproduce the full loss exactly (same
    # params, batch, dropout key — only the diff'd set differs)
    losses = dict(re.findall(r"loss (\w+): ([-\d.]+)", out))
    assert losses["full"] == losses["frozenemb"], losses


def test_grad_profile_per_arm_proc():
    """Driver mode: one subprocess per arm (tunnel-EOF-proof, VERDICT r4
    #2). The parent must collect per-arm ms from child stdout and print
    the same delta summary as the in-process path."""
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONUNBUFFERED="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "tpu_measure.py"),
         "--log", "", "grad_profile", "--batch", "2", "--txt_len", "16",
         "--num_bb", "8", "--masked", "4", "--iters", "2", "--trials", "1",
         "--attention", "xla", "--dtype", "float32", "--layers", "2",
         "--arms", "full,fwd", "--per_arm_proc", "--arm_timeout", "600"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1200)
    out = r.stdout + r.stderr
    assert r.returncode == 0, out[-3000:]
    collected = re.search(r"per-arm-proc collected: (.*)", out)
    assert collected, out[-3000:]
    arms = dict(kv.split("=") for kv in collected.group(1).split())
    assert set(arms) == {"full", "fwd"}
    assert "delta full-fwd" in out
