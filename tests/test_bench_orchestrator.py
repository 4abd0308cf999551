"""bench.py subprocess-orchestration units (round 5).

The driver parses bench.py's single JSON line as the round's headline.
After the r5d chip run lost its train fields to a one-process
RESOURCE_EXHAUSTED (bench_results.txt — same failure class as
output/tab_r4.log), bench.py became an orchestrator: scoring, each train
bucket's grad rate, and the optimizer apply each run in their own
subprocess with bounded retry, a per-bucket threefry fallback, and
partial-failure fields instead of an all-or-nothing train_error. These
tests pin that assembly logic with _run_subtask/subprocess mocked — the
real subtasks need the chip.
"""

import json
import subprocess
import sys

import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
import bench  # noqa: E402

W = [0.3438, 0.4844, 0.1719]   # the demo-gallery histogram weights


def _fake_runner(table):
    """table: (name, nb, impl) -> dict result or error string."""
    calls = []

    def run(name, extra, attempts=2):
        nb = impl = None
        if "--_nb" in extra:
            nb = int(extra[extra.index("--_nb") + 1])
        if "--_rng_impl" in extra:
            impl = extra[extra.index("--_rng_impl") + 1]
        calls.append((name, nb, impl))
        out = table.get((name, nb, impl), table.get((name, None, None)))
        if isinstance(out, dict):
            return out, ""
        return None, out or "boom"
    return run, calls


def test_measure_train_all_green(monkeypatch):
    table = {("grad", 36, "rbg"): {"g_rate": 9.0},
             ("grad", 66, "rbg"): {"g_rate": 7.0},
             ("grad", 100, "rbg"): {"g_rate": 6.0},
             ("apply", None, None): {"a_rate": 75.0}}
    run, calls = _fake_runner(table)
    monkeypatch.setattr(bench, "_run_subtask", run)
    f = bench._measure_train(W)
    assert "train_errors" not in f
    assert f["train_rng_impl"] == "rbg"
    assert f["train_grad_steps_per_sec"] == 6.0
    # split-step = 1/(1/g + 1/a); flat bucket B=128
    assert f["train_steps_per_sec"] == pytest.approx(
        1 / (1 / 6.0 + 1 / 75.0), abs=0.01)
    assert f["train_ex_per_sec_per_chip"] == pytest.approx(
        128 / (1 / 6.0 + 1 / 75.0), abs=1.0)
    # envelope = weighted harmonic mean of per-bucket ex/s
    ex = [208 / (1 / 9.0 + 1 / 75.0), 160 / (1 / 7.0 + 1 / 75.0),
          128 / (1 / 6.0 + 1 / 75.0)]
    assert f["train_envelope_ex_per_sec_per_chip"] == pytest.approx(
        bench.envelope(ex, W), abs=0.5)
    assert set(f["train_bucket_ex_per_sec"]) == {"36", "66", "100"}
    # exactly one grad call per bucket + one apply — no fallback ran
    assert calls == [("grad", 36, "rbg"), ("grad", 66, "rbg"),
                     ("grad", 100, "rbg"), ("apply", None, None)]


def test_measure_train_threefry_fallback(monkeypatch):
    # the B=208 bucket OOMs under rbg; threefry lands and is recorded
    table = {("grad", 36, "rbg"): "RESOURCE_EXHAUSTED",
             ("grad", 36, "threefry2x32"): {"g_rate": 8.5},
             ("grad", 66, "rbg"): {"g_rate": 7.0},
             ("grad", 100, "rbg"): {"g_rate": 6.0},
             ("apply", None, None): {"a_rate": 75.0}}
    run, _ = _fake_runner(table)
    monkeypatch.setattr(bench, "_run_subtask", run)
    f = bench._measure_train(W)
    assert f["train_rng_impl"] == {36: "threefry2x32", 66: "rbg",
                                   100: "rbg"}
    assert "grad_nb36_rbg" in f["train_errors"]
    # all three buckets present → envelope still produced
    assert "train_envelope_ex_per_sec_per_chip" in f


def test_measure_train_partial_bucket_failure(monkeypatch):
    # one bucket dead under BOTH impls: keep the others, no envelope
    table = {("grad", 36, "rbg"): "timeout after 900s",
             ("grad", 36, "threefry2x32"): "timeout after 900s",
             ("grad", 66, "rbg"): {"g_rate": 7.0},
             ("grad", 100, "rbg"): {"g_rate": 6.0},
             ("apply", None, None): {"a_rate": 75.0}}
    run, _ = _fake_runner(table)
    monkeypatch.setattr(bench, "_run_subtask", run)
    f = bench._measure_train(W)
    assert "grad_nb36" in f["train_errors"]
    assert "train_envelope_ex_per_sec_per_chip" not in f
    assert "train_envelope_grad_ex_per_sec" not in f
    # flat worst-case bucket survived → headline train fields intact
    assert f["train_steps_per_sec"] > 0
    assert set(f["train_bucket_ex_per_sec"]) == {"66", "100"}


def test_measure_train_apply_failure_keeps_grads(monkeypatch):
    table = {("grad", 36, "rbg"): {"g_rate": 9.0},
             ("grad", 66, "rbg"): {"g_rate": 7.0},
             ("grad", 100, "rbg"): {"g_rate": 6.0},
             ("apply", None, None): "EOF"}
    run, _ = _fake_runner(table)
    monkeypatch.setattr(bench, "_run_subtask", run)
    f = bench._measure_train(W)
    assert f["train_errors"] == {"apply": "EOF"}
    assert "train_steps_per_sec" not in f          # needs apply
    assert f["train_envelope_grad_ex_per_sec"] > 0  # grad-only envelope
    assert f["train_bucket_grad_steps_per_sec"]["100"] == 6.0


def test_measure_train_total_failure_raises(monkeypatch):
    run, _ = _fake_runner({("grad", None, None): "dead"})
    monkeypatch.setattr(
        bench, "_run_subtask",
        lambda name, extra, attempts=2: (None, "dead"))
    with pytest.raises(RuntimeError, match="all grad buckets failed"):
        bench._measure_train(W)


class _FakeCompleted:
    def __init__(self, rc, out, err=""):
        self.returncode, self.stdout, self.stderr = rc, out, err


def test_run_subtask_parses_last_line(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    monkeypatch.setattr(
        subprocess, "run",
        lambda *a, **k: _FakeCompleted(
            0, "warning noise\n{\"g_rate\": 5.5}\n"))
    res, err = bench._run_subtask("grad", ["--_nb", "100"])
    assert res == {"g_rate": 5.5} and err == ""


def test_run_subtask_retries_then_reports(monkeypatch):
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    attempts = []
    monkeypatch.setattr(
        subprocess, "run",
        lambda *a, **k: attempts.append(1) or _FakeCompleted(
            1, "", "Traceback ...\nJaxRuntimeError: RESOURCE_EXHAUSTED"))
    res, err = bench._run_subtask("grad", ["--_nb", "36"])
    assert res is None and len(attempts) == 2
    assert "RESOURCE_EXHAUSTED" in err


def test_run_subtask_respects_deadline(monkeypatch):
    # an exhausted global deadline must not spawn anything
    monkeypatch.setattr(bench, "_time_left", lambda: 30.0)
    monkeypatch.setattr(
        subprocess, "run",
        lambda *a, **k: (_ for _ in ()).throw(AssertionError("spawned")))
    res, err = bench._run_subtask("grad", ["--_nb", "36"])
    assert res is None and "deadline" in err


def test_child_mode_disables_reexec(monkeypatch):
    # orchestrator-spawned children must carry UC2_BENCH_RETRY=9 so the
    # __main__ re-exec loop can't double the parent's retry budget
    seen = {}

    def fake_run(cmd, **kw):
        seen["env"] = kw["env"]
        seen["cmd"] = cmd
        return _FakeCompleted(0, json.dumps({"a_rate": 70.0}))
    monkeypatch.setattr(subprocess, "run", fake_run)
    res, _ = bench._run_subtask("apply", [])
    assert res == {"a_rate": 70.0}
    assert seen["env"]["UC2_BENCH_RETRY"] == "9"
    assert "--_subtask" in seen["cmd"] and "apply" in seen["cmd"]
