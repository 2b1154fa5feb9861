"""Unit tests for bench.wait_for_tpu (the degraded-tunnel backend probe).

The tunneled chip's degraded windows hang jax backend init for tens of
minutes; bench.py probes init in a subprocess and waits for a healthy
window before initializing in-process. These tests exercise the retry /
give-up logic with subprocess.run monkeypatched (no real backend)."""
import subprocess
import sys

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])

import bench


def _completed(rc=0, out="8\n"):  # probe prints int(jnp.ones(8).sum())
    return subprocess.CompletedProcess(args=[], returncode=rc, stdout=out,
                                       stderr="")


def test_probe_returns_true_on_healthy_backend(monkeypatch):
    calls = {"n": 0}

    def fake_run(*a, **k):
        calls["n"] += 1
        return _completed()

    # wait_for_tpu imports subprocess locally; it binds this same module
    monkeypatch.setattr(subprocess, "run", fake_run)
    assert bench.wait_for_tpu(max_wait_s=1, probe_timeout_s=1) is True
    assert calls["n"] == 1


def test_probe_retries_then_succeeds(monkeypatch):
    calls = {"n": 0}

    def fake_run(*a, timeout=None, **k):
        calls["n"] += 1
        if calls["n"] < 3:
            raise subprocess.TimeoutExpired(cmd="probe", timeout=timeout)
        return _completed()

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.wait_for_tpu(max_wait_s=600, probe_timeout_s=1) is True
    assert calls["n"] == 3


def test_probe_gives_up_within_budget(monkeypatch):
    def fake_run(*a, timeout=None, **k):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=timeout)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    # Deadline in the past after the first attempt -> gives up, returns False
    assert bench.wait_for_tpu(max_wait_s=0, probe_timeout_s=1) is False


def test_probe_rejects_garbage_output(monkeypatch):
    seq = iter([_completed(out="error\n"), _completed(rc=1), _completed()])
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: next(seq))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)
    assert bench.wait_for_tpu(max_wait_s=600, probe_timeout_s=1) is True
