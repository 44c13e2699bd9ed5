"""bench.py's TPU-backend guard: a tunnel outage must degrade loudly
(stderr notice + backend field), never record a CPU rate as a chip
number silently, and never crash the driver's capture.

The r4 failure mode this guards (VERDICT r4 weak #1): the backend
REGISTERED under the name "tpu" but every device op raised
FAILED_PRECONDITION — a name-only check passed and bench.py crashed,
losing the round's artifact.  The guard now runs an actual bounded
device round-trip (``_probe_work``, monkeypatched here to simulate each
outage state) and terminally re-execs with a forced-CPU sentinel.
"""
import os
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO) if REPO not in sys.path else None

import bench  # noqa: E402


class _ExecCalled(BaseException):
    def __init__(self, env):
        self.env = env


@pytest.fixture()
def guard_env(monkeypatch):
    """Clean slate + instrumented execve/sleep for in-process guard tests."""
    for var in ("SITATOR_BENCH_FORCE_CPU", "SITATOR_BENCH_TPU_RETRY",
                "SITATOR_BENCH_PROBE_TIMEOUT"):
        monkeypatch.delenv(var, raising=False)
    calls = {"execve": None, "slept": 0.0}

    def fake_execve(path, argv, env):
        calls["execve"] = dict(env)
        raise _ExecCalled(env)

    monkeypatch.setattr(os, "execve", fake_execve)
    monkeypatch.setattr(time, "sleep",
                        lambda s: calls.__setitem__("slept",
                                                    calls["slept"] + s))
    return calls


def test_healthy_tpu_probe_passes(guard_env, monkeypatch):
    monkeypatch.setattr(bench, "_probe_work", lambda: "tpu")
    assert bench._ensure_tpu_backend() == "tpu"
    assert guard_env["execve"] is None


def test_healthy_axon_probe_passes(guard_env, monkeypatch):
    monkeypatch.setattr(bench, "_probe_work", lambda: "axon")
    assert bench._ensure_tpu_backend() == "axon"
    assert guard_env["execve"] is None


def test_registered_but_broken_backend_detected(guard_env, monkeypatch,
                                                capsys):
    """The exact BENCH_r04 state: name 'tpu' registers, device ops raise."""
    def broken():
        raise RuntimeError("FAILED_PRECONDITION: TPU backend error")

    monkeypatch.setattr(bench, "_probe_work", broken)
    monkeypatch.setenv("SITATOR_BENCH_TPU_RETRY", "2")  # pre-exhausted
    with pytest.raises(_ExecCalled) as ei:
        bench._ensure_tpu_backend()
    assert ei.value.env.get("SITATOR_BENCH_FORCE_CPU") == "1"
    err = capsys.readouterr().err
    assert "FAILED_PRECONDITION" in err and "pinned" in err


def test_hung_backend_times_out(guard_env, monkeypatch, capsys):
    """The other r4 outage mode: backend init hangs (15-25 min live)."""
    # a genuinely-blocking probe (time.sleep is monkeypatched by
    # guard_env, so block on an Event that only the test releases)
    import threading
    ev = threading.Event()
    monkeypatch.setattr(bench, "_probe_work", lambda: ev.wait() or "tpu")
    monkeypatch.setenv("SITATOR_BENCH_PROBE_TIMEOUT", "0.2")
    monkeypatch.setenv("SITATOR_BENCH_TPU_RETRY", "2")
    try:
        with pytest.raises(_ExecCalled) as ei:
            bench._ensure_tpu_backend()
    finally:
        ev.set()  # release the probe thread
    assert ei.value.env.get("SITATOR_BENCH_FORCE_CPU") == "1"
    assert "timed out" in capsys.readouterr().err


def test_silent_cpu_fallback_retries_then_pins(guard_env, monkeypatch,
                                               capsys):
    """Outage mode (a): plugin never registers, JAX quietly gives 'cpu'."""
    monkeypatch.setattr(bench, "_probe_work", lambda: "cpu")
    with pytest.raises(_ExecCalled) as ei:
        bench._ensure_tpu_backend()
    # first failure: retry re-exec with the attempt counter, after a wait
    assert ei.value.env.get("SITATOR_BENCH_TPU_RETRY") == "1"
    assert "SITATOR_BENCH_FORCE_CPU" not in ei.value.env
    assert guard_env["slept"] > 0
    assert "not the TPU" in capsys.readouterr().err
    # retries exhausted: terminal forced-CPU re-exec
    monkeypatch.setenv("SITATOR_BENCH_TPU_RETRY", "2")
    with pytest.raises(_ExecCalled) as ei:
        bench._ensure_tpu_backend()
    assert ei.value.env.get("SITATOR_BENCH_FORCE_CPU") == "1"


def test_forced_cpu_sentinel_degrades_loudly():
    """End-to-end (fresh process, no conftest pin): the sentinel must pin
    CPU via jax.config.update and announce the degraded record."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env["SITATOR_BENCH_FORCE_CPU"] = "1"
    code = ("import bench; b = bench._ensure_tpu_backend(); "
            "print('RET', b)")
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=300,
                          env=env)
    assert proc.returncode == 0, proc.stderr
    assert "RET cpu" in proc.stdout
    assert "NOT a chip number" in proc.stderr
