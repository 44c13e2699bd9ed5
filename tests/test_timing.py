"""StageTimer / device_trace — the observability layer (SURVEY.md §6.1)."""
import numpy as np

from sitator_tpu.util.timing import StageTimer, device_trace


def test_stage_timer_report():
    t = StageTimer("demo")
    with t.stage("alpha"):
        sum(range(1000))
    with t.stage("beta"):
        sum(range(1000))
    assert len(t.stages) == 2
    assert t.total >= 0.0
    rep = t.report()
    assert "alpha" in rep and "beta" in rep and "TOTAL" in rep
    # percentages line up
    assert abs(sum(s for _, s in t.stages) - t.total) < 1e-12


def test_stage_timer_empty_report():
    t = StageTimer()
    rep = t.report(log=True)
    assert "TOTAL" in rep and t.total == 0.0


def test_device_trace_writes_profile(tmp_path):
    import jax.numpy as jnp
    d = tmp_path / "trace"
    with device_trace(str(d)):
        np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
    # the profiler must have produced SOMETHING under the trace dir
    assert any(d.rglob("*")), "no trace artifacts written"


def test_stage_timer_trace_dir(tmp_path):
    import jax.numpy as jnp
    t = StageTimer()
    with t.stage("traced", trace_dir=str(tmp_path / "t")):
        np.asarray(jnp.ones((4, 4)) + 1.0)
    assert t.stages[0][0] == "traced"


def test_northstar_harness_smoke(tmp_path):
    """The headline-measurement harness (tools/northstar_run.py) must not
    rot: its --small CPU smoke path runs the real engine end-to-end,
    exercises the A/B plumbing flags, and prints a parseable JSON line."""
    import json
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=repo)
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "northstar_run.py"),
         "--small", "--blocks", "4", "--pipeline-depth", "2",
         "--workdir", str(tmp_path)],  # never touch a live run's /tmp
        env=env, capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-3000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("{")][-1]
    res = json.loads(line)
    assert res["n_frames"] == 4 * 64
    assert res["value"] > 0
