"""bench.py's TPU-backend guard: a tunnel outage must degrade loudly
(stderr notice + backend field), never record a CPU rate as a chip
number silently."""
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_backend_guard_degrades_loudly():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = REPO
    env["SITATOR_BENCH_TPU_RETRY"] = "2"      # retries pre-exhausted
    code = ("import bench; b = bench._ensure_tpu_backend(); "
            "print('RET', b)")
    proc = subprocess.run([sys.executable, "-c", code],
                          capture_output=True, text=True, timeout=300,
                          env=env)
    assert proc.returncode == 0, proc.stderr
    assert "RET cpu" in proc.stdout
    assert "NOT a chip number" in proc.stderr
