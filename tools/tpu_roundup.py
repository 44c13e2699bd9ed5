"""One-session TPU validation round-up: health probe → scattering
phase-precision pin → density binning-precision pin, in ONE exclusive
session with teardown hygiene (the tunnel wedges if a process dies
with work in flight; sequential single-session validation avoids
grant races).  bench.py is NOT run here — run it as a separate
process afterwards (the suggested command is printed), keeping chip
sessions serial.

Run (background, exclusive chip, budget >= 900 s):

  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
      tools/tpu_roundup.py [--skip-bench]

Prints one STATUS line per stage and exits nonzero on the first hard
failure.  Designed to be safe to re-run.
"""
import sys
import time

import numpy as np

t0 = time.time()
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
# the tunnel backend has registered as "axon" and (since 2026-08-19) as
# plain "tpu" (device "TPU v5 lite0") — accept either, reject CPU fallback
if jax.default_backend() not in ("axon", "tpu"):
    print("STATUS probe FAIL: not on the TPU", flush=True)
    sys.exit(1)

x = jnp.ones((1024, 1024), jnp.float32)
r = np.asarray(x @ x)
dt = time.time() - t0
print(f"STATUS probe OK: {dt:.1f}s (healthy ~<60s; wedged = minutes)",
      flush=True)

# --- scattering phase-precision pin (HIGHEST on the phase matmul) ----
from sitator_tpu.ops import scattering as scat

rng = np.random.default_rng(3)
cell = np.array([[9.0, 0, 0], [1.0, 8.0, 0], [0.4, 0.7, 10.0]])
F, M = 32, 150
traj = (rng.uniform(0, 1, size=(F, M, 3)) @ cell).astype(np.float64)
n, q, mag = scat.allowed_wavevectors(cell, q_max=7.0)
rho = scat.collective_density_modes(traj, cell, np.ones(M, bool), n)
ref = np.exp(1j * np.einsum("fmx,kx->fmk", traj, q)).sum(axis=1)
err = float(np.abs(rho - ref).max())
ok = err < 5e-4 * M
print(f"STATUS scattering {'OK' if ok else 'FAIL'}: max|rho-ref| = "
      f"{err:.3e} (budget {5e-4 * M:.1e})", flush=True)
if not ok:
    sys.exit(1)

# --- density binning-precision pin (HIGHEST on the frac matmul) ------
from sitator_tpu.ops.density import density_grid

n_bins = 48
Fd, Md = 64, 500
frac = rng.uniform(0, 1, size=(Fd, Md, 3))
seam = (rng.integers(0, n_bins, size=(Fd, Md // 4, 3)) / n_bins
        + rng.normal(scale=2e-4, size=(Fd, Md // 4, 3)))
frac[:, : Md // 4] = seam
traj_d = (frac @ cell).astype(np.float64)
grid_dev = np.asarray(density_grid(traj_d, cell, n_bins=n_bins))
ci32 = np.linalg.inv(cell).astype(np.float32)
f32 = traj_d.astype(np.float32).reshape(-1, 3) @ ci32
f32 -= np.floor(f32)
idx = np.clip((f32 * n_bins).astype(np.int32), 0, n_bins - 1)
flat = (idx[:, 0] * n_bins + idx[:, 1]) * n_bins + idx[:, 2]
grid_host = np.bincount(flat, minlength=n_bins ** 3).reshape(
    n_bins, n_bins, n_bins)
diff = int(np.abs(grid_dev - grid_host).sum())
ok = diff < 50              # ~1-ulp reorders flip a handful; bf16 1000s
print(f"STATUS density {'OK' if ok else 'FAIL'}: "
      f"sum|dev-host_f32| = {diff} of {Fd * Md}", flush=True)
if not ok:
    sys.exit(1)

# --- 12-bit egress pack: device-pack -> host-decode bit identity -----
# The pack is uint16 shifts/ors + a bitcast compiled by real-TPU XLA;
# interpret/CPU tests cannot see backend lowering differences (the
# s_tile=64 lesson), so the shipped egress path gets a direct pin here.
from sitator_tpu.landmark.streaming import _pack12, _unpack12

lab = rng.integers(-1, 4095, size=(64, 739)).astype(np.int32)
lab.flat[0], lab.flat[-1] = -1, 4094
packed = np.asarray(jax.jit(_pack12)(jnp.asarray(lab)))
ok = bool((_unpack12(packed, lab.shape[1]) == lab).all())
print(f"STATUS pack12 {'OK' if ok else 'FAIL'}: device pack -> host "
      f"decode {'bit-identical' if ok else 'MISMATCH'} "
      f"({lab.size} labels)", flush=True)
if not ok:
    sys.exit(1)

# --- teardown hygiene before handing the grant to bench --------------
np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))

if "--skip-bench" not in sys.argv:
    # reminder only — bench must run as its own process AFTER this one
    # exits (serial chip sessions; the axon grant is exclusive)
    print("STATUS roundup OK — now run bench separately:\n"
          "  PYTHONPATH=/root/repo:/root/.axon_site "
          "/opt/venv/bin/python bench.py", flush=True)
print("TPU_ROUNDUP_OK", flush=True)
