"""One-shot TPU validation of the density-grid binning: health probe,
then `density_grid` on-device vs the identical computation on host
float64.  The thing under test is the Precision.HIGHEST pin on the
fractional-coordinate matmul (`ops/density.py::_grid_chunk`) — with
MXU-default bf16 operands the fractional error is ~1e-3, which moves
seam-adjacent atoms across bins and breaks the exact-count/roll
invariants (the CPU suite cannot see this).  Run (background,
exclusive chip):

  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
      tools/tpu_density_check.py
"""
import time

import numpy as np

t0 = time.time()
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
assert jax.default_backend() in ("axon", "tpu"), (
    "not on the TPU — got backend " + jax.default_backend())

x = jnp.ones((1024, 1024), jnp.float32)
y = np.asarray(x @ x)
print(f"probe matmul OK in {time.time() - t0:.1f}s", flush=True)

from sitator_tpu.ops.density import density_grid

rng = np.random.default_rng(7)
cell = np.array([[9.0, 0, 0], [1.0, 8.0, 0], [0.4, 0.7, 10.0]])
n_bins = 48
F, M = 64, 500
# positions biased toward bin seams: uniform + a seam-hugging cohort
frac = rng.uniform(0, 1, size=(F, M, 3))
seam = (rng.integers(0, n_bins, size=(F, M // 4, 3)) / n_bins
        + rng.normal(scale=2e-4, size=(F, M // 4, 3)))
frac[:, : M // 4] = seam
traj = (frac @ cell).astype(np.float64)

t1 = time.time()
grid_dev = np.asarray(density_grid(traj, cell, n_bins=n_bins))
print(f"device grid in {time.time() - t1:.1f}s, total {grid_dev.sum()}",
      flush=True)

# host reference: the same f32 pipeline in NumPy (identical rounding)
cell_inv32 = np.linalg.inv(cell).astype(np.float32)
f32 = traj.astype(np.float32).reshape(-1, 3) @ cell_inv32
f32 = f32 - np.floor(f32)
idx = np.clip((f32 * n_bins).astype(np.int32), 0, n_bins - 1)
flat = (idx[:, 0] * n_bins + idx[:, 1]) * n_bins + idx[:, 2]
grid_host = np.bincount(flat, minlength=n_bins ** 3).reshape(
    n_bins, n_bins, n_bins)

diff = int(np.abs(grid_dev - grid_host).sum())
print(f"sum|device - host_f32| = {diff} of {F * M} points", flush=True)
# With the HIGHEST pin, device vs host f32 may differ only by ~1-ulp
# accumulation-order rounding: of the {F*M//4} seam-hugging points
# (sigma 2e-4 from a seam) only ones within ~1e-7 can flip — a handful.
# A bf16 matmul (~1e-3 fractional error >> 2e-4) flips THOUSANDS.
budget = 50
assert diff < budget, "DENSITY BINNING PRECISION REGRESSION (bf16 matmul?)"

np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))   # teardown hygiene
print("TPU_DENSITY_OK", flush=True)
