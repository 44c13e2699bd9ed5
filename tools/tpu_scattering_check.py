"""One-shot TPU validation of the scattering phase kernel: health
probe, then collective_density_modes on-device vs an exact host-float64
oracle.  The thing under test is the Precision.HIGHEST pin on the
phase matmul (`ops/scattering.py::_rho_chunk`) — with MXU-default
bf16 operands the phase error is ~0.1 rad at high |n| and max|rho-ref|
blows past the f32 budget by ~1000x.  Run (background, exclusive chip):

  PYTHONPATH=/root/repo:/root/.axon_site /opt/venv/bin/python \
      tools/tpu_scattering_check.py
"""
import time

import numpy as np

t0 = time.time()
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), flush=True)
# a silent CPU fallback (tunnel down / grant held) makes the bf16-MXU
# failure mode under test impossible — fail loudly instead of passing
# vacuously (the r3 SOAP mismeasurement was exactly this trap)
assert jax.default_backend() in ("axon", "tpu"), (
    "not on the TPU — got backend " + jax.default_backend())

# health probe
x = jnp.ones((1024, 1024), jnp.float32)
y = np.asarray(x @ x)
print(f"probe matmul OK in {time.time() - t0:.1f}s", flush=True)

from sitator_tpu.ops import scattering as scat

rng = np.random.default_rng(3)
cell = np.array([[9.0, 0, 0], [1.0, 8.0, 0], [0.4, 0.7, 10.0]])
F, M = 32, 150
traj = (rng.uniform(0, 1, size=(F, M, 3)) @ cell).astype(np.float64)
mask = np.ones(M, bool)
# include high-order modes: |n| up to ~10 is where bf16 phases die
n, q, mag = scat.allowed_wavevectors(cell, q_max=7.0)
print(f"{len(n)} modes, |n|_max = {np.abs(n).max()}", flush=True)

t1 = time.time()
rho = scat.collective_density_modes(traj, cell, mask, n)
print(f"density modes on {jax.default_backend()} in "
      f"{time.time() - t1:.1f}s", flush=True)

ref = np.exp(1j * np.einsum("fmx,kx->fmk", traj, q)).sum(axis=1)
err = np.abs(rho - ref).max()
# budget: ~1e-5 rad/ion phase error -> max |rho-ref| ~ 5e-4 * M;
# bf16 phases would give ~0.1 rad -> errors of order M
budget = 5e-4 * M
print(f"max|rho - ref| = {err:.3e}  (budget {budget:.3e})", flush=True)
assert err < budget, "PHASE PRECISION REGRESSION (bf16 matmul?)"

# teardown hygiene: small sync op before exit
np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
print("TPU_SCATTERING_OK", flush=True)
