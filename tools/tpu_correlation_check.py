"""One-shot TPU validation of the correlation histogram kernel: health
probe, then rdf/van_hove_distinct on-device vs the CPU result."""
import os, time
import numpy as np

t0 = time.time()
import jax
import jax.numpy as jnp
print("backend:", jax.default_backend(), flush=True)

# health probe
x = jnp.ones((1024, 1024), jnp.float32)
y = np.asarray(x @ x)
print(f"probe matmul OK in {time.time()-t0:.1f}s", flush=True)

from sitator_tpu.ops import correlation as corr

rng = np.random.default_rng(3)
cell = np.array([[9.0, 0, 0], [1.0, 8.0, 0], [0.4, 0.7, 10.0]])
traj = (rng.uniform(0, 1, size=(64, 200, 3)) @ cell).astype(np.float32)
mask = np.zeros(200, bool); mask[:80] = True

t1 = time.time()
r, g = corr.rdf(traj, cell, mask, np.ones(200, bool), n_bins=50)
print(f"rdf on {jax.default_backend()} in {time.time()-t1:.1f}s", flush=True)
t1 = time.time()
r2, G = corr.van_hove_distinct(traj, cell, mask, lags=[0, 8, 32], n_bins=50,
                               origin_stride=4)
print(f"van_hove_distinct in {time.time()-t1:.1f}s", flush=True)

np.save("/tmp/tpu_corr_g.npy", g)
np.save("/tmp/tpu_corr_G.npy", G)
print("counts finite:", np.isfinite(g).all() and np.isfinite(G).all())
# teardown hygiene: small sync op before exit
np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
print("TPU_CORR_OK", flush=True)
