"""Numeric substrate: pure-JAX and Pallas ops (PBC math, landmark kernels,
clustering kernels, jump scans, MCL).  Everything here is functional and
jit-safe; host-facing classes live in the domain packages."""
from sitator_tpu.ops import cluster, jumps, landmark, mcl, pbc

__all__ = ["pbc", "landmark", "cluster", "jumps", "mcl"]
