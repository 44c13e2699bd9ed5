"""Numeric substrate: pure-JAX and Pallas ops (PBC math, landmark kernels,
clustering kernels, scans).  Everything here is functional and jit-safe."""
from sitator_tpu.ops import pbc

__all__ = ["pbc"]
