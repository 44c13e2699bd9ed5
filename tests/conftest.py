"""Test configuration: force an 8-virtual-device CPU backend BEFORE jax import
so multi-chip sharding paths are exercised without TPU hardware (SURVEY.md §5
item 4).  Must run before anything imports jax."""
import os

# The environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests must run
# on the local CPU backend, so override rather than setdefault.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
