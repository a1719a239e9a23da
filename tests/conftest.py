"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere.
"""

import os
import sys

# HARD override: the harness env pins JAX_PLATFORMS=axon (remote TPU tunnel);
# tests must run on local CPU with a virtual 8-device mesh or every compile
# crosses the network (~20-50s per kernel).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # opt level 0: the limb-arithmetic graphs are large and elementwise; CPU
    # backend optimization buys nothing for tests but costs minutes.
    os.environ["XLA_FLAGS"] = (
        flags
        + " --xla_force_host_platform_device_count=8"
        + " --xla_backend_optimization_level=0"
        + " --xla_llvm_disable_expensive_passes=true"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0x5EED)
