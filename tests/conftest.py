"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set XLA flags before jax is imported anywhere.
"""

import os
import resource
import sys

# XLA:CPU's LLVM pipeline recurses deeply on the long dynamic-update-slice
# chains our limb kernels emit; the default 8 MB main-thread stack overflows
# (segfault in backend_compile).  Raising RLIMIT_STACK after exec does not
# reliably help (the main-stack ceiling is fixed at exec time), so re-exec
# the interpreter once with the raised limit before any compile runs.
# 1 GiB, FINITE on purpose: glibc sizes new pthread stacks from a *finite*
# soft limit (an "unlimited" limit falls back to the 8 MB default), and
# XLA:CPU runs LLVM on worker threads it spawns lazily at first compile —
# raising the limit here, before jax initializes, is early enough.  (No
# re-exec: pytest has already installed fd-level capture, so an execv child
# would write its output into an orphaned capture temp file.)
_WANT_STACK = 1 << 30
try:
    _soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
    _want = _WANT_STACK if _hard == resource.RLIM_INFINITY else min(_hard, _WANT_STACK)
    if _soft == resource.RLIM_INFINITY or (0 <= _soft < _want):
        resource.setrlimit(resource.RLIMIT_STACK, (_want, _hard))
except (ValueError, OSError):
    pass

# HARD override: the harness env pins JAX_PLATFORMS=axon (remote TPU tunnel);
# tests must run on local CPU with a virtual 8-device mesh or every compile
# crosses the network (~20-50s per kernel).
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    # NOTE: do NOT add --xla_backend_optimization_level=0 /
    # --xla_llvm_disable_expensive_passes here: at O0 the LLVM pipeline
    # recurses deeply on our dynamic-update-slice chains and overflows the
    # 8 MB main-thread stack (segfault in backend_compile).  Default opt
    # level compiles the compact-trace kernels quickly and safely.
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# `import pytest` already imported jax via a plugin entry point, BEFORE this
# conftest could set JAX_PLATFORMS — so the env var alone is ignored and the
# config.update below is REQUIRED (it must run before backends initialize).
jax.config.update("jax_platforms", "cpu")
# fail loudly if the platform override didn't stick (ADVICE.md round 1);
# this call also initializes the backends.
assert jax.default_backend() == "cpu", jax.default_backend()

from zprize_wasm_msm_tpu.utils import compile_guard

# run every XLA compile on a dedicated 1 GiB-stack thread; see module doc
compile_guard.install()

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0x5EED)


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables():
    """Free XLA:CPU JIT code sections between test modules.

    XLA:CPU keeps every compiled executable's machine code in one
    contiguous JIT arena; our unrolled limb kernels emit large code, and a
    full session exhausts the arena ("Failed to satisfy suballocation
    request" → abort/segfault mid-suite).  Clearing jit caches releases
    the executables (and their code sections) at module boundaries.
    """
    yield
    jax.clear_caches()
