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

# persistent compile cache (same store the TPU bench uses; entries are
# keyed per backend so CPU and TPU coexist).  The pairing-stage compiles
# the slow tier pays (minutes each at full width, tens of seconds at toy
# width) are then paid once per source revision, not once per run.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

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


# ---------------------------------------------------------------------------
# smoke tier: a bounded (< 10 min) fast gate over every layer (VERDICT r3 #5).
# Tests are smoke when (a) explicitly listed here, or (b) parameterized on a
# toy curve/field (param id contains "toy") and not marked slow.
# ---------------------------------------------------------------------------

_SMOKE_TESTS = {
    # MSM pipeline stages + engines (toy width)
    "test_msm.py::test_raw_window_digits",
    "test_msm.py::test_signed_window_digits",
    "test_msm.py::test_msm_e2e_toy",
    "test_msm.py::test_engine_differential_naive_vs_bucket_toy",
    "test_msm.py::test_resolve_config_explicit_large_c_pallas",
    # GLV host-side decompose bounds (device part is tiny)
    "test_glv.py::test_phi_is_lambda",
    # sharded path on the virtual mesh (toy)
    "test_sharded.py::test_eight_devices_available",
    "test_sharded.py::test_sharded_msm_toy_matches_oracle_and_single_device",
    # field spec constants (host-only)
    "test_field.py::test_spec_constants",
    # serde sign convention (host+small device)
    "test_groupmap.py::test_field_exp_runtime_toy",
    "test_g3.py::test_f3_sign_convention",
    "test_g3.py::test_ext3_result_to_affine_zero",
    # poly layer over toy Fr
    "test_poly.py::test_construct_lc",
    "test_poly.py::test_build_abc_join",
    "test_fft.py::test_ifft_roundtrip",
    # toy curve group laws (no "toy" in the nodeid)
    "test_g3.py::test_f3_field_ops",
    "test_g3.py::test_g3_group_law_differential",
    "test_curve_general_a.py::test_general_a_msm_differential",
    # Pallas kernels in interpret mode (toy spec)
    "test_kernels.py::test_kcore_matches_mont",
    "test_kernels.py::test_kgroup_matches_group",
    "test_kernels.py::test_pl_bucket_matches_xla_path",
    "test_kernels.py::test_sorted_engine_matches_oracle_g1[4]",
    # pairing algebra at toy scale
    "test_pairing_fast.py::test_mnt6_tower_algebra_toy",
    "test_pairing_fast.py::test_bn_mul024_matches_dense",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        rel = item.nodeid.split("/")[-1]
        base = rel.split("[")[0]
        is_toy_param = "[" in rel and "toy" in rel.split("[", 1)[1]
        if rel in _SMOKE_TESTS or base in _SMOKE_TESTS or (
            is_toy_param and "slow" not in item.keywords
        ):
            item.add_marker(pytest.mark.smoke)
