"""Pre-compile the driver-facing jit signatures into .jax_cache.

The reference ships checked-in build artifacts (build/*.wasm + base64 JS,
tools/buildwasm_bls12381.js:15-43) so users never pay codegen at runtime.
The TPU-native analog is the persistent XLA compile cache: this tool
populates it with the EXACT signatures the round driver replays —

  1. `python bench.py` (headline MSM, real TPU) — one rep, long budget;
  2. `__graft_entry__.entry()` compile check (single chip);
  3. `__graft_entry__.dryrun_multichip(8)` on the virtual CPU mesh.

Run it after the last kernel-source change of a working session: the
cache is keyed on jaxpr, so ANY edit to traced code invalidates the
matching entries and the next driver run pays a cold compile (which is
what timed the round-1/round-3 benches out).

Usage: python tools/warm_cache.py [--skip-tpu] [--skip-cpu]
"""

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(desc, cmd, env=None, timeout=3600):
    t0 = time.time()
    print(f"[warm_cache] {desc}: {' '.join(cmd)}", flush=True)
    e = dict(os.environ)
    if env:
        e.update(env)
    p = subprocess.run(cmd, cwd=REPO, env=e, timeout=timeout)
    print(f"[warm_cache] {desc}: rc={p.returncode} in {time.time()-t0:.0f}s", flush=True)
    return p.returncode


def main():
    args = sys.argv[1:]
    rc = 0
    if "--skip-tpu" not in args:
        # 1. headline bench signature (includes result_to_affine verify path)
        rc |= run(
            "bench (TPU)",
            [sys.executable, "bench.py"],
            env={"BENCH_REPS": "1", "BENCH_BUDGET_S": "3400"},
        )
        # 2. entry() single-chip compile check
        rc |= run(
            "entry compile (TPU)",
            [
                sys.executable,
                "-c",
                "import __graft_entry__ as g, jax; fn, a = g.entry(); "
                "jax.block_until_ready(jax.jit(fn)(*a)); print('entry OK')",
            ],
        )
    if "--skip-cpu" not in args:
        # 3. multichip dryrun on the virtual CPU mesh (driver replays this)
        rc |= run(
            "dryrun_multichip (CPU x8)",
            [
                sys.executable,
                "-c",
                "import jax; jax.config.update('jax_platforms', 'cpu'); "
                "import __graft_entry__ as g; g.dryrun_multichip(8); "
                "print('dryrun OK')",
            ],
            env={
                "JAX_PLATFORMS": "cpu",
                "XLA_FLAGS": os.environ.get("XLA_FLAGS", "")
                + " --xla_force_host_platform_device_count=8",
            },
        )
    sys.exit(rc)


if __name__ == "__main__":
    main()
