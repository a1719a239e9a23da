"""Speed-of-light accounting for the MSM hot kernels.

BASELINE.json's north star asks for per-field-mul-kernel SOL accounting —
the TPU analog of the reference's ad-hoc profiling
(wasmcurves/test/int.js:65 "should profile int",
test/tomcook.js:148-195, benchmarks/multiexp.js performance.now()).

Measures, on whatever backend is active (run on the TPU for real numbers):

  1. raw u32 VPU throughput (a mul+add+mask chain — the elementary op mix
     of the limb kernels) -> the chip's u32 speed of light;
  2. Montgomery field-mul throughput (chained mont_mul at 2^20 batch);
  3. complete-formula group-add throughput;

then derives the analytic u32-op cost of one field mul / group add and
reports achieved/SOL utilization.  Output: ONE JSON line + PERF.json next
to this file's repo root.

Usage:  python tools/perf.py            (real chip)
        PERF_N=18 python tools/perf.py  (smaller batch)
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _bench(fn, *args, reps=5):
    """Times fn; fn MUST return a small (scalar/row) array — large outputs
    would time the remote-device tunnel transfer, not the chip."""
    t0 = time.time()
    np.asarray(fn(*args))
    first = time.time() - t0
    ts = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(fn(*args))
        ts.append(time.time() - t0)
    return min(ts), first


def field_mul_u32_ops(L: int) -> int:
    """Analytic u32 elementary-op count of one Montgomery mul
    (ops.field.mont.mont_mul / kcore.kmul): product phase L rows x
    (1 mul + 1 mask + 1 shift + 2 adds) over L-limb slices, reduction
    phase the same plus the m-recurrence, final carry + cond-subtract.
    Counts every vector ALU op as 1 (the VPU issues mul and add at the
    same rate for u32)."""
    product = L * L * 5
    reduction = L * L * 5 + L * 4
    carry = (L + 1) * 3 + L * 4
    return product + reduction + carry


def group_add_field_muls() -> int:
    """Complete mixed add (RCB16 alg. 8) = 11 field muls; adds/subs are
    ~L-op noise next to the L^2 muls."""
    return 11


def main():
    cache_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
    )
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from zprize_wasm_msm_tpu.models.curves import bls12_381
    from zprize_wasm_msm_tpu.ops.curve import group
    from zprize_wasm_msm_tpu.ops.field import mont

    fq = bls12_381.fq
    L = fq.n_limbs
    logn = int(os.environ.get("PERF_N", "20"))
    N = 1 << logn
    rng = np.random.default_rng(0)

    # ---- 1. u32 speed of light ------------------------------------------
    a1 = jnp.asarray(rng.integers(0, 1 << 16, size=(N,), dtype=np.uint32))
    b1 = jnp.asarray(rng.integers(0, 1 << 16, size=(N,), dtype=np.uint32))

    def chain(k):
        @jax.jit
        def f(a, b):
            x = a
            for i in range(k):
                x = (x * b + np.uint32(i)) & np.uint32(0xFFFF)
            return jnp.sum(x, dtype=jnp.uint32)

        return f

    t_short, _ = _bench(chain(100), a1, b1)
    t_long, _ = _bench(chain(800), a1, b1)
    # difference cancels the HBM read/launch overhead: 700 iters x 3 ops
    u32_gops = 700 * 3 * N / (t_long - t_short) / 1e9

    # ---- 2. field mul ----------------------------------------------------
    CH = 4
    af = jnp.asarray(rng.integers(0, 1 << 16, size=(L, N), dtype=np.uint32))
    bf = jnp.asarray(rng.integers(0, 1 << 16, size=(L, N), dtype=np.uint32))

    @jax.jit
    def mulN(a, b):
        x = a
        for _ in range(CH):
            x = mont.mont_mul(fq, x, b)
        return jnp.sum(x, dtype=jnp.uint32)  # 4-byte fetch

    t_mul, _ = _bench(mulN, af, bf)
    fmul_mps = CH * N / t_mul / 1e6
    sol_fmul_mps = u32_gops * 1e9 / field_mul_u32_ops(L) / 1e6
    fmul_pct = 100.0 * fmul_mps / sol_fmul_mps

    # ---- 3. group add ----------------------------------------------------
    Ng = N // 8
    P = group.generator(bls12_381, (Ng,))

    @jax.jit
    def add2(p):
        x = group.add(bls12_381, p, p)
        return jnp.sum(group.add(bls12_381, x, p)[0], dtype=jnp.uint32)

    t_add, _ = _bench(add2, P)
    gadd_mps = 2 * Ng / t_add / 1e6
    # full projective add = 12 muls + ~2 squarings worth of adds
    sol_gadd_mps = sol_fmul_mps / 12
    gadd_pct = 100.0 * gadd_mps / sol_gadd_mps

    out = {
        "device": jax.devices()[0].device_kind,
        "u32_vpu_gops": round(u32_gops, 1),
        "field_mul_Mps": round(fmul_mps, 1),
        "field_mul_sol_Mps": round(sol_fmul_mps, 1),
        "field_mul_sol_pct": round(fmul_pct, 1),
        "field_mul_u32_ops": field_mul_u32_ops(L),
        "group_add_Mps": round(gadd_mps, 2),
        "group_add_sol_pct": round(gadd_pct, 1),
        "batch_log2n": logn,
    }
    print(json.dumps(out))
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PERF.json"
    )
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
