"""Speed-of-light accounting for the MSM hot kernels.

BASELINE.json's north star asks for per-field-mul-kernel SOL accounting —
the TPU analog of the reference's ad-hoc profiling
(wasmcurves/test/int.js:65 "should profile int", test/tomcook.js:148-195,
benchmarks/multiexp.js performance.now()).

Measures, on whatever backend is active (run on the TPU for real numbers):

  1. u32 VPU throughput ceiling — independent-stream mul+add+mask chains
     (the elementary op mix of the limb kernels); multiple parallel
     streams expose the ALU ILP a dependency chain hides, and the MAX
     across stream counts is the usable speed of light;
  2. Pallas Montgomery mul / square throughput (ops.field.kernels — the
     kernels the MSM actually runs) AND the jnp path (ops.field.mont, the
     CPU-fallback path) for comparison;
  3. pl_bucket mixed-add rate (the end-to-end hot loop: 11 muls + curve
     adds + B-way bucket select per point-window);

then derives utilization against ONE analytic op model, so every row is
mutually consistent: sol(field_mul) = ceiling / u32_ops(mul),
sol(bucket_add) = ceiling / u32_ops(add) where u32_ops(add) counts the
11 muls + field adds + select sweep of the measured kernel.

Output: ONE JSON line + PERF.json at the repo root.

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
    (ops.field.kernels._mul_kernel): product phase L rows x
    (1 mul + 1 mask + 1 shift + 2 adds) over L-limb slices, reduction
    phase the same plus the m-recurrence, final carry + cond-subtract.
    Counts every vector ALU op as 1."""
    product = L * L * 5
    reduction = L * L * 5 + L * 4
    carry = (L + 1) * 3 + L * 4
    return product + reduction + carry


def field_square_u32_ops(L: int) -> int:
    """Squaring: ~half the product-phase muls (diagonal + doubled upper
    triangle, +1 shift per doubled row), same reduction/carry."""
    product = (L * (L + 1) // 2) * 6
    reduction = L * L * 5 + L * 4
    carry = (L + 1) * 3 + L * 4
    return product + reduction + carry


def bucket_add_u32_ops(L: int, B: int) -> int:
    """One pl_bucket point-window add: 11 Montgomery muls (RCB16 alg 8
    mixed add) + ~17 field add/sub (Kogge-Stone: ~6 ops x L rows each)
    + the B-way gather/scatter select sweep (1 cmp + 6L selects per b)
    + digit decode noise."""
    muls = 11 * field_mul_u32_ops(L)
    fadds = 17 * 6 * L
    select = B * (1 + 6 * L)
    return muls + fadds + select + 8 * L


def g2_bucket_add_u32_ops(L: int, B: int, packed: bool = False) -> int:
    """One pl_bucket G2 (Fq2) point-window add: 11 Karatsuba Fq2 muls
    (3 base muls + ~5 base add/sub each, ktower.KFq2.mul) + ~17 Fq2
    add/sub (2 base each) + the B-way select sweep over 2L-row (or
    L-row packed) elements.  L = base-field limbs."""
    f2mul = 3 * field_mul_u32_ops(L) + 5 * 6 * L
    muls = 11 * f2mul
    fadds = 17 * 2 * 6 * L
    rows = (2 * L) // 2 if packed else 2 * L
    select = B * (1 + 6 * rows)
    return muls + fadds + select + 16 * L


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from zprize_wasm_msm_tpu.models.curves import bls12_381
    from zprize_wasm_msm_tpu.ops.curve import group
    from zprize_wasm_msm_tpu.ops.field import mont

    on_tpu = jax.devices()[0].platform == "tpu"

    fq = bls12_381.fq
    L = fq.n_limbs
    logn = int(os.environ.get("PERF_N", "20"))
    N = 1 << logn
    rng = np.random.default_rng(0)

    # ---- 1. u32 speed of light ------------------------------------------
    # Independent streams expose ALU ILP; a single dependent chain
    # under-reports the ceiling ~3x (measured r3: 1229 Gops single-chain).
    def chain(k, streams):
        @jax.jit
        def f(a, b):
            xs = [a + np.uint32(s) for s in range(streams)]
            for i in range(k):
                xs = [(x * b + np.uint32(i)) & np.uint32(0xFFFF) for x in xs]
            out = xs[0]
            for x in xs[1:]:
                out = out ^ x
            return jnp.sum(out, dtype=jnp.uint32)

        return f

    a1 = jnp.asarray(rng.integers(0, 1 << 16, size=(N,), dtype=np.uint32))
    b1 = jnp.asarray(rng.integers(0, 1 << 16, size=(N,), dtype=np.uint32))
    t_short, _ = _bench(chain(25, 1), a1, b1)
    t_long, _ = _bench(chain(200, 1), a1, b1)
    chain_gops = 175 * 3 * N / (t_long - t_short) / 1e9
    print(f"# u32 dependent-chain: {chain_gops:.0f} Gops", file=sys.stderr)

    # The SOL basis is the ANALYTIC VPU integer peak, not the chain
    # measurement: a dependent mul+add+mask chain is issue-limited to
    # ~1.2 Tops on the v5e, while the bucket-sweep kernel MEASURES
    # ~3.5 Tops of real u32 work (47 M adds/s x 73.6k ops) — the chain
    # under-reports the usable ceiling ~3x.  v5e VPU: (8, 128) lanes x
    # 4 ALUs @ 0.94 GHz = 3.85 Tops/s; unknown devices fall back to the
    # measured kernel rate as a lower bound.
    ALU_PEAK_GOPS = {
        "TPU v5 lite": 1024 * 4 * 0.94,  # 3852
        "TPU v4": 1024 * 4 * 1.05,
    }
    dev_kind = jax.devices()[0].device_kind
    u32_gops = ALU_PEAK_GOPS.get(dev_kind, max(chain_gops, 1.0))

    sol_fmul_mps = u32_gops * 1e9 / field_mul_u32_ops(L) / 1e6
    sol_fsq_mps = u32_gops * 1e9 / field_square_u32_ops(L) / 1e6

    # ---- 2. field mul: jnp path AND pallas kernels ----------------------
    CH = 4
    af = jnp.asarray(rng.integers(0, 1 << 16, size=(L, N), dtype=np.uint32))
    bf = jnp.asarray(rng.integers(0, 1 << 16, size=(L, N), dtype=np.uint32))

    @jax.jit
    def mulN_jnp(a, b):
        x = a
        for _ in range(CH):
            x = mont.mont_mul(fq, x, b)
        return jnp.sum(x, dtype=jnp.uint32)  # 4-byte fetch

    t_mul, _ = _bench(mulN_jnp, af, bf)
    fmul_jnp_mps = CH * N / t_mul / 1e6

    fmul_pl_mps = fsq_pl_mps = None
    if on_tpu:
        from zprize_wasm_msm_tpu.ops.field import kernels

        @jax.jit
        def mulN_pl(a, b):
            x = a
            for _ in range(CH):
                x = kernels.mont_mul(fq, x, b)
            return jnp.sum(x, dtype=jnp.uint32)

        @jax.jit
        def sqN_pl(a):
            x = a
            for _ in range(CH):
                x = kernels.mont_square(fq, x)
            return jnp.sum(x, dtype=jnp.uint32)

        t, _ = _bench(mulN_pl, af, bf)
        fmul_pl_mps = CH * N / t / 1e6
        t, _ = _bench(sqN_pl, af)
        fsq_pl_mps = CH * N / t / 1e6

    # ---- 3. pl_bucket mixed-add rate ------------------------------------
    bucket_adds_mps = None
    c = 6
    B = 1 << (c - 1)
    if on_tpu:
        from zprize_wasm_msm_tpu.ops.msm import pl_bucket
        from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs

        Wp, T = 8, 128
        gxm = fq.to_mont_int(bls12_381.gx)
        gym = fq.to_mont_int(bls12_381.gy)
        Xp = jnp.asarray(np.tile(ints_to_limbs([gxm], L), (1, N)))
        Yp = jnp.asarray(np.tile(ints_to_limbs([gym], L), (1, N)))
        digs = jnp.asarray(
            rng.integers(-B, B + 1, size=(Wp, N)).astype(np.int32)
        )

        @jax.jit
        def bucket_pass(X, Y, d):
            out = pl_bucket.bucket_accumulate(bls12_381, (X, Y), d, lanes=T, c=c)
            return jnp.sum(out[0], dtype=jnp.uint32)

        t, _ = _bench(bucket_pass, Xp, Yp, digs)
        bucket_adds_mps = Wp * N / t / 1e6

    sol_badd_mps = u32_gops * 1e9 / bucket_add_u32_ops(L, B) / 1e6

    # ---- 4. G2 (Fq2) bucket mixed-add rate -------------------------------
    # the VERDICT r4 gap: G2 had no roofline; same measurement as G1 but
    # over bls12_381_g2 (element length 2L), at the shipping c
    g2_adds_mps = None
    g2_c = 6  # packed-bucket G2 window (B = 32)
    g2_B = 1 << (g2_c - 1)
    if on_tpu and os.environ.get("PERF_G2", "1") == "1":
        from zprize_wasm_msm_tpu.models.curves import bls12_381_g2
        from zprize_wasm_msm_tpu.ops.msm import pl_bucket
        from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs

        N2 = min(N, 1 << 18)
        F2d = bls12_381_g2.field
        gX = F2d.const(bls12_381_g2.gx)  # (2L,)
        gY = F2d.const(bls12_381_g2.gy)
        Xp2 = jnp.asarray(np.tile(np.asarray(gX)[:, None], (1, N2)))
        Yp2 = jnp.asarray(np.tile(np.asarray(gY)[:, None], (1, N2)))
        digs2 = jnp.asarray(
            rng.integers(-g2_B, g2_B + 1, size=(8, N2)).astype(np.int32)
        )

        @jax.jit
        def g2_bucket_pass(X, Y, d):
            out = pl_bucket.bucket_accumulate(
                bls12_381_g2, (X, Y), d, lanes=128, c=g2_c, packed=True
            )
            return jnp.sum(out[0], dtype=jnp.uint32)

        t, _ = _bench(g2_bucket_pass, Xp2, Yp2, digs2)
        g2_adds_mps = 8 * N2 / t / 1e6

    sol_g2_badd_mps = (
        u32_gops * 1e9 / g2_bucket_add_u32_ops(L, g2_B, packed=True) / 1e6
    )

    out = {
        "device": jax.devices()[0].device_kind,
        "u32_vpu_gops_ceiling": round(u32_gops, 1),
        "u32_chain_gops_measured": round(chain_gops, 1),
        "field_mul_u32_ops": field_mul_u32_ops(L),
        "bucket_add_u32_ops": bucket_add_u32_ops(L, B),
        "field_mul_sol_Mps": round(sol_fmul_mps, 1),
        "field_square_sol_Mps": round(sol_fsq_mps, 1),
        "bucket_add_sol_Mps": round(sol_badd_mps, 2),
        "field_mul_jnp_Mps": round(fmul_jnp_mps, 1),
        "field_mul_jnp_sol_pct": round(100 * fmul_jnp_mps / sol_fmul_mps, 1),
        "batch_log2n": logn,
    }
    if fmul_pl_mps is not None:
        out["field_mul_pallas_Mps"] = round(fmul_pl_mps, 1)
        out["field_mul_pallas_sol_pct"] = round(100 * fmul_pl_mps / sol_fmul_mps, 1)
        out["field_square_pallas_Mps"] = round(fsq_pl_mps, 1)
        out["field_square_pallas_sol_pct"] = round(100 * fsq_pl_mps / sol_fsq_mps, 1)
    if bucket_adds_mps is not None:
        out["bucket_add_Mps"] = round(bucket_adds_mps, 2)
        out["bucket_add_sol_pct"] = round(100 * bucket_adds_mps / sol_badd_mps, 1)
        out["bucket_effective_fmul_Mps"] = round(bucket_adds_mps * 11, 1)
    out["g2_bucket_add_u32_ops"] = g2_bucket_add_u32_ops(L, g2_B, packed=True)
    out["g2_bucket_add_sol_Mps"] = round(sol_g2_badd_mps, 2)
    if g2_adds_mps is not None:
        out["g2_bucket_add_Mps"] = round(g2_adds_mps, 2)
        out["g2_bucket_add_sol_pct"] = round(100 * g2_adds_mps / sol_g2_badd_mps, 1)
    print(json.dumps(out))
    path = os.path.join(REPO, "PERF.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
