"""BASELINE.json config-matrix benchmark: run every configuration the
driver's baseline asks for on the active backend and record RESULTS.json.

Configs (BASELINE.md "Targets for this repo"):
  1. BLS12-381 G1 2^10  — single-chip correctness (result verified)
  2. BLS12-381 G1 2^16  — window sweep c = 8..16 (per-c throughput curve)
  3. BLS12-377 G1 2^20
  4. BLS12-381 G2 2^16  (Fq2 tower through the same generic kernels)
  5. BLS12-381 G1 2^20  — the headline (bench.py's config)

Every run verifies its result: bases are tiled multiples m_j of G, so the
MSM collapses to (sum_i k_i * m_{i mod B}) * G — one host scalar-mul.

Usage: python tools/bench_matrix.py [--configs 1,2,5] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _setup_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    return jax


def make_inputs(curve, logn, seed=123, base=64):
    """Tiled multiples of G + random full-width scalars, with the host-side
    expected result (same scheme as bench.py)."""
    import jax.numpy as jnp

    from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve, F2
    from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs

    n = 1 << logn
    base = min(base, n)
    field = None if curve.ext == 1 else F2(curve.q, curve.nr)
    oc = OracleCurve(
        q=curve.q, a=curve.a, b=curve.b, r=curve.r, gx=curve.gx, gy=curve.gy,
        field=field,
    )
    rng = np.random.default_rng(seed)
    mults = [int(rng.integers(1, 1 << 62)) for _ in range(base)]
    pts = [oc.mul(oc.g, m) for m in mults]
    F = curve.field
    xs = np.stack([np.asarray(F.const(p[0])) for p in pts], axis=1)
    ys = np.stack([np.asarray(F.const(p[1])) for p in pts], axis=1)
    reps = n // base
    X = jnp.asarray(np.tile(xs, (1, reps)))
    Y = jnp.asarray(np.tile(ys, (1, reps)))
    ks = rng.integers(0, 1 << 62, size=(n,), dtype=np.uint64)
    mix = int.from_bytes(rng.bytes(24), "little")
    kints = [(int(k) * mix + int(k)) % curve.r for k in ks]
    sc = jnp.asarray(ints_to_limbs(kints, curve.fr.n_limbs))
    total = sum(k * mults[i % base] for i, k in enumerate(kints)) % curve.r
    expected = oc.mul(oc.g, total)
    return (X, Y), sc, expected


def run_msm(curve, logn, c=None, reps=3, impl=None, use_glv=None, seed=123):
    import jax

    from zprize_wasm_msm_tpu.models.context import build_curve

    ctx = build_curve(curve)
    (X, Y), sc, expected = make_inputs(curve, logn, seed=seed)
    kw = {}
    if impl:
        kw["impl"] = impl
    if use_glv is not None:
        kw["use_glv"] = use_glv

    @jax.jit
    def run(X, Y, sc):
        return ctx.msm((X, Y), sc, c=c, **kw)

    def fetch(res):
        return tuple(np.asarray(r) for r in res)

    t0 = time.time()
    res = fetch(run(X, Y, sc))
    first = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.time()
        res = fetch(run(X, Y, sc))
        times.append(time.time() - t0)
    best = min(times)
    got = ctx.result_to_affine(tuple(map(np.asarray, res)))
    ok = got == expected
    return {
        "curve": curve.name,
        "log2n": logn,
        "c": c,
        "points_per_sec": round((1 << logn) / best, 1),
        "best_s": round(best, 4),
        "first_call_s": round(first, 1),
        "verified": bool(ok),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="1,2,3,4,5")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--sweep", default="8,9,10,11,12,13,14,15,16")
    ap.add_argument("--out", default=os.path.join(REPO, "RESULTS.json"))
    args = ap.parse_args()
    jax = _setup_jax()

    from zprize_wasm_msm_tpu.models.curves import bls12_377, bls12_381, bls12_381_g2

    want = set(args.configs.split(","))
    results = {"device": jax.devices()[0].device_kind, "entries": []}

    def emit(entry):
        results["entries"].append(entry)
        print(json.dumps(entry), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=1)

    def guarded(label, fn, *a, **kw):
        try:
            e = fn(*a, **kw)
        except Exception as exc:  # record the failure, keep sweeping
            e = {"config": label, "error": str(exc)[:300]}
        if label and "config" not in e:
            e["config"] = label
        emit(e)

    if "1" in want:
        guarded("single_chip_check", run_msm, bls12_381, 10, reps=args.reps)
    if "2" in want:
        # the window sweep exercises the large-window sorted engine
        # (the c=6 VMEM engine is the c <= 6 point on the same curve)
        for c in (int(x) for x in args.sweep.split(",")):
            guarded(
                f"window_sweep_c{c}",
                run_msm, bls12_381, 16, c=c, reps=args.reps,
                impl="pallas-sorted",
            )
    if "3" in want:
        guarded("bls12_377_2^20", run_msm, bls12_377, 20, reps=args.reps)
    if "3b" in want:
        # the r5 shipping engine (full 255-bit scalars, c=7 packed buckets)
        # on the ZPrize curve
        guarded(
            "bls12_377_2^20_full_c7",
            run_msm, bls12_377, 20, reps=args.reps, use_glv=False,
        )
    if "4" in want:
        guarded("g2_2^16", run_msm, bls12_381_g2, 16, reps=args.reps)
    if "5" in want:
        # the shipping headline engine (full 255-bit scalars, c=7 packed
        # buckets — same path as bench.py since r5); "5b" keeps the GLV
        # c=6 engine under its own label for cross-round comparison
        guarded(
            "headline_2^20", run_msm, bls12_381, 20, reps=args.reps,
            use_glv=False,
        )
    if "5b" in want:
        guarded("headline_2^20_glv", run_msm, bls12_381, 20, reps=args.reps)
    if "6" in want:
        # largest single-chip configs (the 2^26 scaling story, VERDICT #7):
        # per-device working set at N=2^26/8 sharded equals the 2^23 point
        # (GLV-doubled 2^24 lanes) — measuring 2^22/2^23 single-chip grounds
        # the multi-host projection in measured per-stage times
        guarded("large_2^22", run_msm, bls12_381, 22, reps=max(1, args.reps - 1))
    if "7" in want:
        guarded("large_2^23", run_msm, bls12_381, 23, reps=1)
    if "7b" in want:
        # full-scalar engine at 2^23 — the exact per-device load of the
        # 8-chip 2^26 config (tools/project_scaling.py consumes this)
        guarded("large_2^23_full_c7", run_msm, bls12_381, 23, reps=1,
                use_glv=False)
    if "8" in want:
        # SHIPPING-engine window sweep at the headline size (VERDICT r4
        # weak #3: the c=8..16 sweep characterized the sorted engine, not
        # the VMEM-bucket engine users get).  GLV half-scalars at
        # c = 4..6 and full 255-bit scalars at c = 6..7 (packed buckets).
        for c in (4, 5, 6):
            guarded(
                f"vmem_sweep_glv_c{c}",
                run_msm, bls12_381, 20, c=c, reps=2, impl="pallas",
            )
        for c in (6, 7):
            guarded(
                f"vmem_sweep_full_c{c}",
                run_msm, bls12_381, 20, c=c, reps=2, impl="pallas",
                use_glv=False,
            )
    if "9" in want:
        # 2^24 single-chip: one octave above the previous largest measured
        # point (VERDICT r4 missing #2); ~6.4 GB of points + digits on a
        # 16 GB-HBM v5e
        # non-GLV: the GLV point-doubling would put the 2^25-lane batch
        # past the 16 GB HBM; the c=7 full-scalar engine keeps 2^24 lanes
        guarded("large_2^24", run_msm, bls12_381, 24, reps=1, use_glv=False)
    print(f"# wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
