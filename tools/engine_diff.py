"""Cross-engine differential at scale: the reference's optimized-vs-legacy
check (wasmcurves/test/batchAffine.js:1258-1301, 2^16 random points) run
between INDEPENDENT device paths:

  1. pallas   — VMEM-bucket sweep + fused finish kernel (GLV c=6)
  2. pallas-full-c7 — the r5 shipping config: full 255-bit scalars,
                u16-packed c=7 buckets + finish_large
  3. pallas-sorted — sort + running-sum sweep + segmented combine
  4. xla      — jnp private-bucket scatter
  5. naive    — per-point double-and-add ladder + tree sum (ops.msm.naive;
                shares NO pipeline stage with the bucket engines)

All five must agree as group elements, and match the host-side collapse
(sum k_i * m_i) * G of the synthetic input.  Usage:
    DIFF_LOG2N=16 python tools/engine_diff.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from zprize_wasm_msm_tpu.models.context import build_curve
    from zprize_wasm_msm_tpu.models.curves import bls12_381
    from zprize_wasm_msm_tpu.ops.msm import pippenger
    from zprize_wasm_msm_tpu.ops.msm.naive import msm_naive
    from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve
    from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs

    logn = int(os.environ.get("DIFF_LOG2N", "16"))
    n = 1 << logn
    curve = bls12_381
    fq, fr = curve.fq, curve.fr
    ctx = build_curve(curve)

    rng = np.random.default_rng(77)
    oc = OracleCurve(q=curve.q, a=0, b=curve.b, r=curve.r, gx=curve.gx, gy=curve.gy)
    base = 64
    mults = [int(rng.integers(1, 1 << 62)) for _ in range(base)]
    pts = [oc.mul(oc.g, m) for m in mults]
    xs = np.asarray(ints_to_limbs([fq.to_mont_int(p[0]) for p in pts], fq.n_limbs))
    ys = np.asarray(ints_to_limbs([fq.to_mont_int(p[1]) for p in pts], fq.n_limbs))
    X = jnp.asarray(np.tile(xs, (1, n // base)))
    Y = jnp.asarray(np.tile(ys, (1, n // base)))
    ks = [int.from_bytes(rng.bytes(31), "little") % curve.r for _ in range(n)]
    sc = jnp.asarray(ints_to_limbs(ks, fr.n_limbs))

    results = {}
    errors = {}
    t0 = time.time()

    def guarded(name, fn):
        t = time.time()
        try:
            res = fn()
            results[name] = ctx.result_to_affine(
                tuple(jnp.asarray(r) for r in res)
            )
        except Exception as exc:  # record, keep comparing the others
            errors[name] = str(exc)[:200]
        print(f"# {name}: {time.time()-t:.1f}s", file=sys.stderr, flush=True)

    guarded("pallas", lambda: ctx.msm((X, Y), sc, impl="pallas"))
    # the r5 shipping engine: full 255-bit scalars, c=7 packed buckets +
    # finish_large — algorithmically distinct window/bucket/finish config
    guarded(
        "pallas-full-c7",
        lambda: ctx.msm((X, Y), sc, impl="pallas", use_glv=False),
    )
    guarded("pallas-sorted", lambda: ctx.msm((X, Y), sc, impl="pallas-sorted"))
    # the jnp private-bucket engine needs a small lane budget on the
    # 16 GB chip (its per-lane bucket state OOMs at the default 2 GB)
    guarded(
        "xla",
        lambda: ctx.msm((X, Y), sc, impl="xla", mem_budget_bytes=64 << 20),
    )
    guarded("naive", lambda: msm_naive(curve, (X, Y), sc))

    total = sum(k * mults[i % base] for i, k in enumerate(ks)) % curve.r
    expected = oc.mul(oc.g, total)
    agree = (
        len(results) >= 2
        and not errors  # a crashed engine is a FAILED differential
        and all(v == expected for v in results.values())
    )
    out = {
        "n": n,
        "engines": sorted(results),
        "engine_errors": errors,
        "all_equal_and_expected": bool(agree),
        "wall_s": round(time.time() - t0, 1),
    }
    print(json.dumps(out))
    if not agree:
        for k, v in results.items():
            print(f"# {k}: {str(v)[:80]}", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
