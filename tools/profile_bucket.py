"""Stage-level wall-clock breakdown of the VMEM-bucket MSM engine.

Times every stage of the headline bench pipeline (GLV preprocess, digit
recode, each pl_bucket window pass, lane tree-reduce, bucket reduce,
window fold) with device-side fences, so the VERDICT-3 optimization
target is measured, not guessed.

Usage: PROF_LOG2N=20 PROF_C=6 PROF_T=128 python tools/profile_bucket.py
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

    from zprize_wasm_msm_tpu.models.curves import bls12_381
    from zprize_wasm_msm_tpu.ops.msm import glv as glv_mod
    from zprize_wasm_msm_tpu.ops.msm import pippenger, pl_bucket, windows
    from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs

    logn = int(os.environ.get("PROF_LOG2N", "20"))
    c = int(os.environ.get("PROF_C", "6"))
    T = int(os.environ.get("PROF_T", "128"))
    Wp = int(os.environ.get("PROF_WP", "8"))
    n = 1 << logn
    curve = bls12_381
    fq, fr = curve.fq, curve.fr
    L = fq.n_limbs

    rng = np.random.default_rng(0)
    gx = fq.to_mont_int(curve.gx)
    gy = fq.to_mont_int(curve.gy)
    X = jnp.asarray(np.tile(ints_to_limbs([gx], L), (1, n)))
    Y = jnp.asarray(np.tile(ints_to_limbs([gy], L), (1, n)))
    ks = [int.from_bytes(rng.bytes(31), "little") % curve.r for _ in range(n)]
    sc = jnp.asarray(ints_to_limbs(ks, fr.n_limbs))

    max_bits = glv_mod.MAX_BITS

    _sum = jax.jit(lambda a: jnp.sum(a, dtype=jnp.uint32))

    def fetch(out):
        leaves = jax.tree_util.tree_leaves(out)
        np.asarray(_sum(leaves[0]))
        return out

    results = {}

    def timed(name, fn, *args, reps=3):
        t0 = time.time()
        out = fetch(fn(*args))
        first = time.time() - t0
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fetch(fn(*args))
            ts.append(time.time() - t0)
        best = min(ts)
        results[name] = round(best, 4)
        print(f"{name:28s} {best*1e3:9.1f} ms   (first {first:6.1f}s)", file=sys.stderr, flush=True)
        return out

    # stage selection: each stage's standalone jit is a NEW compile; a
    # wedged compile (e.g. the GLV graph at 2^20 hung the remote compile
    # helper >28 min) must not sink the rest — select via PROF_STAGES.
    stages = set(
        os.environ.get("PROF_STAGES", "bucket,reduce,fold,e2e").split(",")
    )

    # stage 1+2 (only when requested — their standalone jits are the
    # riskiest compiles): GLV preprocess and digit recode
    if "glv" in stages:
        glv_fn = jax.jit(
            lambda X, Y, sc: glv_mod.preprocess_endomorphism(curve, (X, Y), sc)
        )
        (_, _), s2 = timed("glv_preprocess", glv_fn, X, Y, sc)
        if "digits" in stages:
            dig_fn = jax.jit(lambda s: windows.signed_window_digits(s, c, max_bits))
            timed("signed_window_digits", dig_fn, s2)

    # synthetic bucket-stage inputs with the GLV-doubled shapes: stages
    # 3-6 are digit-value-driven, so uniform random signed digits exercise
    # them identically to real GLV output
    N2 = 2 * n
    B = 1 << (c - 1)
    W = windows.num_windows(max_bits, c)
    X2 = jnp.asarray(np.tile(np.asarray(X)[:, :1], (1, N2)))
    Y2 = jnp.asarray(np.tile(np.asarray(Y)[:, :1], (1, N2)))
    digits = jnp.asarray(
        rng.integers(-B, B + 1, size=(W, N2)).astype(np.int32)
    )
    print(f"# W={W} windows, N={N2} points (GLV-doubled), c={c}, T={T}, Wp={Wp}",
          file=sys.stderr, flush=True)

    # stage 3: one pl_bucket pass of Wp windows (xWpasses = full accumulate)
    wpad = (-W) % Wp
    dpad = (
        jnp.concatenate([digits, jnp.zeros((wpad, N2), digits.dtype)], axis=0)
        if wpad
        else digits
    )
    passes = (W + wpad) // Wp
    adds = N2 * Wp
    if "bucket" in stages:
        acc_fn = jax.jit(
            lambda X, Y, d: pl_bucket.bucket_accumulate(curve, (X, Y), d, lanes=T, c=c)
        )
        part = timed("bucket_pass_1xWp", acc_fn, X2, Y2, dpad[:Wp])
        results["bucket_passes_total_est"] = round(
            results["bucket_pass_1xWp"] * passes, 4
        )
        print(f"# pass adds/s = {adds/results['bucket_pass_1xWp']/1e6:.1f} M "
              f"({passes} passes)", file=sys.stderr, flush=True)

        if "reduce" in stages:
            # stage 4: lane tree reduce on one pass's output
            red_fn = jax.jit(lambda b: pippenger._lane_tree_reduce(curve, b))
            lane_red = timed("lane_tree_reduce_1xWp", red_fn, part)
            results["lane_reduce_total_est"] = round(
                results["lane_tree_reduce_1xWp"] * passes, 4
            )

            # stage 5: bucket reduce over all W windows
            full = tuple(
                jnp.concatenate([jnp.broadcast_to(b, b.shape)] * passes, axis=1)[:, :W]
                for b in lane_red
            )
            bred_fn = jax.jit(lambda b: pippenger.bucket_reduce(curve, b))
            per_window = timed("bucket_reduce", bred_fn, full)

            if "fold" in stages:
                # stage 6: window fold
                fold_fn = jax.jit(lambda pw: pippenger.window_fold(curve, pw, c))
                timed("window_fold", fold_fn, per_window)

    if "e2e" in stages:
        # end-to-end (the bench jit — cached from bench.py runs)
        @jax.jit
        def e2e(X, Y, sc):
            pts2, s2 = glv_mod.preprocess_endomorphism(curve, (X, Y), sc)
            return pippenger.msm(
                curve, pts2, s2, c=None, max_bits=max_bits, impl="auto"
            )

        timed("end_to_end_msm", e2e, X, Y, sc)

    results["meta"] = {
        "logn": logn, "c": c, "T": T, "Wp": Wp, "W": W,
        "passes": passes, "adds_per_pass": adds,
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
