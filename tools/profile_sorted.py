"""Stage-level wall-clock breakdown of the sorted-runs MSM engine.

Times each pipeline stage of pl_sorted (sort/gather, sweep kernel,
compact, segscan combine, scatter, bucket reduce, window fold) separately
on the active backend with block_until_ready fences, so the optimization
target is measured, not guessed.

Usage: PROF_C=10 PROF_LOG2N=20 python tools/profile_sorted.py
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
    from zprize_wasm_msm_tpu.ops.msm import pippenger, pl_sorted, windows
    from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs

    logn = int(os.environ.get("PROF_LOG2N", "20"))
    c = int(os.environ.get("PROF_C", "10"))
    n = 1 << logn
    curve = bls12_381
    fq, fr = curve.fq, curve.fr
    L = fq.n_limbs

    rng = np.random.default_rng(0)
    gx = fq.to_mont_int(curve.gx)
    gy = fq.to_mont_int(curve.gy)
    X = jnp.asarray(np.tile(ints_to_limbs([gx], L), (1, n)))
    Y = jnp.asarray(np.tile(ints_to_limbs([gy], L), (1, n)))
    ks = [int.from_bytes(rng.bytes(16), "little") for _ in range(n)]
    sc = jnp.asarray(ints_to_limbs(ks, fr.n_limbs))

    max_bits = glv_mod.MAX_BITS

    _sum = jax.jit(lambda a: jnp.sum(a, dtype=jnp.uint32))

    def fetch(out):
        # block_until_ready is untrustworthy through the remote-device
        # tunnel (see bench.py), and materializing a multi-hundred-MB
        # output times the tunnel, not the chip — fetch a 4-byte
        # device-side reduction of one leaf instead.
        leaves = jax.tree_util.tree_leaves(out)
        np.asarray(_sum(leaves[0]))
        return out

    def timed(name, fn, *args, reps=3):
        out = fetch(fn(*args))
        ts = []
        for _ in range(reps):
            t0 = time.time()
            out = fetch(fn(*args))
            ts.append(time.time() - t0)
        print(json.dumps({"stage": name, "best_s": round(min(ts), 4)}), flush=True)
        return out

    # GLV + digits
    glv_fn = jax.jit(
        lambda X, Y, sc: glv_mod.preprocess_endomorphism(curve, (X, Y), sc)
    )
    (pts, s) = timed("glv", glv_fn, X, Y, sc)
    dig_fn = jax.jit(
        lambda s: windows.signed_window_digits(s, c, max_bits)
    )
    digits = timed("digits", dig_fn, s)
    Xg, Yg = pts
    W, N = digits.shape
    print(json.dumps({"W": int(W), "N": int(N), "c": c}), flush=True)

    # pad like bucket_accumulate_sorted
    GRID = pl_sorted.GRID
    pad = (-N) % GRID
    if pad:
        zf = jnp.zeros((L, pad), jnp.uint32)
        Xg = jnp.concatenate([Xg, zf], axis=1)
        Yg = jnp.concatenate([Yg, zf], axis=1)
        digits = jnp.concatenate(
            [digits, jnp.zeros((W, pad), digits.dtype)], axis=1
        )
    negY = jax.jit(curve.field.neg)(Yg)
    jax.block_until_ready(negY)

    # one window's full group (the per-window unit the engine loops)
    dig0 = digits[0:1]
    grp = timed(
        "accumulate_one_window",
        lambda d: pl_sorted._accumulate_group_jit(curve, (Xg, Yg, d), negY, c),
        dig0,
    )

    # full accumulation (all windows)
    buckets = timed(
        "accumulate_all",
        lambda d: pl_sorted.bucket_accumulate_sorted(curve, (Xg[:, :N], Yg[:, :N]), d, c),
        digits[:, :N],
    )
    per_window = timed(
        "bucket_reduce_grouped",
        lambda b: pippenger.bucket_reduce_grouped(curve, b),
        buckets,
    )
    timed(
        "window_fold",
        lambda w: pippenger.window_fold(curve, w, c),
        per_window,
    )

    # stage-1-only probe: sort + gather for one window
    @jax.jit
    def sort_gather(dig, X, Y, negY):
        B = 1 << (c - 1)
        mag = jnp.where(dig < 0, -dig, dig)
        key = jnp.where(dig == 0, B, mag - 1).astype(jnp.int32)
        iota = jax.lax.broadcasted_iota(jnp.int32, dig.shape, 1)
        skey, perm = jax.lax.sort_key_val(key, iota)
        neg_s = jnp.take_along_axis(dig < 0, perm, axis=1)
        Xs = jnp.take(X, perm, axis=1)
        Ys = jnp.take(Y, perm, axis=1)
        Yn = jnp.take(negY, perm, axis=1)
        return Xs, jnp.where(neg_s[None], Yn, Ys), skey

    timed("sort_gather_one_window", sort_gather, dig0, Xg, Yg, negY)

    # isolate: sort alone vs gather alone
    @jax.jit
    def sort_only(dig):
        B = 1 << (c - 1)
        mag = jnp.where(dig < 0, -dig, dig)
        key = jnp.where(dig == 0, B, mag - 1).astype(jnp.int32)
        iota = jax.lax.broadcasted_iota(jnp.int32, dig.shape, 1)
        return jax.lax.sort_key_val(key, iota)

    skey, perm = timed("sort_only_one_window", sort_only, dig0)

    @jax.jit
    def gather_only(X, Y, perm):
        return jnp.take(X, perm, axis=1), jnp.take(Y, perm, axis=1)

    timed("gather_only_two_arrays", gather_only, Xg, Yg, perm)

    @jax.jit
    def sort_all(dig):
        B = 1 << (c - 1)
        mag = jnp.where(dig < 0, -dig, dig)
        key = jnp.where(dig == 0, B, mag - 1).astype(jnp.int32)
        iota = jax.lax.broadcasted_iota(jnp.int32, dig.shape, 1)
        return jax.lax.sort_key_val(key, iota)

    timed("sort_only_all_windows", sort_all, digits)

    # gather with 16-bit-packed limbs (half the rows): isolates whether the
    # gather cost scales with row count or is per-index overhead
    @jax.jit
    def gather_packed(X, Y, perm):
        Xp = (X[0::2] | (X[1::2] << 16)).astype(jnp.uint32)
        Yp = (Y[0::2] | (Y[1::2] << 16)).astype(jnp.uint32)
        return jnp.take(Xp, perm, axis=1), jnp.take(Yp, perm, axis=1)

    timed("gather_only_packed_rows", gather_packed, Xg, Yg, perm)

    # single fused call: one take over concatenated (2L, N)
    @jax.jit
    def gather_one_call(X, Y, perm):
        XY = jnp.concatenate([X, Y], axis=0)
        return jnp.take(XY, perm, axis=1)

    timed("gather_one_call_48rows", gather_one_call, Xg, Yg, perm)

    # row-major layout: gather contiguous (2L,) rows of (N, 2L)
    XYr = jnp.concatenate([Xg, Yg], axis=0).T.copy()  # (N, 48)
    np.asarray(_sum(XYr))

    @jax.jit
    def gather_rowmajor(XYr, perm):
        return jnp.take(XYr, perm, axis=0)

    timed("gather_rowmajor_48cols", gather_rowmajor, XYr, perm[0])


if __name__ == "__main__":
    main()
