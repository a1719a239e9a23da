"""Headline benchmark: BLS12-381 G1 MSM points/sec on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md): its own harness
(wasmcurves/benchmarks/multiexp.js) prints wall-clock for N=2^17 on a host
CPU.  vs_baseline is normalized against REF_WASM_PTS_PER_SEC, a bounded
estimate for the reference's optimized engine (~2.5e4 points/sec at 2^16
on a modern x86 core; see BASELINE.md — "several minutes" for 10 reps of
2^16 in test/batchAffine.js:1257-1301 implies a few seconds per 65k-point
MSM; the estimate is deliberately generous to the reference).

Robustness (the driver runs this under an external timeout):
  * progress goes to stderr immediately, stage by stage;
  * BENCH_BUDGET_S (default 520) is an internal wall-clock budget — after
    the first (compiling) call the rep count is trimmed to fit, and the
    result JSON is emitted even if only one timed rep fits;
  * the persistent .jax_cache is populated by tools/warm_cache.py at the
    end of every working session, so the driver's run replays cached
    executables instead of paying a cold XLA/Mosaic compile.
"""

import json
import os
import resource
import sys
import time

# LLVM can overflow the default 8 MB stack compiling our limb kernels for
# the CPU fallback path; re-exec once with the raised limit (harmless when
# running on a real TPU backend).
if os.environ.get("_ZPTPU_STACK_REEXEC") != "1":
    try:
        soft, hard = resource.getrlimit(resource.RLIMIT_STACK)
        want = (1 << 30) if hard == resource.RLIM_INFINITY else min(hard, 1 << 30)
        if soft != want:  # FINITE: glibc sizes pthread stacks from it
            resource.setrlimit(resource.RLIMIT_STACK, (want, hard))
            os.environ["_ZPTPU_STACK_REEXEC"] = "1"
            os.execv(sys.executable, list(sys.orig_argv))
    except (ValueError, OSError):
        pass

import numpy as np

REF_WASM_PTS_PER_SEC = 2.5e4

LOG2N = int(os.environ.get("BENCH_LOG2N", "20"))
WINDOW = os.environ.get("BENCH_C")  # optional override
REPS = int(os.environ.get("BENCH_REPS", "3"))
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "520"))

T_START = time.time()


def log(msg):
    print(f"# [{time.time() - T_START:6.1f}s] {msg}", file=sys.stderr, flush=True)


def main():
    log(f"bench start: n=2^{LOG2N} budget={BUDGET_S:.0f}s pid={os.getpid()}")
    import jax

    # persistent compilation cache: the driver's bench run reuses compiles
    # from interactive runs (and vice versa), keeping wall-clock dominated
    # by execution, not XLA.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import jax.numpy as jnp

    from zprize_wasm_msm_tpu.models.curves import bls12_381
    from zprize_wasm_msm_tpu.ops.msm import glv as glv_mod
    from zprize_wasm_msm_tpu.ops.msm import pippenger
    from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs

    log(f"imports done; device={jax.devices()[0].device_kind}")

    n = 1 << LOG2N
    fq, fr = bls12_381.fq, bls12_381.fr

    # DISTINCT bases: n device-computed multiples [m_i]G with distinct
    # random 62-bit m_i (a tiled-duplicate batch would hit the doubling
    # case in every bucket repeatedly — unrepresentative of real MSM
    # inputs).  The MSM still collapses to (sum_i k_i*m_i) * G for cheap
    # exact host verification.
    from zprize_wasm_msm_tpu.models.context import build_curve
    from zprize_wasm_msm_tpu.ops.curve import group

    ctx = build_curve(bls12_381)
    rng = np.random.default_rng(123)
    base_mults = rng.integers(1, 1 << 62, size=(n,), dtype=np.uint64)
    t0 = time.time()
    bases_cache = os.path.join(cache_dir, f"bench_bases_{LOG2N}.npz")
    if os.path.exists(bases_cache):
        d = np.load(bases_cache)
        X, Y = jnp.asarray(d["X"]), jnp.asarray(d["Y"])
        log(f"distinct bases loaded from cache in {time.time()-t0:.1f}s")
    else:
        # generate [m_i]G in 2^16-point chunks: one times_scalar over the
        # full (L, 2^20) batch crashes this environment's TPU worker
        # (scan-body HBM peak); the chunked shape is also what 2^14-scale
        # runs compile, so one executable serves every chunk
        gx = fq.to_mont_int(bls12_381.gx)
        gy = fq.to_mont_int(bls12_381.gy)
        CH = min(n, 1 << 16)
        GX = jnp.asarray(np.broadcast_to(
            np.asarray(ints_to_limbs([gx], fq.n_limbs)), (fq.n_limbs, CH)
        ).copy())
        GY = jnp.asarray(np.broadcast_to(
            np.asarray(ints_to_limbs([gy], fq.n_limbs)), (fq.n_limbs, CH)
        ).copy())

        @jax.jit
        def make_chunk(m):
            P = group.from_affine(bls12_381, (GX, GY))
            return group.to_affine(bls12_381, group.times_scalar(bls12_381, P, m))

        xs, ys = [], []
        for i in range(0, n, CH):
            m = jnp.asarray(
                ints_to_limbs([int(v) for v in base_mults[i : i + CH]], 4)
            )
            cx, cy = make_chunk(m)
            xs.append(np.asarray(cx))
            ys.append(np.asarray(cy))
            if i == 0:
                log(f"first base chunk done at {time.time()-t0:.1f}s")
        Xh = np.concatenate(xs, axis=1)
        Yh = np.concatenate(ys, axis=1)
        np.savez(bases_cache, X=Xh, Y=Yh)
        X, Y = jnp.asarray(Xh), jnp.asarray(Yh)
        log(f"distinct bases [m_i]G built on device in {time.time()-t0:.1f}s")

    ks = rng.integers(0, 1 << 62, size=(n,), dtype=np.uint64)
    # widen to full 255-bit scalars: multiply by a mixer host-side
    mix = int.from_bytes(rng.bytes(24), "little")
    kints = [(int(k) * mix + int(k)) % bls12_381.r for k in ks]
    sc = jnp.asarray(ints_to_limbs(kints, fr.n_limbs))
    log("input batch built")

    c = int(WINDOW) if WINDOW else None
    impl = os.environ.get("BENCH_IMPL", "auto")
    use_glv = os.environ.get("BENCH_GLV", "0") == "1"

    # ONE composed jit: each per-stage dispatch through the remote-device
    # tunnel costs tens of ms (synchronous execute RPC), so splitting the
    # pipeline into its stage jits measured ~0.4 s/rep slower.  Set
    # BENCH_SPLIT=1 to run per-stage executables (smaller compiles, one
    # per stage) when debugging a compile or kernel fault.
    #
    # BENCH_GLV=1 restores the GLV-split engine (2n half-width points at
    # c=6: 48 padded window rows of work).  The default engine feeds the
    # full 255-bit scalars at c=7 (u16-packed buckets, 40 rows) — 17%
    # fewer sweep adds and no decomposition stage; measured faster on the
    # v5e (RESULTS3.json r5).
    if use_glv:
        max_bits = glv_mod.MAX_BITS

        def run_stages(X, Y, sc):
            pts2, s2 = glv_mod.preprocess_endomorphism(bls12_381, (X, Y), sc)
            return pippenger.msm(
                bls12_381, pts2, s2, c=c, max_bits=max_bits, impl=impl
            )
    else:
        def run_stages(X, Y, sc):
            return pippenger.msm(
                bls12_381, (X, Y), sc, c=c, max_bits=255, impl=impl
            )

    run = (
        run_stages
        if os.environ.get("BENCH_SPLIT") == "1"
        else jax.jit(run_stages)
    )

    def fetch(res):
        # force full materialization on host: block_until_ready alone is not
        # trustworthy through remote-device tunnels
        return tuple(np.asarray(r) for r in res)

    # compile + first call (served from .jax_cache when warm), split into
    # trace / XLA-compile-or-cache-hit / first-dispatch so the cost of a
    # cold compile vs the tunnel's executable-load is visible (VERDICT r4
    # weak #5)
    log("compiling + first call ...")
    t0 = time.time()
    if os.environ.get("BENCH_SPLIT") == "1":
        res = fetch(run(X, Y, sc))
        compile_and_first = time.time() - t0
    else:
        lowered = run.lower(X, Y, sc)
        t1 = time.time()
        compiled = lowered.compile()
        t2 = time.time()
        res = fetch(compiled(X, Y, sc))
        t3 = time.time()
        compile_and_first = t3 - t0
        log(
            f"first call split: trace={t1-t0:.1f}s "
            f"compile-or-cache-hit={t2-t1:.1f}s first-exec(load+run)={t3-t2:.1f}s"
        )
        run = compiled
    log(f"first call done in {compile_and_first:.1f}s")

    times = []
    for i in range(REPS):
        elapsed = time.time() - T_START
        # keep ~40s of headroom for verification + teardown
        if times and elapsed + max(times) > BUDGET_S - 40:
            log(f"budget: stopping after {len(times)}/{REPS} reps")
            break
        t0 = time.time()
        res = fetch(run(X, Y, sc))
        times.append(time.time() - t0)
        log(f"rep {i + 1}: {times[-1]:.3f}s")
    if not times:
        times = [compile_and_first]  # degenerate upper bound; never faked
    best = min(times)
    pps = n / best

    # ---- verify: the bases are distinct multiples [m_i]G, so the MSM
    # collapses to (sum_i k_i * m_i mod r) * G — one cheap host-side
    # scalar-mul.  A perf "win" that computes garbage cannot pass.
    log("verifying result ...")
    from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve

    oc = OracleCurve(
        q=bls12_381.q, a=0, b=bls12_381.b, r=bls12_381.r,
        gx=bls12_381.gx, gy=bls12_381.gy,
    )
    total = sum(k * int(m) for k, m in zip(kints, base_mults)) % bls12_381.r
    expected = oc.mul(oc.g, total)
    got = ctx.result_to_affine(tuple(jnp.asarray(r) for r in res))
    assert got == expected, "MSM result verification FAILED"
    log("verified OK")
    out = {
        "metric": f"msm_points_per_sec_bls12_381_g1_2^{LOG2N}",
        "value": round(pps, 1),
        "unit": "points/sec",
        "vs_baseline": round(pps / REF_WASM_PTS_PER_SEC, 3),
    }
    print(json.dumps(out), flush=True)
    print(
        f"# n=2^{LOG2N} best={best:.3f}s times={['%.3f' % t for t in times]} "
        f"first_call={compile_and_first:.1f}s device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
