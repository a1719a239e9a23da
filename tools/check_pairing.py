"""Full-width pairing bilinearity witness on the active backend.

The reference proves its pairings with full-width bilinearity +
Frobenius identities (wasmcurves/test/bls12381.js:679,524,596; bn128 and
mnt6753 analogues); this is the hardware-witness form of that evidence,
in the style of tools/check_groth16.py: for random a, b

    e(aP, bQ) * e(-abP, Q) = e(P, Q)^(ab - ab) = 1

must ACCEPT, while corrupting either input ((a+1)P or (b+1)Q) must
REJECT, and the bare e(P, Q) must be non-degenerate (!= 1).  A wrong
Miller loop, tower, Frobenius table, or final exponentiation cannot
satisfy all five outcomes (incl. the
infinity-pair identity).

One Miller-loop batch of 6 pairs (incl. an infinity pair exercising
the identity mask, as the reference's pairing-with-zero tests do) + ONE batched final exponentiation of
the 4 check products per family, so the run reuses exactly the stage
executables the public pairing()/pairing_eq() API dispatches.

Usage:  python tools/check_pairing.py [bls12_381|bn254|mnt6753]...
        (no args = all three; appends per-family results to
        RESULTS_PAIRING.json)
"""

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)


def _g1_dev(curve, pts):
    import jax.numpy as jnp

    from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs

    fq = curve.fq
    xs = [0 if p is None else fq.to_mont_int(p[0]) for p in pts]
    ys = [0 if p is None else fq.to_mont_int(p[1]) for p in pts]
    return (
        jnp.asarray(ints_to_limbs(xs, fq.n_limbs)),
        jnp.asarray(ints_to_limbs(ys, fq.n_limbs)),
    )


def _g2_dev(curve, pts):
    import jax.numpy as jnp

    F = curve.field
    xs = [F.const(p[0] if p else 0) for p in pts]
    ys = [F.const(p[1] if p else 0) for p in pts]
    return (jnp.stack(xs, axis=1), jnp.stack(ys, axis=1))


def _combine4(mul, m):
    """[e0*e1, e2*e1, e3*e1, e4] from the 5-pair Miller batch."""
    import jax.numpy as jnp

    cols = [m[:, i : i + 1] for i in range(5)]
    return jnp.concatenate(
        [mul(cols[0], cols[1]), mul(cols[2], cols[1]), mul(cols[3], cols[1]), cols[4]],
        axis=1,
    )


def run_family(name: str, rng):
    import jax
    import jax.numpy as jnp

    from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve
    from zprize_wasm_msm_tpu.oracle import F2 as HostF2
    from zprize_wasm_msm_tpu.oracle import F3 as HostF3

    t_start = time.time()
    if name == "bls12_381":
        from zprize_wasm_msm_tpu.models.curves import bls12_381 as g1c
        from zprize_wasm_msm_tpu.models.curves import bls12_381_g2 as g2c
        from zprize_wasm_msm_tpu.ops.pairing import bls12 as mod

        ps = mod.get_bls12_381_spec()
        hostF = HostF2(g1c.q, -1)
        ext = 12
    elif name == "bn254":
        from zprize_wasm_msm_tpu.models.curves import bn254 as g1c
        from zprize_wasm_msm_tpu.models.curves import bn254_g2 as g2c
        from zprize_wasm_msm_tpu.ops.pairing import bn as mod

        ps = mod.get_bn254_spec()
        hostF = HostF2(g1c.q, -1)
        ext = 12
    elif name == "mnt6753":
        from zprize_wasm_msm_tpu.models.curves import mnt6753 as g1c
        from zprize_wasm_msm_tpu.models.curves import mnt6753_g2 as g2c
        from zprize_wasm_msm_tpu.ops.pairing import mnt6 as mod

        ps = mod.get_mnt6753_spec()
        hostF = HostF3(g1c.q, 11)
        ext = 6
    else:
        raise SystemExit(f"unknown family {name}")

    oc1 = OracleCurve(q=g1c.q, a=g1c.a, b=g1c.b, r=g1c.r, gx=g1c.gx, gy=g1c.gy)
    oc2 = OracleCurve(
        q=g2c.q, a=g2c.a, b=g2c.b, r=g2c.r, gx=g2c.gx, gy=g2c.gy, field=hostF
    )
    r = g1c.r
    a = int(rng.integers(2, 1 << 62)) | (int.from_bytes(rng.bytes(24), "little") << 62)
    b = int(rng.integers(2, 1 << 62)) | (int.from_bytes(rng.bytes(24), "little") << 62)
    a, b = a % r, b % r
    P, Q = oc1.g, oc2.g
    log(f"{name}: host scalar muls (a,b ~{a.bit_length()} bits) ...")
    aP = oc1.mul(P, a)
    a1P = oc1.mul(P, a + 1)
    nabP = oc1.neg(oc1.mul(P, (a * b) % r))
    bQ = oc2.mul(Q, b)
    b1Q = oc2.mul(Q, b + 1)
    log(f"{name}: host points ready in {time.time()-t_start:.1f}s")

    # pairs: (aP,bQ) (-abP,Q) ((a+1)P,bQ) (aP,(b+1)Q) (P,Q) (inf,Q)
    # (the 6th pair rides the same padded batch-8 executables: the
    # infinity input must yield exactly 1 from the Miller loop — the
    # hardware form of the reference's pairing-with-zero tests)
    Ps = _g1_dev(g1c, [aP, nabP, a1P, aP, P, None])
    Qs = _g2_dev(g2c, [bQ, Q, bQ, b1Q, Q, Q])

    t0 = time.time()
    m = mod.miller_loop(ps, Ps, Qs)
    m.block_until_ready()
    t_miller = time.time() - t0
    log(f"{name}: miller loop (6 pairs) {t_miller:.1f}s")

    if ext == 12:
        tw = ps.tower
        mulfn = tw.f12_mul
        one = np.asarray(tw.f12_one((1,)))
    else:
        mulfn = functools.partial(mod.f6_mul, ps)
        one = np.asarray(mod.f6_one(ps, (1,)))

    inf_is_one = bool((np.asarray(m[:, 5:6]) == one).all())

    combine = jax.jit(lambda mm: _combine4(mulfn, mm))
    t0 = time.time()
    f4 = combine(m[:, :5])  # same (12L/6L, 5) shape as before: cache hit
    e4 = mod.final_exponentiation(ps, f4)
    e4 = np.asarray(e4)  # full host fetch: tunnel-safe sync
    t_fe = time.time() - t0
    log(f"{name}: final exponentiation (4 products) {t_fe:.1f}s")

    is_one = [bool((e4[:, i : i + 1] == one).all()) for i in range(4)]
    out = {
        "family": name,
        "scalar_bits": [a.bit_length(), b.bit_length()],
        "bilinearity_accepts": is_one[0],
        "corrupt_g1_rejects": not is_one[1],
        "corrupt_g2_rejects": not is_one[2],
        "nondegenerate": not is_one[3],
        "infinity_yields_one": inf_is_one,
        "pass": is_one[0] and not is_one[1] and not is_one[2]
        and not is_one[3] and inf_is_one,
        "miller_s": round(t_miller, 1),
        "final_exp_s": round(t_fe, 1),
        "total_s": round(time.time() - t_start, 1),
    }
    return out


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    families = sys.argv[1:] or ["bls12_381", "bn254", "mnt6753"]
    rng = np.random.default_rng(0xAB1D)
    path = os.path.join(REPO, "RESULTS_PAIRING.json")
    results = {}
    if os.path.exists(path):
        with open(path) as f:
            results = json.load(f)
    results.setdefault("device", jax.devices()[0].device_kind)
    ok = True
    for fam in families:
        res = run_family(fam, rng)
        print(json.dumps(res), flush=True)
        results[fam] = res
        ok = ok and res["pass"]
        with open(path, "w") as f:
            json.dump(results, f, indent=1)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
