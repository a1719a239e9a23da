"""Toy-BN (z = 5, 15-bit) pairing + Groth16 tests — the FULL BN
optimal-ate machinery (Miller loop, sparse mul024, Frobenius tables,
final-exp chain, pairing_eq product form) in the fast CI tier.

The real-width analogues (tests/test_pairing_bn.py, slow) compile
minutes; this family compiles in seconds and pins the same code paths —
the reference's own strategy of exercising every engine through small
deterministic vectors before scale (wasmcurves/test/bn128.js).
"""

import numpy as np
import pytest

from zprize_wasm_msm_tpu.models.curves import toy_bn, toy_bn_g2
from zprize_wasm_msm_tpu.ops.pairing import bn
from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve, F2 as HostF2
from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs, limbs_to_ints

pytestmark = pytest.mark.smoke


def ps():
    return bn.get_toy_bn_spec()


def oc_pair():
    oc1 = OracleCurve(
        q=toy_bn.q, a=0, b=toy_bn.b, r=toy_bn.r, gx=toy_bn.gx, gy=toy_bn.gy
    )
    oc2 = OracleCurve(
        q=toy_bn_g2.q, a=0, b=toy_bn_g2.b, r=toy_bn_g2.r,
        gx=toy_bn_g2.gx, gy=toy_bn_g2.gy, field=HostF2(toy_bn.q, -1),
    )
    return oc1, oc2


def g1_dev(pts):
    import jax.numpy as jnp

    fq = toy_bn.fq
    xs = [0 if p is None else fq.to_mont_int(p[0]) for p in pts]
    ys = [0 if p is None else fq.to_mont_int(p[1]) for p in pts]
    return (
        jnp.asarray(ints_to_limbs(xs, fq.n_limbs)),
        jnp.asarray(ints_to_limbs(ys, fq.n_limbs)),
    )


def g2_dev(pts):
    import jax.numpy as jnp

    F = toy_bn_g2.field
    xs = [F.const(p[0] if p else 0) for p in pts]
    ys = [F.const(p[1] if p else 0) for p in pts]
    return (jnp.stack(xs, axis=1), jnp.stack(ys, axis=1))


def f12_host(tw, a):
    L = tw.spec.n_limbs
    out = []
    a = np.asarray(a)
    for n in range(a.shape[1]):
        out.append(
            tuple(
                tw.spec.from_mont_int(limbs_to_ints(a[m * L : (m + 1) * L, n])[0])
                for m in range(12)
            )
        )
    return out


def test_toy_bn_generators_valid():
    oc1, oc2 = oc_pair()
    assert oc1.is_on_curve(oc1.g) and oc1.mul(oc1.g, toy_bn.r) is None
    assert oc2.is_on_curve(oc2.g) and oc2.mul(oc2.g, toy_bn.r) is None
    spec = ps()
    assert spec.loop_count == 32  # 6z + 2, z = 5


def test_toy_bn_frobenius_is_q_power(rng):
    """f12_frobenius(a) == a^q — catches a wrong gamma table (the bug
    class where the tower's xi constant is not threaded through)."""
    import jax.numpy as jnp

    spec = ps()
    tw = spec.tower
    s = tw.spec
    L = s.n_limbs
    comps = []
    for _ in range(12):
        v = int(rng.integers(0, s.q))
        comps.append(jnp.asarray(ints_to_limbs([s.to_mont_int(v)], L)))
    a = jnp.concatenate(comps, axis=0)
    want = tw.f12_one((1,))
    e = s.q
    sq = a
    while e:
        if e & 1:
            want = tw.f12_mul(want, sq)
        sq = tw.f12_square(sq)
        e >>= 1
    got = tw.f12_frobenius(a)
    assert f12_host(tw, got) == f12_host(tw, want)


def test_toy_bn_pairing_bilinearity(rng):
    """e(aP, bQ) == e(P, Q)^(ab) via the product form, plus
    e(2P,Q) == e(P,2Q) == e(P,Q)^2 and non-degeneracy."""
    spec = ps()
    tw = spec.tower
    oc1, oc2 = oc_pair()
    P, Q = oc1.g, oc2.g
    P2, Q2 = oc1.double(P), oc2.double(Q)

    e = bn.pairing(spec, g1_dev([P2, P, P]), g2_dev([Q, Q2, Q]))
    ev = f12_host(tw, e)
    assert ev[0] == ev[1], "e(2P,Q) != e(P,2Q)"
    sq = tw.f12_mul(e[:, 2:3], e[:, 2:3])
    assert f12_host(tw, sq)[0] == ev[0], "e(2P,Q) != e(P,Q)^2"
    one = f12_host(tw, tw.f12_one((1,)))[0]
    assert ev[2] != one, "degenerate pairing"

    # random-scalar product form: e(aP,bQ) * e(-abP,Q) == 1,
    # corrupt G1 input -> != 1
    r = toy_bn.r
    a, b = int(rng.integers(2, r)), int(rng.integers(2, r))
    aP, bQ = oc1.mul(P, a), oc2.mul(Q, b)
    nabP = oc1.neg(oc1.mul(P, (a * b) % r))
    ok = bn.pairing_eq(spec, g1_dev([aP, nabP]), g2_dev([bQ, Q]))
    assert bool(np.asarray(ok))
    bad = bn.pairing_eq(
        spec, g1_dev([oc1.mul(P, a + 1), nabP]), g2_dev([bQ, Q])
    )
    assert not bool(np.asarray(bad))


def test_toy_bn_pairing_infinity():
    spec = ps()
    tw = spec.tower
    _, oc2 = oc_pair()
    f = bn.miller_loop(spec, g1_dev([None]), g2_dev([oc2.g]))
    assert f12_host(tw, f) == f12_host(tw, tw.f12_one((1,)))


def test_toy_bn_final_exp_matches_plain(rng):
    """The BN hard-part addition chain == (plain square-and-multiply by
    h = (q^4 - q^2 + 1)/r) raised to the chain's known harmless multiple
    d = 2z(6z^2 + 3z + 1) — the devegili-chain exponent is d*h, verified
    symbolically (exponent algebra over the chain); same role as the
    pinned cube factor in the BLS differential (test_pairing.py)."""
    from zprize_wasm_msm_tpu.ops.pairing import bls12

    spec = ps()
    tw = spec.tower
    z = spec.z
    d = 2 * z * (6 * z * z + 3 * z + 1)
    oc1, oc2 = oc_pair()
    f = bn.miller_loop(spec, g1_dev([oc1.g]), g2_dev([oc2.g]))
    fast = bn.final_exponentiation(spec, f)
    plain = bls12.final_exponentiation_plain(spec, f)
    # plain^d by host-driven square-and-multiply (d is ~11 bits at toy z)
    acc = tw.f12_one((1,))
    sq = plain
    e = d
    while e:
        if e & 1:
            acc = tw.f12_mul(acc, sq)
        sq = tw.f12_square(sq)
        e >>= 1
    assert f12_host(tw, fast) == f12_host(tw, acc)
