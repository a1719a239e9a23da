"""BN254 pairing tests: bilinearity + Frobenius-twist structure.

The reference ships a complete BN pairing (wasmcurves/src/bn128/
build_bn128.js millerLoop:806, finalExponentiation:1290) exercised by
test/bn128.js; this mirrors its bilinearity checks for the TPU rebuild.
"""

import numpy as np
import pytest

from zprize_wasm_msm_tpu.models.curves import bn254, bn254_g2
from zprize_wasm_msm_tpu.ops.pairing import bn
from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve, F2 as HostF2
from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs, limbs_to_ints

pytestmark = pytest.mark.slow


def ps():
    return bn.get_bn254_spec()


def g1_dev(pts):
    import jax.numpy as jnp

    fq = bn254.fq
    xs = [0 if p is None else fq.to_mont_int(p[0]) for p in pts]
    ys = [0 if p is None else fq.to_mont_int(p[1]) for p in pts]
    return (
        jnp.asarray(ints_to_limbs(xs, fq.n_limbs)),
        jnp.asarray(ints_to_limbs(ys, fq.n_limbs)),
    )


def g2_dev(pts):
    import jax.numpy as jnp

    F = bn254_g2.field
    xs = [F.const(p[0] if p else 0) for p in pts]
    ys = [F.const(p[1] if p else 0) for p in pts]
    return (jnp.stack(xs, axis=1), jnp.stack(ys, axis=1))


def f12_host(tw, a):
    L = tw.spec.n_limbs
    out = []
    a = np.asarray(a)
    for n in range(a.shape[1]):
        comps = []
        for m in range(12):
            v = limbs_to_ints(a[m * L : (m + 1) * L, n])[0]
            comps.append(tw.spec.from_mont_int(v))
        out.append(tuple(comps))
    return out


def test_mul_by_q_is_frobenius():
    """mulByQ(Q) lands on the curve and equals the q-power Frobenius
    composed with the twist (its fixed points are exactly E'(Fq)-rational
    images; here just check the constant derivation against the reference's
    embedded MulByQX/MulByQY values, build_bn128.js:525-535)."""
    spec = ps()
    assert spec.frob_gamma_x == (
        21575463638280843010398324269430826099269044274347216827212613867836435027261,
        10307601595873709700152284273816112264069230130616436755625194854815875713954,
    )
    assert spec.frob_gamma_y == (
        2821565182194536844548159561693502659359617185244120367078079554186484126554,
        3505843767911556378687030309984248845540243509899259641013678093033130930403,
    )
    # ate loop count = 6z+2 (ref ateLoopCount:253)
    assert spec.loop_count == 29793968203157093288


def test_bn_pairing_bilinearity():
    """e(2P, Q) == e(P, 2Q) == e(P, Q)^2; non-degeneracy; e(P,Q)*e(-P,Q)=1."""
    spec = ps()
    tw = spec.tower
    oc1 = OracleCurve(
        q=bn254.q, a=0, b=bn254.b, r=bn254.r, gx=bn254.gx, gy=bn254.gy,
    )
    oc2 = OracleCurve(
        q=bn254_g2.q, a=0, b=bn254_g2.b, r=bn254_g2.r,
        gx=bn254_g2.gx, gy=bn254_g2.gy, field=HostF2(bn254.q, -1),
    )
    P, Q = oc1.g, oc2.g
    P2, Q2 = oc1.mul(P, 2), oc2.mul(Q, 2)

    Ps = g1_dev([P2, P, P])
    Qs = g2_dev([Q, Q2, Q])
    e = bn.pairing(spec, Ps, Qs)
    ev = f12_host(tw, e)
    assert ev[0] == ev[1], "e(2P,Q) != e(P,2Q)"
    e_pq = e[:, 2:3]
    sq = tw.f12_mul(e_pq, e_pq)
    assert f12_host(tw, sq)[0] == ev[0], "e(2P,Q) != e(P,Q)^2"
    one = f12_host(tw, tw.f12_one((1,)))[0]
    assert ev[2] != one

    negP = oc1.neg(P)
    assert bool(np.asarray(bn.pairing_eq(spec, g1_dev([P, negP]), g2_dev([Q, Q]))))


def test_bn_pairing_infinity():
    spec = ps()
    tw = spec.tower
    oc2 = OracleCurve(
        q=bn254_g2.q, a=0, b=bn254_g2.b, r=bn254_g2.r,
        gx=bn254_g2.gx, gy=bn254_g2.gy, field=HostF2(bn254.q, -1),
    )
    f = bn.miller_loop(spec, g1_dev([None]), g2_dev([oc2.g]))
    assert f12_host(tw, f) == f12_host(tw, tw.f12_one((1,)))
