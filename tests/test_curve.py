"""Curve-layer tests: algebraic identities + differential vs oracle.

Mirrors the reference's curve test strategy (wasmcurves/test/bls12381.js:
r*G = 0 at :339, double-vs-add at :296, plus add/double correctness).
"""

import numpy as np
import pytest

from zprize_wasm_msm_tpu.models.curves import bls12_381, bls12_377, bn254
from zprize_wasm_msm_tpu.ops.curve import group
from zprize_wasm_msm_tpu.ops.field import mont
from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve
from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs, limbs_to_ints

CURVES = {"bls12_381": bls12_381, "bls12_377": bls12_377, "bn254": bn254}


@pytest.fixture(params=list(CURVES))
def curve(request):
    return CURVES[request.param]


def oracle_of(curve):
    return OracleCurve(q=curve.q, a=curve.a, b=curve.b, r=curve.r, gx=curve.gx, gy=curve.gy)


def affine_to_dev(curve, pts):
    """List of oracle affine points (or None) -> device (X, Y) Montgomery."""
    fq = curve.fq
    xs, ys = [], []
    for p in pts:
        if p is None:
            xs.append(0)
            ys.append(0)
        else:
            xs.append(fq.to_mont_int(p[0]))
            ys.append(fq.to_mont_int(p[1]))
    return (
        ints_to_limbs(xs, fq.n_limbs),
        ints_to_limbs(ys, fq.n_limbs),
    )


def dev_to_affine(curve, p):
    """Device projective batch -> list of oracle affine points."""
    fq = curve.fq
    x, y = group.to_affine(curve, p)
    xi = limbs_to_ints(np.asarray(x))
    yi = limbs_to_ints(np.asarray(y))
    out = []
    for a, b in zip(xi, yi):
        a, b = fq.from_mont_int(a), fq.from_mont_int(b)
        out.append(None if (a == 0 and b == 0) else (a, b))
    return out


def make_points(curve, ks):
    oc = oracle_of(curve)
    return [oc.mul(oc.g, k) for k in ks]


def test_add_double_differential(curve):
    oc = oracle_of(curve)
    ks_a = [1, 2, 3, 5, 100, 0, 7, 7]
    ks_b = [1, 5, 3, 11, 200, 4, 0, curve.r - 7]  # includes P+P, P+0, 0+Q, P+(-P)
    pa = make_points(curve, ks_a)
    pb = make_points(curve, ks_b)
    A = group.from_affine(curve, affine_to_dev(curve, pa))
    B = group.from_affine(curve, affine_to_dev(curve, pb))
    got_add = dev_to_affine(curve, group.add(curve, A, B))
    got_mix = dev_to_affine(curve, group.add_mixed(curve, A, affine_to_dev(curve, pb)))
    got_dbl = dev_to_affine(curve, group.double(curve, A))
    got_neg = dev_to_affine(curve, group.neg(curve, A))
    for i in range(len(ks_a)):
        expect = oc.add(pa[i], pb[i])
        assert got_add[i] == expect, f"add {i}"
        assert got_mix[i] == expect, f"add_mixed {i}"
        assert got_dbl[i] == oc.double(pa[i]), f"double {i}"
        assert got_neg[i] == oc.neg(pa[i]), f"neg {i}"


def test_group_order(curve):
    """r*G = infinity (ref test/bls12381.js:339)."""
    from zprize_wasm_msm_tpu.utils.bigint import int_to_limbs

    G = group.generator(curve, (1,))
    r_limbs = ints_to_limbs([curve.r], curve.fr.n_limbs)
    res = group.times_scalar(curve, G, r_limbs)
    assert bool(np.asarray(group.is_zero(curve, res))[0])


def test_times_scalar_differential(curve, rng):
    oc = oracle_of(curve)
    ks = [0, 1, 2, int.from_bytes(rng.bytes(40), "little") % curve.r]
    base = [oc.g] * len(ks)
    P = group.from_affine(curve, affine_to_dev(curve, base))
    kl = ints_to_limbs(ks, curve.fr.n_limbs)
    got = dev_to_affine(curve, group.times_scalar(curve, P, kl))
    for i, k in enumerate(ks):
        assert got[i] == oc.mul(oc.g, k), f"times_scalar {i}"


def test_in_curve(curve):
    pts = make_points(curve, [1, 17, 0])
    P = group.from_affine(curve, affine_to_dev(curve, pts))
    ok = np.asarray(group.in_curve(curve, P))
    assert list(ok) == [True, True, True]
    # corrupt X of the first point
    X, Y, Z = P
    Xbad = X.at[0, 0].add(1)
    ok2 = np.asarray(group.in_curve(curve, (Xbad, Y, Z)))
    assert not bool(ok2[0])


def test_eq_and_select(curve):
    pts = make_points(curve, [3, 4, 0])
    P = group.from_affine(curve, affine_to_dev(curve, pts))
    # double the projective rep: scale X,Y,Z by 2 -> same point, different rep
    fq = curve.fq
    two = mont.full_const(fq, fq.to_mont_int(2), (3,))
    P2 = tuple(mont.mont_mul(fq, c, two) for c in P)
    e = np.asarray(group.eq(curve, P, P2))
    assert list(e) == [True, True, True]
    Q = group.from_affine(curve, affine_to_dev(curve, make_points(curve, [3, 5, 1])))
    e2 = np.asarray(group.eq(curve, P, Q))
    assert list(e2) == [True, False, False]
