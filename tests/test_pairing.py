"""BLS12-381 pairing tests: tower algebra + bilinearity.

Mirrors the reference's pairing test strategy (wasmcurves/test/bls12381.js
— bilinearity e(aP, bQ) = e(P,Q)^(ab) at :679, Frobenius / cyclotomic
identities at :524,596, in-group checks).
"""

import numpy as np
import pytest

from zprize_wasm_msm_tpu.models.curves import bls12_381, bls12_381_g2
from zprize_wasm_msm_tpu.ops.pairing import bls12
from zprize_wasm_msm_tpu.ops.pairing.tower import Tower
from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve, F2 as HostF2
from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs, limbs_to_ints

pytestmark = pytest.mark.slow


def ps():
    return bls12.get_bls12_381_spec()


def g1_dev(pts):
    fq = bls12_381.fq
    xs = [0 if p is None else fq.to_mont_int(p[0]) for p in pts]
    ys = [0 if p is None else fq.to_mont_int(p[1]) for p in pts]
    import jax.numpy as jnp

    return (
        jnp.asarray(ints_to_limbs(xs, fq.n_limbs)),
        jnp.asarray(ints_to_limbs(ys, fq.n_limbs)),
    )


def g2_dev(pts):
    import jax.numpy as jnp

    F = bls12_381_g2.field
    xs = [F.const(p[0] if p else 0) for p in pts]
    ys = [F.const(p[1] if p else 0) for p in pts]
    return (jnp.stack(xs, axis=1), jnp.stack(ys, axis=1))


def f12_host(tw, a):
    """(12L, N) -> list of 12-tuples of standard ints."""
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


def test_tower_algebra(rng):
    """Fq6/Fq12 mul/inverse/frobenius identities on random elements."""
    import jax.numpy as jnp

    tw = Tower(bls12_381.fq)
    q = bls12_381.q
    n = 2
    L = tw.spec.n_limbs

    def rand12():
        vals = [int.from_bytes(rng.bytes(47), "little") % q for _ in range(12 * n)]
        return jnp.asarray(
            ints_to_limbs([tw.spec.to_mont_int(v) for v in vals], L)
        ).reshape(12 * L, n, order="F").reshape(12 * L, n)

    # build (12L, n) from per-component stacking
    def rand12b():
        comps = []
        for _ in range(12):
            vals = [int.from_bytes(rng.bytes(47), "little") % q for _ in range(n)]
            comps.append(
                jnp.asarray(ints_to_limbs([tw.spec.to_mont_int(v) for v in vals], L))
            )
        return jnp.concatenate(comps, axis=0)

    a = rand12b()
    b = rand12b()
    cmul = tw.f12_mul(a, b)
    # commutativity + identity + inverse round trip
    assert np.array_equal(np.asarray(cmul), np.asarray(tw.f12_mul(b, a)))
    one = tw.f12_one((n,))
    assert np.array_equal(np.asarray(tw.f12_mul(a, one)), np.asarray(a))
    ainv = tw.f12_inverse(a)
    assert f12_host(tw, tw.f12_mul(a, ainv)) == f12_host(tw, one)
    # frobenius^12 == identity; frobenius is multiplicative
    fr = a
    for _ in range(12):
        fr = tw.f12_frobenius(fr)
    assert f12_host(tw, fr) == f12_host(tw, a)
    lhs = tw.f12_frobenius(cmul)
    rhs = tw.f12_mul(tw.f12_frobenius(a), tw.f12_frobenius(b))
    assert f12_host(tw, lhs) == f12_host(tw, rhs)


def test_pairing_bilinearity():
    """e(2P, Q) == e(P, 2Q) == e(P, Q)^2 and e(P, Q)^r == 1."""
    spec = ps()
    tw = spec.tower
    oc1 = OracleCurve(
        q=bls12_381.q, a=0, b=bls12_381.b, r=bls12_381.r,
        gx=bls12_381.gx, gy=bls12_381.gy,
    )
    g2c = bls12_381_g2
    oc2 = OracleCurve(
        q=g2c.q, a=0, b=g2c.b, r=g2c.r, gx=g2c.gx, gy=g2c.gy,
        field=HostF2(g2c.q, -1),
    )
    P = oc1.g
    P2 = oc1.mul(P, 2)
    Q = oc2.g
    Q2 = oc2.mul(Q, 2)

    # batch the three pairings: (2P, Q), (P, 2Q), (P, Q)
    Ps = g1_dev([P2, P, P])
    Qs = g2_dev([Q, Q2, Q])
    e = bls12.pairing(spec, Ps, Qs)
    ev = f12_host(tw, e)
    assert ev[0] == ev[1], "e(2P,Q) != e(P,2Q)"
    # e(P,Q)^2 via device mul
    e_pq = e[:, 2:3]
    sq = tw.f12_mul(e_pq, e_pq)
    assert f12_host(tw, sq)[0] == ev[0], "e(2P,Q) != e(P,Q)^2"
    # non-degeneracy
    one = f12_host(tw, tw.f12_one((1,)))[0]
    assert ev[2] != one

    # product-of-pairings check: e(P,Q) * e(-P,Q) == 1
    negP = oc1.neg(P)
    Ps2 = g1_dev([P, negP])
    Qs2 = g2_dev([Q, Q])
    assert bool(np.asarray(bls12.pairing_eq(spec, Ps2, Qs2)))


def test_final_exp_fast_matches_plain(rng):
    """The w0 cyclotomic chain ≡ plain square-and-multiply by the hard
    exponent (possibly up to the well-known harmless cube factor — pinned
    here so any drift fails loudly)."""
    import jax.numpy as jnp

    spec = ps()
    tw = spec.tower
    q = bls12_381.q
    L = tw.spec.n_limbs
    comps = []
    for _ in range(12):
        v = int.from_bytes(rng.bytes(47), "little") % q
        comps.append(
            jnp.asarray(ints_to_limbs([tw.spec.to_mont_int(v)], L))
        )
    f = jnp.concatenate(comps, axis=0)  # (12L, 1)
    fast = f12_host(tw, bls12.final_exponentiation(spec, f))[0]
    plain = bls12.final_exponentiation_plain(spec, f)
    plain_v = f12_host(tw, plain)[0]
    cube = f12_host(tw, tw.f12_mul(tw.f12_mul(plain, plain), plain))[0]
    assert fast in (plain_v, cube)


def test_pairing_infinity():
    spec = ps()
    tw = spec.tower
    oc2 = OracleCurve(
        q=bls12_381_g2.q, a=0, b=bls12_381_g2.b, r=bls12_381_g2.r,
        gx=bls12_381_g2.gx, gy=bls12_381_g2.gy, field=HostF2(bls12_381.q, -1),
    )
    Ps = g1_dev([None])
    Qs = g2_dev([oc2.g])
    f = bls12.miller_loop(spec, Ps, Qs)
    assert f12_host(tw, f) == f12_host(tw, tw.f12_one((1,)))
