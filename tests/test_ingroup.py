"""Subgroup membership checks (ref wasmcurves/test/bls12381.js:737-800:
generator in group, in-curve-but-NOT-in-group rejection, G1 and G2)."""

import numpy as np
import pytest

from zprize_wasm_msm_tpu.models.curves import bls12_381, bls12_381_g2
from zprize_wasm_msm_tpu.ops.pairing import bls12, ingroup
from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve, F2 as HostF2
from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs

pytestmark = pytest.mark.slow

Z = bls12.BLS12_381_X

#: BLS12-381 G1 cofactor h1 = (z-1)^2 / 3 — with z NEGATIVE for this
#: curve, (z-1)^2 = (|z|+1)^2.  (An earlier revision used (|z|-1)^2/3,
#: which is NOT the group cofactor: its "cleared" point stayed outside
#: the subgroup and the test blamed the — correct — membership check.)
H1 = (abs(Z) + 1) ** 2 // 3


def _find_curve_point_g1(start_x: int):
    """Host search: an affine point on y^2 = x^3 + 4 (random coset, with
    overwhelming probability NOT in the order-r subgroup: cofactor ~2^125)."""
    q = bls12_381.q
    from zprize_wasm_msm_tpu.oracle import F

    f = F(q)
    x = start_x
    while True:
        y = f.sqrt((x * x * x + 4) % q)
        if y is not None and y != 0:
            return (x, y)
        x += 1


def test_g1_in_group():
    oc = OracleCurve(
        q=bls12_381.q, a=0, b=bls12_381.b, r=bls12_381.r,
        gx=bls12_381.gx, gy=bls12_381.gy,
    )
    fq = bls12_381.fq
    bad = _find_curve_point_g1(5)
    good2 = oc.mul(oc.g, 123456789)
    # cofactor-cleared version of the bad point IS in the subgroup
    cleared = oc.mul(bad, H1)
    pts = [oc.g, good2, bad, cleared, None]
    import jax.numpy as jnp

    X = jnp.asarray(ints_to_limbs([0 if p is None else fq.to_mont_int(p[0]) for p in pts], fq.n_limbs))
    Y = jnp.asarray(ints_to_limbs([0 if p is None else fq.to_mont_int(p[1]) for p in pts], fq.n_limbs))
    got = np.asarray(ingroup.g1_in_group(bls12_381, Z, (X, Y)))
    assert got.tolist() == [True, True, False, True, True]
    # off-curve point rejected
    Xo = X.at[0, 0].add(1)
    got2 = np.asarray(ingroup.g1_in_group(bls12_381, Z, (Xo, Y)))
    assert not got2[0]


def test_g2_in_group():
    g2c = bls12_381_g2
    oc2 = OracleCurve(
        q=g2c.q, a=0, b=g2c.b, r=g2c.r, gx=g2c.gx, gy=g2c.gy,
        field=HostF2(g2c.q, -1),
    )
    F = g2c.field
    import jax.numpy as jnp

    q = g2c.q
    f2 = HostF2(q, -1)

    # host search for an on-curve (twist) point; subgroup index ~2^381 so it
    # is not in the subgroup
    from zprize_wasm_msm_tpu.oracle import F as HostF

    def sqrt_f2(a):
        """Square root in Fq2 (q ≡ 3 mod 4 tower trick), or None."""
        # try candidate: a^((q^2+7)/16)-style is messy; use the norm method
        c0, c1 = a
        f = HostF(q)
        norm = (c0 * c0 + c1 * c1) % q  # nr = -1
        sn = f.sqrt(norm)
        if sn is None:
            return None
        for s in (sn, (-sn) % q):
            lam = (c0 + s) * pow(2, q - 2, q) % q
            x0 = f.sqrt(lam)
            if x0 is None:
                continue
            x1 = c1 * pow(2 * x0, q - 2, q) % q
            cand = (x0, x1)
            if f2.sqr(cand) == f2.of(a):
                return cand
        return None

    x = (3, 1)
    while True:
        rhs = f2.add(f2.mul(f2.mul(x, x), x), f2.of((4, 4)))
        y = sqrt_f2(rhs)
        if y is not None:
            break
        x = (x[0] + 1, x[1])
    bad = (x, y)
    assert oc2.is_on_curve(bad)

    good = oc2.mul(oc2.g, 987654321)
    pts = [oc2.g, good, bad, None]
    X = jnp.stack([F.const(p[0] if p else 0) for p in pts], axis=1)
    Y = jnp.stack([F.const(p[1] if p else 0) for p in pts], axis=1)
    got = np.asarray(ingroup.g2_in_group(g2c, Z, (X, Y)))
    assert got.tolist() == [True, True, False, True]
