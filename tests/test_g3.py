"""Fq3 field + G2-over-Fq3 curve tests (the MNT6753 G2 axis).

The reference instantiates g2m over f3m for MNT6753
(src/mnt6753/build_mnt6753.js:144 over mulByA2:110; f3m from
src/build_f3m.js).  Fast differentials run on the toy_g3 curve; one slow
test pins the real MNT6753 G2 constants.
"""

import numpy as np
import pytest

from zprize_wasm_msm_tpu.models.curves import mnt6753_g2, toy_g3
from zprize_wasm_msm_tpu.ops.curve import group
from zprize_wasm_msm_tpu.ops.msm import pippenger
from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve, F3
from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs


def oracle_of(curve):
    return OracleCurve(
        q=curve.q, a=curve.a, b=curve.b, r=curve.r, gx=curve.gx, gy=curve.gy,
        field=F3(curve.q, curve.nr),
    )


def dev_points(curve, pts):
    import jax.numpy as jnp

    F = curve.field
    xs = [F.const(p[0] if p else 0) for p in pts]
    ys = [F.const(p[1] if p else 0) for p in pts]
    return (jnp.stack(xs, axis=1), jnp.stack(ys, axis=1))


def host_points(curve, p):
    F = curve.field
    ax, ay = group.to_affine(curve, p)
    xs, ys = F.to_host(ax), F.to_host(ay)
    z3 = (0, 0, 0)
    return [
        None if (x == z3 and y == z3) else (x, y) for x, y in zip(xs, ys)
    ]


def test_f3_field_ops(rng):
    """Fq3 backend mul/inverse ≡ host oracle on random elements."""
    F = toy_g3.field
    hf = F3(toy_g3.q, toy_g3.nr)
    import jax.numpy as jnp

    vals = [
        tuple(int(rng.integers(0, toy_g3.q)) for _ in range(3)) for _ in range(9)
    ]
    a = jnp.stack([F.const(v) for v in vals[:4]], axis=1)
    b = jnp.stack([F.const(v) for v in vals[4:8]], axis=1)
    got = F.to_host(F.mul(a, b))
    want = [hf.mul(x, y) for x, y in zip(vals[:4], vals[4:8])]
    assert got == want
    inv = F.to_host(F.inverse(a))
    winv = [hf.inv(x) for x in vals[:4]]
    assert inv == winv
    # one()/is_zero/select sanity
    one = F.one((2,))
    assert F.to_host(F.mul(one, one)) == [(1, 0, 0)] * 2


def test_g3_group_law_differential(rng):
    """add/double/add_mixed over Fq3 ≡ oracle, incl. identity/doubling."""
    oc = oracle_of(toy_g3)
    assert oc.is_on_curve(oc.g)
    n = 6
    pts = [oc.mul(oc.g, int(rng.integers(1, toy_g3.r))) for _ in range(n - 1)]
    pts.append(None)
    qts = [oc.mul(oc.g, int(rng.integers(1, toy_g3.r))) for _ in range(n - 2)]
    qts.append(pts[0])  # doubling case
    qts.append(None)

    PX, PY = dev_points(toy_g3, pts)
    QX, QY = dev_points(toy_g3, qts)
    P = group.from_affine(toy_g3, (PX, PY))
    Q = group.from_affine(toy_g3, (QX, QY))

    got_add = host_points(toy_g3, group.add(toy_g3, P, Q))
    want_add = [oc.add(p, s) for p, s in zip(pts, qts)]
    assert got_add == want_add

    got_dbl = host_points(toy_g3, group.double(toy_g3, P))
    assert got_dbl == [oc.double(p) for p in pts]

    got_mixed = host_points(toy_g3, group.add_mixed(toy_g3, P, (QX, QY)))
    assert got_mixed == want_add

    # in_curve incl. an off-curve point
    ok = np.asarray(group.in_curve(toy_g3, P))
    assert ok.all()
    bad = (group.from_affine(toy_g3, (PY, PX)))  # swapped coords: off-curve
    assert not np.asarray(group.in_curve(toy_g3, bad))[:-1].any()


def test_g3_msm_matches_oracle(rng):
    """MSM over the Fq3 curve (xla engine) ≡ naive oracle."""
    oc = oracle_of(toy_g3)
    n = 12
    pts = [oc.mul(oc.g, int(rng.integers(1, toy_g3.r))) for _ in range(n)]
    ks = [int(rng.integers(0, toy_g3.r)) for _ in range(n)]
    ks[0] = 0
    X, Y = dev_points(toy_g3, pts)
    sc = ints_to_limbs(ks, toy_g3.fr.n_limbs)
    res = pippenger.msm(
        toy_g3, (X, Y), sc, c=4, max_bits=20, lanes=2, impl="xla"
    )
    got = host_points(toy_g3, tuple(c[:, None] for c in res))[0]
    assert got == oc.msm(pts, ks)


@pytest.mark.slow
def test_mnt6753_g2_constants_and_group():
    """The real MNT6753 G2: generator on curve, r*G = infinity (oracle),
    and one device add/double differential at full 753-bit width."""
    oc = oracle_of(mnt6753_g2)
    assert oc.is_on_curve(oc.g)
    assert oc.mul(oc.g, mnt6753_g2.r) is None
    P2 = oc.double(oc.g)
    PX, PY = dev_points(mnt6753_g2, [oc.g])
    P = group.from_affine(mnt6753_g2, (PX, PY))
    got = host_points(mnt6753_g2, group.double(mnt6753_g2, P))[0]
    assert got == P2


def test_f3_sign_convention():
    """Fq3 sign: highest nonzero component c2 -> c1 -> c0
    (ref build_f3m.js sign:473); sqrt is explicitly unimplemented."""
    F = toy_g3.field
    q = toy_g3.q
    cases = [
        ((0, 0, 0), 0),
        ((5, 0, 0), 1),
        ((q - 1, 0, 0), -1),
        ((q - 1, 1, 0), 1),       # c1 dominates c0
        ((1, 1, q - 1), -1),      # c2 dominates all
    ]
    import jax.numpy as jnp

    a = jnp.stack([F.const(v) for v, _ in cases], axis=1)
    got = [int(s) for s in np.asarray(F.sign(a))]
    assert got == [w for _, w in cases]
    with pytest.raises(NotImplementedError):
        F.sqrt(a)


def test_ext3_result_to_affine_zero():
    """result_to_affine returns None (not a tuple of zero-tuples) for the
    point at infinity on an ext=3 context (round-3 ADVICE item)."""
    from zprize_wasm_msm_tpu.models.context import build_curve

    ctx = build_curve(toy_g3)
    z = group.zero(toy_g3, (1,))
    assert ctx.result_to_affine(z) is None
