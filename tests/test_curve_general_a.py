"""General-a (projective / MNT6753) curve tests.

The reference serves MNT6753 through build_curve_projective.js (a != 0,
add-1998-cmo-2 with special cases); here the RCB16 Algorithm-1 complete
formulas — differential-tested against the affine oracle.
"""

import numpy as np
import pytest

from zprize_wasm_msm_tpu.models.curves import mnt6753, toy_a
from zprize_wasm_msm_tpu.ops.curve import group
from zprize_wasm_msm_tpu.ops.msm import pippenger
from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve
from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs

CURVES = {"toy_a": toy_a, "mnt6753": mnt6753}


@pytest.fixture(params=list(CURVES))
def curve(request):
    return CURVES[request.param]


def oracle_of(curve):
    return OracleCurve(
        q=curve.q, a=curve.a, b=curve.b, r=curve.r, gx=curve.gx, gy=curve.gy
    )


def to_dev(curve, pts):
    import jax.numpy as jnp

    fq = curve.fq
    xs = [0 if p is None else fq.to_mont_int(p[0]) for p in pts]
    ys = [0 if p is None else fq.to_mont_int(p[1]) for p in pts]
    return (
        jnp.asarray(ints_to_limbs(xs, fq.n_limbs)),
        jnp.asarray(ints_to_limbs(ys, fq.n_limbs)),
    )


def to_host(curve, p):
    F = curve.field
    ax, ay = group.to_affine(curve, p)
    return [
        None if (x == 0 and y == 0) else (x, y)
        for x, y in zip(F.to_host(ax), F.to_host(ay))
    ]


def test_general_a_add_double(curve):
    oc = oracle_of(curve)
    assert oc.is_on_curve(oc.g)
    ks_a = [1, 2, 5, 0, 7]
    ks_b = [1, 3, 11, 4, curve.r - 7]  # P+P, mixed, 0+Q, P+(-P)
    pa = [oc.mul(oc.g, k) for k in ks_a]
    pb = [oc.mul(oc.g, k) for k in ks_b]
    A = group.from_affine(curve, to_dev(curve, pa))
    B = group.from_affine(curve, to_dev(curve, pb))
    got_add = to_host(curve, group.add(curve, A, B))
    got_mix = to_host(curve, group.add_mixed(curve, A, to_dev(curve, pb)))
    got_dbl = to_host(curve, group.double(curve, A))
    assert bool(np.asarray(group.in_curve(curve, A)).all())
    for i in range(len(ks_a)):
        expect = oc.add(pa[i], pb[i])
        assert got_add[i] == expect, f"add {i}"
        assert got_mix[i] == expect, f"add_mixed {i}"
        assert got_dbl[i] == oc.double(pa[i]), f"double {i}"


def test_general_a_msm_differential():
    """Generic Pippenger over the a != 0 toy curve (the reference has no
    MSM for its projective curve — SURVEY.md §2.2; ours is field/formula
    generic, so it comes for free)."""
    import jax.numpy as jnp

    curve = toy_a
    oc = oracle_of(curve)
    rng = np.random.default_rng(3)
    n = 16
    pts = [oc.mul(oc.g, int(rng.integers(1, curve.r))) for _ in range(n)]
    ks = [int(rng.integers(0, curve.r)) for _ in range(n)]
    X, Y = to_dev(curve, pts)
    sc = jnp.asarray(ints_to_limbs(ks, curve.fr.n_limbs))
    res = pippenger.msm(
        curve, (X, Y), sc, c=4, max_bits=16, lanes=2, impl="xla"
    )
    got = to_host(curve, tuple(a[:, None] for a in res))[0]
    assert got == oc.msm(pts, ks)
