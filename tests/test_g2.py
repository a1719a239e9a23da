"""G2 (Fq2 twist) curve + MSM tests, differential vs the tower oracle.

The reference instantiates g2m over f2m (build_bls12381.js:47-53) but its
optimized MSM is G1-hardcoded (SURVEY.md §2.3); the TPU framework's generic
field backend serves both, tested here.
"""

import numpy as np
import pytest

from zprize_wasm_msm_tpu.models.curves import bls12_381_g2, bn254_g2
from zprize_wasm_msm_tpu.ops.curve import group
from zprize_wasm_msm_tpu.ops.msm import pippenger, windows
from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve, F2
from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs

CURVES = {"bls12_381_g2": bls12_381_g2, "bn254_g2": bn254_g2}


@pytest.fixture(params=list(CURVES))
def curve(request):
    return CURVES[request.param]


def oracle_of(curve):
    return OracleCurve(
        q=curve.q, a=curve.a, b=curve.b, r=curve.r, gx=curve.gx, gy=curve.gy,
        field=F2(curve.q, curve.nr),
    )


def dev_points(curve, pts):
    """Oracle affine Fq2 points (None = infinity) -> device (X, Y)."""
    F = curve.field
    import jax.numpy as jnp

    xs = [F.const(p[0] if p else 0) for p in pts]
    ys = [F.const(p[1] if p else 0) for p in pts]
    return (jnp.stack(xs, axis=1), jnp.stack(ys, axis=1))


def host_points(curve, p):
    F = curve.field
    ax, ay = group.to_affine(curve, p)
    xs, ys = F.to_host(ax), F.to_host(ay)
    return [
        None if (x == (0, 0) and y == (0, 0)) else (x, y)
        for x, y in zip(xs, ys)
    ]


def test_g2_generator_on_curve(curve):
    oc = oracle_of(curve)
    assert oc.is_on_curve(oc.g)
    P = group.generator(curve, (2,))
    assert bool(np.asarray(group.in_curve(curve, P))[0])


def test_g2_add_double_differential(curve):
    oc = oracle_of(curve)
    ks_a = [1, 2, 5, 0, 7]
    ks_b = [1, 3, 11, 4, curve.r - 7]  # P+P, P+Q, 0+Q, P+(-P)
    pa = [oc.mul(oc.g, k) for k in ks_a]
    pb = [oc.mul(oc.g, k) for k in ks_b]
    A = group.from_affine(curve, dev_points(curve, pa))
    B = group.from_affine(curve, dev_points(curve, pb))
    got_add = host_points(curve, group.add(curve, A, B))
    got_mix = host_points(curve, group.add_mixed(curve, A, dev_points(curve, pb)))
    got_dbl = host_points(curve, group.double(curve, A))
    for i in range(len(ks_a)):
        expect = oc.add(pa[i], pb[i])
        assert got_add[i] == expect, f"add {i}"
        assert got_mix[i] == expect, f"add_mixed {i}"
        assert got_dbl[i] == oc.double(pa[i]), f"double {i}"


def test_g2_msm_differential(curve):
    import jax.numpy as jnp

    oc = oracle_of(curve)
    rng = np.random.default_rng(42)
    n = 8
    pts = [oc.mul(oc.g, int(rng.integers(1, 1 << 30))) for _ in range(n)]
    ks = [int.from_bytes(rng.bytes(31), "little") % curve.r for _ in range(n)]
    X, Y = dev_points(curve, pts)
    sc = jnp.asarray(ints_to_limbs(ks, curve.fr.n_limbs))
    res = pippenger.msm(
        curve, (X, Y), sc, c=8, max_bits=curve.fr.n_limbs * 16,
        lanes=2, impl="xla",
    )
    got = host_points(curve, tuple(a[:, None] for a in res))[0]
    assert got == oc.msm(pts, ks)
