"""Serialization round-trip tests (LEM <-> U/C wire formats).

Mirrors the reference's LEMtoU/LEMtoC/UtoLEM/CtoLEM semantics
(build_curve_jacobian_a0.js:1168-1327).
"""

import numpy as np

from zprize_wasm_msm_tpu.models.curves import toy
from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve
from zprize_wasm_msm_tpu.utils import serde
from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs, limbs_to_ints


def setup():
    import jax.numpy as jnp

    oc = OracleCurve(q=toy.q, a=toy.a, b=toy.b, r=toy.r, gx=toy.gx, gy=toy.gy)
    pts = [oc.mul(oc.g, k) for k in (1, 2, 3, 5, 9)] + [None]
    fq = toy.fq
    xs = [0 if p is None else fq.to_mont_int(p[0]) for p in pts]
    ys = [0 if p is None else fq.to_mont_int(p[1]) for p in pts]
    X = jnp.asarray(ints_to_limbs(xs, fq.n_limbs))
    Y = jnp.asarray(ints_to_limbs(ys, fq.n_limbs))
    return oc, pts, X, Y


def from_dev(X, Y):
    fq = toy.fq
    xs = [fq.from_mont_int(v) for v in limbs_to_ints(np.asarray(X))]
    ys = [fq.from_mont_int(v) for v in limbs_to_ints(np.asarray(Y))]
    return [
        None if (x == 0 and y == 0) else (x, y) for x, y in zip(xs, ys)
    ]


def test_uncompressed_roundtrip():
    oc, pts, X, Y = setup()
    raw = serde.points_to_uncompressed(toy, X, Y)
    n8 = toy.fq.n_limbs * 2
    assert raw.shape == (len(pts), 2 * n8)
    # big-endian standard x in the first n8 bytes
    assert int.from_bytes(bytes(raw[0, :n8]), "big") == pts[0][0]
    # infinity flag
    assert raw[-1, 0] == 0x40 and not raw[-1, 1:].any()
    X2, Y2 = serde.points_from_uncompressed(toy, raw)
    assert from_dev(X2, Y2) == pts


def test_compressed_roundtrip():
    oc, pts, X, Y = setup()
    raw = serde.points_to_compressed(toy, X, Y)
    n8 = toy.fq.n_limbs * 2
    assert raw.shape == (len(pts), n8)
    assert raw[-1, 0] == 0x40
    X2, Y2 = serde.points_from_compressed(toy, raw)
    assert from_dev(X2, Y2) == pts


def test_sign_convention():
    import jax.numpy as jnp

    from zprize_wasm_msm_tpu.ops.field import mont

    fq = toy.fq
    q = fq.q
    vals = [0, 1, (q - 1) // 2, (q - 1) // 2 + 1, q - 1]
    a = jnp.asarray(ints_to_limbs([fq.to_mont_int(v) for v in vals], fq.n_limbs))
    got = list(np.asarray(mont.sign(fq, a)))
    assert got == [0, 1, 1, -1, -1]
