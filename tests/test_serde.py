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


# ---------------------------------------------------------------------------
# G2 (ext=2) serialization + Fq2 sqrt (ref build_f2m.js:411 sign, :453 sqrt)
# ---------------------------------------------------------------------------


def setup_g2():
    import jax.numpy as jnp

    from zprize_wasm_msm_tpu.models.curves import toy_g2
    from zprize_wasm_msm_tpu.oracle import F2

    oc = OracleCurve(
        q=toy_g2.q, a=toy_g2.a, b=toy_g2.b, r=toy_g2.r,
        gx=toy_g2.gx, gy=toy_g2.gy, field=F2(toy_g2.q, toy_g2.nr),
    )
    pts = [oc.mul(oc.g, k) for k in (1, 2, 3, 5, 9)] + [None]
    F = toy_g2.field
    X = jnp.stack([F.const(p[0] if p else 0) for p in pts], axis=1)
    Y = jnp.stack([F.const(p[1] if p else 0) for p in pts], axis=1)
    return toy_g2, oc, pts, X, Y


def from_dev_g2(curve, X, Y):
    F = curve.field
    xs, ys = F.to_host(X), F.to_host(Y)
    return [
        None if (x == (0, 0) and y == (0, 0)) else (x, y)
        for x, y in zip(xs, ys)
    ]


def test_g2_uncompressed_roundtrip():
    curve, oc, pts, X, Y = setup_g2()
    raw = serde.points_to_uncompressed(curve, X, Y)
    n8 = curve.field.elem_len * 2
    assert raw.shape == (len(pts), 2 * n8)
    # wire order: c1_be || c0_be (whole-element byte reversal, ref
    # LEMtoU __reverseBytes over n8 = 2*f1n8)
    half = n8 // 2
    assert int.from_bytes(bytes(raw[0, :half]), "big") == pts[0][0][1]
    assert int.from_bytes(bytes(raw[0, half:n8]), "big") == pts[0][0][0]
    assert raw[-1, 0] == 0x40 and not raw[-1, 1:].any()
    X2, Y2 = serde.points_from_uncompressed(curve, raw)
    assert from_dev_g2(curve, X2, Y2) == pts


def test_g2_compressed_roundtrip():
    curve, oc, pts, X, Y = setup_g2()
    raw = serde.points_to_compressed(curve, X, Y)
    n8 = curve.field.elem_len * 2
    assert raw.shape == (len(pts), n8)
    assert raw[-1, 0] == 0x40
    X2, Y2 = serde.points_from_compressed(curve, raw)
    assert from_dev_g2(curve, X2, Y2) == pts


def test_fq2_sqrt():
    """Fq2 sqrt (alg 9adj): root of a^2 squares back to a^2 for random a,
    and non-residues report ok=False."""
    import jax.numpy as jnp

    from zprize_wasm_msm_tpu.models.curves import toy_g2
    from zprize_wasm_msm_tpu.oracle import F2 as HostF2

    F = toy_g2.field
    q = toy_g2.q
    hf = HostF2(q, -1)
    rng = np.random.default_rng(5)
    vals = [(int(rng.integers(0, q)), int(rng.integers(0, q))) for _ in range(8)]
    sqs = [hf.mul(v, v) for v in vals]
    a = jnp.stack([F.const(v) for v in sqs], axis=1)
    r, ok = F.sqrt(a)
    assert bool(np.asarray(ok).all())
    back = F.to_host(F.mul(r, r))
    assert back == sqs
    # a known non-residue: u * (a generator of the non-square class).
    # squares are exactly half of Fq2*; find one by trial against sqrt's
    # own ok flag AND cross-check via the norm being a non-residue in Fq.
    for v in vals:
        n = (v[0] * v[0] + v[1] * v[1]) % q  # norm (nr = -1)
        if pow(n, (q - 1) // 2, q) == q - 1:
            bad = jnp.stack([F.const(v)], axis=1)
            _, ok2 = F.sqrt(bad)
            assert not bool(np.asarray(ok2)[0])
            break
