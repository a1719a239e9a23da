"""pol / qap / applykey tests vs python-int oracles.

Mirrors the reference's snark-layer semantics (wasmcurves/src/build_pol.js
constructLC, build_qap.js buildABC/joinABC/batchAdd,
build_applykey.js batchApplyKey).
"""

import numpy as np
import pytest

from zprize_wasm_msm_tpu.models.curves import bls12_381, toy_fft
from zprize_wasm_msm_tpu.ops.poly import applykey, pol, qap
from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs, limbs_to_ints


def to_m(spec, vals):
    import jax.numpy as jnp

    return jnp.asarray(ints_to_limbs([spec.to_mont_int(v) for v in vals], spec.n_limbs))


def from_m(spec, arr):
    return [spec.from_mont_int(v) for v in limbs_to_ints(np.asarray(arr))]


def test_construct_lc(rng):
    import jax.numpy as jnp

    spec = bls12_381.fr
    r = spec.q
    nnz, n_out = 37, 8
    pos = rng.integers(0, n_out, size=nnz).astype(np.int32)
    coefs = [int(rng.integers(0, 1 << 62)) for _ in range(nnz)]
    sigs = [int(rng.integers(0, 1 << 62)) for _ in range(nnz)]
    got = from_m(
        spec,
        pol.construct_lc(
            spec, to_m(spec, coefs), jnp.asarray(pos), to_m(spec, sigs), n_out
        ),
    )
    want = [0] * n_out
    for p, c, s in zip(pos, coefs, sigs):
        want[p] = (want[p] + c * s) % r
    assert got == want


def test_build_abc_join(rng):
    import jax.numpy as jnp

    spec = bls12_381.fr
    r = spec.q
    nnz, m = 23, 5
    mat = rng.integers(0, 2, size=nnz).astype(np.int32)
    con = rng.integers(0, m, size=nnz).astype(np.int32)
    coefs = [int(rng.integers(0, 1 << 62)) for _ in range(nnz)]
    wit = [int(rng.integers(0, 1 << 62)) for _ in range(nnz)]
    A, B = qap.build_abc(
        spec, jnp.asarray(mat), jnp.asarray(con), to_m(spec, coefs),
        to_m(spec, wit), m,
    )
    wa, wb = [0] * m, [0] * m
    for mm, cc, co, wv in zip(mat, con, coefs, wit):
        if mm == 0:
            wa[cc] = (wa[cc] + co * wv) % r
        else:
            wb[cc] = (wb[cc] + co * wv) % r
    assert from_m(spec, A) == wa
    assert from_m(spec, B) == wb
    C = qap.mul_ab(spec, A, B)
    assert from_m(spec, C) == [a * b % r for a, b in zip(wa, wb)]
    P = qap.join_abc(spec, A, B, to_m(spec, [1] * m))
    assert from_m(spec, P) == [(a * b - 1) % r for a, b in zip(wa, wb)]
    S = qap.batch_add(spec, A, B)
    assert from_m(spec, S) == [(a + b) % r for a, b in zip(wa, wb)]


def test_batch_apply_key_fr(rng):
    spec = bls12_381.fr
    r = spec.q
    n = 11
    vec = [int(rng.integers(0, 1 << 62)) for _ in range(n)]
    first, inc = 0xDEADBEEF, 0x1234567
    got = from_m(
        spec,
        applykey.batch_apply_key_fr(
            spec, to_m(spec, vec), to_m(spec, [first])[:, 0], to_m(spec, [inc])[:, 0]
        ),
    )
    want = [v * first * pow(inc, i, r) % r for i, v in enumerate(vec)]
    assert got == want


def test_batch_apply_key_group():
    import jax.numpy as jnp

    from zprize_wasm_msm_tpu.ops.curve import group
    from zprize_wasm_msm_tpu.oracle import Curve as OC

    curve = toy_fft
    fr = curve.fr
    n = 6
    oc = OC(q=curve.q, a=curve.a, b=curve.b, r=curve.r, gx=curve.gx, gy=curve.gy)
    first, inc = 5, 3
    pts = group.generator(curve, (n,))
    got_p = applykey.batch_apply_key_group(
        curve, pts, to_m(fr, [first])[:, 0], to_m(fr, [inc])[:, 0]
    )
    F = curve.field
    ax, ay = group.to_affine(curve, got_p)
    got = [
        None if (x == 0 and y == 0) else (x, y)
        for x, y in zip(F.to_host(ax), F.to_host(ay))
    ]
    want = [oc.mul(oc.g, first * pow(inc, i, curve.r) % curve.r) for i in range(n)]
    assert got == want
