"""Field-layer tests: differential vs python bigints + edge-value sweeps.

Mirrors the reference's field test strategy (wasmcurves/test/f1.js and
test/helpers/helpers.js genValues boundary sweeps).
"""

import numpy as np
import pytest

from zprize_wasm_msm_tpu.models.curves import bls12_381, bls12_377, bn254
from zprize_wasm_msm_tpu.ops.field import mont
from zprize_wasm_msm_tpu.ops.field.spec import field_spec
from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs, limbs_to_ints

Q381 = bls12_381.q
R381 = bls12_381.r

SPECS = {
    "fq381": field_spec(bls12_381.q),
    "fr381": field_spec(bls12_381.r),
    "fq377": field_spec(bls12_377.q),
    "fq254": field_spec(bn254.q),
}


def gen_values(q, n, rng):
    """Boundary + random values, like test/helpers/helpers.js genValues."""
    vals = [0, 1, 2, q - 1, q - 2, (q - 1) // 2, (q + 1) // 2]
    for k in range(1, (q.bit_length() // 32) + 1):
        for d in (-1, 0, 1):
            v = (1 << (32 * k)) + d
            if 0 <= v < q:
                vals.append(v)
    while len(vals) < n:
        vals.append(int.from_bytes(rng.bytes(q.bit_length() // 8 + 8), "little") % q)
    return vals[:n]


@pytest.fixture(params=list(SPECS))
def spec(request):
    return SPECS[request.param]


# heavy ops (exp/inverse/sqrt compile large graphs): the Tonelli-Shanks
# sqrt path (q = 1 mod 4) is exercised on the tiny toy field where the
# unrolled masked loops compile quickly; the code is spec-generic.
from zprize_wasm_msm_tpu.models.curves import toy

SPECS["toy_q"] = field_spec(toy.q)  # 10009 = 1 mod 4, s=3
SPECS["toy_r"] = field_spec(toy.r)  # 3391 = 3 mod 4


@pytest.fixture(params=["fq381", "toy_q"])
def hspec(request):
    return SPECS[request.param]


def to_dev(spec, vals):
    return ints_to_limbs([v % spec.q for v in vals], spec.n_limbs)


def test_spec_constants():
    s = SPECS["fq381"]
    assert s.n_limbs == 24
    assert s.R == 1 << 384
    assert (s.q * s.np16 + 1) % (1 << 16) == 0
    s = SPECS["fr381"]
    assert s.n_limbs == 16
    assert s.R == 1 << 256


def test_add_sub_neg(spec, rng):
    q = spec.q
    vals = gen_values(q, 40, rng)
    a = to_dev(spec, vals)
    b = to_dev(spec, list(reversed(vals)))
    got_add = limbs_to_ints(np.asarray(mont.add(spec, a, b)))
    got_sub = limbs_to_ints(np.asarray(mont.sub(spec, a, b)))
    got_neg = limbs_to_ints(np.asarray(mont.neg(spec, a)))
    for i, (x, y) in enumerate(zip(vals, reversed(vals))):
        assert got_add[i] == (x + y) % q, f"add {i}"
        assert got_sub[i] == (x - y) % q, f"sub {i}"
        assert got_neg[i] == (-x) % q, f"neg {i}"


def test_mont_mul_square(spec, rng):
    q = spec.q
    vals = gen_values(q, 40, rng)
    vals_m = [v * spec.R % q for v in vals]  # to Montgomery host-side
    rev_m = list(reversed(vals_m))
    a = to_dev(spec, vals_m)
    b = to_dev(spec, rev_m)
    got_mul = limbs_to_ints(np.asarray(mont.mont_mul(spec, a, b)))
    got_sqr = limbs_to_ints(np.asarray(mont.mont_square(spec, a)))
    Rinv = pow(spec.R, q - 2, q)
    for i in range(len(vals)):
        expect = vals_m[i] * rev_m[i] * Rinv % q
        assert got_mul[i] == expect, f"mul {i}"
        expect_s = vals_m[i] * vals_m[i] * Rinv % q
        assert got_sqr[i] == expect_s, f"sqr {i}"


def test_to_from_mont_roundtrip(spec, rng):
    q = spec.q
    vals = gen_values(q, 20, rng)
    a = to_dev(spec, vals)
    am = mont.to_mont(spec, a)
    got_m = limbs_to_ints(np.asarray(am))
    for i, v in enumerate(vals):
        assert got_m[i] == v * spec.R % q
    back = limbs_to_ints(np.asarray(mont.from_mont(spec, am)))
    assert back == [v % q for v in vals]


def test_inverse(hspec, rng):
    spec = hspec
    q = spec.q
    vals = [v for v in gen_values(q, 12, rng)]
    vals_m = [v * spec.R % q for v in vals]
    a = to_dev(spec, vals_m)
    inv = limbs_to_ints(np.asarray(mont.inverse(spec, a)))
    for i, v in enumerate(vals):
        if v % q == 0:
            continue
        # inv is Montgomery form of v^-1
        assert inv[i] == pow(v, q - 2, q) * spec.R % q, f"inv {i}"


def test_batch_inverse(hspec, rng):
    spec = hspec
    q = spec.q
    vals = gen_values(q, 33, rng)  # includes zeros
    vals_m = [v * spec.R % q for v in vals]
    a = to_dev(spec, vals_m)
    inv = limbs_to_ints(np.asarray(mont.batch_inverse(spec, a, axis=-1)))
    for i, v in enumerate(vals):
        if v % q == 0:
            assert inv[i] == 0  # zero passthrough like build_batchinverse.js
        else:
            assert inv[i] == pow(v, q - 2, q) * spec.R % q, f"binv {i}"


def test_sqrt(hspec, rng):
    spec = hspec
    q = spec.q
    vals = gen_values(q, 10, rng)
    squares = [v * v % q for v in vals]
    sq_m = [v * spec.R % q for v in squares]
    a = to_dev(spec, sq_m)
    root, ok = mont.sqrt(spec, a)
    roots = limbs_to_ints(np.asarray(root))
    ok = np.asarray(ok)
    Rinv = pow(spec.R, q - 2, q)
    for i, s in enumerate(squares):
        assert bool(ok[i]), f"sqrt should exist {i}"
        r = roots[i] * Rinv % q
        assert r * r % q == s, f"sqrt {i}"


def test_exp(hspec, rng):
    spec = hspec
    q = spec.q
    vals = [3, 5, q - 7]
    vals_m = [v * spec.R % q for v in vals]
    a = to_dev(spec, vals_m)
    for e in [1, 2, 65537, (q - 1) // 2]:
        got = limbs_to_ints(np.asarray(mont.exp_const(spec, a, e)))
        for i, v in enumerate(vals):
            assert got[i] == pow(v, e, q) * spec.R % q, f"exp {e} {i}"


def test_predicates(spec):
    q = spec.q
    a = to_dev(spec, [0, 1, q - 1, 0])
    z = np.asarray(mont.is_zero(spec, a))
    assert list(z) == [True, False, False, True]
    b = to_dev(spec, [0, 2, q - 1, 5])
    e = np.asarray(mont.eq(spec, a, b))
    assert list(e) == [True, False, True, False]
