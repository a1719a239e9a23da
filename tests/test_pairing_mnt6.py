"""MNT6-753 pairing tests.

Pins the host-derived Frobenius coefficient tables against the
reference's embedded constants (build_mnt6753.js buildFrobeniusMap:989),
checks Fq6 tower algebra, and (slow) bilinearity of the ate pairing.
"""

import numpy as np
import pytest

from zprize_wasm_msm_tpu.models.curves import mnt6753, mnt6753_g2
from zprize_wasm_msm_tpu.ops.pairing import mnt6
from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve, F3 as HostF3
from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs, limbs_to_ints

# the reference's embedded table values (build_mnt6753.js:1000-1004, 1019-1024)
REF_F6_1_1 = 24129022407817241407134263419936114379815707076943508280977368156625538709102831814843582780138963119807143081677569721953561801075623741378629346409604471234573396989178424163772589090105392407118197799904755622897541183052133
REF_F3_1_1 = 24129022407817241407134263419936114379815707076943508280977368156625538709102831814843582780138963119807143081677569721953561801075623741378629346409604471234573396989178424163772589090105392407118197799904755622897541183052132
REF_F3_1_2 = 17769468560101711995209951371304522748355002843010440790806134764399814103468274958215310983651375801610927890210888755369611256415970113691066895445191924931148019336171640277697829047741006062493737919155152541323243293107868


def ps():
    return mnt6.get_mnt6753_spec()


def test_frobenius_gammas_match_reference():
    spec = ps()
    q = mnt6753.q
    # component 3 = w-part, vidx 0 -> pure F6[1][1] = 11^((q-1)/6)
    assert spec.frob_gammas[1][3] == REF_F6_1_1
    # component 1 = vidx 1 -> F3[1][1] = 11^((q-1)/3)
    assert spec.frob_gammas[1][1] == REF_F3_1_1
    # component 2 = vidx 2 -> F3[2][1] = 11^(2(q-1)/3)
    assert spec.frob_gammas[1][2] == REF_F3_1_2
    # ate loop count == final-exp w0 (ref :262 vs :1225)
    assert spec.loop_count == mnt6.MNT6753_ATE_LOOP


def _rand_f6(rng, spec, n):
    import jax.numpy as jnp

    s = spec.g1.fq
    L = s.n_limbs
    comps = []
    for _ in range(6):
        vals = [int.from_bytes(rng.bytes(94), "little") % s.q for _ in range(n)]
        comps.append(jnp.asarray(ints_to_limbs([s.to_mont_int(v) for v in vals], L)))
    return jnp.concatenate(comps, axis=0)


def _f6_host(spec, a):
    s = spec.g1.fq
    L = s.n_limbs
    a = np.asarray(a)
    out = []
    for n in range(a.shape[1]):
        out.append(
            tuple(
                s.from_mont_int(limbs_to_ints(a[m * L : (m + 1) * L, n])[0])
                for m in range(6)
            )
        )
    return out


@pytest.mark.slow
def test_f6_tower_algebra(rng):
    spec = ps()
    n = 2
    a = _rand_f6(rng, spec, n)
    b = _rand_f6(rng, spec, n)
    ab = mnt6.f6_mul(spec, a, b)
    ba = mnt6.f6_mul(spec, b, a)
    assert _f6_host(spec, ab) == _f6_host(spec, ba)
    one = mnt6.f6_one(spec, (n,))
    assert _f6_host(spec, mnt6.f6_mul(spec, a, one)) == _f6_host(spec, a)
    inv = mnt6.f6_inverse(spec, a)
    assert _f6_host(spec, mnt6.f6_mul(spec, a, inv)) == _f6_host(spec, one)
    # frobenius: multiplicative and order 6
    fr = a
    for _ in range(3):
        fr = mnt6.f6_frobenius(spec, fr, 1)
    assert _f6_host(spec, fr) == _f6_host(spec, mnt6.f6_frobenius(spec, a, 3))
    lhs = mnt6.f6_frobenius(spec, ab, 1)
    rhs = mnt6.f6_mul(
        spec, mnt6.f6_frobenius(spec, a, 1), mnt6.f6_frobenius(spec, b, 1)
    )
    assert _f6_host(spec, lhs) == _f6_host(spec, rhs)


@pytest.mark.slow
def test_mnt6_pairing_bilinearity():
    """e(2P, Q) == e(P, 2Q) == e(P, Q)^2; e(P,Q)*e(-P,Q) == 1."""
    import jax.numpy as jnp

    spec = ps()
    oc1 = OracleCurve(
        q=mnt6753.q, a=mnt6753.a, b=mnt6753.b, r=mnt6753.r,
        gx=mnt6753.gx, gy=mnt6753.gy,
    )
    oc2 = OracleCurve(
        q=mnt6753_g2.q, a=mnt6753_g2.a, b=mnt6753_g2.b, r=mnt6753_g2.r,
        gx=mnt6753_g2.gx, gy=mnt6753_g2.gy, field=HostF3(mnt6753.q, 11),
    )
    P, Q = oc1.g, oc2.g
    P2, Q2 = oc1.double(P), oc2.double(Q)

    fq = mnt6753.fq
    L = fq.n_limbs

    def g1_dev(pts):
        xs = [0 if p is None else fq.to_mont_int(p[0]) for p in pts]
        ys = [0 if p is None else fq.to_mont_int(p[1]) for p in pts]
        return (
            jnp.asarray(ints_to_limbs(xs, L)),
            jnp.asarray(ints_to_limbs(ys, L)),
        )

    F3d = mnt6753_g2.field

    def g2_dev(pts):
        xs = [F3d.const(p[0] if p else 0) for p in pts]
        ys = [F3d.const(p[1] if p else 0) for p in pts]
        return (jnp.stack(xs, axis=1), jnp.stack(ys, axis=1))

    Ps = g1_dev([P2, P, P])
    Qs = g2_dev([Q, Q2, Q])
    e = mnt6.pairing(spec, Ps, Qs)
    ev = _f6_host(spec, e)
    assert ev[0] == ev[1], "e(2P,Q) != e(P,2Q)"
    sq = mnt6.f6_mul(spec, e[:, 2:3], e[:, 2:3])
    assert _f6_host(spec, sq)[0] == ev[0], "e(2P,Q) != e(P,Q)^2"
    one = _f6_host(spec, mnt6.f6_one(spec, (1,)))[0]
    assert ev[2] != one, "degenerate pairing"

    negP = oc1.neg(P)
    ok = mnt6.pairing_eq(spec, g1_dev([P, negP]), g2_dev([Q, Q]))
    assert bool(np.asarray(ok))


@pytest.mark.slow
def test_mnt6_pairing_infinity():
    import jax.numpy as jnp

    spec = ps()
    fq = mnt6753.fq
    L = fq.n_limbs
    F3d = mnt6753_g2.field
    oc2 = OracleCurve(
        q=mnt6753_g2.q, a=mnt6753_g2.a, b=mnt6753_g2.b, r=mnt6753_g2.r,
        gx=mnt6753_g2.gx, gy=mnt6753_g2.gy, field=HostF3(mnt6753.q, 11),
    )
    Ps = (
        jnp.asarray(ints_to_limbs([0], L)),
        jnp.asarray(ints_to_limbs([0], L)),
    )
    Qs = (
        jnp.stack([F3d.const(oc2.g[0])], axis=1),
        jnp.stack([F3d.const(oc2.g[1])], axis=1),
    )
    f = mnt6.miller_loop(spec, Ps, Qs)
    assert _f6_host(spec, f) == _f6_host(spec, mnt6.f6_one(spec, (1,)))
