"""SvdW groupMap (MNT6753 G1 hash-to-curve) + runtime-exponent field exp.

Reference parity targets: g1m_groupMap (build_mnt6753.js:1362-1490) and
f1m_exp (build_timesscalar.js wired at build_f1m.js:1375-1384).
"""

import numpy as np
import pytest

from zprize_wasm_msm_tpu.models.context import build_curve
from zprize_wasm_msm_tpu.models.curves import mnt6753, toy
from zprize_wasm_msm_tpu.ops.field import mont
from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs


def test_field_exp_runtime_toy(rng):
    """mont.exp with device-resident exponents ≡ pow() per lane."""
    import jax.numpy as jnp

    s = toy.fq
    av = [int(rng.integers(1, s.q)) for _ in range(6)]
    ev = [0, 1, 2, int(rng.integers(0, 1 << 30)), s.q - 2, (1 << 32) - 1]
    a = mont.to_mont(s, jnp.asarray(ints_to_limbs(av, s.n_limbs)))
    e = jnp.asarray(ints_to_limbs(ev, 2))  # 32-bit exponent slots
    got = [s.from_mont_int(v) for v in in_ints(mont.exp(s, a, e), s)]
    want = [pow(x, k, s.q) for x, k in zip(av, ev)]
    assert got == want


def in_ints(arr, s):
    from zprize_wasm_msm_tpu.utils.limbs import limbs_to_ints

    return limbs_to_ints(np.asarray(arr))


def _svdw_host(q, a, b, conic_c, proj_z, t):
    """Host-side oracle of the same SvdW construction (plain ints)."""
    inv = lambda x: pow(x, q - 2, q)
    is_sq = lambda x: x == 0 or pow(x, (q - 1) // 2, q) == 1

    def sqrt_norm(x):
        if x == 0:
            return 0
        if q % 4 == 3:
            r = pow(x, (q + 1) // 4, q)
        else:
            # Tonelli-Shanks (mnt6753 q ≡ 1 mod 4)
            s_, t_ = 0, q - 1
            while t_ % 2 == 0:
                s_, t_ = s_ + 1, t_ // 2
            z = 2
            while pow(z, (q - 1) // 2, q) != q - 1:
                z += 1
            c = pow(z, t_, q)
            r = pow(x, (t_ + 1) // 2, q)
            w = pow(x, t_, q)
            m = s_
            while w != 1:
                i, tmp = 0, w
                while tmp != 1:
                    tmp = tmp * tmp % q
                    i += 1
                bexp = pow(c, 1 << (m - i - 1), q)
                r = r * bexp % q
                c = bexp * bexp % q
                w = w * c % q
                m = i
        assert r * r % q == x % q
        return q - r if r > (q - 1) // 2 else r

    ct = conic_c * t % q
    s_ = 2 * (ct + proj_z) % q * inv((ct * t + 1) % q) % q
    z = (proj_z - s_) % q
    y = (1 - s_ * t) % q
    v = (z * inv(y) - inv(2)) % q
    for x in (v, (-(1 + v)) % q, (1 + y * y) % q):
        rhs = (x * x % q * x + a * x + b) % q
        if is_sq(rhs):
            return x, sqrt_norm(rhs)
    raise AssertionError("SvdW: no candidate was square")


@pytest.mark.slow
def test_groupmap_mnt6753(rng):
    """Device groupMap == host oracle AND lands on the curve (full width)."""
    import jax.numpy as jnp

    from zprize_wasm_msm_tpu.ops.curve import group, groupmap
    from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve

    s = mnt6753.fq
    q = mnt6753.q
    svdw = groupmap._SVDW[q]
    ts = [1, 2, int(rng.integers(0, 1 << 60)), q - 3]
    T = mont.to_mont(s, jnp.asarray(ints_to_limbs(ts, s.n_limbs)))
    X, Y, Z = groupmap.group_map(mnt6753, T)
    xs = [s.from_mont_int(v) for v in in_ints(X, s)]
    ys = [s.from_mont_int(v) for v in in_ints(Y, s)]

    oc = OracleCurve(
        q=q, a=mnt6753.a, b=mnt6753.b, r=mnt6753.r,
        gx=mnt6753.gx, gy=mnt6753.gy,
    )
    for t, x, y in zip(ts, xs, ys):
        wx, wy = _svdw_host(q, mnt6753.a, mnt6753.b, svdw.conic_c, svdw.proj_z, t)
        assert (x, y) == (wx, wy), f"t={t}"
        assert oc.is_on_curve((x, y)), f"t={t} not on curve"
    # device-side on-curve check too
    ok = np.asarray(group.in_curve(mnt6753, (X, Y, Z)))
    assert ok.all()
