"""Shallue–van de Woestijne group map (hash-to-curve) for MNT6753 G1.

TPU-native re-design of the reference's `g1m_groupMap`
(wasmcurves/src/mnt6753/build_mnt6753.js buildGroupMap:1362-1490): maps a
field element t onto the curve by the SvdW conic parametrization — three
candidate x-values are derived from t, and at least one of
x^3 + a*x + b is guaranteed to be a quadratic residue.

The reference tries the candidates sequentially with early returns; here
all three rhs values and square roots are computed for every lane and the
first valid candidate is chosen with masks (branch-free, identical work
per lane — the XLA-friendly shape of the same algorithm).

Curve constants (conic coefficient, projection point) are embedded per
curve exactly as the reference embeds them at codegen time
(build_mnt6753.js:1378-1386).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Tuple

import jax.numpy as jnp

from ..field import mont
from .spec import CurveSpec


@dataclass(frozen=True)
class SvdWSpec:
    conic_c: int  # conic coefficient (ref _conicC, build_mnt6753.js:1383)
    proj_z: int  # z-coord of the conic projection point (ref _prjZ, :1385)
    # proj_y is 1 (ref uses pOne, :1386)


# keyed by curve prime q (constants are per-field, public parameters)
_SVDW: dict = {
    # MNT6753 (ref build_mnt6753.js:1383,1385)
    41898490967918953402344214791240637128170709919953949071783502921025352812571106773058893763790338921418070971888458477323173057491593855069696241854796396165721416325350064441470418137846398469611935719059908164220784476160001: SvdWSpec(
        conic_c=10474622741979738350586053697810159282042677479988487267945875730256338203142776693264723440947584730354517742972114619330793264372898463767424060463699099041430354081337516110367604534461599617402983929764977041055196119040012,
        proj_z=38365735639699746381939366704915555468563774296792699496721397906733830428037078183799997086205833647489050605889539959322880863358082391473031143521765387671570958090617625358358885062894615919620647426481572278916894388596945,
    ),
}


def group_map(curve: CurveSpec, T: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Map a batch of base-field elements onto the curve.

    T: (L, N) Montgomery-form field elements.
    Returns a projective point batch ((L,N), (L,N), (L,N)), Z = 1, exactly
    the reference's output layout (x, sqrt(rhs), one).
    """
    assert curve.ext == 1, "groupMap is a base-field (G1) construction"
    svdw = _SVDW.get(curve.q)
    assert svdw is not None, f"no SvdW constants registered for {curve.name}"
    s = curve.fq
    batch = T.shape[1:]

    one = mont.one_mont(s, batch)
    conic_c = mont.full_const(s, s.to_mont_int(svdw.conic_c % s.q), batch)
    proj_z = mont.full_const(s, s.to_mont_int(svdw.proj_z % s.q), batch)
    u_over_2 = mont.full_const(s, s.to_mont_int(pow(2, -1, s.q)), batch)
    a_c = mont.full_const(s, s.to_mont_int(curve.a % s.q), batch)
    b_c = mont.full_const(s, s.to_mont_int(curve.b % s.q), batch)

    # ct = conicC * t ; S = 2 * (ct*projY + projZ) / (ct*t + 1), projY = 1
    ct = mont.mont_mul(s, conic_c, T)
    num = mont.add(s, ct, proj_z)
    den = mont.add(s, mont.mont_mul(s, ct, T), one)
    S = mont.mont_mul(s, num, mont.inverse(s, den))
    S = mont.add(s, S, S)

    # Z = projZ - S ; Y = projY - S*t ; V = Z/Y - 1/2
    Z = mont.sub(s, proj_z, S)
    Y = mont.sub(s, one, mont.mont_mul(s, S, T))
    V = mont.sub(s, mont.mont_mul(s, Z, mont.inverse(s, Y)), u_over_2)

    # candidates: x1 = V, x2 = -(1 + V), x3 = 1 + Y^2
    x1 = V
    x2 = mont.neg(s, mont.add(s, one, V))
    x3 = mont.add(s, one, mont.mont_square(s, Y))

    def rhs(x):
        # x^3 + a*x + b
        r = mont.mont_mul(s, mont.mont_square(s, x), x)
        r = mont.add(s, r, mont.mont_mul(s, a_c, x))
        return mont.add(s, r, b_c)

    def root(x):
        r2 = rhs(x)
        y, ok = mont.sqrt(s, r2)
        # the reference's f1m_sqrt returns the non-negative root
        # (build_f1m.js:1209-1213); normalize to match
        y = mont._select(mont.sign(s, y) == -1, mont.neg(s, y), y)
        return y, ok

    y1, ok1 = root(x1)
    y2, ok2 = root(x2)
    y3, ok3 = root(x3)

    # first valid candidate wins (SvdW guarantees at least one)
    X = mont._select(ok1, x1, mont._select(ok2, x2, x3))
    Yc = mont._select(ok1, y1, mont._select(ok2, y2, y3))
    return (X, Yc, one)
