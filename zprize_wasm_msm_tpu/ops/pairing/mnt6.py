"""Ate pairing for MNT6-753, batched over (P, Q) pairs.

TPU-native re-design of wasmcurves/src/mnt6753/build_mnt6753.js:
  prepareG1 (:300)            -> P embedded into Fq3 via the twist
                                 (PX_twist = PX*v, PY_twist = PY*v)
  prepareG2 + millerLoop
  (:361, :678)                -> ONE lax.scan over the bits of the ate
                                 loop count carrying (R, f): Jacobian-
                                 with-T doubling (prepDblStep:567) and
                                 mixed addition (prepAddStep:450) with
                                 fused line evaluation into Fq6
  finalExponentiation (:1272) -> easy part (FirstChunk:1248,
                                 t^((q^3-1)(q+1))) then hard part
                                 (LastChunk:1224): frob1(beta) * beta^w0
                                 with the NAF cyclotomic exponentiation
                                 (cyclotomicSquare:1052, w0 = the ate
                                 loop count, :1225)

Tower: Fq6 = Fq3[w]/(w^2 - v) over Fq3 = Fq[v]/(v^3 - 11)
(ftm = buildF2m over f3m with mulNR6 = multiply-by-v, :58-88).
Element layout: flat (6L, *batch) = [c00 c01 c02 | c10 c11 c12]
(w-coefficient second), matching the reference's ftsize offsets.

All values Montgomery; G1 points affine (L, N), G2 affine (3L, N).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from functools import cached_property
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curve.spec import CurveSpec
from ..field import mont
from ..field.tower import Fq2, Fq3

#: the MNT6-753 ate loop count == final-exp hard-part w0
#: (ref ateLoopCount:262 == MNT6753_final_exponent_last_chunk_abs_of_w0:1225)
MNT6753_ATE_LOOP = 204691208819330962009469868104636132783269696790011977400223898462431810102935615891307667367766898917669754470400


@dataclass(frozen=True)
class MNT6PairingSpec:
    g1: CurveSpec
    g2: CurveSpec
    loop_count: int = MNT6753_ATE_LOOP

    @cached_property
    def f3(self) -> Fq3:
        return Fq3(self.g1.fq, 11)

    @cached_property
    def f2(self) -> Fq2:
        """Fq2 with the SAME non-residue 11 (only used by the cyclotomic
        squaring's Fq4-style sub-squares, ref f2m built over mulNR3 :54)."""
        return Fq2(self.g1.fq, 11)

    @cached_property
    def loop_bits(self) -> Tuple[int, ...]:
        n = self.loop_count
        return tuple((n >> i) & 1 for i in range(n.bit_length()))

    @cached_property
    def frob_gammas(self):
        """gamma(i, n) = 11^(widx*(q^n-1)/6 + vidx*(q^n-1)/3) mod q for
        component i = 3*widx + vidx — the host derivation of the F6/F3
        coefficient tables (ref buildFrobeniusMap:989-1027)."""
        q = self.g1.q
        out = {}
        for n in range(1, 4):
            qn = q**n
            e6 = (qn - 1) // 6
            e3 = (qn - 1) // 3
            coefs = []
            for i in range(6):
                widx, vidx = divmod(i, 3)
                coefs.append(pow(11, widx * e6 + vidx * e3, q))
            out[n] = tuple(coefs)
        return out


# ---------------------------------------------------------------------------
# Fq6 = Fq3[w]/(w^2 - v) arithmetic on flat (6L, *batch) values
# ---------------------------------------------------------------------------


def _split6(ps, a):
    k = 3 * ps.g1.fq.n_limbs
    return a[:k], a[k:]


def f6_one(ps, batch):
    F3 = ps.f3
    return jnp.concatenate([F3.one(batch), F3.zeros(batch)])


def f6_mul(ps, a, b):
    """Karatsuba over Fq3; w^2 = v so the cross term shifts by v
    (ref ftm mul = build_f2m.js mul with mulNR6 = multiply-by-v)."""
    F3 = ps.f3
    a0, a1 = _split6(ps, a)
    b0, b1 = _split6(ps, b)
    t0, t1, m = F3.mul_many(
        [(a0, b0), (a1, b1), (F3.add(a0, a1), F3.add(b0, b1))]
    )
    c0 = F3.add(t0, _mul_v(ps, t1))
    c1 = F3.sub(F3.sub(m, t0), t1)
    return jnp.concatenate([c0, c1])


def _mul_v(ps, x):
    """v * (x0 + x1 v + x2 v^2) = 11 x2 + x0 v + x1 v^2."""
    F3 = ps.f3
    L = ps.g1.fq.n_limbs
    x0, x1, x2 = x[:L], x[L : 2 * L], x[2 * L :]
    return jnp.concatenate([F3._mul_nr(x2), x0, x1])


def f6_square(ps, a):
    return f6_mul(ps, a, a)


def f6_conjugate(ps, a):
    F3 = ps.f3
    a0, a1 = _split6(ps, a)
    return jnp.concatenate([a0, F3.neg(a1)])


def f6_inverse(ps, a):
    F3 = ps.f3
    a0, a1 = _split6(ps, a)
    t = F3.sub(F3.mul(a0, a0), _mul_v(ps, F3.mul(a1, a1)))
    tinv = F3.inverse(t)
    return jnp.concatenate(
        [F3.mul(a0, tinv), F3.neg(F3.mul(a1, tinv))]
    )


def f6_frobenius(ps, a, n: int):
    """a^(q^n): componentwise Fq scalar multiply by gamma(i, n)
    (ref __frobeniusMap1/2/3, buildFrobeniusMap:989)."""
    s = ps.g1.fq
    L = s.n_limbs
    from ...utils.bigint import int_to_limbs

    comps = []
    for i in range(6):
        c = a[i * L : (i + 1) * L]
        g = ps.frob_gammas[n][i]
        if g != 1:
            gl = jnp.asarray(
                int_to_limbs(s.to_mont_int(g), L), jnp.uint32
            ).reshape((L,) + (1,) * (c.ndim - 1))
            c = mont.mont_mul(s, c, jnp.broadcast_to(gl, c.shape))
        comps.append(c)
    return jnp.concatenate(comps)


def f6_cyclotomic_square(ps, a):
    """Granger-Scott squaring in the degree-6 cyclotomic subgroup via the
    three Fq2(nr=11) sub-squares (ref __cyclotomicSquare:1052-1149):
      A = (c00, c11), B = (c10, c02), C = (c01, c12);
      r00 = 3 ASQ0 - 2 A0      r04 = 3 ASQ1 + 2 A1
      r03 = 3*11 CSQ1 + 2 B0   r02 = 3 CSQ0 - 2 B1
      r01 = 3 BSQ0 - 2 C0      r05 = 3 BSQ1 + 2 C1
    """
    s = ps.g1.fq
    F2 = ps.f2
    L = s.n_limbs
    c = [a[i * L : (i + 1) * L] for i in range(6)]
    A = jnp.concatenate([c[0], c[4]])
    B = jnp.concatenate([c[3], c[2]])
    C = jnp.concatenate([c[1], c[5]])
    ASQ = F2.square(A)
    BSQ = F2.square(B)
    CSQ = F2.square(C)
    asq0, asq1 = ASQ[:L], ASQ[L:]
    bsq0, bsq1 = BSQ[:L], BSQ[L:]
    csq0, csq1 = CSQ[:L], CSQ[L:]

    def m3p2(x, y, sgn):
        # 3x + 2y (sgn=+1) or 3x - 2y (sgn=-1), via the reference's
        # add/sub chains
        t = mont.sub(s, x, y) if sgn < 0 else mont.add(s, x, y)
        t = mont.add(s, t, t)
        return mont.add(s, t, x)

    r0 = m3p2(asq0, c[0], -1)
    r4 = m3p2(asq1, c[4], +1)
    nr_csq1 = ps.f3._mul_nr(csq1)
    r3 = m3p2(nr_csq1, c[3], +1)
    r2 = m3p2(csq0, c[2], -1)
    r1 = m3p2(bsq0, c[1], -1)
    r5 = m3p2(bsq1, c[5], +1)
    return jnp.concatenate([r0, r1, r2, r3, r4, r5])


@functools.lru_cache(maxsize=None)
def _naf_digits_msb(n: int) -> Tuple[int, ...]:
    digs = []
    while n:
        if n & 1:
            d = 2 - (n % 4)
            digs.append(d)
            n -= d
        else:
            digs.append(0)
        n >>= 1
    return tuple(reversed(digs))


def f6_cyclotomic_exp(ps, f, e_abs: int):
    """f^e_abs by NAF square-and-multiply with cyclotomic squarings;
    inversion is conjugation (ref __cyclotomicExp_w0:1150-1223)."""
    digs = _naf_digits_msb(e_abs)
    assert digs[0] == 1
    darr = jnp.asarray(np.array(digs, np.int32))
    inv = f6_conjugate(ps, f)

    def body(i, res):
        res = f6_cyclotomic_square(ps, res)
        m1 = f6_mul(ps, res, f)
        m2 = f6_mul(ps, res, inv)
        d = darr[i]
        return jnp.where((d == 1)[None], m1, jnp.where((d == -1)[None], m2, res))

    return jax.lax.fori_loop(1, len(digs), body, f)


# ---------------------------------------------------------------------------
# Miller loop (Jacobian-with-T steps, ref prepDblStep:567 / prepAddStep:450)
# ---------------------------------------------------------------------------


def _dbl_step(ps, R):
    F3 = ps.f3
    X1, Y1, Z1, T1 = R
    batch = X1.shape[1:]
    a2 = F3.const(ps.g2.a, batch)  # (0, 0, 11) = 11 v^2 (TwistCoefA:546)

    A = F3.square(T1)
    B = F3.square(X1)
    C = F3.square(Y1)
    D = F3.square(C)
    E = F3.sub(F3.sub(F3.square(F3.add(X1, C)), B), D)
    F_ = F3.mul(a2, A)
    F_ = F3.add(B, F3.add(B, F3.add(B, F_)))
    G = F3.square(F_)
    nX = F3.sub(G, F3.add(F3.add(E, E), F3.add(E, E)))
    nY = F3.mul(F3.sub(F3.add(E, E), nX), F_)
    D8 = F3.add(D, D)
    D8 = F3.add(D8, D8)
    D8 = F3.add(D8, D8)
    nY = F3.sub(nY, D8)
    nZ = F3.sub(
        F3.square(F3.add(Y1, Z1)), F3.add(F3.square(Z1), C)
    )
    nT = F3.square(nZ)
    H = F3.sub(F3.sub(F3.square(F3.add(nZ, T1)), nT), A)
    fourC = F3.add(C, C)
    fourC = F3.add(fourC, fourC)
    J = F3.sub(F3.sub(F3.square(F3.add(F_, T1)), G), A)
    Lc = F3.sub(F3.sub(F3.square(F3.add(F_, X1)), G), B)
    return (nX, nY, nZ, nT), (H, fourC, J, Lc)


def _add_step(ps, R, QX, QY, QY2):
    F3 = ps.f3
    X1, Y1, Z1, T1 = R
    B = F3.mul(QX, T1)
    D = F3.mul(
        F3.sub(F3.sub(F3.square(F3.add(QY, Z1)), QY2), T1), T1
    )
    H = F3.sub(B, X1)
    I = F3.square(H)
    E = F3.add(I, I)
    E = F3.add(E, E)
    J = F3.mul(H, E)
    V = F3.mul(X1, E)
    L1 = F3.sub(D, F3.add(Y1, Y1))
    nX = F3.sub(F3.square(L1), F3.add(F3.add(V, V), J))
    nY = F3.sub(
        F3.mul(L1, F3.sub(V, nX)), F3.mul(F3.add(Y1, Y1), J)
    )
    nZ = F3.sub(
        F3.square(F3.add(Z1, H)), F3.add(T1, I)
    )
    nT = F3.square(nZ)
    return (nX, nY, nZ, nT), (L1, nZ)


def miller_loop(ps, P, Q):
    """Batched MNT6 ate Miller loop (ref millerLoop:678-787).

    P affine G1 (L, N) x2; Q affine G2 (3L, N) x2 over Fq3.
    Pairs with P or Q at infinity yield 1.  Pads the pair batch to the
    canonical PAIR_BATCH (see bls12.PAIR_BATCH) so all callers share
    one executable."""
    from .bls12 import _pad_cols, _padded_n

    n = P[0].shape[-1]
    np_ = _padded_n(n)
    if np_ != n:
        P = tuple(_pad_cols(a, np_) for a in P)
        Q = tuple(_pad_cols(a, np_) for a in Q)
    return _j_miller(ps, P, Q)[..., :n]


@functools.partial(jax.jit, static_argnums=(0,))
def _j_miller(ps: MNT6PairingSpec, P, Q):
    F3 = ps.f3
    s = ps.g1.fq
    L = s.n_limbs
    Px, Py = P
    Qx, Qy = Q
    batch = Px.shape[1:]

    zero1 = mont.zeros(s, batch)
    # P twisted into Fq3: PX_twist = PX * v = (0, PX, 0) (prepareG1:326-331)
    PXt = jnp.concatenate([zero1, Px, jnp.zeros_like(Px)])
    PYt = jnp.concatenate([zero1, Py, jnp.zeros_like(Py)])
    # twist = v; twist^-1 precomputed host-side: v^-1 = v^2 / 11
    inv11 = pow(11, -1, ps.g1.q)
    twist_inv = F3.const((0, 0, inv11), batch)
    QXot = F3.mul(Qx, twist_inv)
    QYot = F3.mul(Qy, twist_inv)
    QY2 = F3.square(Qy)
    # L1Coef = (PX, 0, 0) - QX_over_twist  (millerLoop:719-723)
    PX3 = jnp.concatenate([Px, zero1, zero1])
    L1Coef = F3.sub(PX3, QXot)

    R = (Qx, Qy, F3.one(batch), F3.one(batch))
    f = f6_one(ps, batch)

    bits = ps.loop_bits
    xs = jnp.asarray(
        np.array([bits[i] for i in range(len(bits) - 2, -1, -1)], np.int32)
    )

    def body(carry, bit):
        R, f = carry
        R, (H, fourC, J, Lc) = _dbl_step(ps, R)
        ev0 = F3.sub(F3.sub(Lc, F3.mul(J, PXt)), fourC)
        ev1 = F3.mul(H, PYt)
        f = f6_square(ps, f)
        f = f6_mul(ps, f, jnp.concatenate([ev0, ev1]))
        Ra, (L1, RZ) = _add_step(ps, R, Qx, Qy, QY2)
        ev0a = F3.mul(RZ, PYt)
        ev1a = F3.neg(
            F3.add(F3.mul(RZ, QYot), F3.mul(L1Coef, L1))
        )
        fa = f6_mul(ps, f, jnp.concatenate([ev0a, ev1a]))
        do_add = bit == 1
        R = tuple(F3.select(do_add, a, b) for a, b in zip(Ra, R))
        f = jnp.where(do_add[None], fa, f)
        return (R, f), None

    (R, f), _ = jax.lax.scan(body, (R, f), xs)

    inf = (
        (mont.is_zero(s, Px) & mont.is_zero(s, Py))
        | (F3.is_zero(Qx) & F3.is_zero(Qy))
    )
    return jnp.where(inf[None], f6_one(ps, batch), f)


@functools.partial(jax.jit, static_argnums=(0,))
def _j_fe_easy(ps: MNT6PairingSpec, f):
    """Easy part (FirstChunk:1248): t = frob3(f) * f^-1;
    beta = frob1(t) * t."""
    finv = f6_inverse(ps, f)
    t = f6_mul(ps, f6_frobenius(ps, f, 3), finv)
    return f6_mul(ps, f6_frobenius(ps, t, 1), t)


@functools.partial(jax.jit, static_argnums=(0,))
def _j_cyc_exp_w0(ps: MNT6PairingSpec, beta):
    """beta^w0 — the NAF cyclotomic exponentiation (LastChunk:1224)."""
    return f6_cyclotomic_exp(ps, beta, ps.loop_count)


@functools.partial(jax.jit, static_argnums=(0,))
def _j_frob1_mul(ps: MNT6PairingSpec, beta, e):
    return f6_mul(ps, f6_frobenius(ps, beta, 1), e)


def final_exponentiation(ps: MNT6PairingSpec, f):
    """f^((q^6-1)/r) (ref finalExponentiation:1272).

    Easy part (FirstChunk:1248): t = frob3(f) * f^-1; beta = frob1(t) * t.
    Hard part (LastChunk:1224): frob1(beta) * beta^w0.
    Composed from THREE stage jits (easy part / cyclotomic exp / final
    frobenius-multiply) — the fused 753-bit module exceeds this
    environment's TPU compile-helper memory cap; see
    bls12.final_exponentiation for the same decomposition.
    Batch padded to the canonical PAIR_BATCH (f = 1 passthrough)."""
    from .bls12 import _pad_cols, _padded_n

    n = f.shape[-1]
    np_ = _padded_n(n)
    if np_ != n:
        f = _pad_cols(f, np_, fill=f6_one(ps, (1,)))
    beta = _j_fe_easy(ps, f)
    return _j_frob1_mul(ps, beta, _j_cyc_exp_w0(ps, beta))[..., :n]


def pairing(ps: MNT6PairingSpec, P, Q):
    """e(P, Q) batched (ref buildPairing:1345).  Stage jits, not one
    fused program — see bls12.pairing for the compile-size rationale."""
    return final_exponentiation(ps, miller_loop(ps, P, Q))


@functools.partial(jax.jit, static_argnums=(0,))
def _f6_product_tree(ps: MNT6PairingSpec, f):
    n = f.shape[1]
    while n > 1:
        half = n // 2
        prod = f6_mul(ps, f[:, :half], f[:, half : 2 * half])
        f = jnp.concatenate([prod, f[:, -1:]], axis=1) if n % 2 else prod
        n = half + (n % 2)
    return f


def pairing_eq(ps: MNT6PairingSpec, Ps, Qs):
    """prod_i e(P_i, Q_i) == 1 (ref pairingEq1-3:1312)."""
    from .bls12 import _pad_cols, _padded_n

    f = miller_loop(ps, Ps, Qs)
    f = _pad_cols(f, _padded_n(f.shape[-1]), fill=f6_one(ps, (1,)))
    f = _f6_product_tree(ps, f)
    e = final_exponentiation(ps, f)
    return jnp.all(e == f6_one(ps, (1,)))


_mnt6_spec = None


def get_mnt6753_spec() -> MNT6PairingSpec:
    global _mnt6_spec
    if _mnt6_spec is None:
        from ...models.curves import mnt6753, mnt6753_g2

        _mnt6_spec = MNT6PairingSpec(g1=mnt6753, g2=mnt6753_g2)
    return _mnt6_spec
