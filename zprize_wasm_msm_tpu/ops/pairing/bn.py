"""Optimal-ate pairing for BN curves (the reference's bn128), batched.

TPU-native re-design of wasmcurves/src/bn128/build_bn128.js:
  prepareG2 + millerLoop  (:550, :806) -> one lax.scan over the bits of
      the ate loop count 6z+2, carrying (R, f); homogeneous-projective
      doubling/addition steps with fused line evaluation (prepDblStep:417,
      prepAddStep:331) folded via the sparse f12_mul024 (:663), then the
      two Frobenius-twisted add steps with Q1 = pi(Q), Q2 = -pi^2(Q)
      (mulByQ:515, prepareG2 tail :604-621).
  finalExponentiation (:1290) -> easy part (FirstChunk:994) + the BN
      hard-part addition chain (LastChunk:1200-1286) with cyclotomic
      exponentiations by z (finalExpZ:287) — transcribed step for step.

Shares the Fq6/Fq12 tower with the BLS pairing, instantiated with the BN
sextic non-residue xi = 9 + u (ref pNonResidueF6:185).

All values Montgomery; G1 points affine (L, N), G2 affine (2L, N),
results (12L, N).
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
from .bls12 import _cyclotomic_exp, _frob_k
from .tower import Tower

#: BN254 curve parameter z (ref finalExpZ, build_bn128.js:287)
BN254_Z = 4965661367192848881


@dataclass(frozen=True)
class BNPairingSpec:
    g1: CurveSpec
    g2: CurveSpec
    z: int  # BN parameter; ate loop count is 6z+2
    xi: Tuple[int, int] = (9, 1)  # sextic non-residue (ref pNonResidueF6:185)

    @cached_property
    def tower(self) -> Tower:
        return Tower(self.g1.fq, xi=self.xi)

    @cached_property
    def loop_count(self) -> int:
        return 6 * self.z + 2  # ref ateLoopCount:253

    @cached_property
    def loop_bits(self) -> Tuple[int, ...]:
        """LSB-first bits of 6z+2 (ref bits():305)."""
        n = self.loop_count
        return tuple((n >> i) & 1 for i in range(n.bit_length()))

    # -- embedded constants (ref :190-199, :525-535) -----------------------

    def _f2_host(self, v0: int, v1: int):
        q = self.g1.q
        return (v0 % q, v1 % q)

    @cached_property
    def two_inv(self) -> Tuple[int, int]:
        return (pow(2, -1, self.g1.q), 0)  # pTwoInv:190

    @cached_property
    def twist_b(self) -> Tuple[int, int]:
        return tuple(c % self.g1.q for c in self.g2.b)  # pTwistCoefB:197

    @cached_property
    def frob_gamma_x(self) -> Tuple[int, int]:
        """xi^((q-1)/3): the mulByQ x-coefficient (MulByQX:525)."""
        return self._xi_pow((self.g1.q - 1) // 3)

    @cached_property
    def frob_gamma_y(self) -> Tuple[int, int]:
        """xi^((q-1)/2): the mulByQ y-coefficient (MulByQY:530)."""
        return self._xi_pow((self.g1.q - 1) // 2)

    def _xi_pow(self, e: int) -> Tuple[int, int]:
        from ...oracle import F2 as HostF2

        hf = HostF2(self.g1.q, -1)
        acc, base = (1, 0), self.xi
        while e:
            if e & 1:
                acc = hf.mul(acc, base)
            base = hf.sqr(base)
            e >>= 1
        return acc


def _dbl_step(ps: BNPairingSpec, R):
    """Homogeneous-projective doubling + line coefficients
    (ref prepDblStep, build_bn128.js:417-512)."""
    tw = ps.tower
    F2 = tw.f2
    X1, Y1, Z1 = R
    batch = X1.shape[1:]
    two_inv = F2.const(ps.two_inv, batch)
    twist_b = F2.const(ps.twist_b, batch)

    A = F2.mul(X1, F2.mul(Y1, two_inv))
    B = F2.square(Y1)
    C = F2.square(Z1)
    D = F2.add(F2.add(C, C), C)
    E = F2.mul(twist_b, D)
    F_ = F2.add(F2.add(E, E), E)
    G = F2.mul(F2.add(B, F_), two_inv)
    H = F2.sub(F2.square(F2.add(Y1, Z1)), F2.add(B, C))
    I = F2.sub(E, B)
    J = F2.square(X1)
    E2 = F2.square(E)

    nX = F2.mul(A, F2.sub(B, F_))
    nY = F2.sub(F2.square(G), F2.add(F2.add(E2, E2), E2))
    nZ = F2.mul(B, H)

    ell_0 = tw.f2_mul_xi(I)
    ell_vw = F2.neg(H)  # later * yP
    ell_vv = F2.add(F2.add(J, J), J)  # later * xP
    return (nX, nY, nZ), (ell_0, ell_vw, ell_vv)


def _add_step(ps: BNPairingSpec, R, Q):
    """Homogeneous-projective mixed addition + line coefficients
    (ref prepAddStep, build_bn128.js:331-413)."""
    tw = ps.tower
    F2 = tw.f2
    X1, Y1, Z1 = R
    X2, Y2 = Q

    D = F2.sub(X1, F2.mul(X2, Z1))
    E = F2.sub(Y1, F2.mul(Y2, Z1))
    F_ = F2.square(D)
    G = F2.square(E)
    H = F2.mul(D, F_)
    I = F2.mul(X1, F_)
    J = F2.sub(F2.add(H, F2.mul(Z1, G)), F2.add(I, I))

    nX = F2.mul(D, J)
    nY = F2.sub(F2.mul(E, F2.sub(I, J)), F2.mul(H, Y1))
    nZ = F2.mul(Z1, H)

    ell_0 = tw.f2_mul_xi(F2.sub(F2.mul(E, X2), F2.mul(D, Y2)))
    ell_vw = D  # later * yP
    ell_vv = F2.neg(E)  # later * xP
    return (nX, nY, nZ), (ell_0, ell_vw, ell_vv)


def _ell(tw: Tower, f, coefs, Px, Py):
    """Fold one line into f (ref millerLoop's f2m_mul1 + __mulBy024,
    build_bn128.js:842-844)."""
    ell_0, ell_vw, ell_vv = coefs
    vw = tw.f2_scale_fq(ell_vw, Py)
    vv = tw.f2_scale_fq(ell_vv, Px)
    return tw.f12_mul024(f, ell_0, vv, vw)


def _mul_by_q(ps: BNPairingSpec, Q):
    """Frobenius endomorphism on the twist: (x, y) ->
    (gamma_x * conj(x), gamma_y * conj(y)) (ref mulByQ:515-545)."""
    tw = ps.tower
    F2 = tw.f2
    Qx, Qy = Q
    batch = Qx.shape[1:]
    gx = F2.const(ps.frob_gamma_x, batch)
    gy = F2.const(ps.frob_gamma_y, batch)
    return (F2.mul(gx, F2.conjugate(Qx)), F2.mul(gy, F2.conjugate(Qy)))


def miller_loop(ps, P, Q):
    """Batched BN Miller loop (ref millerLoop:806-885 + prepareG2:550).

    P affine G1 (L, N) x2; Q affine G2 (2L, N) x2.  Pairs with P or Q at
    infinity yield 1.  Pads the pair batch to the canonical PAIR_BATCH
    (see bls12.PAIR_BATCH) so all callers share one executable."""
    from .bls12 import _pad_cols, _padded_n

    n = P[0].shape[-1]
    np_ = _padded_n(n)
    if np_ != n:
        P = tuple(_pad_cols(a, np_) for a in P)
        Q = tuple(_pad_cols(a, np_) for a in Q)
    return _j_miller(ps, P, Q)[..., :n]


@functools.partial(jax.jit, static_argnums=(0,))
def _j_miller(ps: BNPairingSpec, P, Q):
    tw = ps.tower
    F2 = tw.f2
    Px, Py = P
    Qx, Qy = Q
    batch = Px.shape[1:]
    bits = ps.loop_bits  # LSB-first; bits[-1] == 1

    R = (Qx, Qy, F2.one(batch))
    f = tw.f12_one(batch)

    xs = jnp.asarray(
        np.array([bits[i] for i in range(len(bits) - 2, -1, -1)], np.int32)
    )

    def body(carry, bit):
        R, f = carry
        f = tw.f12_square(f)
        R, dcoef = _dbl_step(ps, R)
        f = _ell(tw, f, dcoef, Px, Py)
        Ra, acoef = _add_step(ps, R, (Qx, Qy))
        fa = _ell(tw, f, acoef, Px, Py)
        do_add = bit == 1
        R = tuple(F2.select(do_add, a, b) for a, b in zip(Ra, R))
        f = jnp.where(do_add[None], fa, f)
        return (R, f), None

    (R, f), _ = jax.lax.scan(body, (R, f), xs)

    # the two Frobenius-twisted add steps (prepareG2 tail :604-621)
    Q1 = _mul_by_q(ps, (Qx, Qy))
    Q2 = _mul_by_q(ps, Q1)
    Q2 = (Q2[0], F2.neg(Q2[1]))
    R, c1 = _add_step(ps, R, Q1)
    f = _ell(tw, f, c1, Px, Py)
    R, c2 = _add_step(ps, R, Q2)
    f = _ell(tw, f, c2, Px, Py)

    inf = (
        (mont.is_zero(tw.spec, Px) & mont.is_zero(tw.spec, Py))
        | (F2.is_zero(Qx) & F2.is_zero(Qy))
    )
    return jnp.where(inf[None], tw.f12_one(batch), f)


@functools.partial(jax.jit, static_argnums=(0,))
def _j_fe_easy(ps: BNPairingSpec, f):
    """Easy part (FirstChunk:994): f^(q^6-1) then ^(q^2+1)."""
    tw = ps.tower
    elt = tw.f12_mul(tw.f12_conjugate(f), tw.f12_inverse(f))
    return tw.f12_mul(_frob_k(tw, elt, 2), elt)


@functools.partial(jax.jit, static_argnums=(0,))
def _j_exp_nz(ps: BNPairingSpec, a):
    """a^(-z) — ONE compiled cyclotomic-exp executable reused for all
    three hard-part exponentiations (z > 0, so exp-then-conjugate:
    `finalExpIsNegative ? [] : conjugate` at build_bn128.js:1235)."""
    return _cyclotomic_exp(ps.tower, a, ps.z, True)


@functools.partial(jax.jit, static_argnums=(0,))
def _j_bd(ps: BNPairingSpec, A):
    """B = A^2, D = B^2 * B (cyclotomic squares)."""
    tw = ps.tower
    B = tw.f12_cyclotomic_square(A)
    return B, tw.f12_mul(tw.f12_cyclotomic_square(B), B)


@functools.partial(jax.jit, static_argnums=(0,))
def _j_csq(ps: BNPairingSpec, a):
    return ps.tower.f12_cyclotomic_square(a)


@functools.partial(jax.jit, static_argnums=(0,))
def _j_tail(ps: BNPairingSpec, elt, B, D, E, G):
    """The mul/conjugate/frobenius tail of the hard-part chain
    (LastChunk:1236-1286) — cheap algebra, one small executable."""
    tw = ps.tower
    mul = tw.f12_mul
    conj = tw.f12_conjugate
    H = conj(D)
    I = conj(G)
    J = mul(I, E)
    K = mul(J, H)
    L_ = mul(K, B)
    M = mul(K, E)
    N = mul(M, elt)
    O = _frob_k(tw, L_, 1)
    P_ = mul(O, N)
    Q_ = _frob_k(tw, K, 2)
    R_ = mul(Q_, P_)
    S = conj(elt)
    T_ = mul(S, L_)
    U = _frob_k(tw, T_, 3)
    return mul(U, R_)


def final_exponentiation(ps: BNPairingSpec, f):
    """f^((q^12 - 1) / r) (ref finalExponentiation:1290).

    Easy part (FirstChunk:994): f^(q^6-1) then ^(q^2+1).
    Hard part (LastChunk:1200-1286): the devegili/zkcrypto BN chain with
    three cyclotomic exponentiations by -z.  The chain's exponent is
    d * (q^4 - q^2 + 1)/r with d = 2z(6z^2+3z+1) (verified symbolically;
    the reference computes the same chain at :1200-1286) — a harmless
    fixed power: the result is still a non-degenerate bilinear pairing
    and matches the reference bit for bit.  Composed from SMALL stage
    jits (easy part, ONE shared cyclotomic-exp executable, the
    square/tail glue) — the fused module exceeds this environment's TPU
    compile-helper memory cap; see bls12.final_exponentiation for the
    same decomposition on the BLS chain.  Batch padded to PAIR_BATCH.
    """
    from .bls12 import _pad_cols, _padded_n

    tw = ps.tower
    n = f.shape[-1]
    np_ = _padded_n(n)
    if np_ != n:
        f = _pad_cols(f, np_, fill=tw.f12_one((1,)))
    return _fe_impl(ps, f)[..., :n]


def _fe_impl(ps: BNPairingSpec, f):
    elt = _j_fe_easy(ps, f)
    A = _j_exp_nz(ps, elt)
    B, D = _j_bd(ps, A)
    E = _j_exp_nz(ps, D)
    F_ = _j_csq(ps, E)
    G = _j_exp_nz(ps, F_)
    return _j_tail(ps, elt, B, D, E, G)


def pairing(ps: BNPairingSpec, P, Q):
    """e(P, Q) batched (ref bn128 pairing:1368).  Stage jits, not one
    fused program — see bls12.pairing for the compile-size rationale."""
    return final_exponentiation(ps, miller_loop(ps, P, Q))


@functools.partial(jax.jit, static_argnums=(0,))
def _f12_product_tree(ps: BNPairingSpec, f):
    tw = ps.tower
    n = f.shape[1]
    while n > 1:
        half = n // 2
        prod = tw.f12_mul(f[:, :half], f[:, half : 2 * half])
        f = jnp.concatenate([prod, f[:, -1:]], axis=1) if n % 2 else prod
        n = half + (n % 2)
    return f


def pairing_eq(ps: BNPairingSpec, Ps, Qs):
    """prod_i e(P_i, Q_i) == 1 (ref pairingEq1-5 for bn128)."""
    from .bls12 import _pad_cols, _padded_n

    tw = ps.tower
    f = miller_loop(ps, Ps, Qs)
    f = _pad_cols(f, _padded_n(f.shape[-1]), fill=tw.f12_one((1,)))
    f = _f12_product_tree(ps, f)
    e = final_exponentiation(ps, f)
    one = tw.f12_one((1,))
    return jnp.all(e == one)


_bn254_spec = None


def get_bn254_spec() -> BNPairingSpec:
    global _bn254_spec
    if _bn254_spec is None:
        from ...models.curves import bn254, bn254_g2

        _bn254_spec = BNPairingSpec(g1=bn254, g2=bn254_g2, z=BN254_Z)
    return _bn254_spec


_toy_bn_spec = None


def get_toy_bn_spec() -> BNPairingSpec:
    """The 15-bit toy BN family (z = 5): the SAME pairing code at ~1000x
    smaller compile cost, used to keep the pairing + Groth16 composition
    in the fast CI tier (the full-width instantiations compile minutes
    and are covered by tools/check_pairing.py / check_groth16.py)."""
    global _toy_bn_spec
    if _toy_bn_spec is None:
        from ...models.curves import toy_bn, toy_bn_g2

        _toy_bn_spec = BNPairingSpec(g1=toy_bn, g2=toy_bn_g2, z=5, xi=(4, 1))
    return _toy_bn_spec
