"""Optimal-ate pairing for BLS12 curves, batched over (P, Q) pairs.

TPU-native re-design of the reference's pairing
(wasmcurves/src/bls12381/build_bls12381.js — prepareG1:321,
prepDblStep:335, prepAddStep:448, prepareG2:576, ell:789, millerLoop:841,
finalExponentiation:1181, cyclotomicSquare:1008; ate loop constant
x = -0xd201000000010000 at :254-256, finalExpZ at :267).

Structure mapping:
  prepareG2 + millerLoop   -> ONE lax.scan over the 62 interior bits of
                              |x| carrying (R, f): each step runs the
                              Jacobian doubling step, the line evaluation
                              (sparse f12 mul014), a masked addition step,
                              and the f^2 — identical op order to the
                              reference's coefficient stream, but fused so
                              no coefficient array is materialized and the
                              whole pair batch advances per step.
  finalExponentiation      -> easy part exactly as the reference
                              (conjugate, one f12 inverse, frobenius^2),
                              hard part as a plain square-and-multiply by
                              (q^4 - q^2 + 1)/r driven by a lax.fori_loop
                              over a host bit table.  (The reference's
                              cyclotomic-exp chain is an optimization of
                              the same exponent; cyclotomic_square is
                              provided in ops.pairing.tower for parity.)

All values Montgomery; G1 points are affine (L, N) pairs, G2 points
affine (2L, N) pairs, pairing results (12L, N).
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
from ..field.tower import Fq2
from .tower import Tower

#: BLS parameter; the ate loop count is |x| and x < 0 for BLS12-381
BLS12_381_X = -0xD201000000010000


@dataclass(frozen=True)
class PairingSpec:
    g1: CurveSpec
    g2: CurveSpec
    x: int  # signed BLS parameter

    @cached_property
    def tower(self) -> Tower:
        return Tower(self.g1.fq)

    @cached_property
    def loop_bits(self) -> Tuple[int, ...]:
        """LSB-first bits of |x| (ref `bits()` at build_bls12381.js:300)."""
        n = abs(self.x)
        return tuple((n >> i) & 1 for i in range(n.bit_length()))


def _f2_scale_fq(spec, a2, s):
    """Scale an Fq2 batch (2L, N) componentwise by an Fq batch (L, N)."""
    L = spec.n_limbs
    return jnp.concatenate(
        [mont.mont_mul(spec, a2[:L], s), mont.mont_mul(spec, a2[L:], s)]
    )


def _dbl_step(F2: Fq2, R):
    """Jacobian doubling + line coefficients (ref prepDblStep:335).

    R = (Rx, Ry, Rz) over Fq2.  Returns (R', (coef_a, coef_b, coef_c))
    with ell consuming c4 = coef_a * P.y, c1 = coef_b * P.x, c0 = coef_c.
    """
    Rx, Ry, Rz = R
    t0 = F2.square(Rx)
    t1 = F2.square(Ry)
    t2 = F2.square(t1)
    t3 = F2.sub(F2.sub(F2.square(F2.add(t1, Rx)), t0), t2)
    t3 = F2.add(t3, t3)
    t4 = F2.add(F2.add(t0, t0), t0)
    t6 = F2.add(Rx, t4)
    t5 = F2.square(t4)
    zsq = F2.square(Rz)
    nRx = F2.sub(F2.sub(t5, t3), t3)
    nRz = F2.sub(F2.sub(F2.square(F2.add(Rz, Ry)), t1), zsq)
    nRy = F2.mul(F2.sub(t3, nRx), t4)
    t2_8 = F2.add(t2, t2)
    t2_8 = F2.add(t2_8, t2_8)
    t2_8 = F2.add(t2_8, t2_8)
    nRy = F2.sub(nRy, t2_8)
    coef_b = F2.mul(t4, zsq)
    coef_b = F2.neg(F2.add(coef_b, coef_b))
    t6 = F2.sub(F2.sub(F2.square(t6), t0), t5)
    t1_4 = F2.add(t1, t1)
    t1_4 = F2.add(t1_4, t1_4)
    coef_c = F2.sub(t6, t1_4)
    coef_a = F2.mul(nRz, zsq)
    coef_a = F2.add(coef_a, coef_a)
    return (nRx, nRy, nRz), (coef_a, coef_b, coef_c)


def _add_step(F2: Fq2, R, Q):
    """Jacobian mixed addition + line coefficients (ref prepAddStep:448)."""
    Rx, Ry, Rz = R
    Qx, Qy = Q
    zsq = F2.square(Rz)
    ysq = F2.square(Qy)
    t0 = F2.mul(zsq, Qx)
    t1 = F2.mul(
        F2.sub(F2.sub(F2.square(F2.add(Qy, Rz)), ysq), zsq), zsq
    )
    t2 = F2.sub(t0, Rx)
    t3 = F2.square(t2)
    t4 = F2.add(t3, t3)
    t4 = F2.add(t4, t4)
    t5 = F2.mul(t4, t2)
    t6 = F2.sub(F2.sub(t1, Ry), Ry)
    t9 = F2.mul(t6, Qx)
    t7 = F2.mul(t4, Rx)
    nRx = F2.sub(F2.sub(F2.sub(F2.square(t6), t5), t7), t7)
    nRz = F2.sub(F2.sub(F2.square(F2.add(Rz, t2)), zsq), t3)
    t10 = F2.add(Qy, nRz)
    t8 = F2.mul(F2.sub(t7, nRx), t6)
    t0b = F2.mul(Ry, t5)
    t0b = F2.add(t0b, t0b)
    nRy = F2.sub(t8, t0b)
    t10 = F2.sub(F2.square(t10), ysq)
    t10 = F2.sub(t10, F2.square(nRz))
    t9 = F2.sub(F2.add(t9, t9), t10)
    coef_a = F2.add(nRz, nRz)  # t10 in the reference
    coef_b = F2.add(F2.neg(t6), F2.neg(t6))  # t1 in the reference
    coef_c = t9
    return (nRx, nRy, nRz), (coef_a, coef_b, coef_c)


def _ell(tw: Tower, f, coefs, Px, Py):
    """Line evaluation folded into f (ref ell:789)."""
    spec = tw.spec
    coef_a, coef_b, coef_c = coefs
    c4 = _f2_scale_fq(spec, coef_a, Py)
    c1 = _f2_scale_fq(spec, coef_b, Px)
    return tw.f12_mul014(f, coef_c, c1, c4)


#: canonical pair-batch quantum: every pairing entry point pads its batch
#: to a multiple of this, so the Groth16 verifier (4 pairs), bilinearity
#: tests (<= 8 pairs) and witness tools all reuse ONE compiled instance
#: of each stage executable — compiles (minutes at full width) and
#: tunnel executable-loads (~10 s each) are paid once per shape family.
PAIR_BATCH = 8


def _pad_cols(a, n_to, fill=None):
    """Pad the last axis to n_to columns (zeros, or broadcast fill)."""
    n = a.shape[-1]
    if n == n_to:
        return a
    if fill is None:
        pad = jnp.zeros(a.shape[:-1] + (n_to - n,), a.dtype)
    else:
        pad = jnp.broadcast_to(fill, a.shape[:-1] + (n_to - n,))
    return jnp.concatenate([a, pad], axis=-1)


def _padded_n(n: int) -> int:
    return -(-n // PAIR_BATCH) * PAIR_BATCH


def miller_loop(ps, P, Q):
    """Batched Miller loop: P affine G1 (L, N) x2; Q affine G2 (2L, N) x2.

    Returns f in Fq12, (12L, N).  Pairs with P or Q at infinity yield 1.
    Pads the pair batch to PAIR_BATCH internally (infinity pairs -> 1)."""
    n = P[0].shape[-1]
    np_ = _padded_n(n)
    if np_ != n:
        P = tuple(_pad_cols(a, np_) for a in P)
        Q = tuple(_pad_cols(a, np_) for a in Q)
    f = _j_miller(ps, P, Q)
    return f[..., :n]


@functools.partial(jax.jit, static_argnums=(0,))
def _j_miller(ps: PairingSpec, P, Q):
    tw = ps.tower
    F2 = tw.f2
    Px, Py = P
    Qx, Qy = Q
    batch = Px.shape[1:]
    bits = ps.loop_bits  # LSB-first; bits[-1] == 1

    R = (Qx, Qy, F2.one(batch))
    f = tw.f12_one(batch)

    xs = jnp.asarray(
        np.array([bits[i] for i in range(len(bits) - 2, 0, -1)], np.int32)
    )

    def body(carry, bit):
        R, f = carry
        R, dcoef = _dbl_step(F2, R)
        f = _ell(tw, f, dcoef, Px, Py)
        Ra, acoef = _add_step(F2, R, (Qx, Qy))
        fa = _ell(tw, f, acoef, Px, Py)
        do_add = bit == 1
        R = tuple(F2.select(do_add, a, b) for a, b in zip(Ra, R))
        f = jnp.where(do_add[None], fa, f)
        f = tw.f12_square(f)
        return (R, f), None

    (R, f), _ = jax.lax.scan(body, (R, f), xs)
    R, dcoef = _dbl_step(F2, R)
    f = _ell(tw, f, dcoef, Px, Py)
    if ps.x < 0:  # ref isLoopNegative (build_bls12381.js:257)
        f = tw.f12_conjugate(f)

    # infinity handling (ref millerLoop early returns)
    inf = (
        (mont.is_zero(tw.spec, Px) & mont.is_zero(tw.spec, Py))
        | (F2.is_zero(Qx) & F2.is_zero(Qy))
    )
    return jnp.where(inf[None], tw.f12_one(batch), f)


@functools.lru_cache(maxsize=None)
def _hard_exp_bits(q: int, r: int) -> Tuple[int, ...]:
    """MSB-first bits of the hard-part exponent (q^4 - q^2 + 1) / r."""
    e, rem = divmod(q**4 - q**2 + 1, r)
    assert rem == 0, "r must divide the 12th cyclotomic polynomial at q"
    n = e.bit_length()
    return tuple((e >> (n - 1 - i)) & 1 for i in range(n))


@functools.lru_cache(maxsize=None)
def _naf_digits_msb(n: int) -> Tuple[int, ...]:
    """Non-adjacent form of n > 0, MSB-first (ref naf() helper used by
    buildCyclotomicExp, build_bls12381.js:1117)."""
    digs = []
    while n:
        if n & 1:
            d = 2 - (n % 4)  # 1 or -1
            digs.append(d)
            n -= d
        else:
            digs.append(0)
        n >>= 1
    return tuple(reversed(digs))


def _cyclotomic_exp(tw: Tower, f, e_abs: int, negative: bool):
    """f^(±e_abs) for f in the cyclotomic subgroup: NAF square-and-multiply
    with Granger-Scott squarings; inversion is conjugation there
    (ref __cyclotomicExp_w0, build_bls12381.js:1117-1178)."""
    digs = _naf_digits_msb(e_abs)
    assert digs[0] == 1
    darr = jnp.asarray(np.array(digs, np.int32))
    inv = tw.f12_conjugate(f)

    def body(i, res):
        res = tw.f12_cyclotomic_square(res)
        m1 = tw.f12_mul(res, f)
        m2 = tw.f12_mul(res, inv)
        d = darr[i]
        return jnp.where((d == 1)[None], m1, jnp.where((d == -1)[None], m2, res))

    res = jax.lax.fori_loop(1, len(digs), body, f)
    return tw.f12_conjugate(res) if negative else res


def _frob_k(tw: Tower, a, k: int):
    for _ in range(k):
        a = tw.f12_frobenius(a)
    return a


@functools.partial(jax.jit, static_argnums=(0,))
def _j_fe_easy(ps: PairingSpec, f):
    """Easy part: f^((q^6-1)(q^2+1))."""
    tw = ps.tower
    t2 = tw.f12_mul(tw.f12_conjugate(f), tw.f12_inverse(f))
    return tw.f12_mul(_frob_k(tw, t2, 2), t2)


@functools.partial(jax.jit, static_argnums=(0,))
def _j_cyc_exp(ps: PairingSpec, a):
    """a^|x| (conjugated for x < 0) — ONE compiled instance reused for
    all four hard-part exponentiations."""
    return _cyclotomic_exp(ps.tower, a, abs(ps.x), ps.x < 0)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _j_frob_mul(ps: PairingSpec, a, k: int, b):
    """frobenius^k(a) * b (k=0: plain product)."""
    tw = ps.tower
    return tw.f12_mul(_frob_k(tw, a, k) if k else a, b)


@functools.partial(jax.jit, static_argnums=(0, 2))
def _j_csq(ps: PairingSpec, a, conj: bool):
    tw = ps.tower
    s = tw.f12_cyclotomic_square(a)
    return tw.f12_conjugate(s) if conj else s


def final_exponentiation(ps: PairingSpec, f):
    """Pads the batch to PAIR_BATCH (f = 1 columns pass through as 1),
    then runs the stage chain; see _final_exponentiation_impl."""
    tw = ps.tower
    n = f.shape[-1]
    np_ = _padded_n(n)
    if np_ != n:
        f = _pad_cols(f, np_, fill=tw.f12_one((1,)))
    return _final_exponentiation_impl(ps, f)[..., :n]


def _final_exponentiation_impl(ps: PairingSpec, f):
    """f^((q^12 - 1) / r) (ref finalExponentiation:1181-1290).

    Easy part: f^(q^6-1) = conj(f) * f^-1, then ^(q^2+1) via frobenius^2.
    Hard part: the reference's zkcrypto-style addition chain — four
    cyclotomic exponentiations by the BLS parameter w0 = |x| plus
    frobenius powers — ~260 cyclotomic squarings instead of ~1505
    generic square-and-multiply steps (build_bls12381.js:1183-1290, w0
    at :267).  Composed from SMALL stage jits (easy part, one shared
    cyclotomic-exp executable, frobenius-multiply) — the fused module
    exceeds this environment's TPU compile-helper memory cap.
    """
    tw = ps.tower
    t2 = _j_fe_easy(ps, f)

    # hard part (formula sequence of build_bls12381.js:1229-1289)
    t1 = _j_csq(ps, t2, True)
    t3 = _j_cyc_exp(ps, t2)
    t4 = _j_csq(ps, t3, False)
    t5 = _j_frob_mul(ps, t1, 0, t3)
    t1 = _j_cyc_exp(ps, t5)
    t0 = _j_cyc_exp(ps, t1)
    t6 = _j_cyc_exp(ps, t0)
    t6 = _j_frob_mul(ps, t6, 0, t4)
    t4 = _j_cyc_exp(ps, t6)
    t5 = tw.f12_conjugate(t5)  # sign flips: cheap eager
    t4 = _j_frob_mul(ps, _j_frob_mul(ps, t4, 0, t5), 0, t2)
    t5 = tw.f12_conjugate(t2)
    t1 = _j_frob_mul(ps, t1, 0, t2)
    t6 = _j_frob_mul(ps, t6, 0, t5)
    t3 = _j_frob_mul(ps, t3, 0, t0)
    t1 = _j_frob_mul(ps, t1, 3, tw.f12_one(t1.shape[1:]))
    t6 = _j_frob_mul(ps, t6, 1, tw.f12_one(t6.shape[1:]))
    t3 = _j_frob_mul(ps, t3, 2, t1)
    t3 = _j_frob_mul(ps, t3, 0, t6)
    return _j_frob_mul(ps, t3, 0, t4)


@functools.partial(jax.jit, static_argnums=(0,))
def final_exponentiation_plain(ps: PairingSpec, f):
    """Reference-free oracle: plain square-and-multiply by the hard
    exponent (q^4 - q^2 + 1)/r after the same easy part.  Kept as the
    differential check for the fast chain (and as the general-curve
    fallback; the w0 chain is BLS-family-specific)."""
    tw = ps.tower
    q = ps.g1.q
    t = tw.f12_mul(tw.f12_conjugate(f), tw.f12_inverse(f))
    t = tw.f12_mul(_frob_k(tw, t, 2), t)
    bits = _hard_exp_bits(q, ps.g1.r)
    bit_arr = jnp.asarray(np.array(bits, np.uint32))

    def body(i, acc):
        acc = tw.f12_square(acc)
        with_mul = tw.f12_mul(acc, t)
        return jnp.where((bit_arr[i] == 1)[None], with_mul, acc)

    return jax.lax.fori_loop(1, len(bits), body, t)


def pairing(ps: PairingSpec, P, Q):
    """e(P, Q) batched (ref pairing:1597).

    NOT one fused jit: miller_loop and final_exponentiation compile as
    separate executables — the composed module exceeds this
    environment's TPU compile-helper memory cap (SIGKILL) and was
    measured at hours / >100 GB on XLA:CPU; the stage jits compile in
    minutes each."""
    return final_exponentiation(ps, miller_loop(ps, P, Q))


@functools.partial(jax.jit, static_argnums=(0,))
def _f12_product_tree(ps: PairingSpec, f):
    """Log-depth product over the pair axis: (12L, N) -> (12L, 1)."""
    tw = ps.tower
    n = f.shape[1]
    while n > 1:
        half = n // 2
        prod = tw.f12_mul(f[:, :half], f[:, half : 2 * half])
        f = jnp.concatenate([prod, f[:, -1:]], axis=1) if n % 2 else prod
        n = half + (n % 2)
    return f


def pairing_eq(ps: PairingSpec, Ps, Qs):
    """prod_i e(P_i, Q_i) == 1 (the ref's pairingEq1-5:1592-1596).

    Ps/Qs are batches; miller loops run batched, the product is folded
    log-depth, and ONE final exponentiation finishes.  Runs as THREE
    stage executables (see pairing) rather than one fused jit.
    Returns a scalar bool.
    """
    tw = ps.tower
    f = miller_loop(ps, Ps, Qs)  # (12L, N)
    # pad with ones to the canonical batch so the product tree compiles
    # once per batch family (padding columns multiply in as identity)
    f = _pad_cols(f, _padded_n(f.shape[-1]), fill=tw.f12_one((1,)))
    f = _f12_product_tree(ps, f)
    e = final_exponentiation(ps, f)
    one = tw.f12_one((1,))
    return jnp.all(e == one)


bls12_381_pairing_spec = None  # set lazily below


def get_bls12_381_spec() -> PairingSpec:
    global bls12_381_pairing_spec
    if bls12_381_pairing_spec is None:
        from ...models.curves import bls12_381, bls12_381_g2

        bls12_381_pairing_spec = PairingSpec(
            g1=bls12_381, g2=bls12_381_g2, x=BLS12_381_X
        )
    return bls12_381_pairing_spec
