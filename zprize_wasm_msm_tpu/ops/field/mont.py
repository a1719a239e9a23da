"""Vectorized Montgomery prime-field arithmetic on 16-bit limb vectors.

TPU-native re-design of the reference's Montgomery field layer
(wasmcurves/src/build_f1m.js — add:71, sub:91, mul:466 CIOS with the gnark
no-carry idea, square:779, inverse:1112, sqrt:1147, exp via
build_timesscalar.js, batchInverse via build_batchinverse.js).

Representation
--------------
A batch of field elements is a single ``uint32`` array of shape
``(L, *batch)`` — limbs first, batch last, little-endian 16-bit limbs.
Limb-first layout puts the batch on the TPU's (sublane, lane) grid so one
vector op advances every element of the batch by one limb step; the limb
loops below are static Python loops that unroll at trace time (the analog
of the reference's fully-unrolled WASM codegen).

Every function here is pure jnp, so the SAME code runs:
  * traced under ``jax.jit`` for the XLA elementwise-fusion path, and
  * inside Pallas kernel bodies, where the limb planes become VPU registers.

Accumulator discipline: 16x16 products are exact in uint32; lo/hi halves
(< 2^16) are accumulated redundantly.  Each accumulator position receives
at most ~4*L half-products + carries, staying far below 2^32 for L <= 48
(MNT6753's 768-bit field) — no 64-bit lanes needed.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .spec import LIMB_BITS, LIMB_MASK, FieldSpec

U32 = jnp.uint32


def _specjit(*static_argnums):
    """jit with the FieldSpec (and other host params) static.

    FieldSpec is frozen/hashable, so each prime gets its own compiled
    specialization — the runtime analog of the reference's per-prime
    codegen (build_f1m.js is invoked once per curve prime).
    """

    def deco(fn):
        jitted = jax.jit(fn, static_argnums=static_argnums)
        return functools.wraps(fn)(jitted)

    return deco


# ---------------------------------------------------------------------------
# small helpers
# ---------------------------------------------------------------------------


def _const(spec_limbs: np.ndarray, ndim_batch: int) -> jnp.ndarray:
    """Lift a host (L,) limb constant to an (L, 1, 1, ...) broadcastable."""
    arr = jnp.asarray(spec_limbs, dtype=U32)
    return arr.reshape(arr.shape + (1,) * ndim_batch)


def zeros(spec: FieldSpec, batch_shape=()) -> jnp.ndarray:
    return jnp.zeros((spec.n_limbs,) + tuple(batch_shape), dtype=U32)


def full_const(spec: FieldSpec, value: int, batch_shape=()) -> jnp.ndarray:
    """Broadcast a host integer (already in desired domain) to a batch."""
    from ...utils.bigint import int_to_limbs

    limbs = int_to_limbs(value, spec.n_limbs)
    return jnp.broadcast_to(
        _const(limbs, len(batch_shape)), (spec.n_limbs,) + tuple(batch_shape)
    )


def _ks_resolve(s: jnp.ndarray):
    """Kogge-Stone carry resolution of an (K, *batch) limb array.

    Input limbs must be < 2^17 (i.e. at most one pending carry bit each).
    Returns (canonical limbs < 2^16, carry_out in {0,1} of batch shape).

    Log-depth generate/propagate prefix via lax.associative_scan — the
    branch-free TPU replacement for the reference's serial ripple carries
    (build_int.js add:186-229); trace size O(log L) instead of O(L).
    """
    g = s >> LIMB_BITS  # in {0, 1}
    p = ((s & LIMB_MASK) == LIMB_MASK).astype(U32)

    def comb(a, b):
        ga, pa = a
        gb, pb = b
        return (gb | (pb & ga), pb & pa)

    gs, _ = jax.lax.associative_scan(comb, (g, p), axis=0)
    carry_in = jnp.concatenate([jnp.zeros_like(gs[:1]), gs[:-1]], axis=0)
    out = (s + carry_in) & LIMB_MASK
    return out, gs[-1]


def _resolve(acc: jnp.ndarray):
    """Resolve a redundant (K, *batch) accumulator (limbs < ~2^26) to
    canonical 16-bit limbs + carry_out.

    One local carry pass brings every limb below 2^17, then Kogge-Stone
    finishes.  carry_out collects both the local top carry and the KS one.
    """
    c = acc >> LIMB_BITS  # multi-bit carries
    s = (acc & LIMB_MASK) + jnp.concatenate(
        [jnp.zeros_like(c[:1]), c[:-1]], axis=0
    )
    out, ks_carry = _ks_resolve(s)
    return out, c[-1] + ks_carry


def _add_raw(a: jnp.ndarray, b: jnp.ndarray):
    """(a + b) over canonical limb arrays; returns (sum limbs, carry_out)."""
    return _ks_resolve(a + b)


def _sub_raw(a: jnp.ndarray, b: jnp.ndarray):
    """(a - b) mod R over canonical limb arrays; returns (diff, borrow).

    Two's complement: a + ~b + 1; borrow = 1 - carry_out.
    """
    s = a + (jnp.asarray(np.uint32(LIMB_MASK)) - b)
    s = s.at[0].add(1)
    out, carry = _ks_resolve(s)
    return out, jnp.asarray(np.uint32(1)) - carry


def _const_limb_col(values: np.ndarray, ndim_batch: int) -> jnp.ndarray:
    """(L,) host constants -> (L, 1, ..., 1) broadcastable device array."""
    arr = jnp.asarray(values, dtype=U32)
    return arr.reshape(arr.shape + (1,) * ndim_batch)


def _stack(limbs: Sequence[jnp.ndarray]) -> jnp.ndarray:
    return jnp.stack(limbs, axis=0)


def _select(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """mask is a boolean batch-shaped array; select limb-vectors a else b."""
    return jnp.where(mask[None], a, b)


# ---------------------------------------------------------------------------
# add / sub / neg (ref build_f1m.js:71-105)
# ---------------------------------------------------------------------------


@_specjit(0)
def add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod q, operands canonical < q."""
    s, _ = _add_raw(a, b)  # < 2q < R (FieldSpec asserts 2-bit headroom)
    return _cond_sub_q(spec, s)


def _cond_sub_q(spec: FieldSpec, s: jnp.ndarray) -> jnp.ndarray:
    """Given canonical limbs of s < 2q, return s mod q (branch-free select,
    the role of the reference's compare-subtract at build_f1m.js:668-776).

    Accepts L or L+1 limbs (q is zero-padded to match)."""
    K = s.shape[0]
    ql = np.zeros(K, dtype=np.uint32)
    ql[: spec.n_limbs] = spec.q_limbs
    qv = _const_limb_col(ql, s.ndim - 1)
    d, borrow = _sub_raw(s, jnp.broadcast_to(qv, s.shape))
    return _select(borrow == 0, d, s)


@_specjit(0)
def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod q, operands canonical < q."""
    d, borrow = _sub_raw(a, b)
    qv = _const_limb_col(spec.q_limbs, a.ndim - 1)
    t, _ = _add_raw(d, jnp.broadcast_to(qv, d.shape))  # wraps mod R
    return _select(borrow != 0, t, d)


@_specjit(0)
def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """(-a) mod q = q - a, with -0 = 0 (ref build_f1m.js neg)."""
    z = is_zero(spec, a)
    qv = _const_limb_col(spec.q_limbs, a.ndim - 1)
    d, _ = _sub_raw(jnp.broadcast_to(qv, a.shape), a)
    return _select(z, jnp.zeros_like(a), d)


@_specjit(0)
def double(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return add(spec, a, a)


# ---------------------------------------------------------------------------
# Montgomery multiplication (ref build_f1m.js:466-777 CIOS; word size 16)
# ---------------------------------------------------------------------------


def _mont_reduce_acc(spec: FieldSpec, acc: jnp.ndarray) -> jnp.ndarray:
    """Montgomery-reduce a redundant (2L+2, *batch) product accumulator.

    Word-serial reduction (the 16-bit-limb analog of the reference's CIOS,
    build_f1m.js:466-777): L rounds, each clearing one low limb with a
    vectorized m*q row update — trace size O(L), work O(L^2 * batch).
    """
    L = spec.n_limbs
    np16 = np.uint32(spec.np16)
    qv = _const_limb_col(spec.q_limbs, acc.ndim - 1)  # (L, 1...)
    for i in range(L):
        # m depends on acc[i] mod 2^16 only; the u32 wraparound of the
        # product preserves the low 16 bits, so no pre-masking is needed.
        m = (acc[i] * np16) & LIMB_MASK
        p = m[None] * qv  # (L, batch)
        acc = acc.at[i : i + L].add(p & LIMB_MASK)
        acc = acc.at[i + 1 : i + L + 1].add(p >> LIMB_BITS)
        # acc[i] is now ≡ 0 mod 2^16; push its carry and retire it
        acc = acc.at[i + 1].add(acc[i] >> LIMB_BITS)
    res, _ = _resolve(acc[L : 2 * L + 1])  # value < 2q -> L+1 limbs, top in {0,1}
    return _cond_sub_q(spec, res)[:L]


@_specjit(0)
def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod q.  Operands canonical < q.

    Row-vectorized schoolbook product with redundant uint32 accumulation
    followed by a word-serial Montgomery reduction — the 16-bit-limb VPU
    equivalent of the reference's 32-bit-word CIOS (build_f1m.js:466-777).
    Each of the 2L trace-time rounds is a vector op over the full (L, batch)
    plane, so the traced graph is O(L) (it was O(L^2) when fully unrolled:
    106 s to compile ONE group add on CPU; this form is ~40x smaller).

    Overflow discipline: acc[k] collects <= 2L lo/hi halves (< 2^16) from
    the product phase plus <= 2L from reduction plus carries — below
    2^16 * 4L + 2^8, safe in uint32 for L <= 512.
    """
    L = spec.n_limbs
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    acc = jnp.zeros((2 * L + 2,) + batch, dtype=U32)
    for i in range(L):
        p = a[i][None] * b  # (L, batch), exact 16x16 -> 32
        acc = acc.at[i : i + L].add(p & LIMB_MASK)
        acc = acc.at[i + 1 : i + L + 1].add(p >> LIMB_BITS)
    return _mont_reduce_acc(spec, acc)


@_specjit(0)
def mont_square(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery squaring.  Uses the asymmetric-doubling trick
    (ref build_f1m.js:779-1076): off-diagonal products counted once and
    doubled, nearly halving the multiply count vs mont_mul.
    """
    L = spec.n_limbs
    batch = a.shape[1:]
    acc = jnp.zeros((2 * L + 2,) + batch, dtype=U32)
    for i in range(L):
        p = a[i][None] * a[i:]  # (L-i, batch): diagonal + upper triangle
        lo = p & LIMB_MASK
        hi = p >> LIMB_BITS
        if L - i > 1:  # double the off-diagonal terms (stay < 2^17)
            lo = jnp.concatenate([lo[:1], lo[1:] << 1], axis=0)
            hi = jnp.concatenate([hi[:1], hi[1:] << 1], axis=0)
        acc = acc.at[2 * i : i + L].add(lo)
        acc = acc.at[2 * i + 1 : i + L + 1].add(hi)
    return _mont_reduce_acc(spec, acc)


@_specjit(0)
def reduce_redundant(spec: FieldSpec, acc: jnp.ndarray) -> jnp.ndarray:
    """Reduce a redundant multi-limb accumulator to a canonical element.

    acc: (K, *batch) uint32 with K >= L; limbs may hold up to ~2^26 (e.g.
    the raw u32 sum of up to 2^10 canonical elements).  Interpreting acc in
    the SAME domain as its summands (so: Montgomery in, Montgomery out),
    returns acc mod q as canonical (L, *batch) limbs.

    Used by the sparse linear-combination kernels (ops.poly.pol/qap): a
    segment/scatter sum runs in raw u32, then ONE modular reduction per
    output replaces per-term modular adds.
    """
    L = spec.n_limbs
    K = acc.shape[0]
    assert K <= 2 * L, "accumulator wider than 2L limbs"
    # pad to 2L+2 and Montgomery-reduce -> value * R^{-1} mod q
    pad = 2 * L + 2 - K
    wide = jnp.concatenate(
        [acc] + ([jnp.zeros((pad,) + acc.shape[1:], U32)] if pad else []), axis=0
    )
    reduced = _mont_reduce_acc(spec, wide)  # acc * R^{-1} mod q
    # multiply back by R (mont_mul by R^2 gives acc mod q)
    r2 = jnp.broadcast_to(_const(spec.r2_limbs, reduced.ndim - 1), reduced.shape)
    return mont_mul(spec, reduced, r2)


# ---------------------------------------------------------------------------
# domain conversion
# ---------------------------------------------------------------------------


@_specjit(0)
def to_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """a -> a*R mod q (ref build_f1m.js:1089)."""
    r2 = jnp.broadcast_to(_const(spec.r2_limbs, a.ndim - 1), a.shape)
    return mont_mul(spec, a, r2)


@_specjit(0)
def from_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """a -> a*R^{-1} mod q (ref build_f1m.js:1100) — multiply by 1."""
    one = jnp.zeros_like(a).at[0].set(1)
    return mont_mul(spec, a, one)


def one_mont(spec: FieldSpec, batch_shape=()) -> jnp.ndarray:
    return jnp.broadcast_to(
        _const(spec.one_mont_limbs, len(batch_shape)),
        (spec.n_limbs,) + tuple(batch_shape),
    )


# ---------------------------------------------------------------------------
# predicates
# ---------------------------------------------------------------------------


@_specjit(0)
def is_zero(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    acc = a[0]
    for i in range(1, spec.n_limbs):
        acc = acc | a[i]
    return acc == 0


@_specjit(0)
def eq(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    acc = a[0] ^ b[0]
    for i in range(1, spec.n_limbs):
        acc = acc | (a[i] ^ b[i])
    return acc == 0


@_specjit(0)
def sign(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Sign convention of build_f1m.js sign:135: 0 for zero, -1 if the
    standard-domain value is > (q-1)/2, else +1.  a is Montgomery."""
    std = from_mont(spec, a)
    half_plus1 = (spec.q - 1) // 2 + 1
    from ...utils.bigint import int_to_limbs

    hv = _const_limb_col(int_to_limbs(half_plus1, spec.n_limbs), a.ndim - 1)
    _, borrow = _sub_raw(std, jnp.broadcast_to(hv, std.shape))
    is_neg = borrow == 0  # std >= (q+1)/2
    z = is_zero(spec, a)
    out = jnp.where(is_neg, jnp.int32(-1), jnp.int32(1))
    return jnp.where(z, jnp.int32(0), out)


@_specjit(0)
def is_negative(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """build_f1m.js isNegative:120 — True iff sign == -1."""
    return sign(spec, a) == -1


# ---------------------------------------------------------------------------
# exponentiation / inverse / sqrt
# ---------------------------------------------------------------------------


@_specjit(0, 2)
def exp_const(spec: FieldSpec, a: jnp.ndarray, e: int) -> jnp.ndarray:
    """a^e for a host-known exponent, a in Montgomery form.

    MSB-first square-and-multiply (ref build_timesscalar.js) driven by a
    lax.fori_loop over a device-resident bit array, so the traced graph has
    ONE square+mul body regardless of exponent size.
    """
    if e == 0:
        return one_mont(spec, a.shape[1:])
    nbits = e.bit_length()
    bits = np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], np.uint32)
    bits = jnp.asarray(bits)

    def body(i, acc):
        acc = mont_square(spec, acc)
        with_mul = mont_mul(spec, acc, a)
        return _select(bits[i] == 1, with_mul, acc)

    # first bit is always 1, so the accumulator starts as a
    return jax.lax.fori_loop(1, nbits, body, a)


@_specjit(0)
def exp(spec: FieldSpec, a: jnp.ndarray, e: jnp.ndarray) -> jnp.ndarray:
    """a^e for a DEVICE-resident exponent (the reference's runtime f1m_exp,
    build_timesscalar.js wired at build_f1m.js:1375-1384).

    a: (L, *batch) Montgomery; e: (Le, *batch) uint32 16-bit limbs
    (standard domain, little-endian) — per-lane exponents.
    MSB-first square-and-multiply over all Le*16 bits, branch-free.
    """
    Le = e.shape[0]
    nbits = Le * 16
    batch = a.shape[1:]
    acc = one_mont(spec, batch)
    # bits MSB-first: reverse limb order, walk bits 15..0 within each limb
    shifts = jnp.asarray(
        np.arange(15, -1, -1, dtype=np.uint32).reshape((1, 16) + (1,) * len(batch))
    )
    bits = (jnp.flip(e, axis=0)[:, None] >> shifts) & 1
    bits = bits.reshape((nbits,) + batch)

    def body(i, acc):
        acc = mont_square(spec, acc)
        with_mul = mont_mul(spec, acc, a)
        return _select(bits[i] == 1, with_mul, acc)

    return jax.lax.fori_loop(0, nbits, body, acc)


@_specjit(0)
def inverse(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """a^{-1} in Montgomery form via Fermat: a^(q-2).

    (The reference uses extended Euclid through int inverseMod,
    build_f1m.js:1112-1122; data-dependent Euclid iteration counts are
    hostile to SIMT/XLA so the TPU design uses a fixed exponentiation.)
    Returns 0 for input 0 (matching batchInverse's zero handling).
    """
    return exp_const(spec, a, spec.q - 2)


@_specjit(0)
def sqrt(spec: FieldSpec, a: jnp.ndarray):
    """Square root in Montgomery form (Tonelli-Shanks,
    ref build_f1m.js:1147-1215).  Returns (root, has_root mask).

    For q ≡ 3 (mod 4) this is a single exponentiation a^((q+1)/4); the
    general case runs the fixed-bound Tonelli-Shanks loop with masks.
    """
    if spec.q % 4 == 3:
        r = exp_const(spec, a, (spec.q + 1) // 4)
    else:
        r = _tonelli_shanks(spec, a)
    ok = eq(spec, mont_square(spec, r), a)
    ok = ok | is_zero(spec, a)
    return r, ok


def _tonelli_shanks(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Fixed-bound, branch-free Tonelli-Shanks (ref build_f1m.js:1147-1215).

    Classic loop state (x, w, c, m); every data-dependent inner loop is
    unrolled to the static bound s with masks, so all lanes run identical
    code.  m tracks the shrinking 2-order bound exactly as in the classic
    algorithm.
    """
    s, t, q = spec.sqrt_s, spec.sqrt_t, spec.q
    batch = a.shape[1:]
    # codegen-time constants, as the reference precomputes (build_f1m.js:1127)
    z = spec.to_mont_int(pow(spec.nqr, t, q))  # generator of the 2-Sylow
    c = full_const(spec, z, batch)
    x = exp_const(spec, a, (t + 1) // 2)
    w = exp_const(spec, a, t)
    one = one_mont(spec, batch)
    m0 = jnp.full(batch, np.uint32(s), dtype=U32)

    def outer(_, state):
        x, w, c, m = state
        done = eq(spec, w, one)
        # j = least j with w^(2^j) == 1, via masked squaring chain
        wj = w
        j = jnp.zeros(batch, dtype=U32)
        found = eq(spec, wj, one)
        for _k in range(s):
            not_found = ~found
            wj = _select(not_found, mont_square(spec, wj), wj)
            j = j + not_found.astype(U32)
            found = found | eq(spec, wj, one)
        # b = c^(2^(m-j-1)) via masked repeated squaring
        b = c
        nsq = m - j - 1  # valid only where ~done (j < m there)
        for k in range(s):
            do = (jnp.asarray(np.uint32(k)) < nsq) & ~done
            b = _select(do, mont_square(spec, b), b)
        b2 = mont_square(spec, b)
        x = _select(~done, mont_mul(spec, x, b), x)
        w = _select(~done, mont_mul(spec, w, b2), w)
        c = _select(~done, b2, c)
        m = jnp.where(done, m, j)
        return (x, w, c, m)

    x, w, c, m = jax.lax.fori_loop(0, s, outer, (x, w, c, m0))
    return x


# ---------------------------------------------------------------------------
# batch inverse (Montgomery's trick, ref build_batchinverse.js)
# ---------------------------------------------------------------------------


@_specjit(0, 2)
def batch_inverse(spec: FieldSpec, a: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Elementwise inverse of a batch with ONE field inversion.

    Blocked Montgomery's trick (ref build_batchinverse.js:43-127): the batch
    is reshaped into ~sqrt(n) blocks of ~sqrt(n) elements; forward prefix
    products run vectorized across blocks (lax.scan over the block length),
    block totals chain serially, one Fermat inversion of the grand total,
    then the mirrored backward passes emit every inverse.  2*(M+K) serial
    steps instead of the reference's 2n.  Zeros pass through as 0.

    ``axis`` is accepted for API parity; every element is inverted
    independently so the scan order is irrelevant to the result.
    """
    del axis  # result is order-independent
    L = spec.n_limbs
    z = is_zero(spec, a)
    a1 = _select(z, one_mont(spec, a.shape[1:]), a)

    batch_shape = a.shape[1:]
    n = int(np.prod(batch_shape)) if batch_shape else 1
    M = max(1, 1 << ((n.bit_length() + 1) // 2))  # block length ~ sqrt(n)
    K = -(-n // M)  # number of blocks
    flat = a1.reshape(L, n)
    pad = M * K - n
    if pad:
        flat = jnp.concatenate([flat, one_mont(spec, (pad,))], axis=1)
    x = flat.reshape(L, K, M)
    xm = jnp.moveaxis(x, 2, 0)  # (M, L, K): scan over block position

    ones_lk = one_mont(spec, (K,))

    # forward within-block inclusive prefixes P[m] and block totals
    def fwd(carry, row):
        p = mont_mul(spec, carry, row)
        return p, p

    tot, P = jax.lax.scan(fwd, ones_lk, xm)  # tot (L,K); P (M,L,K)

    # block-level exclusive prefixes B[k] (serial over K, width-1 muls)
    def blk_fwd(carry, tk):
        return mont_mul(spec, carry, tk), carry

    grand, B = jax.lax.scan(blk_fwd, one_mont(spec, ()), jnp.moveaxis(tot, 1, 0))
    B = jnp.moveaxis(B, 1, 0)  # (L, K)

    inv_grand = inverse(spec, grand)

    # block-level backward: I[k] = inv(B[k] * tot[k]), emitted pre-multiply
    def blk_bwd(carry, tk):
        return mont_mul(spec, carry, tk), carry

    _, I = jax.lax.scan(
        blk_bwd, inv_grand, jnp.moveaxis(tot, 1, 0), reverse=True
    )
    I = jnp.moveaxis(I, 1, 0)  # (L, K)

    # within-block backward: invFP[m] = inv(B[k] * P[m,k])
    def bwd(carry, row):
        return mont_mul(spec, carry, row), carry

    _, invFP = jax.lax.scan(bwd, I, xm, reverse=True)  # (M, L, K)

    # inv(a[m,k]) = B[k] * P[m-1,k] * invFP[m,k]   (limb axis first: (L, M, K))
    P_exc = jnp.moveaxis(jnp.concatenate([ones_lk[None], P[:-1]], axis=0), 1, 0)
    fp_prev = mont_mul(spec, P_exc, B[:, None, :])
    inv = mont_mul(spec, fp_prev, jnp.moveaxis(invFP, 1, 0))  # (L, M, K)

    inv = jnp.moveaxis(inv, 1, 2).reshape(L, K * M)[:, :n]
    inv = inv.reshape((L,) + batch_shape)
    return _select(z, jnp.zeros_like(a), inv)
