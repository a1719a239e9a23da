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


def _carry_propagate(limbs: List[jnp.ndarray]):
    """Resolve a redundant limb list to canonical 16-bit limbs + carry-out."""
    out = []
    carry = None
    for x in limbs:
        s = x if carry is None else x + carry
        out.append(s & LIMB_MASK)
        carry = s >> LIMB_BITS
    return out, carry


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
    L = spec.n_limbs
    raw = [a[i] + b[i] for i in range(L)]
    s, _ = _carry_propagate(raw)  # < 2q < R, carry-out 0
    return _cond_sub_q(spec, s)


def _cond_sub_q(spec: FieldSpec, s: List[jnp.ndarray]) -> jnp.ndarray:
    """Given canonical limbs of s < 2q, return s mod q (branch-free).

    Adds R - q; carry out of the top limb <=> s >= q (ref conditional
    subtract at build_f1m.js:668-776, here as a select).
    """
    L = spec.n_limbs
    rmq = (spec.R - spec.q)  # R - q
    from ...utils.bigint import int_to_limbs

    rmq_limbs = int_to_limbs(rmq, L)
    nd = s[0].ndim
    t = [s[i] + jnp.asarray(np.uint32(rmq_limbs[i])) for i in range(L)]
    t, carry = _carry_propagate(t)
    ge = carry.astype(jnp.bool_)  # s >= q
    return _select(ge, _stack(t), _stack(s))


@_specjit(0)
def sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod q, operands canonical < q."""
    L = spec.n_limbs
    d = []
    borrow = None
    for i in range(L):
        x = a[i] + jnp.asarray(np.uint32(1 << LIMB_BITS)) - b[i]
        if borrow is not None:
            x = x - borrow
        d.append(x & LIMB_MASK)
        borrow = jnp.asarray(np.uint32(1)) - (x >> LIMB_BITS)
    underflow = borrow.astype(jnp.bool_)
    # if underflow: result = d + q (propagates, no carry-out since result < q)
    ql = spec.q_limbs
    t = [d[i] + jnp.asarray(np.uint32(ql[i])) for i in range(L)]
    t, _ = _carry_propagate(t)
    return _select(underflow, _stack(t), _stack(d))


@_specjit(0)
def neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """(-a) mod q = q - a, with -0 = 0 (ref build_f1m.js neg)."""
    z = is_zero(spec, a)
    L = spec.n_limbs
    ql = spec.q_limbs
    d = []
    borrow = None
    for i in range(L):
        x = jnp.asarray(np.uint32((1 << LIMB_BITS) + int(ql[i]))) - a[i]
        if borrow is not None:
            x = x - borrow
        d.append(x & LIMB_MASK)
        borrow = jnp.asarray(np.uint32(1)) - (x >> LIMB_BITS)
    return _select(z, jnp.zeros_like(a), _stack(d))


@_specjit(0)
def double(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return add(spec, a, a)


# ---------------------------------------------------------------------------
# Montgomery multiplication (ref build_f1m.js:466-777 CIOS; word size 16)
# ---------------------------------------------------------------------------


def _mont_mul_ssa(spec: FieldSpec, a, b):
    """Core Montgomery product on SSA per-limb accumulators.

    a, b: length-L lists (or indexable arrays) of batch-shaped uint32 limbs.
    Every accumulator is its own small tensor (never a (2L+1, batch) array),
    so XLA fuses the whole multiply into one elementwise kernel — no
    dynamic-update-slice materialization (the (2L, N) `.at[]` form measured
    HBM-bound at ~6.6M muls/s on v5e; this form is compute-bound).

    Overflow discipline: acc[k] accumulates lo/hi halves (< 2^16) of 16x16
    products.  Position k receives at most 2*(L+1) halves from the product
    phase plus 2*(L+1) from the reduction phase plus carries — bounded by
    ~4(L+2)*2^16 < 2^32 for L <= 1000.  Safe for every supported prime.
    """
    L = spec.n_limbs
    np16 = np.uint32(spec.np16)
    ql = [np.uint32(int(x)) for x in spec.q_limbs]
    zero = jnp.zeros_like(a[0] + b[0])
    acc = [zero] * (2 * L + 1)

    # --- product phase: acc[k] = sum_{i+j=k} lo/hi halves -----------------
    for i in range(L):
        ai = a[i]
        for j in range(L):
            p = ai * b[j]  # exact 16x16 -> 32
            acc[i + j] = acc[i + j] + (p & LIMB_MASK)
            acc[i + j + 1] = acc[i + j + 1] + (p >> LIMB_BITS)

    # --- reduction phase: clear limbs 0..L-1 ------------------------------
    for i in range(L):
        m = (acc[i] * np16) & LIMB_MASK
        for j in range(L):
            p = m * ql[j]
            acc[i + j] = acc[i + j] + (p & LIMB_MASK)
            acc[i + j + 1] = acc[i + j + 1] + (p >> LIMB_BITS)
        # acc[i] now ≡ 0 mod 2^16; push its carry and retire it
        acc[i + 1] = acc[i + 1] + (acc[i] >> LIMB_BITS)

    # --- normalize limbs L..2L; value < 2q --------------------------------
    res, _ = _carry_propagate(acc[L:])
    # res has L+1 limbs; top limb must be 0 after propagation (< 2q < R)
    return _cond_sub_q(spec, res[:L])


@_specjit(0)
def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product a*b*R^{-1} mod q.  Operands canonical < q.

    Schoolbook product with redundant uint32 accumulation followed by a
    word-serial Montgomery reduction — the 16-bit-limb VPU equivalent of the
    reference's 32-bit-word CIOS (build_f1m.js:466-777).
    """
    L = spec.n_limbs
    return _mont_mul_ssa(spec, [a[i] for i in range(L)], [b[i] for i in range(L)])


@_specjit(0)
def mont_square(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Montgomery squaring.  Uses the asymmetric-doubling trick
    (ref build_f1m.js:779-1076): off-diagonal products counted once and
    doubled, halving the multiply count vs mont_mul.
    """
    L = spec.n_limbs
    np16 = np.uint32(spec.np16)
    ql = [np.uint32(int(x)) for x in spec.q_limbs]
    one = np.uint32(1)
    zero = jnp.zeros_like(a[0])
    acc = [zero] * (2 * L + 1)

    for i in range(L):
        ai = a[i]
        # diagonal term
        p = ai * ai
        acc[2 * i] = acc[2 * i] + (p & LIMB_MASK)
        acc[2 * i + 1] = acc[2 * i + 1] + (p >> LIMB_BITS)
        # off-diagonal, doubled.  lo/hi < 2^16 so doubling stays < 2^17.
        for j in range(i + 1, L):
            p = ai * a[j]
            acc[i + j] = acc[i + j] + ((p & LIMB_MASK) << one)
            acc[i + j + 1] = acc[i + j + 1] + ((p >> LIMB_BITS) << one)

    for i in range(L):
        m = (acc[i] * np16) & LIMB_MASK
        for j in range(L):
            p = m * ql[j]
            acc[i + j] = acc[i + j] + (p & LIMB_MASK)
            acc[i + j + 1] = acc[i + j + 1] + (p >> LIMB_BITS)
        acc[i + 1] = acc[i + 1] + (acc[i] >> LIMB_BITS)

    res, _ = _carry_propagate(acc[L:])
    return _cond_sub_q(spec, res[:L])


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

    Parallel prefix/suffix products via lax.associative_scan (mont_mul is
    associative), then a single Fermat inversion of the total — the
    O(log n)-depth TPU shape of the reference's two sequential passes
    (build_batchinverse.js:43-127).  Zeros pass through as 0.
    """
    if axis < 0:
        axis = a.ndim + axis
    assert axis != 0, "axis 0 is the limb axis"
    z = is_zero(spec, a)
    ones = one_mont(spec, a.shape[1:])
    a1 = _select(z, ones, a)

    # move scan axis to position 1
    a_s = jnp.moveaxis(a1, axis, 1)

    def comb(x, y):
        return mont_mul(spec, x, y)

    prefix = jax.lax.associative_scan(comb, a_s, axis=1)  # inclusive
    total = prefix[:, -1]
    inv_total = inverse(spec, total)

    # suffix products S_i = a_i * ... * a_{n-1}, inclusive, reversed scan
    suffix = jax.lax.associative_scan(comb, jnp.flip(a_s, axis=1), axis=1)
    suffix = jnp.flip(suffix, axis=1)

    n = a_s.shape[1]
    # inv(a_i) = prefix_{i-1} * suffix_{i+1} * inv_total
    pre_shift = jnp.concatenate(
        [one_mont(spec, (1,) + total.shape[1:]), prefix[:, :-1]], axis=1
    )
    suf_shift = jnp.concatenate(
        [suffix[:, 1:], one_mont(spec, (1,) + total.shape[1:])], axis=1
    )
    outer = mont_mul(spec, pre_shift, suf_shift)
    inv = mont_mul(spec, outer, inv_total[:, None])
    inv = jnp.moveaxis(inv, 1, axis)
    return _select(z, jnp.zeros_like(a), inv)
