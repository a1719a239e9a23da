"""Vectorized multi-limb unsigned integer arithmetic (non-modular).

TPU-native analog of the reference's generic bigint layer
(wasmcurves/src/build_int.js — add:186 returns carry, sub:232 returns
borrow, mul:281 product-scanning, div:706 long division, and the int512
instance wired for GLV at build_curve_jacobian_a0.js:1422).

Same limb convention as ops.field.mont: (L, *batch) uint32 arrays of
little-endian 16-bit limbs.  Division is NOT the reference's byte-wise
estimation long division (branchy, data-dependent) — it is Barrett
reduction by a host-known constant divisor, which is the only kind of
division the library ever needs at runtime (GLV decomposition divides by
the lattice determinant r; build_glv.js:82-110).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from .spec import LIMB_BITS, LIMB_MASK

U32 = jnp.uint32


def int_add(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Limbwise add with carry; returns (sum mod 2^(16L), carry_out)."""
    L = a.shape[0]
    out = []
    carry = None
    for i in range(L):
        s = a[i] + b[i]
        if carry is not None:
            s = s + carry
        out.append(s & LIMB_MASK)
        carry = s >> LIMB_BITS
    return jnp.stack(out), carry


def int_sub(a: jnp.ndarray, b: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Limbwise subtract; returns (a-b mod 2^(16L), borrow_out in {0,1})."""
    L = a.shape[0]
    out = []
    borrow = None
    for i in range(L):
        x = a[i] + np.uint32(1 << LIMB_BITS) - b[i]
        if borrow is not None:
            x = x - borrow
        out.append(x & LIMB_MASK)
        borrow = np.uint32(1) - (x >> LIMB_BITS)
    return jnp.stack(out), borrow


def int_mul(a: jnp.ndarray, b: jnp.ndarray, out_limbs: int = None) -> jnp.ndarray:
    """Full product, (La+Lb) limbs (ref build_int.js mul:281).

    Redundant uint32 accumulation of 16x16 half-products, then one carry
    resolution pass.  out_limbs may truncate (mod 2^(16*out_limbs)).
    """
    La, Lb = a.shape[0], b.shape[0]
    total = La + Lb if out_limbs is None else min(La + Lb, out_limbs)
    batch = jnp.broadcast_shapes(a.shape[1:], b.shape[1:])
    acc = jnp.zeros((total + 1,) + batch, dtype=U32)
    for i in range(La):
        if i >= total:
            break
        hi_len = min(Lb, total - i)
        p = a[i][None] * b[:hi_len]
        acc = acc.at[i : i + hi_len].add(p & LIMB_MASK)
        acc = acc.at[i + 1 : i + 1 + hi_len].add(p >> LIMB_BITS)
        # resolve eagerly every 64 rows would be needed for L>64; fine here
    out = []
    carry = None
    for k in range(total):
        s = acc[k] if carry is None else acc[k] + carry
        out.append(s & LIMB_MASK)
        carry = s >> LIMB_BITS
    res = jnp.stack(out)
    if out_limbs is not None and out_limbs > total:
        res = pad_limbs(res, out_limbs)
    return res


def int_mul_const(a: jnp.ndarray, c: int, out_limbs: int = None) -> jnp.ndarray:
    """Product with a host constant."""
    from ...utils.bigint import int_to_limbs

    nlimbs = max(1, (int(c).bit_length() + LIMB_BITS - 1) // LIMB_BITS)
    cl = jnp.asarray(int_to_limbs(c, nlimbs), dtype=U32)
    cl = cl.reshape((nlimbs,) + (1,) * (a.ndim - 1))
    return int_mul(a, cl, out_limbs)


def int_shr_limbs(a: jnp.ndarray, k: int, out_limbs: int) -> jnp.ndarray:
    """Drop the k low limbs (i.e. >> 16k), keep out_limbs limbs."""
    L = a.shape[0]
    avail = max(0, L - k)
    take = min(avail, out_limbs)
    parts = [a[k + i] for i in range(take)]
    pad = out_limbs - take
    if pad:
        z = jnp.zeros_like(a[0])
        parts += [z] * pad
    return jnp.stack(parts)


def int_gte(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a >= b (ref build_int.js gte)."""
    _, borrow = int_sub(a, b)
    return borrow == 0


def int_is_zero(a: jnp.ndarray) -> jnp.ndarray:
    acc = a[0]
    for i in range(1, a.shape[0]):
        acc = acc | a[i]
    return acc == 0


def pad_limbs(a: jnp.ndarray, out_limbs: int) -> jnp.ndarray:
    """Zero-extend to out_limbs limbs."""
    L = a.shape[0]
    if L >= out_limbs:
        return a[:out_limbs]
    z = jnp.zeros((out_limbs - L,) + a.shape[1:], dtype=U32)
    return jnp.concatenate([a, z], axis=0)


def barrett_div(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """floor(x / d) for a host-known divisor d.

    Replaces the reference's data-dependent long division
    (build_int.js:706-920) with a fixed-structure Barrett estimate plus two
    branch-free corrections (q_est in [q-2, q]).
    Returns the quotient with the same limb count as x.
    """
    Lx = x.shape[0]
    B = LIMB_BITS * Lx
    mu = (1 << B) // d  # host constant
    # q_est = (x * mu) >> B
    xmu = int_mul_const(x, mu)  # Lx + Lmu limbs
    q_est = int_shr_limbs(xmu, Lx, Lx)
    # r = x - q_est * d  (fits in Lx limbs after correction)
    qd = int_mul_const(q_est, d, Lx)
    r, _ = int_sub(x, qd)
    from ...utils.bigint import int_to_limbs

    dl = jnp.asarray(int_to_limbs(d % (1 << B), Lx), dtype=U32)
    dl = dl.reshape((Lx,) + (1,) * (x.ndim - 1))
    one = jnp.zeros_like(q_est).at[0].set(1)
    for _ in range(2):  # at most 2 corrections
        ge = int_gte(r, dl)
        r2, _ = int_sub(r, dl)
        q2, _ = int_add(q_est, one)
        r = jnp.where(ge[None], r2, r)
        q_est = jnp.where(ge[None], q2, q_est)
    return q_est
