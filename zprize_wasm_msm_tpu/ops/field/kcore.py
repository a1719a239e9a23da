"""Kernel-internal field core: Montgomery arithmetic for Pallas bodies.

Same math as ops.field.mont (ref wasmcurves/src/build_f1m.js mul:466-777,
add:71, sub:91), but expressed for Mosaic's constraints:

  * no scatter/gather primitives — the multiply accumulator is a VMEM
    scratch *ref* updated through static slices;
  * carry chains are serial row loops (O(L) trace, vector ops per row);
  * constants enter as numpy scalars (Mosaic folds scalar fills; array
    constants would have to be kernel operands).

A field element is a stacked ``(L, *batch)`` uint32 value (16-bit limbs,
little-endian), exactly like the jnp path — results are bit-identical.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from .spec import LIMB_BITS, LIMB_MASK, FieldSpec

U32 = jnp.uint32


def _q_scalars(spec: FieldSpec, extra_zero: bool = False):
    ql = [np.uint32(int(x)) for x in spec.q_limbs]
    if extra_zero:
        ql.append(np.uint32(0))
    return ql


def kcarry_rows(rows: List[jnp.ndarray]):
    """Serial carry resolve of redundant rows -> (canonical rows, carry)."""
    out = []
    carry = None
    for r in rows:
        s = r if carry is None else r + carry
        out.append(s & LIMB_MASK)
        carry = s >> LIMB_BITS
    return out, carry


def kcond_sub_q(spec: FieldSpec, rows: List[jnp.ndarray]) -> List[jnp.ndarray]:
    """rows (canonical, L or L+1 limbs, value < 2q) -> value mod q (L rows)."""
    L = spec.n_limbs
    ql = _q_scalars(spec, extra_zero=(len(rows) > L))
    borrow = None
    drows = []
    for k in range(len(rows)):
        x = rows[k] + np.uint32(1 << LIMB_BITS) - ql[k]
        if borrow is not None:
            x = x - borrow
        drows.append(x & LIMB_MASK)
        borrow = np.uint32(1) - (x >> LIMB_BITS)
    ge = borrow == 0
    return [jnp.where(ge, d, r) for d, r in zip(drows[:L], rows[:L])]


def kadd(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a + b) mod q on stacked (L, *batch) values."""
    L = spec.n_limbs
    rows, _ = kcarry_rows([a[i] + b[i] for i in range(L)])
    return jnp.stack(kcond_sub_q(spec, rows))


def ksub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a - b) mod q on stacked (L, *batch) values."""
    L = spec.n_limbs
    ql = _q_scalars(spec)
    borrow = None
    drows = []
    for i in range(L):
        x = a[i] + np.uint32(1 << LIMB_BITS) - b[i]
        if borrow is not None:
            x = x - borrow
        drows.append(x & LIMB_MASK)
        borrow = np.uint32(1) - (x >> LIMB_BITS)
    underflow = borrow != 0
    trows, _ = kcarry_rows([d + q for d, q in zip(drows, ql)])
    return jnp.stack(
        [jnp.where(underflow, t, d) for t, d in zip(trows, drows)]
    )


def kneg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """(-a) mod q with -0 = 0."""
    L = spec.n_limbs
    ql = _q_scalars(spec)
    z = a[0]
    for i in range(1, L):
        z = z | a[i]
    is_zero = z == 0
    borrow = None
    drows = []
    for i in range(L):
        x = np.uint32((1 << LIMB_BITS)) + ql[i] - a[i]
        if borrow is not None:
            x = x - borrow
        drows.append(x & LIMB_MASK)
        borrow = np.uint32(1) - (x >> LIMB_BITS)
    return jnp.stack([jnp.where(is_zero, jnp.zeros_like(d), d) for d in drows])


def kis_zero(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    z = a[0]
    for i in range(1, spec.n_limbs):
        z = z | a[i]
    return z == 0


def kmul(spec: FieldSpec, acc_ref, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Montgomery product on stacked (L, *batch) values.

    acc_ref: (2L+2, *batch) uint32 VMEM scratch, clobbered.  The product
    and word-serial reduction run through static ref slices (Mosaic has no
    value-level dynamic-update-slice); same bounds as ops.field.mont.
    """
    L = spec.n_limbs
    np16 = np.uint32(spec.np16)
    ql = _q_scalars(spec)
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for i in range(L):
        p = a[i][None] * b
        acc_ref[i : i + L] = acc_ref[i : i + L] + (p & LIMB_MASK)
        acc_ref[i + 1 : i + L + 1] = acc_ref[i + 1 : i + L + 1] + (p >> LIMB_BITS)
    for i in range(L):
        m = (acc_ref[i] * np16) & LIMB_MASK
        p = jnp.stack([m * q for q in ql])
        acc_ref[i : i + L] = acc_ref[i : i + L] + (p & LIMB_MASK)
        acc_ref[i + 1 : i + L + 1] = acc_ref[i + 1 : i + L + 1] + (p >> LIMB_BITS)
        acc_ref[i + 1] = acc_ref[i + 1] + (acc_ref[i] >> LIMB_BITS)
    rows, _ = kcarry_rows([acc_ref[k] for k in range(L, 2 * L + 1)])
    return jnp.stack(kcond_sub_q(spec, rows))


def kconst(spec: FieldSpec, value_mont_limbs, batch_shape) -> jnp.ndarray:
    """Broadcast host limb constants to a stacked (L, *batch) value."""
    return jnp.stack(
        [jnp.full(batch_shape, np.uint32(int(v)), U32) for v in value_mont_limbs]
    )


def kselect(mask: jnp.ndarray, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Limb-wise select on stacked values; mask is batch-shaped."""
    return jnp.where(mask[None], a, b)
