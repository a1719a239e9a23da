"""Pallas TPU kernels for the Montgomery field core.

The jnp path (ops.field.mont) expresses the CIOS multiply as ~100 chained
dynamic-update-slices; XLA materializes the (2L+2, N) accumulator in HBM on
every step, measured at ~10 M muls/s on a v5e — 50x below compute.  These
kernels keep the accumulator in a VMEM scratch register file and run the
identical arithmetic (same reduction, same bounds, bit-identical results),
measured at ~240 M muls/s on the same chip.

Layout: blocks are (L, S, 128) — limb planes on the leading axis, batch on
(sublane=S, lane=128) so every per-limb vector op fills the full 8x128 VPU
grid (the (L, BLK) 2-D layout leaves 7/8 sublanes idle: 160 M muls/s).

Reference lineage: wasmcurves/src/build_f1m.js mul:466-777 (CIOS with the
gnark no-carry headroom), square:779-1076 (asymmetric doubling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .spec import LIMB_BITS, LIMB_MASK, FieldSpec

U32 = jnp.uint32

#: sublanes per limb plane; BLK = _S * 128 elements per grid step
_S = 8
_BLK = _S * 128


def block_elems() -> int:
    return _BLK


# ---------------------------------------------------------------------------
# kernel-internal field core (operates on (L, S, 128) values + VMEM acc ref)
# ---------------------------------------------------------------------------


def _k_carry_rows(rows):
    """Serial carry resolve of a list of redundant rows -> canonical rows."""
    out = []
    carry = None
    for r in rows:
        s = r if carry is None else r + carry
        out.append(s & LIMB_MASK)
        carry = s >> LIMB_BITS
    return out, carry


def _k_cond_sub_q(spec: FieldSpec, rows):
    """rows (canonical, len L+1, value < 2q) -> L rows of (value mod q)."""
    L = spec.n_limbs
    ql = [np.uint32(int(x)) for x in spec.q_limbs] + [np.uint32(0)]
    borrow = None
    drows = []
    for k in range(L + 1):
        x = rows[k] + np.uint32(1 << LIMB_BITS) - ql[k]
        if borrow is not None:
            x = x - borrow
        drows.append(x & LIMB_MASK)
        borrow = np.uint32(1) - (x >> LIMB_BITS)
    ge = borrow == 0
    return [jnp.where(ge, d, r) for d, r in zip(drows[:L], rows[:L])]


def _k_mont_reduce(spec: FieldSpec, acc_ref):
    """Word-serial Montgomery reduction of the VMEM accumulator, followed by
    carry resolution and the conditional subtract.  Returns L output rows."""
    L = spec.n_limbs
    np16 = np.uint32(spec.np16)
    ql = [np.uint32(int(x)) for x in spec.q_limbs]
    for i in range(L):
        m = (acc_ref[i] * np16) & LIMB_MASK
        p = jnp.stack([m * q for q in ql])  # (L, S, 128)
        acc_ref[i : i + L] = acc_ref[i : i + L] + (p & LIMB_MASK)
        acc_ref[i + 1 : i + L + 1] = acc_ref[i + 1 : i + L + 1] + (p >> LIMB_BITS)
        acc_ref[i + 1] = acc_ref[i + 1] + (acc_ref[i] >> LIMB_BITS)
    rows, _ = _k_carry_rows([acc_ref[k] for k in range(L, 2 * L + 1)])
    return _k_cond_sub_q(spec, rows)


def _mul_kernel(spec: FieldSpec, a_ref, b_ref, o_ref, acc_ref):
    L = spec.n_limbs
    a = a_ref[:, 0]
    b = b_ref[:, 0]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for i in range(L):
        p = a[i][None] * b
        acc_ref[i : i + L] = acc_ref[i : i + L] + (p & LIMB_MASK)
        acc_ref[i + 1 : i + L + 1] = acc_ref[i + 1 : i + L + 1] + (p >> LIMB_BITS)
    o_ref[:, 0] = jnp.stack(_k_mont_reduce(spec, acc_ref))


def _square_kernel(spec: FieldSpec, a_ref, o_ref, acc_ref):
    L = spec.n_limbs
    a = a_ref[:, 0]
    acc_ref[:] = jnp.zeros_like(acc_ref)
    for i in range(L):
        p = a[i][None] * a[i:]  # (L-i, S, 128): diagonal + upper triangle
        lo = p & LIMB_MASK
        hi = p >> LIMB_BITS
        if L - i > 1:
            lo = jnp.concatenate([lo[:1], lo[1:] << 1], axis=0)
            hi = jnp.concatenate([hi[:1], hi[1:] << 1], axis=0)
        acc_ref[2 * i : i + L] = acc_ref[2 * i : i + L] + lo
        acc_ref[2 * i + 1 : i + L + 1] = acc_ref[2 * i + 1 : i + L + 1] + hi
    o_ref[:, 0] = jnp.stack(_k_mont_reduce(spec, acc_ref))


# ---------------------------------------------------------------------------
# host wrappers: (L, N) -> (L, N), padding N up to a block multiple
# ---------------------------------------------------------------------------


def _blockify(x: jnp.ndarray):
    L, n = x.shape
    pad = (-n) % _BLK
    if pad:
        x = jnp.concatenate([x, jnp.zeros((L, pad), U32)], axis=1)
    nb = (n + pad) // _BLK
    return x.reshape(L, nb, _S, 128), nb, pad


@functools.partial(jax.jit, static_argnums=(0,))
def mont_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pallas Montgomery product over an (L, N) batch (TPU only)."""
    L = spec.n_limbs
    n = a.shape[1]
    a3, nb, pad = _blockify(a)
    b3, _, _ = _blockify(b)
    out = pl.pallas_call(
        functools.partial(_mul_kernel, spec),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((L, 1, _S, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 1, _S, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (L, 1, _S, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, nb, _S, 128), U32),
        scratch_shapes=[pltpu.VMEM((2 * L + 2, _S, 128), U32)],
    )(a3, b3)
    return out.reshape(L, nb * _BLK)[:, :n]


@functools.partial(jax.jit, static_argnums=(0,))
def mont_square(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """Pallas Montgomery squaring over an (L, N) batch (TPU only)."""
    L = spec.n_limbs
    n = a.shape[1]
    a3, nb, pad = _blockify(a)
    out = pl.pallas_call(
        functools.partial(_square_kernel, spec),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((L, 1, _S, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (L, 1, _S, 128), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((L, nb, _S, 128), U32),
        scratch_shapes=[pltpu.VMEM((2 * L + 2, _S, 128), U32)],
    )(a3)
    return out.reshape(L, nb * _BLK)[:, :n]
