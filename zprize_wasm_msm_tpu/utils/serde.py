"""Point serialization: LEM <-> uncompressed / compressed wire formats.

TPU-native re-design of the reference's serializers
(wasmcurves/src/build_curve_jacobian_a0.js — LEMtoU:1207, LEMtoC:1168,
UtoLEM:1239, CtoLEM:1265, batch* wrappers at :1413-1416; field sign
convention build_f1m.js sign:135).

Formats (per point, n8 = field byte size):
  LEM:  the in-framework layout — little-endian Montgomery affine (x, y)
        limb arrays (here: (L, N) uint32 device arrays).
  U:    uncompressed wire — big-endian standard-domain x || y (2*n8 bytes);
        infinity encoded as zeros with byte0 = 0x40.
  C:    compressed wire — big-endian standard-domain x (n8 bytes);
        byte0 bit 0x80 = y is "greatest" (sign == -1), 0x40 = infinity.

Byte shuffles are vectorized numpy on host; the field math (Montgomery
conversion, sqrt for decompression, sign) runs on device as batched
kernels — the reference's per-point WASM loops become ONE device op per
batch (the batchLEMtoU/batchCtoLEM role).
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.curve import group
from ..ops.curve.spec import CurveSpec
from ..ops.field import mont


def _to_be_bytes(std_limbs: np.ndarray) -> np.ndarray:
    """(EL, N) standard-domain 16-bit limbs -> (N, n8) big-endian bytes.

    For extension elements the WHOLE flat element is byte-reversed as one
    unit, exactly like the reference's __reverseBytes over n8 = ext * f1n8
    bytes (build_curve_jacobian_a0.js LEMtoU:1233-1236) — the wire order
    becomes c1_be || c0_be for Fq2."""
    le = np.ascontiguousarray(std_limbs.T.astype("<u2"))  # (N, EL) LE limbs
    raw = le.view(np.uint8).reshape(le.shape[0], -1)  # (N, n8) LE bytes
    return raw[:, ::-1]  # big-endian


def _from_be_bytes(be: np.ndarray, n_limbs: int) -> np.ndarray:
    """(N, n8) big-endian bytes -> (EL, N) uint32 16-bit limbs."""
    le = np.ascontiguousarray(be[:, ::-1])
    limbs = le.view("<u2").astype(np.uint32)  # (N, EL)
    return np.ascontiguousarray(limbs.T)


def _from_mont_flat(curve: CurveSpec, A):
    """fromMontgomery on a flat (EL, N) coordinate (componentwise for
    extension fields — the f2m_fromMontgomery role)."""
    fq = curve.fq
    if curve.ext == 1:
        return mont.from_mont(fq, A)
    L = fq.n_limbs
    a3 = jnp.moveaxis(A.reshape((curve.ext, L) + A.shape[1:]), 0, 1)
    s = mont.from_mont(fq, a3)
    return jnp.moveaxis(s, 1, 0).reshape(A.shape)


def _to_mont_flat(curve: CurveSpec, A):
    fq = curve.fq
    if curve.ext == 1:
        return mont.to_mont(fq, A)
    L = fq.n_limbs
    a3 = jnp.moveaxis(A.reshape((curve.ext, L) + A.shape[1:]), 0, 1)
    s = mont.to_mont(fq, a3)
    return jnp.moveaxis(s, 1, 0).reshape(A.shape)


def _coord_sign(curve: CurveSpec, A):
    """Field sign: f1m sign:135 for the base field, f2m sign:411 for Fq2."""
    if curve.ext == 1:
        return mont.sign(curve.fq, A)
    return curve.field.sign(A)


def points_to_uncompressed(curve: CurveSpec, X, Y) -> np.ndarray:
    """LEM affine batch -> (N, 2*n8) uncompressed bytes (batchLEMtoU).

    n8 = ext * base-field bytes: G2 points serialize as x || y with each
    coordinate in the reference's whole-element big-endian order."""
    inf = np.asarray(group.is_zero_affine(curve, (X, Y)))
    xs = np.asarray(_from_mont_flat(curve, X))
    ys = np.asarray(_from_mont_flat(curve, Y))
    out = np.concatenate([_to_be_bytes(xs), _to_be_bytes(ys)], axis=1)
    out[inf] = 0
    out[inf, 0] = 0x40
    return out


def points_from_uncompressed(curve: CurveSpec, raw: np.ndarray):
    """(N, 2*n8) uncompressed bytes -> LEM affine batch (batchUtoLEM)."""
    EL = curve.field.elem_len
    n8 = EL * 2
    raw = np.asarray(raw, dtype=np.uint8).reshape(-1, 2 * n8)
    inf = (raw[:, 0] & 0x40) != 0
    xb = raw[:, :n8].copy()
    yb = raw[:, n8:].copy()
    xb[inf] = 0
    yb[inf] = 0
    X = _to_mont_flat(curve, jnp.asarray(_from_be_bytes(xb, EL)))
    Y = _to_mont_flat(curve, jnp.asarray(_from_be_bytes(yb, EL)))
    z = jnp.asarray(inf)
    X = mont._select(z, jnp.zeros_like(X), X)
    Y = mont._select(z, jnp.zeros_like(Y), Y)
    return X, Y


def points_to_compressed(curve: CurveSpec, X, Y) -> np.ndarray:
    """LEM affine batch -> (N, n8) compressed bytes (batchLEMtoC)."""
    inf = np.asarray(group.is_zero_affine(curve, (X, Y)))
    xs = np.asarray(_from_mont_flat(curve, X))
    neg = np.asarray(_coord_sign(curve, Y)) == -1
    out = _to_be_bytes(xs).copy()
    out[neg, 0] |= 0x80
    out[inf] = 0
    out[inf, 0] = 0x40
    return out


def points_from_compressed(curve: CurveSpec, raw: np.ndarray):
    """(N, n8) compressed bytes -> LEM affine batch (batchCtoLEM).

    Recomputes y = sqrt(x^3 + [a x] + b) on device — one batched
    Tonelli-Shanks / q≡3-mod-4 exponentiation for G1, the reference's
    f2m sqrt (build_f2m.js:453, alg 9adj of eprint 2012/685) for G2 —
    and picks the root whose sign matches the 0x80 flag, exactly
    CtoLEM:1265's selection table.
    """
    F = curve.field
    EL = F.elem_len
    n8 = EL * 2
    raw = np.asarray(raw, dtype=np.uint8).reshape(-1, n8)
    inf = (raw[:, 0] & 0x40) != 0
    greatest = (raw[:, 0] & 0x80) != 0
    xb = raw.copy()
    xb[:, 0] &= 0x3F
    xb[inf] = 0
    X = _to_mont_flat(curve, jnp.asarray(_from_be_bytes(xb, EL)))
    # y^2 = x^3 + a*x + b
    rhs = F.add(
        F.mul(F.mul(X, X), X),
        F.const(curve.b, (X.shape[1],)),
    )
    if curve.a != 0:
        rhs = F.add(rhs, F.mul(F.const(curve.a, (X.shape[1],)), X))
    if curve.ext == 1:
        y, ok = mont.sqrt(curve.fq, rhs)
    else:
        y, ok = F.sqrt(rhs)
    y_neg = F.neg(y)
    root_is_neg = _coord_sign(curve, y) == -1
    want_neg = jnp.asarray(greatest)
    Y = F.select(root_is_neg == want_neg, y, y_neg)
    z = jnp.asarray(inf)
    X = mont._select(z, jnp.zeros_like(X), X)
    Y = mont._select(z, jnp.zeros_like(Y), Y)
    return X, Y


# reference-parity aliases (batch variants ARE the native API here)
batch_lem_to_u = points_to_uncompressed
batch_u_to_lem = points_from_uncompressed
batch_lem_to_c = points_to_compressed
batch_c_to_lem = points_from_compressed
