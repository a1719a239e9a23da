"""Branch-free elliptic-curve group ops on limb-vector batches.

TPU-native re-design of the reference's Jacobian a=0 group layer
(wasmcurves/src/build_curve_jacobian_a0.js: add:541, addMixed:661,
addAffine:764, double:291, neg, timesScalar via build_timesscalarnaf.js,
normalize/toAffine:940-1013, batchToAffine:1040).

Design departure (deliberate, see SURVEY.md §7): the reference's Jacobian
formulas carry data-dependent special cases (P==Q, P==-Q, infinity), which
on a TPU would force every lane to evaluate both the add and the double
path plus selects.  Instead we use the *complete* homogeneous projective
formulas for a=0 curves (Renes–Costello–Batina 2016, Algorithms 7-9):
exception-free by construction, so every lane executes the identical
straight-line code — the ideal shape for VPU/XLA.  Infinity is (0:1:0);
affine zero is encoded as (0,0) exactly like the reference
(build_curve_jacobian_a0.js isZeroAffine:55).

Generic over the coordinate field: every op goes through the curve's
field backend (ops.field.tower), so the SAME code implements G1 (Fq) and
G2 (Fq2) — the role of the reference's field-prefix parameterization
(build_curve_jacobian_a0.js:29 `prefixField`; G2 instantiation at
build_bls12381.js:47-53).

A point batch is a tuple (X, Y, Z) of uint32 arrays of shape (EL, *batch)
in Montgomery form (EL = field.elem_len); affine batches are (X, Y).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _curvejit(*static_argnums):
    """jit with the hashable CurveSpec static (per-curve specialization,
    the runtime analog of the reference's per-curve codegen)."""

    def deco(fn):
        return functools.wraps(fn)(jax.jit(fn, static_argnums=static_argnums))

    return deco


from .spec import CurveSpec

Point = Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]
AffinePoint = Tuple[jnp.ndarray, jnp.ndarray]


# ---------------------------------------------------------------------------
# constructors / predicates
# ---------------------------------------------------------------------------


def zero(curve: CurveSpec, batch_shape=()) -> Point:
    """The identity (0 : 1 : 0)."""
    F = curve.field
    return (F.zeros(batch_shape), F.one(batch_shape), F.zeros(batch_shape))


def generator(curve: CurveSpec, batch_shape=()) -> Point:
    F = curve.field
    return (
        F.const(curve.gx, batch_shape),
        F.const(curve.gy, batch_shape),
        F.one(batch_shape),
    )


@_curvejit(0)
def is_zero(curve: CurveSpec, p: Point) -> jnp.ndarray:
    return curve.field.is_zero(p[2])


@_curvejit(0)
def is_zero_affine(curve: CurveSpec, p: AffinePoint) -> jnp.ndarray:
    """(0,0) encodes the affine identity (ref isZeroAffine:55)."""
    F = curve.field
    return F.is_zero(p[0]) & F.is_zero(p[1])


@_curvejit(0)
def from_affine(curve: CurveSpec, p: AffinePoint) -> Point:
    """Affine -> projective; (0,0) -> (0:1:0)."""
    F = curve.field
    z = is_zero_affine(curve, p)
    batch = F.batch_shape(p[0])
    one = F.one(batch)
    zeros = F.zeros(batch)
    return (p[0], F.select(z, one, p[1]), F.select(z, zeros, one))


@_curvejit(0)
def eq(curve: CurveSpec, p: Point, q: Point) -> jnp.ndarray:
    """Projective equality: X1*Z2 == X2*Z1 and Y1*Z2 == Y2*Z1 (+ both-inf)."""
    F = curve.field
    both_inf = is_zero(curve, p) & is_zero(curve, q)
    one_inf = is_zero(curve, p) ^ is_zero(curve, q)
    x_eq = F.eq(F.mul(p[0], q[2]), F.mul(q[0], p[2]))
    y_eq = F.eq(F.mul(p[1], q[2]), F.mul(q[1], p[2]))
    return both_inf | (x_eq & y_eq & ~one_inf)


# ---------------------------------------------------------------------------
# complete group law (RCB16 algorithms 7/8/9 for a = 0)
# ---------------------------------------------------------------------------


def _add_general(curve: CurveSpec, p: Point, q: Point) -> Point:
    """Complete projective addition for ARBITRARY a (RCB16 alg. 1; 12M).

    Serves the reference's projective curve (build_curve_projective.js,
    MNT6753 with a = 11) — but exception-free where the reference's
    add-1998-cmo-2 has special cases.
    """
    F = curve.field
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    batch = F.batch_shape(X1)
    b3 = F.const(curve.b3, batch)
    a = F.const(curve.a, batch)
    fadd, fsub = F.add, F.sub

    t0, t1, t2, m3, m4, m5 = F.mul_many(
        [
            (X1, X2),
            (Y1, Y2),
            (Z1, Z2),
            (fadd(X1, Y1), fadd(X2, Y2)),
            (fadd(X1, Z1), fadd(X2, Z2)),
            (fadd(Y1, Z1), fadd(Y2, Z2)),
        ]
    )
    t3 = fsub(m3, fadd(t0, t1))  # X1Y2 + X2Y1
    t4 = fsub(m4, fadd(t0, t2))  # X1Z2 + X2Z1
    t5 = fsub(m5, fadd(t1, t2))  # Y1Z2 + Y2Z1

    at4, bt2, at2 = F.mul_many([(a, t4), (b3, t2), (a, t2)])
    Z3 = fadd(bt2, at4)
    X3 = fsub(t1, Z3)
    Z3 = fadd(t1, Z3)

    t1n = fadd(fadd(t0, t0), t0)  # 3*t0
    t1n = fadd(t1n, at2)
    t2n = fsub(t0, at2)

    bt4, at2n = F.mul_many([(b3, t4), (a, t2n)])
    t4n = fadd(bt4, at2n)

    Y3, m0, m1, m2, m3b = F.mul_many(
        [
            (X3, Z3),
            (t1n, t4n),
            (t5, t4n),
            (t3, X3),
            (t3, t1n),
        ]
    )
    (m4b,) = F.mul_many([(t5, Z3)])
    return (fsub(m2, m1), fadd(Y3, m0), fadd(m4b, m3b))


@_curvejit(0)
def add(curve: CurveSpec, p: Point, q: Point) -> Point:
    """Complete projective addition (RCB16 alg. 7 for a=0, alg. 1 general).

    Replaces the reference's branchy Jacobian add
    (build_curve_jacobian_a0.js:541-658) — handles P==Q, P==-Q and
    infinities with NO special cases.
    """
    if curve.a != 0:
        return _add_general(curve, p, q)
    F = curve.field
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    batch = F.batch_shape(X1)
    b3 = F.const(curve.b3, batch)
    fadd, fsub = F.add, F.sub

    # round 1: six independent products, one stacked multiply
    t0, t1, t2, A, B, C = F.mul_many(
        [
            (X1, X2),
            (Y1, Y2),
            (Z1, Z2),
            (fadd(X1, Y1), fadd(X2, Y2)),
            (fadd(Y1, Z1), fadd(Y2, Z2)),
            (fadd(X1, Z1), fadd(X2, Z2)),
        ]
    )
    t3 = fsub(fsub(A, t0), t1)  # X1Y2 + X2Y1
    t4 = fsub(fsub(B, t1), t2)  # Y1Z2 + Y2Z1
    Yr = fsub(fsub(C, t0), t2)  # X1Z2 + X2Z1
    t0_3 = fadd(fadd(t0, t0), t0)

    # round 2: the two b3 products
    t2b, Yb = F.mul_many([(b3, t2), (b3, Yr)])
    Z3l = fadd(t1, t2b)
    t1l = fsub(t1, t2b)

    # round 3: six independent products
    X3a, t2c, Yc, t1c, t0c, Z3c = F.mul_many(
        [
            (t4, Yb),
            (t3, t1l),
            (Yb, t0_3),
            (t1l, Z3l),
            (t0_3, t3),
            (Z3l, t4),
        ]
    )
    return (fsub(t2c, X3a), fadd(t1c, Yc), fadd(Z3c, t0c))


@_curvejit(0)
def add_mixed(curve: CurveSpec, p: Point, q: AffinePoint) -> Point:
    """Complete projective + affine addition, a=0 (RCB16 alg. 8; 11M).

    Replaces build_curve_jacobian_a0.js addMixed:661.  The affine identity
    (0,0) cannot be expressed in the complete formula, so it is handled by
    one select — the only mask in the hot path.
    """
    if curve.a != 0:  # general-a curves: lift and use the complete add
        return add(curve, p, from_affine(curve, q))
    F = curve.field
    X1, Y1, Z1 = p
    X2, Y2 = q
    batch = F.batch_shape(X1)
    b3 = F.const(curve.b3, batch)
    fadd, fsub = F.add, F.sub

    # round 1: six independent products (incl. b3*Z1), one stacked multiply
    t0, t1, A, t4a, Ya, t2b = F.mul_many(
        [
            (X1, X2),
            (Y1, Y2),
            (fadd(X1, Y1), fadd(X2, Y2)),
            (Y2, Z1),
            (X2, Z1),
            (b3, Z1),
        ]
    )
    t3 = fsub(fsub(A, t0), t1)
    t4 = fadd(t4a, Y1)
    Yr = fadd(Ya, X1)
    t0_3 = fadd(fadd(t0, t0), t0)
    Z3l = fadd(t1, t2b)
    t1l = fsub(t1, t2b)

    # round 2
    (Yb,) = F.mul_many([(b3, Yr)])

    # round 3: six independent products
    X3a, t2c, Yc, t1c, t0c, Z3c = F.mul_many(
        [
            (t4, Yb),
            (t3, t1l),
            (Yb, t0_3),
            (t1l, Z3l),
            (t0_3, t3),
            (Z3l, t4),
        ]
    )
    X3 = fsub(t2c, X3a)
    Y3 = fadd(t1c, Yc)
    Z3 = fadd(Z3c, t0c)

    qz = is_zero_affine(curve, q)
    return (
        F.select(qz, X1, X3),
        F.select(qz, Y1, Y3),
        F.select(qz, Z1, Z3),
    )


@_curvejit(0)
def double(curve: CurveSpec, p: Point) -> Point:
    """Complete projective doubling, a=0 (RCB16 alg. 9; 6M+2S).

    Replaces build_curve_jacobian_a0.js double:291; handles infinity for
    free ((0:1:0) maps to itself).
    """
    if curve.a != 0:  # complete formulas handle P == Q: reuse the add
        return _add_general(curve, p, p)
    F = curve.field
    X, Y, Z = p
    batch = F.batch_shape(X)
    b3 = F.const(curve.b3, batch)
    fadd, fsub = F.add, F.sub

    # round 1: four independent products
    t0, t1, t2, txy = F.mul_many([(Y, Y), (Y, Z), (Z, Z), (X, Y)])
    Z8 = fadd(t0, t0)
    Z8 = fadd(Z8, Z8)
    Z8 = fadd(Z8, Z8)  # 8*Y^2

    # round 2
    (t2b,) = F.mul_many([(b3, t2)])
    Y3s = fadd(t0, t2b)
    t0p = fsub(t0, fadd(fadd(t2b, t2b), t2b))

    # round 3: four independent products
    X3a, Z3c, Yc, Xc = F.mul_many(
        [(t2b, Z8), (t1, Z8), (t0p, Y3s), (t0p, txy)]
    )
    return (fadd(Xc, Xc), fadd(X3a, Yc), Z3c)


@_curvejit(0)
def neg(curve: CurveSpec, p: Point) -> Point:
    return (p[0], curve.field.neg(p[1]), p[2])


@_curvejit(0)
def neg_affine(curve: CurveSpec, p: AffinePoint) -> AffinePoint:
    return (p[0], curve.field.neg(p[1]))


@_curvejit(0)
def sub(curve: CurveSpec, p: Point, q: Point) -> Point:
    return add(curve, p, neg(curve, q))


def select(mask: jnp.ndarray, p: Point, q: Point) -> Point:
    """Lane-wise select between two point batches (mask True -> p)."""
    return tuple(jnp.where(mask[None], a, b) for a, b in zip(p, q))


# ---------------------------------------------------------------------------
# scalar multiplication (ref build_timesscalarnaf.js / timesScalar)
# ---------------------------------------------------------------------------


@_curvejit(0)
def times_scalar(curve: CurveSpec, p: Point, scalar_limbs: jnp.ndarray) -> Point:
    """MSB-first double-and-add over a batch.

    scalar_limbs: (Ls, *batch) uint32 16-bit limbs (standard domain).
    The reference uses a NAF ladder (build_timesscalarnaf.js); with complete
    formulas a plain ladder is branch-free, and MSM never calls this on the
    hot path — it exists for API parity and as a differential oracle.
    """
    F = curve.field
    Ls = scalar_limbs.shape[0]
    batch = scalar_limbs.shape[1:]
    nbits = Ls * 16
    acc = zero(curve, F.batch_shape(p[0]))

    def body(acc, bit):
        acc = double(curve, acc)
        added = add(curve, acc, p)
        return select(bit == 1, added, acc), None

    # expand bits MSB-first: limbs are little-endian, so reverse limb order
    # and walk each limb's bits from 15 down to 0 -> (nbits, *batch)
    shifts = jnp.asarray(
        np.arange(15, -1, -1, dtype=np.uint32).reshape((1, 16) + (1,) * len(batch))
    )
    bits = (jnp.flip(scalar_limbs, axis=0)[:, None] >> shifts) & 1
    bits = bits.reshape((nbits,) + batch)
    acc, _ = jax.lax.scan(body, acc, bits)
    return acc


# ---------------------------------------------------------------------------
# normalization (ref normalize/toAffine:940-1013, batchToAffine:1040)
# ---------------------------------------------------------------------------


@_curvejit(0)
def to_affine(curve: CurveSpec, p: Point) -> AffinePoint:
    """Projective -> affine via batched Montgomery inversion of Z.

    Infinity maps to (0,0), matching the reference's encoding.
    """
    F = curve.field
    X, Y, Z = p
    zinv = F.batch_inverse(Z)
    x = F.mul(X, zinv)
    y = F.mul(Y, zinv)
    inf = F.is_zero(Z)
    zl = jnp.zeros_like(x)
    return (F.select(inf, zl, x), F.select(inf, zl, y))


@_curvejit(0)
def in_curve(curve: CurveSpec, p: Point) -> jnp.ndarray:
    """Y^2*Z == X^3 + a*X*Z^2 + b*Z^3 (ref inCurve:1330)."""
    F = curve.field
    X, Y, Z = p
    batch = F.batch_shape(X)
    b = F.const(curve.b, batch)
    zsq = F.mul(Z, Z)
    lhs = F.mul(F.mul(Y, Y), Z)
    x3 = F.mul(F.mul(X, X), X)
    rhs = F.add(x3, F.mul(b, F.mul(zsq, Z)))
    if curve.a != 0:
        a = F.const(curve.a, batch)
        rhs = F.add(rhs, F.mul(a, F.mul(X, zsq)))
    return F.eq(lhs, rhs) | is_zero(curve, p)
