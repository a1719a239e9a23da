"""Kernel-internal group ops: complete-formula curve arithmetic for Pallas.

Mirrors ops.curve.group (RCB16 complete projective formulas for a=0;
reference lineage wasmcurves/src/build_curve_jacobian_a0.js addMixed:661,
add:541, double:291) but on stacked kernel values with a shared VMEM
multiply accumulator.  Bit-identical to the jnp path.

Generic over the coordinate field via ops.field.ktower (the kernel twin of
the reference's field-prefix parameterization,
build_curve_jacobian_a0.js:29): the SAME kernel code runs G1 (Fq) and G2
(Fq2) — including inside the sorted-runs MSM engine, which is what puts
G2 MSM on TPU.
"""

from __future__ import annotations

from .spec import CurveSpec


def kzero_point(curve: CurveSpec, batch_shape):
    """The identity (0 : 1 : 0) as stacked kernel values.

    (Two independent zero constants: jnp.array-copying one of them emits a
    `copy` primitive Mosaic cannot lower inside pl.when branches.)"""
    kf = curve.kfield
    zeros = kf.zeros(batch_shape)
    zeros2 = kf.zeros(batch_shape)
    one = kf.one(batch_shape)
    return (zeros, one, zeros2)


def kadd_mixed(curve: CurveSpec, acc_ref, p, q):
    """Complete projective + affine addition (RCB16 alg. 8, a=0; 11M).

    p: (X1, Y1, Z1) stacked values; q: (X2, Y2) affine, (0,0) = identity.
    acc_ref: (2L+2, *batch) VMEM scratch for the sequential multiplies
    (shared across extension components — see ktower.KFq2.mul).
    """
    kf = curve.kfield
    X1, Y1, Z1 = p
    X2, Y2 = q
    batch = X1.shape[1:]
    b3 = kf.const(curve.b3_flat_limbs, batch)
    mul = lambda a, b: kf.mul(acc_ref, a, b)
    fadd = kf.add
    fsub = kf.sub

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    A = mul(fadd(X1, Y1), fadd(X2, Y2))
    t4 = fadd(mul(Y2, Z1), Y1)
    Yr = fadd(mul(X2, Z1), X1)
    t2b = mul(b3, Z1)

    t3 = fsub(fsub(A, t0), t1)
    t0_3 = fadd(fadd(t0, t0), t0)
    Z3l = fadd(t1, t2b)
    t1l = fsub(t1, t2b)
    Yb = mul(b3, Yr)

    X3 = fsub(mul(t3, t1l), mul(t4, Yb))
    Y3 = fadd(mul(t1l, Z3l), mul(Yb, t0_3))
    Z3 = fadd(mul(Z3l, t4), mul(t0_3, t3))

    qz = kf.is_zero(X2) & kf.is_zero(Y2)
    return (
        kf.select(qz, X1, X3),
        kf.select(qz, Y1, Y3),
        kf.select(qz, Z1, Z3),
    )


def kadd(curve: CurveSpec, acc_ref, p, q):
    """Complete projective addition (RCB16 alg. 7, a=0; 12M)."""
    kf = curve.kfield
    X1, Y1, Z1 = p
    X2, Y2, Z2 = q
    batch = X1.shape[1:]
    b3 = kf.const(curve.b3_flat_limbs, batch)
    mul = lambda a, b: kf.mul(acc_ref, a, b)
    fadd = kf.add
    fsub = kf.sub

    t0 = mul(X1, X2)
    t1 = mul(Y1, Y2)
    t2 = mul(Z1, Z2)
    A = mul(fadd(X1, Y1), fadd(X2, Y2))
    B = mul(fadd(Y1, Z1), fadd(Y2, Z2))
    C = mul(fadd(X1, Z1), fadd(X2, Z2))

    t3 = fsub(fsub(A, t0), t1)
    t4 = fsub(fsub(B, t1), t2)
    Yr = fsub(fsub(C, t0), t2)
    t0_3 = fadd(fadd(t0, t0), t0)
    t2b = mul(b3, t2)
    Yb = mul(b3, Yr)
    Z3l = fadd(t1, t2b)
    t1l = fsub(t1, t2b)

    X3 = fsub(mul(t3, t1l), mul(t4, Yb))
    Y3 = fadd(mul(t1l, Z3l), mul(Yb, t0_3))
    Z3 = fadd(mul(Z3l, t4), mul(t0_3, t3))
    return (X3, Y3, Z3)


def kdouble(curve: CurveSpec, acc_ref, p):
    """Complete projective doubling (RCB16 alg. 9, a=0; 6M+2S)."""
    kf = curve.kfield
    X, Y, Z = p
    batch = X.shape[1:]
    b3 = kf.const(curve.b3_flat_limbs, batch)
    mul = lambda a, b: kf.mul(acc_ref, a, b)
    fadd = kf.add
    fsub = kf.sub

    t0 = mul(Y, Y)
    t1 = mul(Y, Z)
    t2 = mul(Z, Z)
    txy = mul(X, Y)
    Z8 = fadd(t0, t0)
    Z8 = fadd(Z8, Z8)
    Z8 = fadd(Z8, Z8)
    t2b = mul(b3, t2)
    Y3s = fadd(t0, t2b)
    t0p = fsub(t0, fadd(fadd(t2b, t2b), t2b))
    Xc = mul(t0p, txy)
    X3 = fadd(Xc, Xc)
    Y3 = fadd(mul(t2b, Z8), mul(t0p, Y3s))
    Z3 = mul(t1, Z8)
    return (X3, Y3, Z3)
