"""Kernel-internal field tower: Fq and Fq2 backends for Pallas bodies.

The kernel-side analog of ops.field.tower — the same field-prefix
parameterization the reference threads through its curve builder
(wasmcurves/src/build_curve_jacobian_a0.js:29 `prefixField`; quadratic
extension ops in src/build_f2m.js mul:153, square:212) — so ONE generic
kernel group layer (ops.curve.kgroup) serves G1 (over Fq) and G2 (over
Fq2).  This is what makes the large-window sorted-runs MSM engine run G2
on TPU, fixing the reference's G1-hardcoding wart
(build_multiexp_opt.js:27-30) *in the kernels*, not just the jnp path.

Element layout matches ops.field.tower exactly:
  Fq:  stacked (L, *batch) uint32 16-bit limbs, Montgomery form.
  Fq2: stacked (2L, *batch) — component 0 in rows [:L], component 1 in
       rows [L:], each a base element.

Every backend shares ONE base-field multiply scratch ``acc_ref`` of shape
(2L+2, *batch): Fq2's Karatsuba runs its 3 base multiplies through it
sequentially, so VMEM scratch cost does not grow with the extension
degree.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from typing import List

import jax.numpy as jnp

from . import kcore
from .spec import FieldSpec


@dataclass(frozen=True)
class KFq:
    """Base prime field kernel backend (delegates to ops.field.kcore)."""

    spec: FieldSpec

    @property
    def elem_len(self) -> int:
        return self.spec.n_limbs

    @property
    def acc_rows(self) -> int:
        """Rows of the shared multiply scratch: (2L+2, *batch)."""
        return 2 * self.spec.n_limbs + 2

    @cached_property
    def one_mont_limbs(self) -> List[int]:
        return [int(v) for v in self.spec.one_mont_limbs]

    def zeros(self, batch_shape):
        return kcore.kconst(self.spec, [0] * self.spec.n_limbs, batch_shape)

    def one(self, batch_shape):
        return kcore.kconst(self.spec, self.one_mont_limbs, batch_shape)

    def const(self, flat_mont_limbs, batch_shape):
        return kcore.kconst(self.spec, flat_mont_limbs, batch_shape)

    def add(self, a, b):
        return kcore.kadd(self.spec, a, b)

    def sub(self, a, b):
        return kcore.ksub(self.spec, a, b)

    def neg(self, a):
        return kcore.kneg(self.spec, a)

    def mul(self, acc_ref, a, b):
        return kcore.kmul(self.spec, acc_ref, a, b)

    def is_zero(self, a):
        return kcore.kis_zero(self.spec, a)

    def select(self, mask, a, b):
        return kcore.kselect(mask, a, b)


@dataclass(frozen=True)
class KFq2:
    """Quadratic extension Fq[u]/(u^2 - nr) kernel backend.

    Mirrors ops.field.tower.Fq2 (ref src/build_f2m.js mul:153): Karatsuba
    multiplication in 3 base multiplies, with the nr = -1 fast path used
    by BLS12-381 and BN254 (u^2 + 1 = 0).
    """

    spec: FieldSpec  # the base field
    nr: int  # non-residue (u^2 = nr), signed small int

    @property
    def elem_len(self) -> int:
        return 2 * self.spec.n_limbs

    @property
    def acc_rows(self) -> int:
        return 2 * self.spec.n_limbs + 2

    @cached_property
    def _nr_is_m1(self) -> bool:
        return self.nr % self.spec.q == self.spec.q - 1

    @cached_property
    def _nr_mont_limbs(self) -> List[int]:
        from ...utils.bigint import int_to_limbs

        return [
            int(v)
            for v in int_to_limbs(
                self.spec.to_mont_int(self.nr % self.spec.q), self.spec.n_limbs
            )
        ]

    @cached_property
    def one_mont_limbs(self) -> List[int]:
        return [int(v) for v in self.spec.one_mont_limbs] + [0] * self.spec.n_limbs

    def _split(self, a):
        L = self.spec.n_limbs
        return a[:L], a[L:]

    def zeros(self, batch_shape):
        return kcore.kconst(self.spec, [0] * self.elem_len, batch_shape)

    def one(self, batch_shape):
        return kcore.kconst(self.spec, self.one_mont_limbs, batch_shape)

    def const(self, flat_mont_limbs, batch_shape):
        assert len(flat_mont_limbs) == self.elem_len
        return kcore.kconst(self.spec, flat_mont_limbs, batch_shape)

    # componentwise ops vectorize over the full stacked (2L, ...) value:
    # kcore's carry loops are per-row, so running them across both halves
    # at once would mix carries — split and rejoin instead.
    def add(self, a, b):
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        return jnp.concatenate(
            [kcore.kadd(self.spec, a0, b0), kcore.kadd(self.spec, a1, b1)]
        )

    def sub(self, a, b):
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        return jnp.concatenate(
            [kcore.ksub(self.spec, a0, b0), kcore.ksub(self.spec, a1, b1)]
        )

    def neg(self, a):
        a0, a1 = self._split(a)
        return jnp.concatenate(
            [kcore.kneg(self.spec, a0), kcore.kneg(self.spec, a1)]
        )

    def _mul_nr(self, acc_ref, a):
        if self._nr_is_m1:
            return kcore.kneg(self.spec, a)
        c = kcore.kconst(self.spec, self._nr_mont_limbs, a.shape[1:])
        return kcore.kmul(self.spec, acc_ref, a, c)

    def mul(self, acc_ref, a, b):
        """(a0 + a1 u)(b0 + b1 u) via Karatsuba: 3 sequential base muls
        through the SHARED (2L+2, *batch) scratch."""
        s = self.spec
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        m0 = kcore.kmul(s, acc_ref, a0, b0)
        m1 = kcore.kmul(s, acc_ref, a1, b1)
        m2 = kcore.kmul(
            s, acc_ref, kcore.kadd(s, a0, a1), kcore.kadd(s, b0, b1)
        )
        c0 = kcore.kadd(s, m0, self._mul_nr(acc_ref, m1))
        c1 = kcore.ksub(s, kcore.ksub(s, m2, m0), m1)
        return jnp.concatenate([c0, c1])

    def is_zero(self, a):
        a0, a1 = self._split(a)
        return kcore.kis_zero(self.spec, a0) & kcore.kis_zero(self.spec, a1)

    def select(self, mask, a, b):
        return kcore.kselect(mask, a, b)


def kfield(curve) -> "KFq | KFq2":
    """The kernel coordinate-field backend for a CurveSpec."""
    if curve.ext == 1:
        return KFq(curve.fq)
    assert curve.ext == 2, f"unsupported extension degree {curve.ext}"
    return KFq2(curve.fq, curve.nr)
