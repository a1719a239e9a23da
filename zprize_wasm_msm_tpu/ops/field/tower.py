"""Field tower backends: a uniform op surface over Fq and Fq2.

TPU-native analog of the reference's field-prefix parameterization: the
curve builder takes a field *prefix* ("f1m" or "f2m") and emits calls to
that field's exported ops (wasmcurves/src/build_curve_jacobian_a0.js:29
`prefixField` arg; quadratic extension in src/build_f2m.js — mul:153,
square:212, inverse:379, conjugate:115).  Here a frozen backend object
carries the same specialization so ONE generic group/MSM layer serves G1
(over Fq) and G2 (over Fq2).

Element layouts (all Montgomery form):
  Fq:   (L, *batch) uint32 — as ops.field.mont.
  Fq2:  (2L, *batch) uint32 — flat: component 0 in limbs [:L], component 1
        in [L:], so generic shape logic downstream (padding, reshapes,
        bucket layouts) treats extension elements as wider base elements.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from typing import Tuple, Union

import jax.numpy as jnp
import numpy as np

from . import mont
from .mont import U32
from .spec import FieldSpec

IntLike = Union[int, Tuple[int, ...]]


@dataclass(frozen=True)
class Fq:
    """Base prime field backend (delegates to ops.field.mont)."""

    spec: FieldSpec

    #: leading element axes before the batch (limb axis only)
    elem_ndim = 1

    @property
    def elem_len(self) -> int:
        return self.spec.n_limbs

    def batch_shape(self, a):
        return a.shape[1:]

    def zeros(self, batch_shape=()):
        return mont.zeros(self.spec, batch_shape)

    def one(self, batch_shape=()):
        return mont.one_mont(self.spec, batch_shape)

    def const(self, value: IntLike, batch_shape=()):
        """Host int (standard domain) -> Montgomery element batch."""
        assert isinstance(value, int)
        return mont.full_const(
            self.spec, self.spec.to_mont_int(value), batch_shape
        )

    def add(self, a, b):
        return mont.add(self.spec, a, b)

    def sub(self, a, b):
        return mont.sub(self.spec, a, b)

    def neg(self, a):
        return mont.neg(self.spec, a)

    def mul(self, a, b):
        return mont.mont_mul(self.spec, a, b)

    def mul_many(self, pairs):
        """One stacked multiply for independent products (see group._mul_many)."""
        k = len(pairs)
        if k == 1:
            return [self.mul(*pairs[0])]
        a = jnp.stack([p[0] for p in pairs], axis=1)
        b = jnp.stack([p[1] for p in pairs], axis=1)
        r = mont.mont_mul(self.spec, a, b)
        return [r[:, i] for i in range(k)]

    def square(self, a):
        return mont.mont_square(self.spec, a)

    def inverse(self, a):
        return mont.inverse(self.spec, a)

    def batch_inverse(self, a):
        return mont.batch_inverse(self.spec, a)

    def is_zero(self, a):
        return mont.is_zero(self.spec, a)

    def eq(self, a, b):
        return mont.eq(self.spec, a, b)

    def select(self, mask, a, b):
        return jnp.where(mask[None], a, b)

    def sqrt(self, a):
        return mont.sqrt(self.spec, a)

    # host-side marshalling ------------------------------------------------
    def to_host(self, a) -> list:
        from ...utils.limbs import limbs_to_ints

        vals = limbs_to_ints(np.asarray(a))
        return [self.spec.from_mont_int(v) for v in vals]


@dataclass(frozen=True)
class Fq2:
    """Quadratic extension Fq[u]/(u^2 - nr) (ref src/build_f2m.js).

    For BLS12-381 and BN254, nr = -1 (u^2 + 1 = 0).

    Flat element layout: (2L, *batch) uint32 — component 0 in limbs [:L],
    component 1 in limbs [L:].  The flat leading axis lets every generic
    shape computation downstream (padding, reshapes, bucket layouts in
    ops.msm) treat extension elements exactly like wider base elements.
    """

    spec: FieldSpec  # the base field
    nr: int  # non-residue, as a signed small int (e.g. -1)

    elem_ndim = 1

    @property
    def elem_len(self) -> int:
        return 2 * self.spec.n_limbs

    @cached_property
    def _nr_is_m1(self) -> bool:
        return self.nr % self.spec.q == self.spec.q - 1

    @cached_property
    def _nr_mont_limbs(self):
        from ...utils.bigint import int_to_limbs

        return int_to_limbs(
            self.spec.to_mont_int(self.nr % self.spec.q), self.spec.n_limbs
        )

    def _split(self, a):
        L = self.spec.n_limbs
        return a[:L], a[L:]

    def batch_shape(self, a):
        return a.shape[1:]

    def zeros(self, batch_shape=()):
        return jnp.zeros((self.elem_len,) + tuple(batch_shape), U32)

    def one(self, batch_shape=()):
        return jnp.concatenate(
            [mont.one_mont(self.spec, batch_shape), mont.zeros(self.spec, batch_shape)]
        )

    def const(self, value: IntLike, batch_shape=()):
        if isinstance(value, int):
            value = (value, 0)
        return jnp.concatenate(
            [
                mont.full_const(self.spec, self.spec.to_mont_int(v), batch_shape)
                for v in value
            ]
        )

    def _mul_nr(self, a):
        """Multiply a base-field batch by the non-residue."""
        if self._nr_is_m1:
            return mont.neg(self.spec, a)
        c = jnp.asarray(self._nr_mont_limbs, U32).reshape(
            (self.spec.n_limbs,) + (1,) * (a.ndim - 1)
        )
        return mont.mont_mul(self.spec, a, jnp.broadcast_to(c, a.shape))

    def add(self, a, b):
        # componentwise; the base op vectorizes over the stacked limb axis
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        return jnp.concatenate(
            [mont.add(self.spec, a0, b0), mont.add(self.spec, a1, b1)]
        )

    def sub(self, a, b):
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        return jnp.concatenate(
            [mont.sub(self.spec, a0, b0), mont.sub(self.spec, a1, b1)]
        )

    def neg(self, a):
        a0, a1 = self._split(a)
        return jnp.concatenate(
            [mont.neg(self.spec, a0), mont.neg(self.spec, a1)]
        )

    def conjugate(self, a):
        """(a0, a1) -> (a0, -a1) (ref build_f2m.js conjugate:115)."""
        a0, a1 = self._split(a)
        return jnp.concatenate([a0, mont.neg(self.spec, a1)])

    def mul(self, a, b):
        """Karatsuba: 3 base muls (ref build_f2m.js mul:153)."""
        s = self.spec
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        m0, m1, m2 = Fq(s).mul_many(
            [
                (a0, b0),
                (a1, b1),
                (mont.add(s, a0, a1), mont.add(s, b0, b1)),
            ]
        )
        c0 = mont.add(s, m0, self._mul_nr(m1))
        c1 = mont.sub(s, mont.sub(s, m2, m0), m1)
        return jnp.concatenate([c0, c1])

    def mul_many(self, pairs):
        k = len(pairs)
        if k == 1:
            return [self.mul(*pairs[0])]
        a = jnp.stack([p[0] for p in pairs], axis=1)
        b = jnp.stack([p[1] for p in pairs], axis=1)
        r = self.mul(a, b)
        return [r[:, i] for i in range(k)]

    def square(self, a):
        """Complex squaring (2 base muls, ref build_f2m.js square:212)."""
        s = self.spec
        a0, a1 = self._split(a)
        if self._nr_is_m1:
            p, q = Fq(s).mul_many(
                [
                    (mont.add(s, a0, a1), mont.sub(s, a0, a1)),
                    (a0, a1),
                ]
            )
            return jnp.concatenate([p, mont.add(s, q, q)])
        return self.mul(a, a)

    def norm(self, a):
        """a0^2 - nr*a1^2 (base-field batch)."""
        s = self.spec
        a0, a1 = self._split(a)
        sq0, sq1 = Fq(s).mul_many([(a0, a0), (a1, a1)])
        return mont.sub(s, sq0, self._mul_nr(sq1))

    def inverse(self, a):
        """conj(a) / norm(a) (ref build_f2m.js inverse:379)."""
        s = self.spec
        a0, a1 = self._split(a)
        ninv = mont.inverse(s, self.norm(a))
        return jnp.concatenate(
            [
                mont.mont_mul(s, a0, ninv),
                mont.neg(s, mont.mont_mul(s, a1, ninv)),
            ]
        )

    def batch_inverse(self, a):
        s = self.spec
        a0, a1 = self._split(a)
        ninv = mont.batch_inverse(s, self.norm(a))
        return jnp.concatenate(
            [
                mont.mont_mul(s, a0, ninv),
                mont.neg(s, mont.mont_mul(s, a1, ninv)),
            ]
        )

    def is_zero(self, a):
        a0, a1 = self._split(a)
        return mont.is_zero(self.spec, a0) & mont.is_zero(self.spec, a1)

    def eq(self, a, b):
        a0, a1 = self._split(a)
        b0, b1 = self._split(b)
        return mont.eq(self.spec, a0, b0) & mont.eq(self.spec, a1, b1)

    def select(self, mask, a, b):
        return jnp.where(mask[None], a, b)

    def sign(self, a):
        """sign(a1) if a1 != 0 else sign(a0) (ref build_f2m.js sign:411)."""
        a0, a1 = self._split(a)
        s1 = mont.sign(self.spec, a1)
        return jnp.where(s1 != 0, s1, mont.sign(self.spec, a0))

    def exp_const(self, a, e: int):
        """a^e for a host-known exponent (MSB-first ladder, the Fq2
        instantiation of build_timesscalar.js — ref f2m_exp wiring)."""
        import jax

        if e == 0:
            return self.one(self.batch_shape(a))
        nbits = e.bit_length()
        bits = jnp.asarray(
            np.array([(e >> (nbits - 1 - i)) & 1 for i in range(nbits)], np.uint32)
        )

        def body(i, acc):
            acc = self.square(acc)
            return self.select(bits[i] == 1, self.mul(acc, a), acc)

        return jax.lax.fori_loop(1, nbits, body, a)

    def sqrt(self, a):
        """Square root in Fq2 for q ≡ 3 (mod 4) — algorithm 9 (adjusted)
        of eprint 2012/685, exactly the reference's f2m sqrt
        (build_f2m.js buildSqrt:453-522).  Returns (root, has_root mask);
        branch-free (the reference traps on non-residues instead).
        """
        s = self.spec
        q = s.q
        assert q % 4 == 3, "Fq2 sqrt implemented for q = 3 mod 4 (ref parity)"
        batch = self.batch_shape(a)
        a1 = self.exp_const(a, (q - 3) // 4)
        alpha = self.mul(self.square(a1), a)
        x0 = self.mul(a1, a)
        neg_one = self.neg(self.one(batch))
        alpha_is_m1 = self.eq(alpha, neg_one)
        # branch 1: x = x0 * u
        u = self.const((0, 1), batch)
        xa = self.mul(u, x0)
        # branch 2: x = (1 + alpha)^((q-1)/2) * x0
        b = self.exp_const(self.add(self.one(batch), alpha), (q - 1) // 2)
        xb = self.mul(b, x0)
        x = self.select(alpha_is_m1, xa, xb)
        ok = self.eq(self.square(x), a) | self.is_zero(a)
        return x, ok

    def to_host(self, a) -> list:
        from ...utils.limbs import limbs_to_ints

        a = np.asarray(a)
        a0, a1 = self._split(a)
        c0 = limbs_to_ints(a0)
        c1 = limbs_to_ints(a1)
        f = self.spec.from_mont_int
        return [(f(x), f(y)) for x, y in zip(c0, c1)]


@dataclass(frozen=True)
class Fq3:
    """Cubic extension Fq[v]/(v^3 - nr) (ref src/build_f3m.js — mul:152,
    square:218, inverse:416; instantiated for MNT6753 with nr = 11,
    src/mnt6753/build_mnt6753.js build_mulNR3:34-51).

    Flat element layout: (3L, *batch) uint32 — component k in limb rows
    [kL:(k+1)L], matching the Fq2 convention so the generic group/MSM
    layers treat extension elements as wider base elements.
    """

    spec: FieldSpec  # the base field
    nr: int  # non-residue (v^3 = nr), small positive int

    elem_ndim = 1

    @property
    def elem_len(self) -> int:
        return 3 * self.spec.n_limbs

    @cached_property
    def _nr_mont_limbs(self):
        from ...utils.bigint import int_to_limbs

        return int_to_limbs(
            self.spec.to_mont_int(self.nr % self.spec.q), self.spec.n_limbs
        )

    def _split(self, a):
        L = self.spec.n_limbs
        return a[:L], a[L : 2 * L], a[2 * L :]

    def batch_shape(self, a):
        return a.shape[1:]

    def zeros(self, batch_shape=()):
        return jnp.zeros((self.elem_len,) + tuple(batch_shape), U32)

    def one(self, batch_shape=()):
        return jnp.concatenate(
            [
                mont.one_mont(self.spec, batch_shape),
                mont.zeros(self.spec, batch_shape),
                mont.zeros(self.spec, batch_shape),
            ]
        )

    def const(self, value: IntLike, batch_shape=()):
        if isinstance(value, int):
            value = (value, 0, 0)
        assert len(value) == 3
        return jnp.concatenate(
            [
                mont.full_const(self.spec, self.spec.to_mont_int(v), batch_shape)
                for v in value
            ]
        )

    def _mul_nr(self, a):
        """Multiply a base-field batch by the non-residue (mulNR3)."""
        c = jnp.asarray(self._nr_mont_limbs, U32).reshape(
            (self.spec.n_limbs,) + (1,) * (a.ndim - 1)
        )
        return mont.mont_mul(self.spec, a, jnp.broadcast_to(c, a.shape))

    def _base_map(self, fn, *arrs):
        L = self.spec.n_limbs
        shp = arrs[0].shape

        def to3(x):
            return jnp.moveaxis(x.reshape((3, L) + shp[1:]), 0, 1)

        out = fn(*[to3(x) for x in arrs])
        return jnp.moveaxis(out, 1, 0).reshape(shp)

    def add(self, a, b):
        s = self.spec
        return self._base_map(lambda x, y: mont.add(s, x, y), a, b)

    def sub(self, a, b):
        s = self.spec
        return self._base_map(lambda x, y: mont.sub(s, x, y), a, b)

    def neg(self, a):
        s = self.spec
        return self._base_map(lambda x: mont.neg(s, x), a)

    def mul(self, a, b):
        """6-multiplication Karatsuba-style product (ref build_f3m.js
        mul:152 — same interpolation as the Fq6-over-Fq2 product)."""
        s = self.spec
        a0, a1, a2 = self._split(a)
        b0, b1, b2 = self._split(b)
        t0, t1, t2, m01, m12, m02 = Fq(s).mul_many(
            [
                (a0, b0),
                (a1, b1),
                (a2, b2),
                (mont.add(s, a0, a1), mont.add(s, b0, b1)),
                (mont.add(s, a1, a2), mont.add(s, b1, b2)),
                (mont.add(s, a0, a2), mont.add(s, b0, b2)),
            ]
        )
        c0 = mont.add(
            s, t0, self._mul_nr(mont.sub(s, mont.sub(s, m12, t1), t2))
        )
        c1 = mont.add(
            s, mont.sub(s, mont.sub(s, m01, t0), t1), self._mul_nr(t2)
        )
        c2 = mont.add(s, mont.sub(s, mont.sub(s, m02, t0), t2), t1)
        return jnp.concatenate([c0, c1, c2])

    def mul_many(self, pairs):
        k = len(pairs)
        if k == 1:
            return [self.mul(*pairs[0])]
        a = jnp.stack([p[0] for p in pairs], axis=1)
        b = jnp.stack([p[1] for p in pairs], axis=1)
        r = self.mul(a, b)
        return [r[:, i] for i in range(k)]

    def square(self, a):
        return self.mul(a, a)

    def inverse(self, a):
        """Fq3 inverse (ref build_f3m.js inverse:416): the norm-style
        cofactor formula c_i / (a0 c0 + nr (a2 c1 + a1 c2))."""
        s = self.spec
        a0, a1, a2 = self._split(a)
        sq0, sq1, sq2, m01, m02, m12 = Fq(s).mul_many(
            [(a0, a0), (a1, a1), (a2, a2), (a0, a1), (a0, a2), (a1, a2)]
        )
        c0 = mont.sub(s, sq0, self._mul_nr(m12))
        c1 = mont.sub(s, self._mul_nr(sq2), m01)
        c2 = mont.sub(s, sq1, m02)
        u0, u1 = Fq(s).mul_many([(a2, c1), (a1, c2)])
        (t0,) = Fq(s).mul_many([(a0, c0)])
        t = mont.add(s, t0, self._mul_nr(mont.add(s, u0, u1)))
        tinv = mont.inverse(s, t)
        r0, r1, r2 = Fq(s).mul_many([(c0, tinv), (c1, tinv), (c2, tinv)])
        return jnp.concatenate([r0, r1, r2])

    def batch_inverse(self, a):
        # the cofactor trick already shares ONE base inversion per element;
        # batching happens along the lane axis for free
        return self.inverse(a)

    def is_zero(self, a):
        a0, a1, a2 = self._split(a)
        s = self.spec
        return mont.is_zero(s, a0) & mont.is_zero(s, a1) & mont.is_zero(s, a2)

    def eq(self, a, b):
        a0, a1, a2 = self._split(a)
        b0, b1, b2 = self._split(b)
        s = self.spec
        return (
            mont.eq(s, a0, b0) & mont.eq(s, a1, b1) & mont.eq(s, a2, b2)
        )

    def select(self, mask, a, b):
        return jnp.where(mask[None], a, b)

    def sign(self, a):
        """Sign of the highest nonzero component, order c2 -> c1 -> c0
        (ref build_f3m.js sign:473) — the convention compressed serde
        uses to pick the 'greatest' root."""
        a0, a1, a2 = self._split(a)
        s = self.spec
        s2 = mont.sign(s, a2)
        s1 = mont.sign(s, a1)
        return jnp.where(s2 != 0, s2, jnp.where(s1 != 0, s1, mont.sign(s, a0)))

    def sqrt(self, a):
        raise NotImplementedError(
            "Fq3 square root is not implemented (the reference's f3m has no "
            "sqrt either, build_f3m.js); compressed decode is unavailable "
            "for cubic-extension curves — use uncompressed serialization."
        )

    def to_host(self, a) -> list:
        from ...utils.limbs import limbs_to_ints

        a = np.asarray(a)
        a0, a1, a2 = self._split(a)
        f = self.spec.from_mont_int
        return [
            (f(x), f(y), f(z))
            for x, y, z in zip(
                limbs_to_ints(a0), limbs_to_ints(a1), limbs_to_ints(a2)
            )
        ]
