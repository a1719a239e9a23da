"""Fq6 / Fq12 tower arithmetic for pairings, batched on limb vectors.

TPU-native re-design of the reference's extension tower
(wasmcurves/src/build_f3m.js instantiated as f6m over f2m with
mulNR = (1+u)-multiplication, and build_f2m.js as ftm = Fq12 over f6m —
wired at build_bls12381.js:195-252; sparse muls f6m_mul1/mul01 and
ftm_mul014 at :625-788).

Tower (BLS12-381 and BN-style curves with ξ = 1+u):
  Fq2  = Fq[u]/(u^2+1)          — ops.field.tower.Fq2, flat (2L, *batch)
  Fq6  = Fq2[v]/(v^3-ξ)         — flat (6L, *batch), components c0,c1,c2
  Fq12 = Fq6[w]/(w^2-v)         — flat (12L, *batch), components c0,c1

Every op is a composition of batched base-field ops, so one call advances
the whole pair batch; all tensors stay 2-D (limb, batch) internally (the
TPU XLA fusion emitter requirement — see pippenger._flat_add).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import cached_property
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..field import mont
from ..field.spec import FieldSpec
from ..field.tower import Fq2


@dataclass(frozen=True)
class Tower:
    """Fq6/Fq12 ops over a base prime field, parameterized by the sextic
    non-residue ξ ∈ Fq2 (Fq2 = Fq[u]/(u^2+1)).

    ξ = 1 + u for BLS12-381 (ref build_bls12381.js build_mulNR2:195);
    ξ = 9 + u for BN254 (ref src/bn128/build_bn128.js pNonResidueF6:185).
    """

    spec: FieldSpec
    xi: Tuple[int, int] = (1, 1)

    @cached_property
    def f2(self) -> Fq2:
        return Fq2(self.spec, -1)

    @cached_property
    def _xi_mont_flat(self):
        from ...utils.bigint import int_to_limbs

        L = self.spec.n_limbs
        out = []
        for c in self.xi:
            out.extend(
                int(v) for v in int_to_limbs(self.spec.to_mont_int(c % self.spec.q), L)
            )
        return np.asarray(out, np.uint32)

    @property
    def L2(self) -> int:
        return 2 * self.spec.n_limbs

    def _base_map(self, fn, *arrs):
        """Apply a base-field op componentwise over a stacked (mL, *batch)
        array: reshape to (L, m, *batch) so ONE vectorized base op advances
        all m components (limb semantics stay per-component)."""
        L = self.spec.n_limbs
        shp = arrs[0].shape
        m = shp[0] // L

        def to3(x):
            return jnp.moveaxis(x.reshape((m, L) + shp[1:]), 0, 1)

        out = fn(*[to3(x) for x in arrs])
        return jnp.moveaxis(out, 1, 0).reshape(shp)

    # -- Fq2 helpers --------------------------------------------------------

    def f2_mul_xi(self, a):
        """ξ * a.  Fast path for ξ = 1+u: (a0 - a1) + (a0 + a1) u
        (ref build_bls12381.js build_mulNR2:195); general ξ via one Fq2
        multiply by the embedded constant (ref bn128 build_mulNR6:202)."""
        s = self.spec
        L = s.n_limbs
        if self.xi == (1, 1):
            a0, a1 = a[:L], a[L:]
            return jnp.concatenate([mont.sub(s, a0, a1), mont.add(s, a0, a1)])
        batch = a.shape[1:]
        xi = jnp.broadcast_to(
            jnp.asarray(self._xi_mont_flat).reshape((2 * L,) + (1,) * len(batch)),
            a.shape,
        )
        return self.f2.mul(xi, a)

    def f2_scale_fq(self, a2, s1):
        """Scale an Fq2 batch componentwise by an Fq batch (the reference's
        f2m_mul1 over the base field, build_f2m.js)."""
        s = self.spec
        L = s.n_limbs
        return jnp.concatenate(
            [mont.mont_mul(s, a2[:L], s1), mont.mont_mul(s, a2[L:], s1)]
        )

    # -- Fq6 ----------------------------------------------------------------

    def f6_split(self, a):
        k = self.L2
        return a[:k], a[k : 2 * k], a[2 * k :]

    def f6_zero(self, batch):
        return jnp.zeros((3 * self.L2,) + tuple(batch), jnp.uint32)

    def f6_one(self, batch):
        return jnp.concatenate(
            [self.f2.one(batch), self.f2.zeros(batch), self.f2.zeros(batch)]
        )

    def f6_add(self, a, b):
        s = self.spec
        return self._base_map(lambda x, y: mont.add(s, x, y), a, b)

    def f6_sub(self, a, b):
        s = self.spec
        return self._base_map(lambda x, y: mont.sub(s, x, y), a, b)

    def f6_neg(self, a):
        s = self.spec
        return self._base_map(lambda x: mont.neg(s, x), a)

    def f6_mul_nr(self, a):
        """v * (c0 + c1 v + c2 v^2) = ξ c2 + c0 v + c1 v^2
        (ref build_mulNR6:218)."""
        c0, c1, c2 = self.f6_split(a)
        return jnp.concatenate([self.f2_mul_xi(c2), c0, c1])

    def f6_mul(self, a, b):
        """Toom/Karatsuba-style 6-mul Fq6 product (ref build_f3m.js mul:152)."""
        F2 = self.f2
        a0, a1, a2 = self.f6_split(a)
        b0, b1, b2 = self.f6_split(b)
        t0 = F2.mul(a0, b0)
        t1 = F2.mul(a1, b1)
        t2 = F2.mul(a2, b2)
        m01 = F2.mul(F2.add(a0, a1), F2.add(b0, b1))
        m12 = F2.mul(F2.add(a1, a2), F2.add(b1, b2))
        m02 = F2.mul(F2.add(a0, a2), F2.add(b0, b2))
        c0 = F2.add(t0, self.f2_mul_xi(F2.sub(F2.sub(m12, t1), t2)))
        c1 = F2.add(F2.sub(F2.sub(m01, t0), t1), self.f2_mul_xi(t2))
        c2 = F2.add(F2.sub(F2.sub(m02, t0), t2), t1)
        return jnp.concatenate([c0, c1, c2])

    def f6_square(self, a):
        return self.f6_mul(a, a)

    def f6_mul1(self, a, c1):
        """a * (0 + c1 v + 0 v^2), c1 in Fq2 (ref f6m_mul1:625)."""
        F2 = self.f2
        a0, a1, a2 = self.f6_split(a)
        b_b = F2.mul(a1, c1)
        t1 = self.f2_mul_xi(F2.sub(F2.mul(F2.add(a1, a2), c1), b_b))
        t2 = F2.sub(F2.mul(F2.add(a0, a1), c1), b_b)
        return jnp.concatenate([t1, t2, b_b])

    def f6_mul01(self, a, c0, c1):
        """a * (c0 + c1 v), c0/c1 in Fq2 (ref f6m_mul01:668)."""
        F2 = self.f2
        a0, a1, a2 = self.f6_split(a)
        a_a = F2.mul(a0, c0)
        b_b = F2.mul(a1, c1)
        t1 = F2.add(
            self.f2_mul_xi(F2.sub(F2.mul(F2.add(a1, a2), c1), b_b)), a_a
        )
        t2 = F2.sub(F2.sub(F2.mul(F2.add(c0, c1), F2.add(a0, a1)), a_a), b_b)
        t3 = F2.add(F2.sub(F2.mul(F2.add(a0, a2), c0), a_a), b_b)
        return jnp.concatenate([t1, t2, t3])

    def f6_inverse(self, a):
        """Fq6 inverse (ref build_f3m.js inverse:416)."""
        F2 = self.f2
        a0, a1, a2 = self.f6_split(a)
        c0 = F2.sub(F2.square(a0), self.f2_mul_xi(F2.mul(a1, a2)))
        c1 = F2.sub(self.f2_mul_xi(F2.square(a2)), F2.mul(a0, a1))
        c2 = F2.sub(F2.square(a1), F2.mul(a0, a2))
        t = F2.add(
            F2.add(
                self.f2_mul_xi(F2.add(F2.mul(a2, c1), F2.mul(a1, c2))),
                F2.mul(a0, c0),
            ),
            F2.zeros(F2.batch_shape(a0)),
        )
        tinv = F2.inverse(t)
        return jnp.concatenate(
            [F2.mul(c0, tinv), F2.mul(c1, tinv), F2.mul(c2, tinv)]
        )

    # -- Fq12 ---------------------------------------------------------------

    def f12_split(self, a):
        k = 3 * self.L2
        return a[:k], a[k:]

    def f12_one(self, batch):
        return jnp.concatenate([self.f6_one(batch), self.f6_zero(batch)])

    def f12_mul(self, a, b):
        """Karatsuba over Fq6 (ref build_f2m.js mul instantiated as ftm)."""
        a0, a1 = self.f12_split(a)
        b0, b1 = self.f12_split(b)
        t0 = self.f6_mul(a0, b0)
        t1 = self.f6_mul(a1, b1)
        m = self.f6_mul(self.f6_add(a0, a1), self.f6_add(b0, b1))
        c0 = self.f6_add(t0, self.f6_mul_nr(t1))
        c1 = self.f6_sub(self.f6_sub(m, t0), t1)
        return jnp.concatenate([c0, c1])

    def f12_square(self, a):
        """Complex squaring over Fq6."""
        a0, a1 = self.f12_split(a)
        v0 = self.f6_mul(a0, a1)
        t = self.f6_mul(
            self.f6_add(a0, a1), self.f6_add(a0, self.f6_mul_nr(a1))
        )
        c0 = self.f6_sub(
            self.f6_sub(t, v0), self.f6_mul_nr(v0)
        )
        c1 = self.f6_add(v0, v0)
        return jnp.concatenate([c0, c1])

    def f12_conjugate(self, a):
        """a0 - a1 w (= a^(p^6), ref ftm conjugate)."""
        a0, a1 = self.f12_split(a)
        return jnp.concatenate([a0, self.f6_neg(a1)])

    def f12_inverse(self, a):
        a0, a1 = self.f12_split(a)
        t = self.f6_sub(self.f6_square(a0), self.f6_mul_nr(self.f6_square(a1)))
        tinv = self.f6_inverse(t)
        return jnp.concatenate(
            [self.f6_mul(a0, tinv), self.f6_neg(self.f6_mul(a1, tinv))]
        )

    def f12_mul014(self, a, c0, c1, c4):
        """Sparse multiply by (c0 + c1 v) + (c4 v) w — the Miller-loop line
        (ref ftm_mul014:737)."""
        F2 = self.f2
        a0, a1 = self.f12_split(a)
        aa = self.f6_mul01(a0, c0, c1)
        bb = self.f6_mul1(a1, c4)
        o = F2.add(c1, c4)
        r1 = self.f6_mul01(self.f6_add(a1, a0), c0, o)
        r1 = self.f6_sub(self.f6_sub(r1, aa), bb)
        r0 = self.f6_add(self.f6_mul_nr(bb), aa)
        return jnp.concatenate([r0, r1])

    def f12_mul024(self, a, x0, x2, x4):
        """Sparse multiply by x0 + x2 v^2 + x4 v w — the BN Miller-loop line
        (ref src/bn128/build_bn128.js __mulBy024:663-805; component z_i is
        the i-th Fq2 slot of the flat f12 layout, matching the reference's
        offsets z0..z5)."""
        F2 = self.f2
        k = self.L2
        z = [a[m * k : (m + 1) * k] for m in range(6)]
        xi = self.f2_mul_xi

        d0 = F2.mul(z[0], x0)
        d2 = F2.mul(z[2], x2)
        d4 = F2.mul(z[4], x4)
        t2 = F2.add(z[0], z[4])
        t1 = F2.add(z[0], z[2])
        s0 = F2.add(F2.add(z[1], z[3]), z[5])

        # z0'
        s1 = F2.mul(z[1], x2)
        t3 = F2.add(s1, d4)
        o0 = F2.add(xi(t3), d0)
        # z1'
        t3 = F2.mul(z[5], x4)
        s1 = F2.add(s1, t3)
        t3 = F2.add(t3, d2)
        t4 = xi(t3)
        t3 = F2.mul(z[1], x0)
        s1 = F2.add(s1, t3)
        o1 = F2.add(t4, t3)
        # z2'
        t0 = F2.add(x0, x2)
        t3 = F2.sub(F2.mul(t1, t0), F2.add(d0, d2))
        t4 = F2.mul(z[3], x4)
        s1 = F2.add(s1, t4)
        o2 = F2.add(t3, t4)
        # z3'
        t0 = F2.add(z[2], z[4])
        t1b = F2.add(x2, x4)
        t3 = F2.sub(F2.mul(t1b, t0), F2.add(d2, d4))
        t4 = xi(t3)
        t3 = F2.mul(z[3], x0)
        s1 = F2.add(s1, t3)
        o3 = F2.add(t4, t3)
        # z4'
        t3 = F2.mul(z[5], x2)
        s1 = F2.add(s1, t3)
        t4 = xi(t3)
        t0 = F2.add(x0, x4)
        t3 = F2.sub(F2.mul(t2, t0), F2.add(d0, d4))
        o4 = F2.add(t4, t3)
        # z5'
        t0 = F2.add(F2.add(x0, x2), x4)
        o5 = F2.sub(F2.mul(s0, t0), s1)
        return jnp.concatenate([o0, o1, o2, o3, o4, o5])

    # -- Frobenius ----------------------------------------------------------

    @cached_property
    def _frob_gammas(self):
        """Host table γ_k = ξ^(k(q-1)/6) in Fq2 for k = 0..5."""
        from ...oracle import F2 as HostF2

        q = self.spec.q
        hf = HostF2(q, -1)
        xi = self.xi  # (1,1) for the BLS tower, (9,1) for BN
        out = []
        for k in range(6):
            e = k * (q - 1) // 6
            # square-and-multiply in host Fq2
            acc = (1, 0)
            base = xi
            ee = e
            while ee:
                if ee & 1:
                    acc = hf.mul(acc, base)
                base = hf.sqr(base)
                ee >>= 1
            out.append(acc)
        return out

    def _f2_const(self, val, batch):
        return self.f2.const(val, batch)

    def f12_frobenius(self, a):
        """a^q (ref buildFrobeniusMap(1), build_bls12381.js:904).

        Component c_{i,j} of v^i w^j maps to conj(c_{i,j}) * γ_{2i+j}.
        """
        F2 = self.f2
        k = self.L2
        batch = a.shape[1:]
        comps = [a[m * k : (m + 1) * k] for m in range(6)]  # order: (i,j)?
        # layout: [c00, c01, c02 | c10, c11, c12] where first index is w-coef
        # i.e. a = (c00 + c01 v + c02 v^2) + (c10 + c11 v + c12 v^2) w
        out = []
        for widx in range(2):
            for vidx in range(3):
                c = comps[widx * 3 + vidx]
                kexp = 2 * vidx + widx
                cc = F2.conjugate(c)
                if kexp:
                    g = self._f2_const(self._frob_gammas[kexp], batch)
                    cc = F2.mul(cc, g)
                out.append(cc)
        return jnp.concatenate(out)

    def f12_cyclotomic_square(self, a):
        """Granger-Scott cyclotomic squaring (ref cyclotomicSquare:1008) —
        valid for elements of the cyclotomic subgroup (after the easy part
        of the final exponentiation)."""
        F2 = self.f2
        k = self.L2
        c = [a[m * k : (m + 1) * k] for m in range(6)]
        # zkcrypto naming: (z0..z5) with a = z0 + z4 v + z3 v^2? The tower
        # here is [c00,c01,c02,c10,c11,c12]; Granger-Scott works on the
        # Fq4 sub-pairs (c00,c11), (c10,c02), (c01,c12).
        z0, z4, z3, z2, z1, z5 = c[0], c[1], c[2], c[3], c[4], c[5]

        def fp4_square(a0, a1):
            t0 = F2.square(a0)
            t1 = F2.square(a1)
            t2 = self.f2_mul_xi(t1)
            c0 = F2.add(t2, t0)
            t2 = F2.add(a0, a1)
            t2 = F2.square(t2)
            t2 = F2.sub(F2.sub(t2, t0), t1)
            return c0, t2

        t0, t1 = fp4_square(z0, z1)
        z0 = F2.sub(t0, z0)
        z0 = F2.add(F2.add(z0, z0), t0)
        z1 = F2.add(t1, z1)
        z1 = F2.add(F2.add(z1, z1), t1)

        t0, t1 = fp4_square(z2, z3)
        t2, t3 = fp4_square(z4, z5)

        z4 = F2.sub(t0, z4)
        z4 = F2.add(F2.add(z4, z4), t0)
        z5 = F2.add(t1, z5)
        z5 = F2.add(F2.add(z5, z5), t1)

        t0 = self.f2_mul_xi(t3)
        z2 = F2.add(t0, z2)
        z2 = F2.add(F2.add(z2, z2), t0)
        z3 = F2.sub(t2, z3)
        z3 = F2.add(F2.add(z3, z3), t2)
        return jnp.concatenate([z0, z4, z3, z2, z1, z5])
