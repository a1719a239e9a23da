"""Curve context: the package's user-facing API object.

TPU-native analog of the reference's protoboard (wasmcurves/index.js:26-29
exports buildBn128/buildBls12381/buildF1m, each returning an instantiated
WASM module whose exports are methods).  Here a ``CurveContext`` bundles a
CurveSpec with bound, jitted methods over limb-vector batches; the "module
instantiation" cost is jit specialization, paid lazily per shape.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..ops.curve import group
from ..ops.curve.spec import CurveSpec
from ..ops.field import mont
from ..ops.msm import glv as glv_mod
from ..ops.msm import pippenger, windows
from ..utils.limbs import ints_to_limbs, limbs_to_ints


@dataclass
class CurveContext:
    spec: CurveSpec

    # ---- marshalling (role of pb.set/pb.get) -----------------------------

    def points_to_device(self, pts: Sequence[Optional[Tuple[int, int]]]):
        """Affine python points (None = infinity) -> Montgomery limb batch.

        Coordinates are ints for ext=1, (c0, c1) tuples for ext=2 — the
        coordinate-field backend handles both uniformly."""
        F = self.spec.field
        xs = [F.const(0 if p is None else p[0]) for p in pts]
        ys = [F.const(0 if p is None else p[1]) for p in pts]
        return (jnp.stack(xs, axis=1), jnp.stack(ys, axis=1))

    def scalars_to_device(self, ks: Sequence[int]) -> jnp.ndarray:
        fr = self.spec.fr
        return jnp.asarray(ints_to_limbs([k % (1 << fr.n_limbs * 16) for k in ks], fr.n_limbs))

    def result_to_affine(self, res) -> Optional[Tuple[int, int]]:
        """Projective device point -> python affine (None = infinity)."""
        F = self.spec.field
        r = tuple(c[:, None] if c.ndim == 1 else c for c in res)
        x, y = group.to_affine(self.spec, r)
        xi = F.to_host(x)[0]
        yi = F.to_host(y)[0]
        zero = 0 if self.spec.ext == 1 else (0,) * self.spec.ext
        return None if (xi == zero and yi == zero) else (xi, yi)

    # ---- MSM (the reference's g1m_multiexp_multiExp) ---------------------

    def msm(
        self,
        points,
        scalars,
        c: Optional[int] = None,
        use_glv: Optional[bool] = None,
        **kw,
    ):
        """points: (X, Y) device batch; scalars: device limb batch.

        Applies GLV preprocessing when the curve supports it (the
        composition the reference leaves to the caller,
        build_glv.js preprocessEndomorphism + multiExp).
        """
        spec = self.spec
        max_bits = kw.pop("max_bits", None)
        if use_glv is None:
            use_glv = spec.glv is not None
        if use_glv and spec.glv is not None:
            points, scalars = glv_mod.preprocess_endomorphism(spec, points, scalars)
            max_bits = glv_mod.MAX_BITS
        return pippenger.msm(spec, points, scalars, c=c, max_bits=max_bits, **kw)

    def msm_host(self, pts, ks, **kw) -> Optional[Tuple[int, int]]:
        """Convenience end-to-end host API: python points/ints in, out."""
        P = self.points_to_device(pts)
        s = self.scalars_to_device(ks)
        return self.result_to_affine(self.msm(P, s, **kw))

    def msm_legacy(self, points, scalars, max_bits=None):
        """The reference's second engine (g1m_multiexpAffine_wasmcurve,
        build_multiexp.js:251), used as a differential oracle for msm()
        (test/batchAffine.js:1258-1301).  Here: an algorithmically disjoint
        per-point double-and-add + tree-sum path (ops.msm.naive) that shares
        NO pipeline stage with the bucket engines — a shared-stage bug
        cannot cancel out of the comparison."""
        from ..ops.msm.naive import msm_naive

        return msm_naive(self.spec, points, scalars, max_bits=max_bits)

    # ---- group-op parity surface (build_curve_jacobian_a0.js exports) -----

    def add(self, p, q):
        return group.add(self.spec, p, q)

    def add_mixed(self, p, q):
        return group.add_mixed(self.spec, p, q)

    def double(self, p):
        return group.double(self.spec, p)

    def neg(self, p):
        return group.neg(self.spec, p)

    def sub(self, p, q):
        return group.sub(self.spec, p, q)

    def eq(self, p, q):
        return group.eq(self.spec, p, q)

    def is_zero(self, p):
        return group.is_zero(self.spec, p)

    def in_curve(self, p):
        return group.in_curve(self.spec, p)

    def in_group_affine(self, P):
        """Subgroup membership on an affine batch (ref g1m/g2m_inGroupAffine,
        build_bls12381.js:1376-1556).  BLS curves only (needs bls_x)."""
        from ..ops.pairing import ingroup

        spec = self.spec
        assert spec.bls_x is not None, f"{spec.name}: no BLS parameter"
        if spec.ext == 1:
            return ingroup.g1_in_group(spec, spec.bls_x, P)
        return ingroup.g2_in_group(spec, spec.bls_x, P)

    def in_group(self, p):
        """Subgroup check on a projective batch (ref g1m_inGroup)."""
        return self.in_group_affine(group.to_affine(self.spec, p))

    # ---- pairing surface (ref g1m/g2m pairing exports per assembly:
    # build_bls12381.js:1592-1615, bn128 :1368, mnt6753 :1345) -------------

    @property
    def _pairing(self):
        """(module, spec) for this curve family's pairing."""
        name = self.spec.name
        if name.startswith("bls12_381"):
            from ..ops.pairing import bls12

            return bls12, bls12.get_bls12_381_spec()
        if name.startswith("bn254") or name == "bn128":
            from ..ops.pairing import bn

            return bn, bn.get_bn254_spec()
        if name.startswith("toy_bn"):
            from ..ops.pairing import bn

            return bn, bn.get_toy_bn_spec()
        if name.startswith("mnt6753"):
            from ..ops.pairing import mnt6

            return mnt6, mnt6.get_mnt6753_spec()
        raise NotImplementedError(f"no pairing for curve {name}")

    def pairing(self, P, Q):
        """e(P, Q) batched: P affine G1 batch, Q affine G2 batch."""
        mod, spec = self._pairing
        return mod.pairing(spec, P, Q)

    def pairing_eq(self, Ps, Qs):
        """prod_i e(P_i, Q_i) == 1 (the reference's pairingEq1-5)."""
        mod, spec = self._pairing
        return mod.pairing_eq(spec, Ps, Qs)

    def miller_loop(self, P, Q):
        mod, spec = self._pairing
        return mod.miller_loop(spec, P, Q)

    def final_exponentiation(self, f):
        mod, spec = self._pairing
        return mod.final_exponentiation(spec, f)

    def times_scalar(self, points, scalars):
        return group.times_scalar(self.spec, points, scalars)

    def group_map(self, T):
        """SvdW hash-to-curve (ref mnt6753 g1m_groupMap,
        build_mnt6753.js:1362-1490).  T: (L, N) Montgomery field batch ->
        projective point batch.  MNT6753 G1 (curves with registered SvdW
        constants) only."""
        from ..ops.curve import groupmap

        return groupmap.group_map(self.spec, T)

    def field_exp(self, a, e):
        """Runtime-exponent field exponentiation (ref f1m_exp,
        build_timesscalar.js wired at build_f1m.js:1375-1384): a, e device
        batches — e as uint32 16-bit limbs, per-lane exponents."""
        assert self.spec.ext == 1, "field_exp is a base-field op"
        return mont.exp(self.spec.fq, a, e)

    def to_affine(self, p):
        """normalize / batchToAffine (ref :940-1128) — batched by nature."""
        return group.to_affine(self.spec, p)

    batch_to_affine = to_affine

    # ---- batched field ops (ref f1m_batch*, build_f1m.js:1351-1357) -------
    # On TPU these route through the Pallas register kernels
    # (ops.field.kernels); on CPU the jnp path.  Montgomery domain.

    def batch_mul(self, a, b):
        from ..ops.field import batch

        return batch.batch_mul(self.spec.fq, a, b)

    def batch_square(self, a):
        from ..ops.field import batch

        return batch.batch_square(self.spec.fq, a)

    def batch_add(self, a, b):
        from ..ops.field import batch

        return batch.batch_add(self.spec.fq, a, b)

    def batch_sub(self, a, b):
        from ..ops.field import batch

        return batch.batch_sub(self.spec.fq, a, b)

    def batch_neg(self, a):
        from ..ops.field import batch

        return batch.batch_neg(self.spec.fq, a)

    def batch_inverse(self, a):
        from ..ops.field import batch

        return batch.batch_inverse(self.spec.fq, a)

    def batch_to_mont(self, a):
        from ..ops.field import batch

        return batch.batch_to_mont(self.spec.fq, a)

    def batch_from_mont(self, a):
        from ..ops.field import batch

        return batch.batch_from_mont(self.spec.fq, a)

    # ---- serialization (ref LEMtoU/LEMtoC/UtoLEM/CtoLEM + batch*) ---------

    def to_uncompressed(self, X, Y):
        from ..utils import serde

        return serde.points_to_uncompressed(self.spec, X, Y)

    def from_uncompressed(self, raw):
        from ..utils import serde

        return serde.points_from_uncompressed(self.spec, raw)

    def to_compressed(self, X, Y):
        from ..utils import serde

        return serde.points_to_compressed(self.spec, X, Y)

    def from_compressed(self, raw):
        from ..utils import serde

        return serde.points_from_compressed(self.spec, raw)

    # ---- FFT over Fr (ref frm_fft/ifft, build_bls12381.js:43) -------------

    def fft(self, x, inverse: bool = False):
        from ..ops.poly import fft as fft_mod

        return fft_mod.fft(self.spec.fr, x, inverse)

    def ifft(self, x):
        from ..ops.poly import fft as fft_mod

        return fft_mod.ifft(self.spec.fr, x)

    def group_fft(self, p, inverse: bool = False):
        from ..ops.poly import fft as fft_mod

        return fft_mod.group_fft(self.spec, p, inverse)

    @property
    def g1(self):
        return group.generator(self.spec, ())

    @property
    def fq(self):
        return self.spec.fq

    @property
    def fr(self):
        return self.spec.fr


def build_curve(spec: CurveSpec) -> CurveContext:
    return CurveContext(spec)
