"""batchApplyKey: multiply a vector by a geometric sequence of Fr factors.

TPU-native re-design of wasmcurves/src/build_applykey.js: out[i] =
in[i] ⊗ (first * inc^i), instantiated for Fr vectors and for G1/G2 point
vectors (build_bls12381.js:88-92).  The reference's serial multiply chain
becomes a log-depth doubling construction of the power table, then one
vectorized action.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import group
from ..curve.spec import CurveSpec
from ..field import mont
from ..field.spec import FieldSpec
from ...utils.bigint import int_to_limbs


def _power_table(spec: FieldSpec, first: jnp.ndarray, inc: jnp.ndarray, n: int):
    """(L, n) Montgomery table [first, first*inc, ..., first*inc^(n-1)].

    Log-depth: repeatedly concatenate p and p * inc^len(p) — log2(n)
    vectorized multiplies instead of the reference's n serial ones.
    """
    p = first[:, None]  # (L, 1)
    step = inc  # inc^len(p)
    while p.shape[1] < n:
        scaled = mont.mont_mul(spec, p, step[:, None])
        p = jnp.concatenate([p, scaled], axis=1)
        step = mont.mont_mul(spec, step, step)
    return p[:, :n]


@functools.partial(jax.jit, static_argnums=(0,))
def batch_apply_key_fr(
    spec: FieldSpec, vec: jnp.ndarray, first: jnp.ndarray, inc: jnp.ndarray
) -> jnp.ndarray:
    """Fr vector variant: out[i] = vec[i] * first * inc^i (all Montgomery)."""
    n = vec.shape[1]
    powers = _power_table(spec, first, inc, n)
    return mont.mont_mul(spec, vec, powers)


@functools.partial(jax.jit, static_argnums=(0,))
def batch_apply_key_group(
    curve: CurveSpec, pts, first: jnp.ndarray, inc: jnp.ndarray
):
    """Group variant: out[i] = (first * inc^i) · P_i (opGtimesF = scalar mul).

    pts: projective (X, Y, Z) each (EL, n); first/inc: (Ls,) Montgomery Fr.
    """
    fr = curve.fr
    n = pts[0].shape[1]
    powers_m = _power_table(fr, first, inc, n)
    powers_std = mont.from_mont(fr, powers_m)  # times_scalar takes standard
    return group.times_scalar(curve, pts, powers_std)
