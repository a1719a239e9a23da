"""Naive MSM: per-point double-and-add + tree sum — the differential engine.

Role of the reference's legacy Pippenger (wasmcurves/src/build_multiexp.js
g1m_multiexpAffine_wasmcurve:251-371): an INDEPENDENT second engine the
optimized pipeline is cross-checked against on random inputs
(test/batchAffine.js:1258-1301).  This implementation is algorithmically
disjoint from the bucket pipeline on purpose — it shares only the group/
field kernels, not the digit recode, bucket accumulation, bucket_reduce,
or window_fold stages, so a bug in any shared MSM stage cannot cancel out
of an engine-vs-engine comparison.

Algorithm: k_i * P_i for every point in parallel via the branch-free
double-and-add ladder (group.times_scalar, one lane per point), then a
log2(N) pairwise tree reduction over the point axis.  O(N * max_bits)
group doubles — asymptotically far worse than Pippenger, but fully
parallel across lanes and trivially correct.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..curve import group
from ..curve.spec import CurveSpec


@functools.partial(jax.jit, static_argnums=(0, 3))
def _msm_naive_jit(curve, points, scalars, max_bits):
    X, Y = points
    Ls = (max_bits + 15) // 16
    P = group.from_affine(curve, (X, Y))
    prods = group.times_scalar(curve, P, scalars[:Ls])
    # pairwise tree over the point axis: (L, N) -> (L,)
    px, py, pz = prods
    n = px.shape[1]
    while n > 1:
        half = n // 2
        s = group.add(
            curve,
            (px[:, :half], py[:, :half], pz[:, :half]),
            (px[:, half : 2 * half], py[:, half : 2 * half], pz[:, half : 2 * half]),
        )
        if n % 2:
            px = jnp.concatenate([s[0], px[:, -1:]], axis=1)
            py = jnp.concatenate([s[1], py[:, -1:]], axis=1)
            pz = jnp.concatenate([s[2], pz[:, -1:]], axis=1)
            n = half + 1
        else:
            px, py, pz = s
            n = half
    return (px[:, 0], py[:, 0], pz[:, 0])


def msm_naive(
    curve: CurveSpec,
    points: Tuple[jnp.ndarray, jnp.ndarray],
    scalars: jnp.ndarray,
    max_bits: Optional[int] = None,
):
    """points: affine (X, Y) each (L, N) Montgomery; scalars (Ls, N) u32
    16-bit limbs, standard domain.  Returns one projective point."""
    if max_bits is None:
        max_bits = scalars.shape[0] * 16
    return _msm_naive_jit(curve, points, scalars, max_bits)
