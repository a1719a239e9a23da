"""Sparse polynomial linear combinations over Fr.

TPU-native re-design of the reference's pol module
(wasmcurves/src/build_pol.js — zero1/zero2, constructLC:62): the pointer
walk over per-signal coefficient lists becomes a flat COO triple
(positions, signals, coefficients) and one vectorized multiply + raw-u32
scatter-sum + single modular reduction per output slot (see
ops.field.mont.reduce_redundant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..field import mont
from ..field.mont import U32
from ..field.spec import FieldSpec


@functools.partial(jax.jit, static_argnums=(0, 4))
def construct_lc(
    spec: FieldSpec,
    coefs: jnp.ndarray,
    positions: jnp.ndarray,
    signals: jnp.ndarray,
    n_out: int,
) -> jnp.ndarray:
    """res[positions[j]] += coefs[:, j] * signals[:, j] over Fr.

    coefs:     (L, nnz) Montgomery coefficients.
    positions: (nnz,) int32 destination indices in [0, n_out).
    signals:   (L, nnz) Montgomery signal values, pre-gathered per entry
               (the reference walks (signal, [(pos, coef)...]) lists;
               flatten to COO with the signal value repeated per entry).
    Returns (L, n_out) Montgomery.

    Safe for nnz-per-position up to 2^10 (raw u32 limb sums stay < 2^26
    before the single reduction).
    """
    L = spec.n_limbs
    prod = mont.mont_mul(spec, coefs, signals)  # (L, nnz)
    acc = jnp.zeros((L, n_out), U32)
    acc = acc.at[:, positions].add(prod)
    return mont.reduce_redundant(spec, acc)
