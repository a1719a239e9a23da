"""QAP (Groth16) witness evaluation over Fr.

TPU-native re-design of wasmcurves/src/build_qap.js — buildABC:8 (sparse
coefficient records (m, c, s) scattered into per-constraint A/B sums),
joinABC:217 (elementwise A*B - C) and batchAdd:278.

The reference walks (n8+12)-byte records in linear memory; here the record
stream is a flat COO quadruple (matrix, constraint, signal, coef) and the
evaluation is one vectorized multiply + raw-u32 scatter-sum + one modular
reduction per output (ops.field.mont.reduce_redundant).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..field import mont
from ..field.mont import U32
from ..field.spec import FieldSpec


@functools.partial(jax.jit, static_argnums=(0, 5))
def build_abc(
    spec: FieldSpec,
    matrix: jnp.ndarray,
    constraint: jnp.ndarray,
    coefs: jnp.ndarray,
    witness_vals: jnp.ndarray,
    n_constraints: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Evaluate the A and B constraint polynomials at the witness.

    matrix:       (nnz,) int32 — 0 for A records, 1 for B (the reference
                  skips m >= 2 records; filter host-side).
    constraint:   (nnz,) int32 — destination constraint index.
    coefs:        (L, nnz) Montgomery coefficients.
    witness_vals: (L, nnz) Montgomery witness values, pre-gathered by the
                  record's signal index (the reference's i32_load + offset
                  walk, build_qap.js:~120).
    Returns (A, B), each (L, n_constraints) Montgomery.
    """
    L = spec.n_limbs
    prod = mont.mont_mul(spec, coefs, witness_vals)  # (L, nnz)
    is_a = (matrix == 0)[None]
    zeros = jnp.zeros_like(prod)
    acc_a = jnp.zeros((L, n_constraints), U32)
    acc_b = jnp.zeros((L, n_constraints), U32)
    acc_a = acc_a.at[:, constraint].add(jnp.where(is_a, prod, zeros))
    acc_b = acc_b.at[:, constraint].add(jnp.where(is_a, zeros, prod))
    return (
        mont.reduce_redundant(spec, acc_a),
        mont.reduce_redundant(spec, acc_b),
    )


@functools.partial(jax.jit, static_argnums=(0,))
def mul_ab(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """C = A * B elementwise (second loop of buildABC, build_qap.js:~200)."""
    return mont.mont_mul(spec, a, b)


@functools.partial(jax.jit, static_argnums=(0,))
def join_abc(
    spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray, c: jnp.ndarray
) -> jnp.ndarray:
    """P = A*B - C elementwise (ref joinABC:217)."""
    return mont.sub(spec, mont.mont_mul(spec, a, b), c)


@functools.partial(jax.jit, static_argnums=(0,))
def batch_add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """r = a + b elementwise (ref batchAdd:278)."""
    return mont.add(spec, a, b)
