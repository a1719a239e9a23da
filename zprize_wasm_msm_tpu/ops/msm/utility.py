"""Utility helpers mirroring the reference's runtime utility module.

TPU-native analog of wasmcurves/src/build_utility.js: the pointer-machine
load/store/copy helpers have no TPU counterpart (static shapes + XLA buffer
assignment replace the bump allocator — SURVEY.md §5.6), but the VALUE
helpers used by the MSM driver are provided as vectorized jnp ops:
  maxArrayValue:  max_array_value
  getMsb:         get_msb
  countNonZero:   count_non_zero
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def max_array_value(a: jnp.ndarray) -> jnp.ndarray:
    """Max over an integer array (ref build_utility.js maxArrayValue)."""
    return jnp.max(a)


def get_msb(a: jnp.ndarray) -> jnp.ndarray:
    """Index of the most significant set bit, elementwise; 0 for input 0
    (ref getMsb:297-308)."""
    a = a.astype(jnp.uint32)
    bits = 31 - jax.lax.clz(a.astype(jnp.int32)).astype(jnp.int32)
    return jnp.where(a == 0, 0, bits)


def count_non_zero(digits: jnp.ndarray) -> jnp.ndarray:
    """Number of non-zero entries (ref countNonZero:312-365) — used by the
    reference's scheduler; here a diagnostic for digit matrices."""
    return jnp.sum((digits != 0).astype(jnp.int32))
