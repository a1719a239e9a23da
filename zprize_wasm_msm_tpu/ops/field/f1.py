"""Standard-domain (non-Montgomery) field ops.

TPU-native analog of the reference's f1 wrapper (wasmcurves/src/build_f1.js
— `fr`-prefixed ops that round-trip through the Montgomery core, e.g.
mul:43-55 converts both operands in, multiplies, converts out).

Add/sub/neg are domain-agnostic (delegated directly); mul/square/inverse
round-trip exactly like the reference.  Batches are (L, *batch) uint32
16-bit limbs holding canonical standard-domain values.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import mont
from .spec import FieldSpec

add = mont.add
sub = mont.sub
neg = mont.neg
is_zero = mont.is_zero
eq = mont.eq


@functools.partial(jax.jit, static_argnums=(0,))
def mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(a * b) mod q in standard domain (ref build_f1.js mul:43)."""
    am = mont.to_mont(spec, a)
    bm = mont.to_mont(spec, b)
    return mont.from_mont(spec, mont.mont_mul(spec, am, bm))


@functools.partial(jax.jit, static_argnums=(0,))
def square(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    am = mont.to_mont(spec, a)
    return mont.from_mont(spec, mont.mont_square(spec, am))


@functools.partial(jax.jit, static_argnums=(0,))
def inverse(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    am = mont.to_mont(spec, a)
    return mont.from_mont(spec, mont.inverse(spec, am))
