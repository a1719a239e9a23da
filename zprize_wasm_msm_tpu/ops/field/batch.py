"""Batched field ops with backend dispatch: the f1m_batch* surface.

Parity with the reference's batch wrappers (wasmcurves/src/build_f1m.js
:1351-1357 wires batchInverse / batchToMontgomery / batchFromMontgomery /
batchNeg / batchAdd / batchSub / batchMul over strided arrays via
build_batchconvertion.js / build_batchop.js).

On TPU backends the multiplicative ops route through the Pallas register
kernels (ops.field.kernels) — the jnp CIOS chain materializes its (2L+2, N)
accumulator in HBM every round-trip and measures ~25x slower there; on CPU
(tests) everything uses the jnp path.  Results are bit-identical either way
(same reduction, same bounds; enforced by tests/test_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import kernels, mont
from .spec import FieldSpec


def _use_pallas() -> bool:
    import os

    forced = os.environ.get("ZPTPU_FIELD_IMPL")
    if forced in ("pallas", "xla"):
        return forced == "pallas"
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def batch_mul(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise Montgomery product over an (L, N) batch."""
    if _use_pallas():
        return kernels.mont_mul(spec, a, b)
    return mont.mont_mul(spec, a, b)


def batch_square(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    if _use_pallas():
        return kernels.mont_square(spec, a)
    return mont.mont_square(spec, a)


def batch_add(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return mont.add(spec, a, b)


def batch_sub(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return mont.sub(spec, a, b)


def batch_neg(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont.neg(spec, a)


def batch_inverse(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    return mont.batch_inverse(spec, a)


def batch_to_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """batchToMontgomery: a -> a*R, one batch_mul by R^2."""
    r2 = jnp.broadcast_to(
        mont._const(spec.r2_limbs, a.ndim - 1), a.shape
    )
    return batch_mul(spec, a, r2)


def batch_from_mont(spec: FieldSpec, a: jnp.ndarray) -> jnp.ndarray:
    """batchFromMontgomery: a -> a*R^{-1}, one batch_mul by 1."""
    one = jnp.zeros_like(a).at[0].set(1)
    return batch_mul(spec, a, one)
