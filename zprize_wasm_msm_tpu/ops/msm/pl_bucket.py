"""Pallas TPU kernel for Pippenger bucket accumulation.

The MSM hot loop (ref wasmcurves/src/build_multiexp_opt.js — the role of
organizeBuckets:568 + evaluateAdditionChains:810, re-architected): stream
the point batch through the chip once, and for every (window, lane) pair
accumulate each point into its signed-digit bucket with ONE complete
mixed addition per (point, window).

TPU-native design decisions:
  * Buckets are VMEM-resident for the whole sweep: the bucket state is the
    kernel OUTPUT with a constant index_map, so Mosaic keeps one copy on
    chip across all grid steps (the canonical reduction pattern).
  * TPUs have no per-lane gather/scatter, so the bucket read/write is a
    B-way masked select over the bucket axis.  With the small-window
    regime (c <= 6, B = 2^(c-1) <= 32) the select cost is a few percent
    of the mixed-add arithmetic.
  * Small c trades more windows (W ~ 34 for GLV half-scalars at c=4) for
    buckets that fit VMEM; the XLA jnp path keeps the large-c regime.
    Work is N*W mixed adds either way — c only moves the VMEM/adds knob.
  * The per-step vector width is (W, T): windows on sublanes, T point
    lanes on the 128-lane axis, so every field op fills the VPU grid.

The digit semantics match windows.signed_window_digits exactly; results
equal the XLA path as group elements (same field core, same formulas; the
projective representatives differ because this kernel partitions points to
lanes interleaved while the jnp path chunks them — addition order differs).
Enforced by tests/test_kernels.py in Pallas interpret mode.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..curve import kgroup
from ..curve.spec import CurveSpec
from ..field import kcore
from ..field.spec import FieldSpec

U32 = jnp.uint32
I32 = jnp.int32


def vmem_bytes(curve: CurveSpec, W: int, T: int, c: int) -> int:
    """Estimated VMEM footprint of the bucket state + mul scratch."""
    L = curve.fq.n_limbs
    B = 1 << (c - 1)
    Wpad = -(-W // 8) * 8
    state = 3 * B * L * Wpad * T * 4
    scratch = (2 * L + 2) * Wpad * T * 4
    return state + scratch


def _kernel(curve: CurveSpec, c: int, dig_ref, x_ref, y_ref,
            bx_ref, by_ref, bz_ref, acc_ref):
    fq = curve.fq
    L = fq.n_limbs
    B = 1 << (c - 1)
    W, T = dig_ref.shape[1], dig_ref.shape[2]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        zeros = jnp.zeros_like(bx_ref)
        ones = kcore.kconst(fq, fq.one_mont_limbs, (W, T))  # (L, W, T)
        bx_ref[:] = zeros
        by_ref[:] = jnp.broadcast_to(ones[None], by_ref.shape)
        bz_ref[:] = zeros

    d = dig_ref[0]  # (W, T) int32 in [-B, B]
    px = x_ref[0]  # (L, T)
    py = y_ref[0]
    pxw = jnp.broadcast_to(px[:, None, :], (L, W, T))
    pyw = jnp.broadcast_to(py[:, None, :], (L, W, T))

    is_zero = d == 0
    neg = d < 0
    idx = jnp.where(neg, -d, d) - 1
    idx = jnp.where(is_zero, 0, idx)  # (W, T) in [0, B)

    y_eff = kcore.kselect(neg, kcore.kneg(fq, pyw), pyw)
    x_eff = kcore.kselect(is_zero, jnp.zeros_like(pxw), pxw)
    y_eff = kcore.kselect(is_zero, jnp.zeros_like(pyw), y_eff)

    # B-way masked gather of each lane's current bucket value
    cur_x, cur_y, cur_z = bx_ref[0], by_ref[0], bz_ref[0]
    for b in range(1, B):
        m = idx == b
        cur_x = kcore.kselect(m, bx_ref[b], cur_x)
        cur_y = kcore.kselect(m, by_ref[b], cur_y)
        cur_z = kcore.kselect(m, bz_ref[b], cur_z)

    new = kgroup.kadd_mixed(curve, acc_ref, (cur_x, cur_y, cur_z), (x_eff, y_eff))

    # B-way masked scatter back (zero digits write new == cur: harmless)
    for b in range(B):
        m = idx == b
        bx_ref[b] = kcore.kselect(m, new[0], bx_ref[b])
        by_ref[b] = kcore.kselect(m, new[1], by_ref[b])
        bz_ref[b] = kcore.kselect(m, new[2], bz_ref[b])


@functools.partial(
    jax.jit, static_argnums=(0,), static_argnames=("lanes", "c", "raw")
)
def bucket_accumulate(
    curve: CurveSpec,
    points: Tuple[jnp.ndarray, jnp.ndarray],
    digits: jnp.ndarray,
    *,
    lanes: int = 128,
    c: int = 4,
    raw: bool = False,
):
    """Scatter-accumulate points into per-(window, lane) signed buckets.

    points: affine (X, Y), each (L, N) Montgomery.
    digits: (W, N) int32 signed digits (windows.signed_window_digits).
    lanes:  T, point lanes processed per grid step (N padded to multiple).
    Returns bucket sums (X, Y, Z), each (L, W, T, B), lane axis unreduced
    (callers tree-reduce T with jnp group adds).
    """
    fq = curve.fq
    L = fq.n_limbs
    B = 1 << (c - 1)
    T = lanes
    X, Y = points
    W, N = digits.shape
    pad = (-N) % T
    if pad:
        zf = jnp.zeros((L, pad), U32)
        X = jnp.concatenate([X, zf], axis=1)
        Y = jnp.concatenate([Y, zf], axis=1)
        digits = jnp.concatenate([digits, jnp.zeros((W, pad), I32)], axis=1)
    steps = (N + pad) // T

    # grid axis leads so each block's trailing two dims equal the array's
    # (Mosaic requires trailing block dims divisible by (8, 128) or full)
    d3 = jnp.moveaxis(digits.reshape(W, steps, T), 1, 0)  # (steps, W, T)
    x3 = jnp.moveaxis(X.reshape(L, steps, T), 1, 0)  # (steps, L, T)
    y3 = jnp.moveaxis(Y.reshape(L, steps, T), 1, 0)

    out_shape = jax.ShapeDtypeStruct((B, L, W, T), U32)
    grid_out_spec = pl.BlockSpec(
        (B, L, W, T), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    bx, by, bz = pl.pallas_call(
        functools.partial(_kernel, curve, c),
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((1, W, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, T), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(grid_out_spec, grid_out_spec, grid_out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[pltpu.VMEM((2 * L + 2, W, T), U32)],
    )(d3, x3, y3)
    if raw:
        # kernel-native layout, fed straight into pl_reduce.lane_reduce
        # (skips the (B,L,W,T) -> (L,W,T,B) HBM transpose)
        return (bx, by, bz)
    # (B, L, W, T) -> (L, W, T, B)
    perm = (1, 2, 3, 0)
    return (
        jnp.transpose(bx, perm),
        jnp.transpose(by, perm),
        jnp.transpose(bz, perm),
    )
