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


def vmem_bytes(curve: CurveSpec, W: int, T: int, c: int, packed: bool = False) -> int:
    """Estimated VMEM footprint of the bucket state + mul scratch."""
    L = curve.field.elem_len
    if packed:
        L //= 2
    B = 1 << (c - 1)
    Wpad = -(-W // 8) * 8
    state = 3 * B * L * Wpad * T * 4
    scratch = curve.kfield.acc_rows * Wpad * T * 4
    return state + scratch


def _pack16(a):
    """Stacked (L, ...) canonical 16-bit limbs -> (L/2, ...) u32 words
    (limb 2j in the low half, limb 2j+1 in the high half).  Halving the
    bucket-state rows is what fits B = 64 (c = 7) in the ~16 MB VMEM:
    the B-way select sweep runs on packed words (half the rows), and the
    unpack/pack around the one mixed add is ~0.5% of the add's ALU cost."""
    L = a.shape[0]
    return jnp.stack([a[2 * j] | (a[2 * j + 1] << 16) for j in range(L // 2)])


def _unpack16(p):
    """Inverse of _pack16: (L/2, ...) words -> (L, ...) 16-bit limbs."""
    rows = []
    for j in range(p.shape[0]):
        rows.append(p[j] & jnp.uint32(0xFFFF))
        rows.append(p[j] >> 16)
    return jnp.stack(rows)


def _kernel(curve: CurveSpec, c: int, steps: int, packed: bool,
            dig_ref, x_ref, y_ref, bx_ref, by_ref, bz_ref, acc_ref):
    # generic over the coordinate field (kfield: Fq for G1, Fq2 for G2 —
    # the reference's optimized engine is G1-hardcoded,
    # build_multiexp_opt.js:27-30; fixed here in the kernel itself)
    kf = curve.kfield
    L = kf.elem_len
    B = 1 << (c - 1)
    W, T = dig_ref.shape[1], dig_ref.shape[2]
    r = pl.program_id(0)

    pack = _pack16 if packed else (lambda a: a)
    unpack = _unpack16 if packed else (lambda a: a)

    @pl.when(r == 0)
    def _init():
        zeros = jnp.zeros_like(bx_ref)
        ones = pack(kf.one((W, T)))  # (L or L/2, W, T)
        bx_ref[:] = zeros
        by_ref[:] = jnp.broadcast_to(ones[None], by_ref.shape)
        bz_ref[:] = zeros

    @pl.when(r < steps)
    def _main():
        d = dig_ref[0]  # (W, T) int32 in [-B, B]
        px = x_ref[0]  # (L, T)
        py = y_ref[0]
        pxw = jnp.broadcast_to(px[:, None, :], (L, W, T))
        pyw = jnp.broadcast_to(py[:, None, :], (L, W, T))

        is_zero = d == 0
        neg = d < 0
        idx = jnp.where(neg, -d, d) - 1
        idx = jnp.where(is_zero, 0, idx)  # (W, T) in [0, B)

        y_eff = kcore.kselect(neg, kf.neg(pyw), pyw)
        x_eff = kcore.kselect(is_zero, jnp.zeros_like(pxw), pxw)
        y_eff = kcore.kselect(is_zero, jnp.zeros_like(pyw), y_eff)

        # B-way masked gather of each lane's current bucket value
        # (on PACKED words when packed=True: half the select rows)
        cur_x, cur_y, cur_z = bx_ref[0], by_ref[0], bz_ref[0]
        for b in range(1, B):
            m = idx == b
            cur_x = kcore.kselect(m, bx_ref[b], cur_x)
            cur_y = kcore.kselect(m, by_ref[b], cur_y)
            cur_z = kcore.kselect(m, bz_ref[b], cur_z)

        new = kgroup.kadd_mixed(
            curve, acc_ref,
            (unpack(cur_x), unpack(cur_y), unpack(cur_z)),
            (x_eff, y_eff),
        )
        new = tuple(pack(n) for n in new)

        # B-way masked scatter back (zero digits write new == cur: harmless)
        for b in range(B):
            m = idx == b
            bx_ref[b] = kcore.kselect(m, new[0], bx_ref[b])
            by_ref[b] = kcore.kselect(m, new[1], by_ref[b])
            bz_ref[b] = kcore.kselect(m, new[2], bz_ref[b])

    @pl.when(r >= steps)
    def _tail():
        # lane tree-reduce of the bucket state: log2(T) extra grid steps,
        # one roll-halving round each, so callers get (.., lane 0) sums
        # without a separate reduction kernel (each standalone executable
        # costs ~10 s to load through the remote-device tunnel)
        rd = r - steps
        half = jnp.int32(T) >> (rd + 1)
        s = jnp.int32(T) - half  # left-rotate as non-negative lane shift
        t_iota = jax.lax.broadcasted_iota(jnp.int32, (W, T), 1)
        keep = t_iota < half

        def body(b, _):
            bs = pl.dslice(b, 1)
            xp = bx_ref[bs][0]
            yp = by_ref[bs][0]
            zp = bz_ref[bs][0]
            x, y, z = unpack(xp), unpack(yp), unpack(zp)
            rx = pltpu.roll(x, s, 2)
            ry = pltpu.roll(y, s, 2)
            rz = pltpu.roll(z, s, 2)
            nx, ny, nz = kgroup.kadd(curve, acc_ref, (x, y, z), (rx, ry, rz))
            bx_ref[bs] = kcore.kselect(keep, pack(nx), xp)[None]
            by_ref[bs] = kcore.kselect(keep, pack(ny), yp)[None]
            bz_ref[bs] = kcore.kselect(keep, pack(nz), zp)[None]
            return 0

        jax.lax.fori_loop(0, B, body, 0)


@functools.partial(
    jax.jit,
    static_argnums=(0,),
    static_argnames=("lanes", "c", "raw", "reduce_lanes", "packed"),
)
def bucket_accumulate(
    curve: CurveSpec,
    points: Tuple[jnp.ndarray, jnp.ndarray],
    digits: jnp.ndarray,
    *,
    lanes: int = 128,
    c: int = 4,
    raw: bool = False,
    reduce_lanes: bool = False,
    packed: bool = False,
):
    """Scatter-accumulate points into per-(window, lane) signed buckets.

    points: affine (X, Y), each (L, N) Montgomery.
    digits: (W, N) int32 signed digits (windows.signed_window_digits).
    lanes:  T, point lanes processed per grid step (N padded to multiple).

    reduce_lanes=True runs log2(T) extra grid steps of in-kernel lane
    tree-reduction and returns dense (L, W, B) bucket sums — ONE
    executable for sweep + reduce.  Otherwise returns (X, Y, Z) each
    (L, W, T, B) with the lane axis unreduced (raw=True keeps the
    kernel-native (B, L, W, T) layout).

    packed=True stores the VMEM bucket state as (B, L/2, W, T) u32 words
    holding two 16-bit limbs each — HALF the state, which is what fits
    c = 7 (B = 64) for 381-bit fields in the ~16 MB VMEM.  Results are
    identical (the arithmetic runs unpacked); returned sums are unpacked.

    Field-generic: L is the coordinate-field element length, so G2
    points over Fq2 stream through with L = 2 x base limbs.
    """
    L = curve.field.elem_len
    B = 1 << (c - 1)
    T = lanes
    X, Y = points
    W, N = digits.shape
    if packed:
        assert L % 2 == 0, "packed bucket state needs an even limb count"
    Ls = L // 2 if packed else L  # state rows per coordinate
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

    tail = (T - 1).bit_length() if reduce_lanes else 0
    last = steps - 1
    in_idx = (lambda i: (jnp.minimum(i, last), 0, 0)) if tail else (
        lambda i: (i, 0, 0)
    )
    out_shape = jax.ShapeDtypeStruct((B, Ls, W, T), U32)
    grid_out_spec = pl.BlockSpec(
        (B, Ls, W, T), lambda i: (0, 0, 0, 0), memory_space=pltpu.VMEM
    )
    bx, by, bz = pl.pallas_call(
        functools.partial(_kernel, curve, c, steps, packed),
        grid=(steps + tail,),
        in_specs=[
            pl.BlockSpec((1, W, T), in_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, T), in_idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, T), in_idx, memory_space=pltpu.VMEM),
        ],
        out_specs=(grid_out_spec, grid_out_spec, grid_out_spec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[pltpu.VMEM((curve.kfield.acc_rows, W, T), U32)],
    )(d3, x3, y3)
    if packed:
        # unpack (B, L/2, W, T) words -> (B, L, W, T) limbs (jnp, cheap)
        def unpk(a):
            lo = a & jnp.uint32(0xFFFF)
            hi = a >> 16
            return jnp.stack([lo, hi], axis=2).reshape(B, L, *a.shape[2:])

        bx, by, bz = unpk(bx), unpk(by), unpk(bz)
    if reduce_lanes:
        # lane 0 holds each bucket's total: (B, L, W, T) -> (L, W, B)
        return tuple(
            jnp.transpose(a[:, :, :, 0], (1, 2, 0)) for a in (bx, by, bz)
        )
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
