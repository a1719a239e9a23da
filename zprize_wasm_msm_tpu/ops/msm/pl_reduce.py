"""Pallas reduction kernels: lane tree-reduce + fused bucket/window finish.

Profiling the headline MSM (tools/profile_bucket.py, v5e, 2^20 points)
showed the bucket sweep at ~50 M adds/s (~85% of the VPU ALU ceiling)
but 310 ms of the 1.36 s wall in the jnp reduction stages — each jnp
group add on a small batch is ~200 tiny XLA ops, so the serial
lane-tree / running-sum / Horner loops are launch-latency-bound, not
compute-bound.  These kernels run the same reductions as single Pallas
programs with in-register state:

  lane_reduce:  (B, L, W, T) bucket partials -> (B, L, W); grid over B,
                log2(T) masked roll-halving rounds per block.
  finish:       dense (L, W, B) bucket sums -> ONE projective point;
                replaces bucket_reduce + window_fold with
                  sum_{w,b} [ (b+1) * 2^(c*w) ] S_{w,b}
                evaluated as: a c-bit double-and-add ladder scaling every
                (w, b) lane by (b+1) in parallel, a masked roll tree over
                the bucket segment, a per-lane selective doubling ladder
                (lane w doubles c*w times), and a circular butterfly
                all-sum.  ~(c + log2(B) + c*(W-1) + 10) sequential group
                ops total, vs B + W*(c+1) serial jnp ops before.

Reference lineage: reduceBucketsToSinglePoint (running sum over buckets,
wasmcurves/src/build_multiexp_opt.js:1597-1706) + accumulateAcrossChunks
(Horner over windows, :1710-1746) — same weighted sum, reassociated into
a parallel form (the group is abelian; the result is the same point).
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

U32 = jnp.uint32
I32 = jnp.int32


# ---------------------------------------------------------------------------
# lane tree-reduce
# ---------------------------------------------------------------------------


def _lane_reduce_kernel(curve, bx_ref, by_ref, bz_ref, ox_ref, oy_ref, oz_ref, macc):
    T = bx_ref.shape[3]
    rounds = (T - 1).bit_length()
    x, y, z = bx_ref[0], by_ref[0], bz_ref[0]  # (L, W, T)
    t_iota = jax.lax.broadcasted_iota(I32, x.shape[1:], 1)

    def body(r, p):
        x, y, z = p
        half = jnp.int32(T) >> (r + 1)
        # left-rotate by half == right-rotate by T - half (Mosaic's dynamic
        # rotate wants a non-negative lane shift)
        s = jnp.int32(T) - half
        rx = pltpu.roll(x, s, 2)
        ry = pltpu.roll(y, s, 2)
        rz = pltpu.roll(z, s, 2)
        nx, ny, nz = kgroup.kadd(curve, macc, (x, y, z), (rx, ry, rz))
        keep = t_iota < half
        return (
            kgroup_select(keep, nx, x),
            kgroup_select(keep, ny, y),
            kgroup_select(keep, nz, z),
        )

    x, y, z = jax.lax.fori_loop(0, rounds, body, (x, y, z))
    ox_ref[0], oy_ref[0], oz_ref[0] = x, y, z


def kgroup_select(mask, a, b):
    from ..field import kcore

    return kcore.kselect(mask, a, b)


@functools.partial(jax.jit, static_argnums=(0,))
def lane_reduce(curve: CurveSpec, buckets):
    """(bx, by, bz) each (B, L, W, T) -> (L, W, B) lane-reduced sums."""
    bx, by, bz = buckets
    B, L, W, T = bx.shape
    acc_rows = curve.kfield.acc_rows
    out_shape = jax.ShapeDtypeStruct((B, L, W, T), U32)
    spec = pl.BlockSpec((1, L, W, T), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
    ox, oy, oz = pl.pallas_call(
        functools.partial(_lane_reduce_kernel, curve),
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[pltpu.VMEM((acc_rows, W, T), U32)],
    )(bx, by, bz)
    # (B, L, W, T) -> take lane 0 -> (L, W, B)
    return tuple(jnp.transpose(o[:, :, :, 0], (1, 2, 0)) for o in (ox, oy, oz))


# ---------------------------------------------------------------------------
# fused finish: dense buckets -> one point
# ---------------------------------------------------------------------------


def _finish_kernel(curve, c, W, B, bx_ref, by_ref, bz_ref,
                   ox_ref, oy_ref, oz_ref, sx, sy, sz, macc):
    """One grid step = one round of the fused weighted-sum schedule.

    The whole schedule (ladder -> segment tree -> head mask -> selective
    doubling -> butterfly all-sum) runs through ONE generic body holding
    exactly one complete add and one complete double — per-round behavior
    is selected with masks derived from the round index, so the Mosaic
    binary stays small (a distinct inlined body per phase measured 14 MB
    / 155 s compile; executable size is what the remote-device tunnel
    pays to load at every first call).
    """
    lb = (B - 1).bit_length()
    kb = B.bit_length()  # ladder rounds: k = b+1 <= B fits kb bits
    cW1 = c * (W - 1)
    O1 = kb           # segment tree start
    O2 = O1 + lb      # head-mask step
    O3 = O2 + 1       # selective-double start
    O4 = O3 + cW1     # lane-butterfly start
    O5 = O4 + 7       # sublane-butterfly start (3 static rounds)
    R = O5 + 3
    r = pl.program_id(0)
    shape = bx_ref.shape[1:]  # (8, 128)
    l_iota = (
        jax.lax.broadcasted_iota(I32, shape, 0) * 128
        + jax.lax.broadcasted_iota(I32, shape, 1)
    )  # flat lane id in [0, 1024)
    b_idx = l_iota % B
    w_idx = l_iota // B
    k = b_idx + 1  # ladder scalar, c bits

    zero = kgroup.kzero_point(curve, shape)

    @pl.when(r == 0)
    def _init():
        sx[:], sy[:], sz[:] = zero

    p_lad = r < O1
    p_seg = (r >= O1) & (r < O2)
    p_mask = r == O2
    p_sd = (r >= O3) & (r < O4)
    p_bfl = (r >= O4) & (r < O5)
    p_bfs = r >= O5

    S = (bx_ref[:], by_ref[:], bz_ref[:])
    A = (sx[:], sy[:], sz[:])

    # lane roll shift for this round (0 = no-op)
    e_seg = jnp.clip(r - O1 + 1, 1, 31)
    half_seg = jnp.int32(B) >> e_seg
    e_bfl = jnp.clip(r - O4, 0, 6)
    shift = jnp.where(
        p_seg,
        jnp.int32(128) - half_seg,  # left-rotate by half_seg
        jnp.where(p_bfl, jnp.int32(64) >> e_bfl, jnp.int32(0)),
    )
    rolled = tuple(pltpu.roll(a, shift, 2) for a in A)
    # sublane butterfly: static shifts 4 / 2 / 1 picked by round
    rsub = tuple(
        kgroup_select(
            jnp.full(shape, r == O5),
            pltpu.roll(a, 4, 1),
            kgroup_select(
                jnp.full(shape, r == O5 + 1),
                pltpu.roll(a, 2, 1),
                pltpu.roll(a, 1, 1),
            ),
        )
        for a in A
    )

    # double where needed: every lane in the ladder; lane w for the first
    # c*w selective-doubling rounds
    dd = p_lad | (p_sd & ((r - O3) < c * w_idx))
    D = kgroup.kdouble(curve, macc, A)
    A1 = tuple(kgroup_select(dd, dn, an) for dn, an in zip(D, A))

    # the one add: operand depends on the phase
    o2 = tuple(
        kgroup_select(
            jnp.full(shape, p_lad),
            sn,
            kgroup_select(jnp.full(shape, p_bfs), rs, rl),
        )
        for sn, rs, rl in zip(S, rsub, rolled)
    )
    T1 = kgroup.kadd(curve, macc, A1, o2)

    bit = (k >> jnp.clip(kb - 1 - r, 0, 31)) & 1
    am = (
        (p_lad & (bit == 1))
        | (p_seg & (b_idx < half_seg))
        | p_bfl
        | p_bfs
    )
    A2 = tuple(kgroup_select(am, tn, an) for tn, an in zip(T1, A1))

    # head-mask round: keep each window total (segment head), identity
    # elsewhere (absorbed by later complete adds)
    valid = (b_idx == 0) & (w_idx < W)
    keep = p_mask & ~valid
    A3 = tuple(kgroup_select(keep, zn, an) for zn, an in zip(zero, A2))

    sx[:], sy[:], sz[:] = A3

    @pl.when(r == R - 1)
    def _emit():
        ox_ref[:], oy_ref[:], oz_ref[:] = sx[:], sy[:], sz[:]


@functools.partial(jax.jit, static_argnums=(0, 2))
def finish(curve: CurveSpec, buckets, c: int):
    """(bx, by, bz) each (L, W, B) dense bucket sums -> ONE projective
    point (L,) x3: sum_w 2^(c*w) sum_b (b+1) S_{w,b}.

    B may be smaller than 2^(c-1): c sets the WINDOW WEIGHT (2^(c*w));
    B only sizes the bucket ladder/segment phases.  B = 1 turns this
    into a pure window fold (sum_w 2^(c*w) S_w) — the second stage of
    finish_large."""
    bx, by, bz = buckets
    L, W, B = bx.shape
    assert B <= 1 << (c - 1) and B & (B - 1) == 0
    slots = 1024 // B
    assert W <= slots, f"finish kernel needs W ({W}) <= 1024/B ({slots})"
    acc_rows = curve.kfield.acc_rows

    def to_grid(a):  # (L, W, B) -> (L, 8, 128), lane l = w*B + b
        pad = jnp.zeros((L, slots - W, B), U32)
        flat = jnp.concatenate([a, pad], axis=1).reshape(L, 1024)
        return flat.reshape(L, 8, 128)

    gx, gy, gz = to_grid(bx), to_grid(by), to_grid(bz)
    lb = (B - 1).bit_length()
    R = B.bit_length() + lb + 1 + c * (W - 1) + 7 + 3
    out_shape = jax.ShapeDtypeStruct((L, 8, 128), U32)
    spec = pl.BlockSpec((L, 8, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    ox, oy, oz = pl.pallas_call(
        functools.partial(_finish_kernel, curve, c, W, B),
        grid=(R,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((L, 8, 128), U32),
            pltpu.VMEM((L, 8, 128), U32),
            pltpu.VMEM((L, 8, 128), U32),
            pltpu.VMEM((acc_rows, 8, 128), U32),
        ],
    )(gx, gy, gz)
    return (ox[:, 0, 0], oy[:, 0, 0], oz[:, 0, 0])


# ---------------------------------------------------------------------------
# large-B finish: per-window weighted collapse, then the B=1 window fold
# ---------------------------------------------------------------------------


def _collapse_kernel(curve, c, W, B, S, bx_ref, by_ref, bz_ref,
                     ox_ref, oy_ref, oz_ref, sx, sy, sz, macc):
    """One grid step = one round of the per-window weighted bucket
    collapse: the ladder scales every (w, b) lane by (b+1) in parallel
    (kb = log2(B)+1 rounds), then a masked lane-roll segment tree sums
    each window's B-lane segment (log2(B) rounds).  Same schedule as the
    first two phases of _finish_kernel, but on an (L, S, 128) grid so
    W*B can exceed 1024 lanes (c = 7 -> 40 windows x 64 buckets)."""
    lb = (B - 1).bit_length()
    kb = B.bit_length()
    O1 = kb
    R = kb + lb
    r = pl.program_id(0)
    shape = bx_ref.shape[1:]  # (S, 128)
    l_iota = (
        jax.lax.broadcasted_iota(I32, shape, 0) * 128
        + jax.lax.broadcasted_iota(I32, shape, 1)
    )
    b_idx = l_iota % B
    k = b_idx + 1

    zero = kgroup.kzero_point(curve, shape)

    @pl.when(r == 0)
    def _init():
        sx[:], sy[:], sz[:] = zero

    p_lad = r < O1
    p_seg = r >= O1

    Sv = (bx_ref[:], by_ref[:], bz_ref[:])
    A = (sx[:], sy[:], sz[:])

    e_seg = jnp.clip(r - O1 + 1, 1, 31)
    half_seg = jnp.int32(B) >> e_seg
    shift = jnp.where(p_seg, jnp.int32(128) - half_seg, jnp.int32(0))
    rolled = tuple(pltpu.roll(a, shift, 2) for a in A)

    D = kgroup.kdouble(curve, macc, A)
    A1 = tuple(kgroup_select(jnp.full(shape, p_lad), dn, an) for dn, an in zip(D, A))

    o2 = tuple(
        kgroup_select(jnp.full(shape, p_lad), sn, rl)
        for sn, rl in zip(Sv, rolled)
    )
    T1 = kgroup.kadd(curve, macc, A1, o2)

    bit = (k >> jnp.clip(kb - 1 - r, 0, 31)) & 1
    am = (p_lad & (bit == 1)) | (p_seg & (b_idx < half_seg))
    A2 = tuple(kgroup_select(am, tn, an) for tn, an in zip(T1, A1))

    sx[:], sy[:], sz[:] = A2

    @pl.when(r == R - 1)
    def _emit():
        ox_ref[:], oy_ref[:], oz_ref[:] = A2


@functools.partial(jax.jit, static_argnums=(0, 2))
def finish_large(curve: CurveSpec, buckets, c: int):
    """(bx, by, bz) each (L, W, B) dense bucket sums -> ONE projective
    point, for configurations whose W * B exceeds the single-block
    finish kernel (c = 7: 38 windows x 64 buckets = 2432 lanes).

    Stage A (_collapse_kernel): lane-parallel (b+1)-weighted collapse of
    every window's bucket segment on an (L, S, 128) grid, ~kb + log2(B)
    rounds.  Stage B: the proven finish() schedule at B = 1 folds the W
    window sums with 2^(c*w) weights.  Reference lineage as finish()."""
    bx, by, bz = buckets
    L, W, B = bx.shape
    assert B == 1 << (c - 1)
    assert B <= 128, "collapse segments must fit one 128-lane row"
    # pad W so the sublane count S = W*B/128 is a multiple of 8
    per_row = 128 // B
    Wpad = -(-W // (8 * per_row)) * (8 * per_row)
    S = Wpad * B // 128
    acc_rows = curve.kfield.acc_rows

    def to_grid(a):
        pad = jnp.zeros((L, Wpad - W, B), U32)
        return jnp.concatenate([a, pad], axis=1).reshape(L, S, 128)

    gx, gy, gz = to_grid(bx), to_grid(by), to_grid(bz)
    R = B.bit_length() + (B - 1).bit_length()
    out_shape = jax.ShapeDtypeStruct((L, S, 128), U32)
    spec = pl.BlockSpec((L, S, 128), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    ox, oy, oz = pl.pallas_call(
        functools.partial(_collapse_kernel, curve, c, Wpad, B, S),
        grid=(R,),
        in_specs=[spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((L, S, 128), U32),
            pltpu.VMEM((L, S, 128), U32),
            pltpu.VMEM((L, S, 128), U32),
            pltpu.VMEM((acc_rows, S, 128), U32),
        ],
    )(gx, gy, gz)
    # window sums live at segment heads: flat lane w*B
    heads = np.arange(W) * B
    flat = tuple(a.reshape(L, S * 128)[:, heads] for a in (ox, oy, oz))
    # stage B: pure window fold via finish() at B = 1
    return finish(curve, tuple(a[:, :, None] for a in flat), c)
