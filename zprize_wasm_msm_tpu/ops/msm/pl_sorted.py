"""Sorted-runs Pallas bucket accumulation: the large-window (c >= 7) engine.

The VMEM-bucket kernel (pl_bucket.py) pays a 2^(c-1)-way masked select per
point, capping it at c <= 6.  This engine removes the bucket array from the
kernel entirely — the TPU-native re-architecture of the reference's
organizeBuckets counting sort + addition chains
(wasmcurves/src/build_multiexp_opt.js organizeBuckets:568,
constructAdditionChains:651, evaluateAdditionChains:810):

  1. SORT   (XLA)     per window, sort points by signed-digit bucket index
                      (lax.sort_key_val + one gather); zero digits sort to
                      a tail sentinel.  Equal buckets become contiguous RUNS.
  2. SWEEP  (Pallas)  each of 1024 lanes owns a contiguous chunk of the
                      sorted stream and keeps ONE running accumulator:
                      acc <- acc + point (complete mixed add); when the
                      bucket changes (run boundary), the finished partial
                      sum is emitted to that step's output slot and the
                      accumulator resets.  No per-lane scatter, no B-way
                      select — bucket capacity is unbounded.
  3. COMPACT (XLA)    boundaries per window <= B + T (number of buckets +
                      number of lane chunks), so one fixed-size nonzero +
                      gather compacts the (N,)-slot output to K = B + T
                      entries, still sorted by bucket.
  4. COMBINE (Pallas) pieces of a bucket split across lane chunks (<= T of
                      them, typically 1-2) are merged by a VMEM-resident
                      segmented scan over the K entries: log2(T) rounds of
                      masked complete adds.
  5. SCATTER (XLA)    one last-of-segment scatter lands each bucket's total
                      in the dense (L, W, B) bucket array consumed by
                      bucket_reduce / window_fold.

Lane packing: windows x lane-chunks are folded onto the full (8, 128) VPU
grid — a group of Wp windows gives each window T = 1024/Wp chunks, so every
grid step does 1024 mixed adds regardless of W (no sublane padding waste).

Everything is shape-static; the only data-dependent quantities are lane
values.  Digit semantics match windows.signed_window_digits; results equal
the other engines as group elements (addition order differs).
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

U32 = jnp.uint32
I32 = jnp.int32

#: full VPU grid: 8 sublanes x 128 lanes of independent running accumulators
GRID = 1024


def _group_sizes(W: int) -> list:
    """One window per kernel group (Wp = 1, T = 1024 chunks/window).

    Earlier revisions packed up to 8 windows per group; that multiplied
    the compiled graph (one inlined compact stage per window) and the
    gather working set by Wp — the Wp=8 variant's MLIR grew past the
    compile helper's memory cap at c >= 13.  With Wp = 1 the grid is
    still full (1024 lane chunks), ONE compiled shape serves every
    window, and peak HBM for the sorted gather is (L, N) not (L, 8, N).
    """
    return [1] * W


# ---------------------------------------------------------------------------
# stage 2: the streaming sweep kernel
# ---------------------------------------------------------------------------


def _sweep_kernel(curve, xs_ref, ys_ref, meta_ref,
                  ox_ref, oy_ref, oz_ref, ax, ay, az, macc):
    """One grid step: 1024 running-accumulator mixed adds + boundary flush.

    meta bit0 = run boundary (flush after this add); bit1 = zero digit
    (point is identity; its adds pass through).
    """

    @pl.when(pl.program_id(0) == 0)
    def _init():
        zx, zy, zz = kgroup.kzero_point(curve, ax.shape[1:])
        ax[:], ay[:], az[:] = zx, zy, zz

    px = xs_ref[0]  # (L, 8, 128)
    py = ys_ref[0]
    meta = meta_ref[0]  # (8, 128) int32
    boundary = (meta & 1) == 1
    iszero = (meta & 2) == 2

    x_eff = kcore.kselect(iszero, jnp.zeros_like(px), px)
    y_eff = kcore.kselect(iszero, jnp.zeros_like(py), py)
    new = kgroup.kadd_mixed(
        curve, macc, (ax[:], ay[:], az[:]), (x_eff, y_eff)
    )
    # emit the (possibly unfinished) partial — compaction only reads slots
    # where boundary is set, so non-boundary slots are dead writes
    ox_ref[0], oy_ref[0], oz_ref[0] = new
    # reset the accumulator where a run just closed
    zx, zy, zz = kgroup.kzero_point(curve, ax.shape[1:])
    ax[:] = kcore.kselect(boundary, zx, new[0])
    ay[:] = kcore.kselect(boundary, zy, new[1])
    az[:] = kcore.kselect(boundary, zz, new[2])


@functools.partial(jax.jit, static_argnums=(0, 4))
def _sweep(curve: CurveSpec, xs, ys, meta, steps: int):
    """xs/ys: (steps, L, 8, 128); meta: (steps, 8, 128) int32.
    Returns per-step partial-sum slots (ox, oy, oz), same shape as xs.
    L is the coordinate-field element length (ext * base limbs)."""
    L = xs.shape[1]
    acc_rows = curve.kfield.acc_rows
    out_shape = jax.ShapeDtypeStruct((steps, L, 8, 128), U32)
    spec_pt = pl.BlockSpec((1, L, 8, 128), lambda i: (i, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    spec_meta = pl.BlockSpec((1, 8, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_sweep_kernel, curve),
        grid=(steps,),
        in_specs=[spec_pt, spec_pt, spec_meta],
        out_specs=(spec_pt, spec_pt, spec_pt),
        out_shape=(out_shape, out_shape, out_shape),
        scratch_shapes=[
            pltpu.VMEM((L, 8, 128), U32),
            pltpu.VMEM((L, 8, 128), U32),
            pltpu.VMEM((L, 8, 128), U32),
            pltpu.VMEM((acc_rows, 8, 128), U32),
        ],
    )(xs, ys, meta)


# ---------------------------------------------------------------------------
# stage 4: VMEM segmented combine of per-chunk bucket pieces
# ---------------------------------------------------------------------------


def _segscan_kernel(curve, px_ref, py_ref, pz_ref, seg_ref,
                    ox_ref, oy_ref, oz_ref, sx, sy, sz, sseg, macc):
    """Inclusive segmented scan (group add) over the K axis.

    Entries are sorted by segment id; a segment's length is at most the
    lane-chunk count T, so ceil(log2(T)) doubling rounds suffice.  Each
    round is ONE grid step (shift distance 2^round via a dynamic roll) so
    the add body is compiled once — an unrolled Python loop multiplied
    Mosaic compile time by the round count.
    """
    r = pl.program_id(0)
    R = pl.num_programs(0)

    @pl.when(r == 0)
    def _init():
        sx[:], sy[:], sz[:] = px_ref[:], py_ref[:], pz_ref[:]
        sseg[:] = seg_ref[:]

    x, y, z, seg = sx[:], sy[:], sz[:], sseg[:]
    Wp, K = seg.shape
    s = jnp.int32(1) << r
    # shift right by s along K: rolled[k] = v[k - s]; wrapped slots masked
    # out via segment id -1 (their add result is discarded by `same`)
    rx = pltpu.roll(x, s, 2)
    ry = pltpu.roll(y, s, 2)
    rz = pltpu.roll(z, s, 2)
    rseg = pltpu.roll(seg, s, 1)
    wrapped = jax.lax.broadcasted_iota(I32, (Wp, K), 1) < s
    rseg = jnp.where(wrapped, -1, rseg)
    same = rseg == seg
    nx, ny, nz = kgroup.kadd(curve, macc, (rx, ry, rz), (x, y, z))
    sx[:] = kcore.kselect(same, nx, x)
    sy[:] = kcore.kselect(same, ny, y)
    sz[:] = kcore.kselect(same, nz, z)

    @pl.when(r == R - 1)
    def _emit():
        ox_ref[:], oy_ref[:], oz_ref[:] = sx[:], sy[:], sz[:]


@functools.partial(jax.jit, static_argnums=(0, 5))
def _segscan_xla(curve: CurveSpec, px, py, pz, seg, rounds: int):
    """XLA fallback for stage 4 when K is too large for the VMEM kernel
    (c >= 15: the (L, Wp, K) working set exceeds the ~12 MB budget even at
    Wp = 1).  Same Hillis-Steele segmented scan, group adds in 2-D jnp
    (the shape the TPU fusion emitter handles — see pippenger._flat_add)."""
    from ..curve import group

    L, Wp, K = px.shape

    def flat_add(p1, p2):
        s = group.add(
            curve,
            tuple(a.reshape(L, -1) for a in p1),
            tuple(a.reshape(L, -1) for a in p2),
        )
        return tuple(a.reshape(L, Wp, K) for a in s)

    kiota = jax.lax.broadcasted_iota(I32, (Wp, K), 1)

    # fori_loop with a dynamic shift: ONE complete-add graph regardless of
    # the round count (an unrolled loop multiplied the HLO by `rounds` and
    # overran the compile helper's memory at large K)
    def body(r, state):
        x, y, z = state
        s = jnp.int32(1) << r
        rx = jnp.roll(x, s, axis=2)
        ry = jnp.roll(y, s, axis=2)
        rz = jnp.roll(z, s, axis=2)
        rseg = jnp.where(kiota < s, -1, jnp.roll(seg, s, axis=1))
        same = (rseg == seg)[None]
        nx, ny, nz = flat_add((rx, ry, rz), (x, y, z))
        return (
            jnp.where(same, nx, x),
            jnp.where(same, ny, y),
            jnp.where(same, nz, z),
        )

    return jax.lax.fori_loop(0, rounds, body, (px, py, pz))


@functools.partial(jax.jit, static_argnums=(0, 5))
def _segscan(curve: CurveSpec, px, py, pz, seg, rounds: int):
    """px/py/pz: (L, Wp, K) projective pieces sorted by seg; seg: (Wp, K).
    Returns the inclusive segmented scan (last entry of each segment holds
    the segment total)."""
    L, Wp, K = px.shape
    acc_rows = curve.kfield.acc_rows
    out = jax.ShapeDtypeStruct((L, Wp, K), U32)
    spec3 = pl.BlockSpec((L, Wp, K), lambda r: (0, 0, 0), memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((Wp, K), lambda r: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_segscan_kernel, curve),
        grid=(rounds,),
        in_specs=[spec3, spec3, spec3, spec2],
        out_specs=(spec3, spec3, spec3),
        out_shape=(out, out, out),
        scratch_shapes=[
            pltpu.VMEM((L, Wp, K), U32),
            pltpu.VMEM((L, Wp, K), U32),
            pltpu.VMEM((L, Wp, K), U32),
            pltpu.VMEM((Wp, K), I32),
            pltpu.VMEM((acc_rows, Wp, K), U32),
        ],
    )(px, py, pz, seg)


# ---------------------------------------------------------------------------
# stages 1 + 3 + 5: XLA sort / compact / scatter around the kernels
# ---------------------------------------------------------------------------


def _accumulate_group(curve: CurveSpec, X, Y, negY, dig, c: int):
    """Bucket sums for one group of Wp windows.

    X/Y/negY: (L, N) affine Montgomery (N a multiple of 1024).
    dig: (Wp, N) int32 signed digits.
    Returns (bx, by, bz), each (L, Wp, B), B = 2^(c-1).
    """
    L = X.shape[0]
    Wp, N = dig.shape
    B = 1 << (c - 1)
    T = GRID // Wp  # lane chunks per window
    steps = (N * Wp) // GRID
    # max flushes per window is B + T; pad to a lane multiple (the segscan
    # kernel's dynamic rotate requires a 128-aligned axis)
    K = -(-(B + T) // 128) * 128

    # ---- stage 1: sort by bucket index (zero digits -> sentinel B) -------
    mag = jnp.where(dig < 0, -dig, dig)
    key = jnp.where(dig == 0, B, mag - 1).astype(I32)  # (Wp, N)
    iota = jax.lax.broadcasted_iota(I32, (Wp, N), 1)
    skey, perm = jax.lax.sort_key_val(key, iota)  # per-row sort
    neg_s = jnp.take_along_axis(dig < 0, perm, axis=1)
    Xs = jnp.take(X, perm, axis=1)  # (L, Wp, N)
    Ys = jnp.take(Y, perm, axis=1)
    Yn = jnp.take(negY, perm, axis=1)
    Ys = jnp.where(neg_s[None], Yn, Ys)

    # ---- boundary metadata ------------------------------------------------
    nxt = jnp.concatenate([skey[:, 1:], jnp.full_like(skey[:, :1], -1)], axis=1)
    pos = jax.lax.broadcasted_iota(I32, (Wp, N), 1)
    chunk_end = (pos % steps) == (steps - 1)  # chunk t owns [t*steps, ...)
    boundary = (skey != nxt) | chunk_end
    iszero = skey == B
    meta = boundary.astype(I32) | (iszero.astype(I32) << 1)

    # ---- layout for the sweep: (steps, L, 8, 128) -------------------------
    # window w's chunk t is grid slot w*T + t; chunk t covers stream
    # positions [t*steps, (t+1)*steps)
    def to_grid_pt(a):  # (L, Wp, N) -> (steps, L, 8, 128)
        a = a.reshape(L, Wp * T, steps)
        a = jnp.moveaxis(a, 2, 0)  # (steps, L, 1024)
        return a.reshape(steps, L, 8, 128)

    xs = to_grid_pt(Xs)
    ys = to_grid_pt(Ys)
    meta_g = jnp.moveaxis(meta.reshape(Wp * T, steps), 1, 0).reshape(
        steps, 8, 128
    )

    ox, oy, oz = _sweep(curve, xs, ys, meta_g, steps)

    # ---- stage 3: compact flush slots to K entries per window ------------
    flush = boundary & ~iszero  # (Wp, N)
    pieces = []
    for w in range(Wp):
        (p_idx,) = jnp.nonzero(flush[w], size=K, fill_value=N)
        valid = p_idx < N
        p_safe = jnp.where(valid, p_idx, 0)
        t = p_safe // steps  # chunk within window
        j = p_safe % steps  # step
        g = w * T + t  # grid slot
        s8, l128 = g // 128, g % 128
        px = ox[j, :, s8, l128].T  # (L, K)
        py = oy[j, :, s8, l128].T
        pz = oz[j, :, s8, l128].T
        seg = jnp.where(valid, skey[w, p_safe], B)
        # invalid slots -> identity point, sentinel segment
        zero = jnp.zeros_like(px)
        one = jnp.broadcast_to(
            jnp.asarray(curve.kfield.one_mont_limbs, U32)[:, None], px.shape
        )
        px = jnp.where(valid[None], px, zero)
        py = jnp.where(valid[None], py, one)
        pz = jnp.where(valid[None], pz, zero)
        pieces.append((px, py, pz, seg))

    px = jnp.stack([p[0] for p in pieces], axis=1)  # (L, Wp, K)
    py = jnp.stack([p[1] for p in pieces], axis=1)
    pz = jnp.stack([p[2] for p in pieces], axis=1)
    seg = jnp.stack([p[3] for p in pieces], axis=0).astype(I32)  # (Wp, K)

    # ---- stage 4: merge each bucket's <= T pieces -------------------------
    # VMEM budget: ~9 value arrays of (L, Wp2, K) + the (acc_rows, Wp2, K)
    # multiply scratch must fit ~12 MB -> cap the windows per kernel call
    rounds = max(1, (T - 1).bit_length())
    # Mosaic's SCOPED (stack) VMEM for the segscan body measures ~85x
    # K*L*4 bytes (the complete-add temporaries; observed 24.41 MB at
    # (L=24, K=3072) against the 16 MB limit) — far above the naive
    # value-array count.  Use the measured scaling with headroom; larger
    # K combines in XLA instead (still one fused graph, HBM-resident).
    scoped_est = 85 * K * L * 4
    if Wp == 1 and scoped_est <= 14 << 20:
        sx, sy, sz = _segscan(curve, px, py, pz, seg, rounds)
    else:
        sx, sy, sz = _segscan_xla(curve, px, py, pz, seg, rounds)

    # ---- stage 5: last-of-segment scatter into dense buckets -------------
    nxt_seg = jnp.concatenate(
        [seg[:, 1:], jnp.full_like(seg[:, :1], -1)], axis=1
    )
    last = seg != nxt_seg
    # flat scatter target (L, Wp*(B+1)); sentinel column B absorbs padding
    w_iota = jax.lax.broadcasted_iota(I32, (Wp, K), 0)
    tgt = jnp.where(last, w_iota * (B + 1) + seg, w_iota * (B + 1) + B)
    flat = jnp.zeros((L, Wp * (B + 1)), U32)
    bx = flat.at[:, tgt.reshape(-1)].set(sx.reshape(L, -1), mode="drop")
    by = flat.at[:, tgt.reshape(-1)].set(sy.reshape(L, -1), mode="drop")
    bz = flat.at[:, tgt.reshape(-1)].set(sz.reshape(L, -1), mode="drop")
    bx = bx.reshape(L, Wp, B + 1)[:, :, :B]
    by = by.reshape(L, Wp, B + 1)[:, :, :B]
    bz = bz.reshape(L, Wp, B + 1)[:, :, :B]
    # empty buckets scattered nothing: their slots are all-zero limbs, which
    # is NOT the identity encoding (0,1,0) — fix Y by selecting one where
    # the whole row is zero
    empty = (bx == 0).all(axis=0) & (by == 0).all(axis=0) & (bz == 0).all(axis=0)
    one = jnp.broadcast_to(
        jnp.asarray(curve.kfield.one_mont_limbs, U32)[:, None, None], by.shape
    )
    by = jnp.where(empty[None], one, by)
    return bx, by, bz


@functools.partial(jax.jit, static_argnums=(0, 3))
def _accumulate_group_jit(curve, pts_and_dig, negY, c):
    X, Y, dig = pts_and_dig
    return _accumulate_group(curve, X, Y, negY, dig, c)


def bucket_accumulate_sorted(
    curve: CurveSpec,
    points: Tuple[jnp.ndarray, jnp.ndarray],
    digits: jnp.ndarray,
    c: int,
):
    """Full-window bucket accumulation via the sorted-runs engine.

    points: affine (X, Y), each (L, N) Montgomery, L = field.elem_len
            (so G2 points over Fq2 pass through with L = 2 * base limbs).
    digits: (W, N) int32 signed digits (windows.signed_window_digits).
    Returns bucket sums (X, Y, Z), each (L, W, B), B = 2^(c-1) — same
    contract as pippenger.bucket_accumulate_c / pl_bucket + lane reduce.
    """
    X, Y = points
    L = X.shape[0]
    W, N = digits.shape
    # pad N to a multiple of the grid so every Wp in {8,4,2,1} divides evenly
    pad = (-N) % GRID
    if pad:
        zf = jnp.zeros((L, pad), U32)
        X = jnp.concatenate([X, zf], axis=1)
        Y = jnp.concatenate([Y, zf], axis=1)
        digits = jnp.concatenate(
            [digits, jnp.zeros((W, pad), digits.dtype)], axis=1
        )
    negY = curve.field.neg(Y)

    parts = []
    w0 = 0
    for Wp in _group_sizes(W):
        dig = digits[w0 : w0 + Wp]
        parts.append(_accumulate_group_jit(curve, (X, Y, dig), negY, c))
        w0 += Wp
    return tuple(
        jnp.concatenate([p[k] for p in parts], axis=1) for k in range(3)
    )
