"""Pippenger MSM: the TPU-native bucket method.

Re-design of the reference's ZPrize MSM engine
(wasmcurves/src/build_multiexp_opt.js — multiExp:1987, computeSchedule:299,
organizeBuckets:568, constructAdditionChains:651, evaluateAdditionChains:810,
reduceBuckets:1336, reduceBucketsToSinglePoint:1597,
accumulateAcrossChunks:1710).

Pipeline mapping (reference stage -> TPU stage):

  computeSchedule + getChunk      -> windows.signed_window_digits
                                     (dense digit matrix, no 64-bit packing)
  organizeBuckets (counting sort) -> not needed: bucket_accumulate scatters
                                     each point directly into a per-lane
                                     private bucket, so no sort phase
  constructAdditionChains +
  evaluateAdditionChains +
  reduceBuckets (batch-affine)    -> bucket_accumulate: every (window, lane)
                                     runs the identical complete mixed-add,
                                     then a log2(lanes) tree reduction.
                                     The reference's data-dependent addition
                                     chains and shared batch-inversions are
                                     deliberately NOT replicated: they
                                     require data-dependent shapes, which
                                     XLA cannot compile efficiently.
  reduceBucketsToSinglePoint      -> bucket_reduce (running-sum over the
                                     bucket axis, vectorized across windows)
  accumulateAcrossChunks          -> window_fold (Horner over windows)

All shapes static; every data-dependent quantity is a lane value, never a
shape.  Bucket count is halved by signed digits (2^(c-1) buckets/window).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import group
from ..curve.spec import CurveSpec
from ..field import mont
from ..field.mont import U32
from . import windows

I32 = jnp.int32


def _lane_count(n: int, c: int, n_windows: int, mem_budget_bytes: int, n_limbs: int) -> int:
    """Pick T (sequential lanes per window) under the bucket-memory budget.

    Bucket state = n_windows * T * 2^(c-1) * 3 coords * n_limbs * 4 bytes.
    More lanes -> fewer sequential fori_loop steps (n / T of them) but more
    bucket memory and a deeper final tree reduction.
    """
    B = 1 << (c - 1)
    per_lane = n_windows * B * 3 * n_limbs * 4
    t = max(1, mem_budget_bytes // per_lane)
    # no point having more lanes than points; keep power of two
    t = min(t, max(1, n))
    return 1 << (int(t).bit_length() - 1)


def _bucket_accumulate_impl(curve, points, digits, lanes, c):
    """Scatter-accumulate points into per-(window, lane) signed buckets.

    points: affine (X, Y), each (L, N) Montgomery.
    digits: (W, N) int32 signed digits from signed_window_digits
            (values in [-2^(c-1), 2^(c-1)]).
    lanes:  T, parallel accumulation lanes per window (N % T == 0; msm pads).

    Each of the W*T (window, lane) pairs owns a private bucket row, so the
    scatter indices are conflict-free by construction; after the sequential
    N/T-step sweep the lane axis is tree-reduced.
    Returns bucket sums (X, Y, Z), each (L, W, B), B = 2^(c-1).
    """
    F = curve.field
    L = F.elem_len
    X, Y = points
    W, N = digits.shape
    T = lanes
    steps = N // T
    B = 1 << (c - 1)

    # reshape: lane t handles points [t*steps, (t+1)*steps)
    Xr = X.reshape(L, T, steps)
    Yr = Y.reshape(L, T, steps)
    Dr = digits.reshape(W, T, steps)

    zero_pt = group.zero(curve, (W, T, B))
    w_iota = jax.lax.broadcasted_iota(I32, (W, T), 0)
    t_iota = jax.lax.broadcasted_iota(I32, (W, T), 1)

    def body(j, buckets):
        bx, by, bz = buckets
        d = jax.lax.dynamic_index_in_dim(Dr, j, axis=2, keepdims=False)  # (W,T)
        px = jax.lax.dynamic_index_in_dim(Xr, j, axis=2, keepdims=False)  # (L,T)
        py = jax.lax.dynamic_index_in_dim(Yr, j, axis=2, keepdims=False)
        is_zero = d == 0
        neg = d < 0
        idx = jnp.where(neg, -d, d) - 1
        idx = jnp.where(is_zero, 0, idx)  # (W,T) in [0,B)
        # effective affine point: negate y for negative digits; (0,0) for
        # zero digits -> add_mixed's identity passthrough skips them
        pxw = jnp.broadcast_to(px[:, None, :], (L, W, T))
        pyw = jnp.broadcast_to(py[:, None, :], (L, W, T))
        neg_y = F.neg(pyw)
        y_eff = F.select(neg, neg_y, pyw)
        x_eff = F.select(is_zero, jnp.zeros_like(pxw), pxw)
        y_eff = F.select(is_zero, jnp.zeros_like(pyw), y_eff)
        # gather the target bucket of each (w, t)
        idx_g = idx[None, :, :, None]  # (1,W,T,1)
        cur = tuple(
            jnp.take_along_axis(b, jnp.broadcast_to(idx_g, (L, W, T, 1)), axis=3)[
                ..., 0
            ]
            for b in (bx, by, bz)
        )
        new = group.add_mixed(curve, cur, (x_eff, y_eff))
        # scatter back (unique (w,t) rows -> distinct positions)
        out = tuple(
            b.at[:, w_iota, t_iota, idx].set(n) for b, n in zip((bx, by, bz), new)
        )
        return out

    buckets = jax.lax.fori_loop(0, steps, body, zero_pt)
    return _lane_tree_reduce(curve, buckets)


def _flat_add(curve, p1, p2):
    """group.add with batch dims flattened to ONE axis around the call.

    The TPU XLA backend's fusion cost model CHECK-fails (fusion_util.cc
    TransformWindow) on our multiply accumulator when the batch is >2-D;
    2-D limb tensors compile and run fine, so flatten around every add.
    """
    shp = p1[0].shape
    L = shp[0]
    f1 = tuple(a.reshape(L, -1) for a in p1)
    f2 = tuple(a.reshape(L, -1) for a in p2)
    s = group.add(curve, f1, f2)
    return tuple(a.reshape(shp) for a in s)


def _lane_tree_reduce(curve, buckets):
    """Tree-reduce the lane axis: (L, W, T, B) -> (L, W, B)."""
    bx, by, bz = buckets
    t = bx.shape[2]
    while t > 1:
        half = t // 2
        p1 = (bx[:, :, :half], by[:, :, :half], bz[:, :, :half])
        p2 = (bx[:, :, half : 2 * half], by[:, :, half : 2 * half], bz[:, :, half : 2 * half])
        s = _flat_add(curve, p1, p2)
        if t % 2:  # odd tail: carry the last lane through
            bx = jnp.concatenate([s[0], bx[:, :, -1:]], axis=2)
            by = jnp.concatenate([s[1], by[:, :, -1:]], axis=2)
            bz = jnp.concatenate([s[2], bz[:, :, -1:]], axis=2)
            t = half + 1
        else:
            bx, by, bz = s
            t = half
    return (bx[:, :, 0], by[:, :, 0], bz[:, :, 0])  # (L, W, B)


def bucket_accumulate_c(curve, points, digits, lanes: int, c: int):
    """bucket_accumulate with explicit window size (jitted, static c)."""
    return _bucket_accumulate_jit(curve, points, digits, lanes, c)


_bucket_accumulate_jit = jax.jit(
    _bucket_accumulate_impl, static_argnums=(0, 3, 4)
)


@functools.partial(jax.jit, static_argnums=(0,))
def bucket_reduce(curve: CurveSpec, buckets):
    """Weighted bucket sum per window: sum_b (b+1) * S_b.

    Classic running-sum walk from the top bucket down
    (ref reduceBucketsToSinglePoint:1597-1706), vectorized across the W
    window axis; B sequential steps of W-wide adds.
    Input: (X,Y,Z) each (L, W, B).  Output: (X,Y,Z) each (L, W).
    """
    bx, by, bz = buckets
    L, W, B = bx.shape
    running = group.zero(curve, (W,))
    acc = group.zero(curve, (W,))

    def body(i, state):
        running, acc = state
        b = B - 1 - i
        cur = tuple(jax.lax.dynamic_index_in_dim(a, b, axis=2, keepdims=False) for a in buckets)
        running = group.add(curve, running, cur)
        acc = group.add(curve, acc, running)
        return (running, acc)

    running, acc = jax.lax.fori_loop(0, B, body, (running, acc))
    return acc


@functools.partial(jax.jit, static_argnums=(0,))
def bucket_reduce_grouped(curve: CurveSpec, buckets):
    """Weighted bucket sum for LARGE bucket counts: ~2*sqrt(B) serial steps
    instead of bucket_reduce's B (the c >= 8 regime would serialize 2^(c-1)
    tiny adds otherwise).

    Split b = g*M + m (M ~ sqrt(B)):
      sum_b (b+1)*S_b = M * sum_g g*T_g + sum_g W_g
    with T_g = sum_m S_{g,m} (group totals) and W_g = sum_m (m+1)*S_{g,m}
    (within-group weighted sums).  The within-group pass runs all W*G lanes
    in parallel (M steps); the group pass is G-1 steps of W-wide adds; M*U
    is log2(M) doublings.  Input (L, W, B); output (L, W).
    """
    bx, by, bz = buckets
    L, W, B = bx.shape
    if B <= 64:
        return bucket_reduce(curve, buckets)
    M = 1 << (B.bit_length() // 2)  # sqrt-split; B = 2^(c-1)
    G = B // M
    r4 = tuple(a.reshape(L, W, G, M) for a in buckets)

    def body(i, state):
        running, acc = state
        m = M - 1 - i
        cur = tuple(
            jax.lax.dynamic_index_in_dim(a, m, axis=3, keepdims=False)
            for a in r4
        )
        running = _flat_add(curve, running, cur)
        acc = _flat_add(curve, acc, running)
        return (running, acc)

    Tg, Wg = jax.lax.fori_loop(
        0, M, body, (group.zero(curve, (W, G)), group.zero(curve, (W, G)))
    )

    # U = sum_g g*T_g via a running sum from the top group down
    def body2(i, state):
        r2, a2 = state
        g = G - 1 - i
        cur = tuple(
            jax.lax.dynamic_index_in_dim(a, g, axis=2, keepdims=False)
            for a in Tg
        )
        r2 = group.add(curve, r2, cur)
        a2 = group.add(curve, a2, r2)
        return (r2, a2)

    _, U = jax.lax.fori_loop(
        0, G - 1, body2, (group.zero(curve, (W,)), group.zero(curve, (W,)))
    )
    for _ in range(M.bit_length() - 1):
        U = group.double(curve, U)

    # sum_g W_g: pairwise tree over the G axis
    t = G
    wx, wy, wz = Wg
    while t > 1:
        half = t // 2
        s = _flat_add(
            curve,
            (wx[:, :, :half], wy[:, :, :half], wz[:, :, :half]),
            (wx[:, :, half : 2 * half], wy[:, :, half : 2 * half], wz[:, :, half : 2 * half]),
        )
        if t % 2:
            wx = jnp.concatenate([s[0], wx[:, :, -1:]], axis=2)
            wy = jnp.concatenate([s[1], wy[:, :, -1:]], axis=2)
            wz = jnp.concatenate([s[2], wz[:, :, -1:]], axis=2)
            t = half + 1
        else:
            wx, wy, wz = s
            t = half
    return group.add(curve, U, (wx[:, :, 0], wy[:, :, 0], wz[:, :, 0]))


@functools.partial(jax.jit, static_argnums=(0, 2))
def window_fold(curve: CurveSpec, window_sums, c: int):
    """Horner fold over windows, MSB -> LSB (ref accumulateAcrossChunks:1710).

    window_sums: (X,Y,Z) each (L, W); window w weights 2^(w*c).
    Returns a single projective point, batch shape ().
    """
    sx, sy, sz = window_sums
    L, W = sx.shape
    acc = group.zero(curve, ())

    def body(i, acc):
        w = W - 1 - i
        cur = tuple(
            jax.lax.dynamic_index_in_dim(a, w, axis=1, keepdims=False)
            for a in (sx, sy, sz)
        )
        acc = jax.lax.fori_loop(
            0, c, lambda _, p: group.double(curve, p), acc
        )
        return group.add(curve, acc, cur)

    # first (top) window without the leading doublings
    top = tuple(a[:, W - 1] for a in (sx, sy, sz))
    acc = jax.lax.fori_loop(1, W, body, top)
    return acc


def _default_impl(ext: int = 1) -> str:
    """Engine choice: measured on the v5e (tools/profile_sorted.py), the
    small-c VMEM-bucket kernel wins (the sorted engine's per-window XLA
    gather costs ~75 ns/point — 2.5x the sweep kernel's add — so
    sort-based large windows lose to more small windows at equal add
    rate).  The bucket kernel is field-generic (Fq/Fq2), so it is the
    default for G1 AND G2; the sorted engine remains the explicit
    large-c path and the ext>2 fallback is jnp."""
    import os

    if os.environ.get("ZPTPU_MSM_IMPL") in ("pallas", "pallas-sorted", "xla"):
        return os.environ["ZPTPU_MSM_IMPL"]
    try:
        on_tpu = jax.devices()[0].platform == "tpu"
    except Exception:
        on_tpu = False
    if not on_tpu:
        return "xla"
    return "pallas" if ext in (1, 2) else "pallas-sorted"


def resolve_config(
    curve, N, max_bits, c, lanes, mem_budget_bytes, impl
) -> Tuple[str, int, Optional[int]]:
    """Resolve (impl, c, lanes) for an MSM of N points (host-side)."""
    if impl == "auto":
        impl = _default_impl(curve.ext)
    if curve.ext > 2 or curve.a != 0:
        # the Pallas kernels cover Fq/Fq2 a=0 curves (the bench surface);
        # cubic-extension / general-a curves (MNT6753) take the jnp path
        impl = "xla"
    # pl_bucket's VMEM cap: c <= 7 over Fq, c <= 6 over Fq2 with the
    # u16-PACKED bucket state (c <= 6 / c <= 5 unpacked; bucket state is
    # 3 * 2^(c-1) * rows * 8 * 128 * 4 bytes vs ~14 MB)
    c_cap = 7 if curve.ext == 1 else 6
    if impl == "pallas" and c is not None and c > c_cap:
        # explicit large window: route to the engine that supports it
        # rather than tripping pl_bucket's VMEM assertion
        impl = "pallas-sorted"
    if c is None:
        if impl == "pallas-sorted":
            c = windows.sorted_engine_window_size(N, max_bits)
        elif impl == "pallas":
            # pick the c <= c_cap minimizing swept window rows (passes run
            # padded to 8 sublanes, so the metric is pad8(W)); ties go to
            # the smaller c (smaller B = cheaper bucket select + finish).
            def rows(cc):
                return -(-windows.num_windows(max_bits, cc) // 8) * 8

            c = min(range(3, c_cap + 1), key=lambda cc: (rows(cc), cc))
        else:
            c = windows.default_window_size(N, max_bits, mem_budget_bytes)
    if impl == "xla" and lanes is None:
        W = windows.num_windows(max_bits, c)
        lanes = _lane_count(N, c, W, mem_budget_bytes, curve.field.elem_len)
    return impl, c, lanes


def _bucket_sums_pallas(curve, points, digits, c, lanes):
    """Dense (L, W, B) bucket sums via the VMEM-bucket sweep kernel.

    Small-c regime: buckets must fit VMEM (see pl_bucket docstring).
    Windows are processed in passes of Wp = 8 — a full sublane tile; a
    remainder-width last pass (e.g. 7 windows) measured 2.2x SLOWER than
    the padded 8-window pass (Mosaic relayouts on a 7-sublane shape), so
    the tail is padded with an all-zero window instead.  Lane reduction
    runs inside the sweep kernel's tail grid steps (one executable per
    pass; the separate reduction kernel cost ~10 s of executable-load
    time per first call, and the jnp tree before it ~55 ms/pass)."""
    from . import pl_bucket

    X, Y = points
    W, N = digits.shape
    c_cap = 7 if curve.ext == 1 else 6
    assert c <= c_cap, f"pallas bucket path requires c <= {c_cap}, got {c}"
    assert curve.ext in (1, 2), "pallas bucket kernel covers Fq/Fq2"
    Wp = min(8, W)
    T = lanes if lanes is not None else 128
    # u16-pack the VMEM bucket state when the unpacked state would not
    # fit (c = 7 over Fq / c = 6 over Fq2): same arithmetic, half the
    # state bytes, B-way select runs on packed words
    packed = pl_bucket.vmem_bytes(curve, Wp, T, c) > 14 << 20
    while T > 8 and pl_bucket.vmem_bytes(curve, Wp, T, c, packed) > 14 << 20:
        T //= 2
    wpad = (-W) % Wp
    if wpad:  # zero digits pass through as identity adds
        digits = jnp.concatenate(
            [digits, jnp.zeros((wpad, N), digits.dtype)], axis=0
        )
    parts = [
        pl_bucket.bucket_accumulate(
            curve, (X, Y), digits[i : i + Wp], lanes=T, c=c,
            reduce_lanes=True, packed=packed,
        )  # (L, Wp, B)
        for i in range(0, W + wpad, Wp)
    ]
    if len(parts) == 1:
        buckets = parts[0]
    else:
        buckets = tuple(
            jnp.concatenate([p[k] for p in parts], axis=1) for k in range(3)
        )
    return tuple(b[:, :W] for b in buckets)


def window_sums(
    curve: CurveSpec,
    points: Tuple[jnp.ndarray, jnp.ndarray],
    digits: jnp.ndarray,
    c: int,
    impl: str,
    lanes: Optional[int] = None,
):
    """Bucket accumulation + per-window weighted reduction: (L, W) x3.

    The per-device stage shared by msm() and parallel.sharded_msm (each
    device computes its shard's window sums; only these cross the
    interconnect).
    """
    from . import pl_bucket, pl_sorted

    X, Y = points
    W, N = digits.shape

    if impl == "pallas-sorted":
        # field-generic: the kernels run G1 (Fq) and G2 (Fq2) through the
        # same code path (ops.field.ktower) — the reference's optimized
        # engine is G1-hardcoded (build_multiexp_opt.js:27-30); fixed here.
        buckets = pl_sorted.bucket_accumulate_sorted(curve, (X, Y), digits, c)
        return bucket_reduce_grouped(curve, buckets)

    if impl == "pallas":
        buckets = _bucket_sums_pallas(curve, (X, Y), digits, c, lanes)
        return bucket_reduce(curve, buckets)

    # jnp private-bucket scatter path
    if lanes is None:
        lanes = _lane_count(N, c, W, 2 << 30, curve.field.elem_len)
    pad = (-N) % lanes
    if pad:
        zf = jnp.zeros((curve.field.elem_len, pad), dtype=U32)
        X = jnp.concatenate([X, zf], axis=1)
        Y = jnp.concatenate([Y, zf], axis=1)
        digits = jnp.concatenate(
            [digits, jnp.zeros((W, pad), digits.dtype)], axis=1
        )
    buckets = bucket_accumulate_c(curve, (X, Y), digits, lanes, c)
    return bucket_reduce(curve, buckets)


def msm(
    curve: CurveSpec,
    points: Tuple[jnp.ndarray, jnp.ndarray],
    scalars: jnp.ndarray,
    c: Optional[int] = None,
    max_bits: Optional[int] = None,
    lanes: Optional[int] = None,
    mem_budget_bytes: int = 2 << 30,
    impl: str = "auto",
):
    """Multi-scalar multiplication (the reference's g1m_multiexp_multiExp,
    build_multiexp_opt.js:1987-2110).

    points:  affine (X, Y), each (L, N), Montgomery form.
    scalars: (Ls, N) uint32 16-bit limbs, standard (non-Montgomery) domain.
    impl:    "pallas" (TPU kernel, VMEM-resident buckets — u16-packed
             above the unpacked VMEM cap, c <= 7 over Fq / c <= 6 over
             Fq2; the measured-fastest engine for G1 and G2),
             "pallas-sorted" (TPU kernel, sort-by-bucket + running-sum
             sweep, any c and any coordinate field — the explicit
             large-window engine),
             "xla" (pure-jnp private-bucket scatter), or "auto"
             (on TPU: pallas for G1 and G2, pallas-sorted for ext > 2;
             xla elsewhere).
    Returns a projective point (X, Y, Z), Montgomery form.
    """
    X, Y = points
    N = X.shape[1]
    if max_bits is None:
        max_bits = scalars.shape[0] * 16
    impl, c, lanes = resolve_config(
        curve, N, max_bits, c, lanes, mem_budget_bytes, impl
    )
    digits = windows.signed_window_digits(scalars, c, max_bits)
    if impl == "pallas":
        # fused single-chip path: sweep kernel -> lane-reduce kernel ->
        # finish kernel (bucket_reduce + window_fold collapsed into one
        # Pallas program; the serial jnp loops were ~145 ms of launch
        # overhead at 2^20)
        from . import pl_reduce

        W = digits.shape[0]
        B = 1 << (c - 1)
        if W <= 1024 // B:
            buckets = _bucket_sums_pallas(curve, (X, Y), digits, c, lanes)
            return pl_reduce.finish(curve, buckets, c)
        if B <= 128:
            # W*B exceeds one 1024-lane block (c = 7 full-width scalars):
            # collapse buckets per window on a wide grid, then fold
            buckets = _bucket_sums_pallas(curve, (X, Y), digits, c, lanes)
            return pl_reduce.finish_large(curve, buckets, c)
    per_window = window_sums(curve, (X, Y), digits, c, impl, lanes)
    return window_fold(curve, per_window, c)
