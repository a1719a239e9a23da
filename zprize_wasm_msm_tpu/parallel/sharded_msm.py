"""Mesh-sharded MSM: data-parallel Pippenger with collective reduction.

The distributed design BASELINE.json's north star requires (the reference
has no parallelism to port — SURVEY.md §2.7/§5.8):

  * the point/scalar batch is sharded over a 1-D device mesh (ICI ring,
    DCN across hosts — same mesh, same code);
  * every device runs the full local pipeline: GLV split, digit recode,
    bucket accumulation, bucket reduction -> per-window partial sums;
  * ONLY the (W, 3, L)-sized window sums cross the interconnect
    (~W*3*L*4 bytes ≈ 50 KB — negligible vs hours of compute), via
    all_gather + replicated tree-add (a curve-group "psum");
  * the Horner window fold runs replicated on every device.

Scaling efficiency is compute-bound by construction: communication is
O(W*L) regardless of N, so 1 -> N host efficiency approaches 1.0 for the
2^26 config (target >= 0.7).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.curve import group
from ..ops.curve.spec import CurveSpec
from ..ops.msm import glv as glv_mod
from ..ops.msm import pippenger, windows
from .mesh import POINTS_AXIS


def msm_sharded(
    curve: CurveSpec,
    points: Tuple[jnp.ndarray, jnp.ndarray],
    scalars: jnp.ndarray,
    mesh: Mesh,
    c: Optional[int] = None,
    max_bits: Optional[int] = None,
    lanes: Optional[int] = None,
    use_glv: Optional[bool] = None,
    mem_budget_bytes: int = 2 << 30,
    impl: str = "auto",
):
    """MSM over a device mesh; N must divide evenly by mesh size.

    impl: per-device engine — "pallas-sorted" (the TPU large-window
    kernel engine), "xla" (jnp private-bucket path), or "auto" (sorted on
    TPU backends, xla elsewhere — same rule as pippenger.msm).
    Returns the projective result, replicated on every device.
    """
    from ..ops.msm import pl_sorted

    X, Y = points
    n_dev = mesh.devices.size
    N = X.shape[1]
    assert N % n_dev == 0, "pad N to a multiple of the mesh size"
    if impl == "auto":
        impl = pippenger._default_impl()
    if use_glv is None:
        use_glv = curve.glv is not None
    if max_bits is None:
        max_bits = glv_mod.MAX_BITS if use_glv else scalars.shape[0] * 16
    local_n = (N // n_dev) * (2 if use_glv else 1)
    if c is None:
        if impl == "pallas-sorted":
            c = windows.sorted_engine_window_size(local_n, max_bits)
        else:
            c = windows.default_window_size(local_n, max_bits, mem_budget_bytes)
    if lanes is None:
        W = windows.num_windows(max_bits, c)
        lanes = pippenger._lane_count(local_n, c, W, mem_budget_bytes, curve.field.elem_len)
        lanes = min(lanes, max(1, local_n // 4) if local_n >= 4 else 1)

    def local_step(xs, ys, sc):
        # shard_map gives the per-device shard (L, N/n_dev)
        pts, s = (xs, ys), sc
        if use_glv:
            pts, s = glv_mod.preprocess_endomorphism(curve, pts, s)
        digits = windows.signed_window_digits(s, c, max_bits)
        if impl == "pallas-sorted":
            # the TPU engine pads to its lane grid internally
            buckets = pl_sorted.bucket_accumulate_sorted(curve, pts, digits, c)
            wsum = pippenger.bucket_reduce_grouped(curve, buckets)
        else:
            # pad local N to lane multiple
            Nl = pts[0].shape[1]
            pad = (-Nl) % lanes
            if pad:
                zf = jnp.zeros((curve.field.elem_len, pad), dtype=jnp.uint32)
                pts = (
                    jnp.concatenate([pts[0], zf], axis=1),
                    jnp.concatenate([pts[1], zf], axis=1),
                )
                digits = jnp.concatenate(
                    [digits, jnp.zeros((digits.shape[0], pad), digits.dtype)], axis=1
                )
            buckets = pippenger.bucket_accumulate_c(curve, pts, digits, lanes, c)
            wsum = pippenger.bucket_reduce(curve, buckets)  # (L, W) x3, local

        # ---- the only cross-device traffic: per-window partial sums ----
        gathered = jax.lax.all_gather(wsum, POINTS_AXIS)  # (D, L, W) x3
        total = tuple(g[0] for g in gathered)
        for d in range(1, n_dev):
            total = group.add(curve, total, tuple(g[d] for g in gathered))
        return pippenger.window_fold(curve, total, c)

    shard = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(None, POINTS_AXIS), P(None, POINTS_AXIS), P(None, POINTS_AXIS)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(shard)(X, Y, scalars)
