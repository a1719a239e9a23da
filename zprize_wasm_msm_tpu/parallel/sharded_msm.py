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
    X, Y = points
    n_dev = mesh.devices.size
    N = X.shape[1]
    assert N % n_dev == 0, "pad N to a multiple of the mesh size"
    if use_glv is None:
        use_glv = curve.glv is not None
    if max_bits is None:
        max_bits = glv_mod.MAX_BITS if use_glv else scalars.shape[0] * 16
    local_n = (N // n_dev) * (2 if use_glv else 1)
    impl, c, lanes = pippenger.resolve_config(
        curve, local_n, max_bits, c, lanes, mem_budget_bytes, impl
    )
    if impl == "xla":
        lanes = min(lanes, max(1, local_n // 4) if local_n >= 4 else 1)

    def local_step(xs, ys, sc):
        # shard_map gives the per-device shard (L, N/n_dev)
        pts, s = (xs, ys), sc
        if use_glv:
            pts, s = glv_mod.preprocess_endomorphism(curve, pts, s)
        digits = windows.signed_window_digits(s, c, max_bits)
        # per-device engine: identical stage to the single-chip msm()
        wsum = pippenger.window_sums(curve, pts, digits, c, impl, lanes)

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
