"""Windowed Pedersen hash over precomputed base tables.

TPU-native re-design of wasmcurves/src/build_pedersenhash.js (wired for
MNT6753 in tools/buildwasm_mnt6753.js; chunkSize = 188 there): the message
is consumed 3 bits per window — (b0, b1) select base_j * (1 + b0 + 2*b1)
from the table, b2 negates — and all selected points are summed.

The reference's per-window pointer walk + accumulator slots become ONE
batched table select (the table is tiny) and a log-depth group tree-sum;
the accumulator-slot layout is a WASM work-sharing detail with no effect
on the result.

Base tables: the reference precomputes [base_j * k for k in 1..4] offline
(tools/buildpedersentablebases_mnt6753.js); `make_base_table` does the
same host-side from affine generator points.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..curve import group
from ..curve.spec import CurveSpec
from ...oracle import Curve as _OracleCurve
from ...utils.limbs import ints_to_limbs


def make_base_table(curve: CurveSpec, bases: Sequence[Tuple[int, int]]):
    """[(x, y)...] affine bases -> device table (X, Y) each (L, 4*n_bases)
    holding base_j * (k+1) for k = 0..3 (the reference's basesTable layout)."""
    oc = _OracleCurve(
        q=curve.q, a=curve.a, b=curve.b, r=curve.r, gx=curve.gx, gy=curve.gy
    )
    fq = curve.fq
    xs, ys = [], []
    for b in bases:
        for k in range(1, 5):
            p = oc.mul(b, k)
            xs.append(fq.to_mont_int(p[0]))
            ys.append(fq.to_mont_int(p[1]))
    return (
        jnp.asarray(ints_to_limbs(xs, fq.n_limbs)),
        jnp.asarray(ints_to_limbs(ys, fq.n_limbs)),
    )


@functools.partial(jax.jit, static_argnums=(0, 3))
def pedersen_hash(
    curve: CurveSpec,
    bits: jnp.ndarray,
    table: Tuple[jnp.ndarray, jnp.ndarray],
    chunk_size: int = 188,
):
    """bits: (nbits, N) uint32 in {0,1} (LSB-first messages, batched).

    Returns the hash point batch, projective (X, Y, Z) each (L, N).
    nbits is padded up to a multiple of 3 by the caller; windows beyond
    the message contribute base*(1) per the reference's bit() = 0 padding.
    chunk_size selects a new base every chunk_size windows (ref :116).
    """
    TX, TY = table
    L = TX.shape[0]
    nbits, N = bits.shape
    W = (nbits + 2) // 3
    pad = W * 3 - nbits
    if pad:
        bits = jnp.concatenate([bits, jnp.zeros((pad, N), bits.dtype)], axis=0)
    b = bits.reshape(W, 3, N)
    sel = b[:, 0] + 2 * b[:, 1]  # (W, N) in 0..3
    sign = b[:, 2]

    n_entries = TX.shape[1]
    # table index per window: base_idx*4 + sel
    w_iota = jax.lax.broadcasted_iota(jnp.uint32, (W, N), 0)
    idx = (w_iota // np.uint32(chunk_size)) * 4 + sel  # (W, N)
    idx = jnp.minimum(idx, np.uint32(n_entries - 1))

    # gather: small table -> one-hot select keeps everything TPU-safe
    px = jnp.zeros((L, W, N), jnp.uint32)
    py = jnp.zeros((L, W, N), jnp.uint32)
    for e in range(n_entries):
        m = (idx == e)[None]
        px = jnp.where(m, TX[:, e][:, None, None], px)
        py = jnp.where(m, TY[:, e][:, None, None], py)

    F = curve.field
    py_flat = py.reshape(L, W * N)
    py_flat = F.select(
        (sign == 1).reshape(W * N), F.neg(py_flat), py_flat
    )
    px_flat = px.reshape(L, W * N)

    # tree-sum over the window axis with complete adds
    P = group.from_affine(curve, (px_flat, py_flat))
    P = tuple(a.reshape(L, W, N) for a in P)
    w = W
    while w > 1:
        half = w // 2
        s = _flat_add3(curve, tuple(a[:, :half] for a in P), tuple(a[:, half : 2 * half] for a in P))
        if w % 2:
            P = tuple(jnp.concatenate([x, a[:, -1:]], axis=1) for x, a in zip(s, P))
            w = half + 1
        else:
            P = s
            w = half
    return tuple(a[:, 0] for a in P)


def _flat_add3(curve, p1, p2):
    shp = p1[0].shape
    L = shp[0]
    s = group.add(
        curve,
        tuple(a.reshape(L, -1) for a in p1),
        tuple(a.reshape(L, -1) for a in p2),
    )
    return tuple(a.reshape(shp) for a in s)
