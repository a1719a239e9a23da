"""Scalar windowing: c-bit chunk extraction and signed-digit recoding.

TPU-native analog of the reference's schedule computation
(wasmcurves/src/build_multiexp_opt.js — getChunk:1251, window table
getOptimalBucketWidth:33-49, computeSchedule:299).  Instead of packing
64-bit (point, sign, bucket) schedule words, the TPU pipeline materializes
a dense (n_windows, N) digit matrix — static shapes, no pointer packing.

We use *signed* digits in [-2^(c-1), 2^(c-1)] which halves the bucket
count (the reference reserved a sign bit in its schedule encoding for
exactly this, build_multiexp_opt.js:285-293, but never set it; the final
MSM result is identical either way).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

U32 = jnp.uint32
I32 = jnp.int32


def num_windows(max_bits: int, c: int) -> int:
    """Window count incl. the signed-carry overflow window."""
    return (max_bits + c - 1) // c + 1


def default_window_size(n: int, max_bits: int = 256, mem_budget_bytes: int = 2 << 30) -> int:
    """Heuristic window size by point count (role of the reference's
    clz-indexed table, build_multiexp_opt.js:39-44), adapted to the TPU
    pipeline's memory model: per-lane private buckets cost
    W * T * 2^(c-1) * 3 coords, so c is capped by the memory budget.
    """
    if n <= 0:
        return 1
    log_n = max(1, n.bit_length() - 1)
    # classic Pippenger optimum ~ log2(n) - log2(log2(n))
    c = max(2, log_n - max(1, int(np.log2(max(log_n, 2)))))
    return int(min(c, 13))


def sorted_engine_window_size(n: int, max_bits: int = 132) -> int:
    """Window size for the sorted-runs engine (pl_sorted).

    Its per-point cost is one mixed add per window plus a fixed
    per-(window, point) sort+gather overhead, so larger c saves adds but
    the gather (~75 ns/pt measured on v5e, tools/profile_sorted.py)
    flattens the curve: the 2^16 sweep (RESULTS.json) measures c=9..13
    within noise of each other.  Cap at 10 — the largest window whose
    segmented-combine kernel stays within Mosaic's scoped-VMEM limit for
    381-bit fields (c >= 11 routes the combine through the XLA fallback,
    whose graph the remote compile helper cannot always hold).  Explicit
    c up to 16 remains available for the BASELINE sweep (matching the
    reference's table top of 17, build_multiexp_opt.js:39-44).
    """
    if n <= 0:
        return 1
    c = max(2, n.bit_length() - 1 - 4)
    return int(min(c, 10))


@functools.partial(jax.jit, static_argnums=(1, 2))
def raw_window_digits(scalars: jnp.ndarray, c: int, max_bits: int) -> jnp.ndarray:
    """Extract unsigned c-bit windows from 16-bit-limb scalars.

    scalars: (Ls, N) uint32 little-endian 16-bit limbs.
    Returns (n_chunks, N) uint32 raw digits, chunk w covering bits
    [w*c, (w+1)*c) — the vectorized analog of getChunk
    (build_multiexp_opt.js:1251-1322, an unaligned load + shift + mask).
    """
    Ls, = scalars.shape[:1]
    n_chunks = (max_bits + c - 1) // c
    out = []
    mask = np.uint32((1 << c) - 1)
    for w in range(n_chunks):
        bit0 = w * c
        limb0 = bit0 // 16
        shift = bit0 % 16
        if limb0 >= Ls:
            out.append(jnp.zeros(scalars.shape[1:], dtype=U32))
            continue
        # assemble up to 32 bits starting at limb0 from 3 limbs
        v = scalars[limb0] >> np.uint32(shift)
        got = 16 - shift
        k = 1
        while got < c and limb0 + k < Ls:
            v = v | (scalars[limb0 + k] << np.uint32(got))
            got += 16
            k += 1
        out.append(v & mask)
    return jnp.stack(out, axis=0)


@functools.partial(jax.jit, static_argnums=(1, 2))
def signed_window_digits(scalars: jnp.ndarray, c: int, max_bits: int) -> jnp.ndarray:
    """Signed-digit recode: digits in [-2^(c-1), 2^(c-1)], plus a final
    carry window; returns (num_windows(max_bits,c), N) int32.

    sum_w digit_w * 2^(w*c) == scalar  (exactly).
    """
    raw = raw_window_digits(scalars, c, max_bits).astype(I32)
    n_chunks = raw.shape[0]
    half = np.int32(1 << (c - 1))
    full = np.int32(1 << c)
    digits = []
    carry = jnp.zeros(raw.shape[1:], dtype=I32)
    for w in range(n_chunks):
        d = raw[w] + carry
        hi = d > half  # strictly greater keeps digit == +half representable
        digits.append(jnp.where(hi, d - full, d))
        carry = hi.astype(I32)
    digits.append(carry)
    return jnp.stack(digits, axis=0)
