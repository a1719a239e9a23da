"""Pedersen hash tests vs a python oracle (ref build_pedersenhash.js)."""

import numpy as np

from zprize_wasm_msm_tpu.models.curves import toy
from zprize_wasm_msm_tpu.ops.poly import pedersen
from zprize_wasm_msm_tpu.ops.curve import group
from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve


def oracle_hash(oc, bits, bases, chunk_size):
    acc = None
    W = (len(bits) + 2) // 3
    bits = list(bits) + [0] * (W * 3 - len(bits))
    for w in range(W):
        b0, b1, sign = bits[3 * w : 3 * w + 3]
        k = 1 + b0 + 2 * b1
        base = bases[min(w // chunk_size, len(bases) - 1)]
        p = oc.mul(base, k)
        if sign:
            p = oc.neg(p)
        acc = oc.add(acc, p)
    return acc


def test_pedersen_matches_oracle(rng):
    import jax.numpy as jnp

    curve = toy
    oc = OracleCurve(q=curve.q, a=curve.a, b=curve.b, r=curve.r, gx=curve.gx, gy=curve.gy)
    bases = [oc.mul(oc.g, k) for k in (1, 7)]
    table = pedersen.make_base_table(curve, bases)
    chunk = 4  # new base every 4 windows (12 bits)

    nbits, N = 20, 3
    bits = rng.integers(0, 2, size=(nbits, N)).astype(np.uint32)
    res = pedersen.pedersen_hash(curve, jnp.asarray(bits), table, chunk_size=chunk)
    ax, ay = group.to_affine(curve, res)
    F = curve.field
    got = [
        None if (x == 0 and y == 0) else (x, y)
        for x, y in zip(F.to_host(ax), F.to_host(ay))
    ]
    for j in range(N):
        want = oracle_hash(oc, bits[:, j], bases, chunk)
        assert got[j] == want, f"message {j}"
