"""FFT/NTT tests vs the O(n^2) DFT oracle (mirrors wasmcurves/test/fft.js)."""

import numpy as np
import pytest

from zprize_wasm_msm_tpu.models.curves import bls12_381, toy_fft
from zprize_wasm_msm_tpu.ops.poly import fft as fft_mod
from zprize_wasm_msm_tpu.oracle import ntt, Curve as OracleCurve
from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs, limbs_to_ints


def to_dev_fr(spec, vals):
    import jax.numpy as jnp

    return jnp.asarray(ints_to_limbs([spec.to_mont_int(v) for v in vals], spec.n_limbs))


def from_dev_fr(spec, arr):
    return [spec.from_mont_int(v) for v in limbs_to_ints(np.asarray(arr))]


@pytest.mark.parametrize("n", [1, 2, 8, 32])
def test_fft_matches_dft_oracle(n, rng):
    spec = bls12_381.fr
    vals = [int(rng.integers(0, 1 << 62)) for _ in range(n)]
    x = to_dev_fr(spec, vals)
    got = from_dev_fr(spec, fft_mod.fft(spec, x))
    if n == 1:
        assert got == [v % spec.q for v in vals]
        return
    root = fft_mod._root_of_unity(spec.q, n)
    want = ntt(vals, spec.q, root)
    assert got == want


def test_ifft_roundtrip(rng):
    spec = bls12_381.fr
    n = 16
    vals = [int(rng.integers(0, 1 << 62)) for _ in range(n)]
    x = to_dev_fr(spec, vals)
    back = from_dev_fr(spec, fft_mod.ifft(spec, fft_mod.fft(spec, x)))
    assert back == [v % spec.q for v in vals]


def test_group_fft_commutes_with_encrypt():
    """FFT(k_i * G) == NTT(k) * G (ref test/fft.js:34-74 'multiplicative
    homomorphism' of the group FFT), on the toy curve."""
    import jax.numpy as jnp

    from zprize_wasm_msm_tpu.ops.curve import group

    curve = toy_fft
    fr = curve.fr
    n = 8
    rng = np.random.default_rng(7)
    ks = [int(rng.integers(1, curve.r)) for _ in range(n)]
    oc = OracleCurve(q=curve.q, a=curve.a, b=curve.b, r=curve.r, gx=curve.gx, gy=curve.gy)

    # device: FFT over points k_i * G
    G = group.generator(curve, (n,))
    sc = jnp.asarray(ints_to_limbs(ks, fr.n_limbs))
    pts = group.times_scalar(curve, G, sc)
    got_pts = fft_mod.group_fft(curve, pts)
    ax, ay = group.to_affine(curve, got_pts)
    F = curve.field
    got = [
        None if (x == 0 and y == 0) else (x, y)
        for x, y in zip(F.to_host(ax), F.to_host(ay))
    ]

    # oracle: NTT of scalars, then multiply G
    root = fft_mod._root_of_unity(fr.q, n)
    want_k = ntt(ks, fr.q, root)
    want = [oc.mul(oc.g, k) for k in want_k]
    assert got == want


def test_fft_join_ext_oracle_and_roundtrip(rng):
    """fft_join_ext matches a bigint oracle and fft_join_ext_inv undoes it
    (ref build_fft.js fftJoinExt:749 / fftJoinExtInv:859)."""
    from zprize_wasm_msm_tpu.utils.bigint import mod_inv

    spec = toy_fft.fr
    q = spec.q
    n, total_bits = 8, 3
    a = [int(rng.integers(0, q)) for _ in range(n)]
    b = [int(rng.integers(0, q)) for _ in range(n)]
    first, inc = 5, 7

    # independent oracle for the constants (reference definition,
    # build_fft.js:80-87): shift = nr^2, m = shift^(2^totalBits),
    # s = 1/(1 - m) — derived here from scratch, NOT via fft_mod internals.
    nr = 2
    while pow(nr, (q - 1) // 2, q) != q - 1:
        nr += 1
    m = pow(nr * nr % q, 1 << total_bits, q)
    s = mod_inv((1 - m) % q, q)
    assert (m, s) == fft_mod._shift_consts(q, total_bits)

    b1 = to_dev_fr(spec, a)
    b2 = to_dev_fr(spec, b)
    fdev = to_dev_fr(spec, [first])[:, 0]
    idev = to_dev_fr(spec, [inc])[:, 0]
    o1, o2 = fft_mod.fft_join_ext(spec, b1, b2, fdev, idev, total_bits)

    w = [first * pow(inc, i, q) % q for i in range(n)]
    want1 = [(x + y) % q for x, y in zip(a, b)]
    want2 = [(x + m * y) * wi % q for x, y, wi in zip(a, b, w)]
    assert from_dev_fr(spec, o1) == want1
    assert from_dev_fr(spec, o2) == want2

    # inverse pass with w_i^{-1} = first^{-1} * (inc^{-1})^i
    fi = to_dev_fr(spec, [mod_inv(first, q)])[:, 0]
    ii = to_dev_fr(spec, [mod_inv(inc, q)])[:, 0]
    r1, r2 = fft_mod.fft_join_ext_inv(spec, o1, o2, fi, ii, total_bits)
    assert from_dev_fr(spec, r1) == a
    assert from_dev_fr(spec, r2) == b


def test_prepare_lagrange_evaluation_oracle(rng):
    """prepare_lagrange_evaluation matches the bigint oracle
    (ref build_fft.js buildPrepareLagrangeEvaluation:991)."""
    from zprize_wasm_msm_tpu.utils.bigint import mod_inv

    spec = toy_fft.fr
    q = spec.q
    n, total_bits = 8, 2
    a = [int(rng.integers(0, q)) for _ in range(n)]
    b = [int(rng.integers(0, q)) for _ in range(n)]
    first, inc = 3, 11

    # constants from the reference definition (build_fft.js:80-87),
    # independent of fft_mod internals
    nr = 2
    while pow(nr, (q - 1) // 2, q) != q - 1:
        nr += 1
    m = pow(nr * nr % q, 1 << total_bits, q)
    s = mod_inv((1 - m) % q, q)
    b1 = to_dev_fr(spec, a)
    b2 = to_dev_fr(spec, b)
    fdev = to_dev_fr(spec, [first])[:, 0]
    idev = to_dev_fr(spec, [inc])[:, 0]
    o1, o2 = fft_mod.prepare_lagrange_evaluation(spec, b1, b2, fdev, idev, total_bits)

    w = [first * pow(inc, i, q) % q for i in range(n)]
    want1 = [(y - m * x) * s % q for x, y in zip(a, b)]
    want2 = [(x - y) * wi % q for x, y, wi in zip(a, b, w)]
    assert from_dev_fr(spec, o1) == want1
    assert from_dev_fr(spec, o2) == want2
