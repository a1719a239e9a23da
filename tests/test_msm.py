"""MSM pipeline tests: stage-level + end-to-end differential + the
reference's embedded end-to-end vector (wasmcurves/test/batchAffine.js:1177).

Stage tests run on the toy curve for compile speed; the generic kernels are
identical for every curve spec.
"""

import numpy as np
import pytest

from zprize_wasm_msm_tpu.models.curves import bls12_381, toy
from zprize_wasm_msm_tpu.ops.msm import pippenger, windows
from zprize_wasm_msm_tpu.ops.curve import group
from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve
from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs, limbs_to_ints


def oracle_of(curve):
    return OracleCurve(q=curve.q, a=curve.a, b=curve.b, r=curve.r, gx=curve.gx, gy=curve.gy)


def affine_to_dev(curve, pts):
    fq = curve.fq
    xs = [0 if p is None else fq.to_mont_int(p[0]) for p in pts]
    ys = [0 if p is None else fq.to_mont_int(p[1]) for p in pts]
    return ints_to_limbs(xs, fq.n_limbs), ints_to_limbs(ys, fq.n_limbs)


def result_to_affine(curve, res):
    fq = curve.fq
    x, y = group.to_affine(curve, tuple(c[:, None] for c in res))
    xi = fq.from_mont_int(limbs_to_ints(np.asarray(x))[0])
    yi = fq.from_mont_int(limbs_to_ints(np.asarray(y))[0])
    return None if (xi == 0 and yi == 0) else (xi, yi)


# ---------------------------------------------------------------------------
# stage tests (ref batchAffine.js tests each exported pipeline stage)
# ---------------------------------------------------------------------------


def test_raw_window_digits():
    k = 0xDEADBEEF12345678
    sc = ints_to_limbs([k], 8)  # 128-bit slot
    for c in (4, 8, 13, 16):
        d = np.asarray(windows.raw_window_digits(sc, c, 128))
        got = 0
        for w in range(d.shape[0] - 1, -1, -1):
            got = (got << c) | int(d[w, 0])
        assert got == k, f"c={c}"


def test_signed_window_digits():
    ks = [0, 1, 0x842, 0xFFFF, 0x12345, (1 << 64) - 1]
    sc = ints_to_limbs(ks, 4)
    for c in (4, 8, 15):
        d = np.asarray(windows.signed_window_digits(sc, c, 64)).astype(np.int64)
        half = 1 << (c - 1)
        assert d.max() <= half and d.min() >= -half
        for i, k in enumerate(ks):
            got = sum(int(d[w, i]) << (w * c) for w in range(d.shape[0]))
            assert got == k, f"c={c} k={k}"


def test_bucket_accumulate_and_reduce_toy(rng):
    oc = oracle_of(toy)
    n = 64
    ks = [int(rng.integers(0, toy.r)) for _ in range(n)]
    pts = [oc.mul(oc.g, int(rng.integers(1, toy.r))) for _ in range(n)]
    X, Y = affine_to_dev(toy, pts)
    sc = ints_to_limbs(ks, toy.fr.n_limbs)
    c = 4
    digits = windows.signed_window_digits(sc, c, 16)
    buckets = pippenger.bucket_accumulate_c(toy, (X, Y), digits, 8, c)
    # window w bucket b must hold sum of points with digit (b+1) (sign folded)
    d_np = np.asarray(digits)
    W = d_np.shape[0]
    B = 1 << (c - 1)
    bx, by, bz = buckets
    for w in range(W):
        for b in range(B):
            expect = None
            for i in range(n):
                if d_np[w, i] == b + 1:
                    expect = oc.add(expect, pts[i])
                elif d_np[w, i] == -(b + 1):
                    expect = oc.add(expect, oc.neg(pts[i]))
            got = result_to_affine(toy, (bx[:, w, b], by[:, w, b], bz[:, w, b]))
            assert got == expect, f"bucket w={w} b={b}"
    # reduce: per-window weighted sums
    per_window = pippenger.bucket_reduce(toy, buckets)
    for w in range(W):
        expect = None
        for i in range(n):
            dv = int(d_np[w, i])
            if dv:
                expect = oc.add(expect, oc.mul(pts[i], dv % toy.r))
        got = result_to_affine(
            toy, (per_window[0][:, w], per_window[1][:, w], per_window[2][:, w])
        )
        assert got == expect, f"window {w}"
    # fold
    res = pippenger.window_fold(toy, per_window, c)
    expect = oc.msm(pts, ks)
    assert result_to_affine(toy, res) == expect


def test_msm_e2e_toy(rng):
    oc = oracle_of(toy)
    for n in (1, 5, 33, 200):
        ks = [int(rng.integers(0, toy.r)) for _ in range(n)]
        ks[0] = 0  # zero scalar
        pts = [oc.mul(oc.g, int(rng.integers(0, toy.r))) for _ in range(n)]
        X, Y = affine_to_dev(toy, pts)  # may include infinity encoded (0,0)
        sc = ints_to_limbs(ks, toy.fr.n_limbs)
        res = pippenger.msm(toy, (X, Y), sc, c=4, max_bits=16, lanes=8)
        assert result_to_affine(toy, res) == oc.msm(pts, ks), f"n={n}"


# ---------------------------------------------------------------------------
# reference end-to-end vector (batchAffine.js:1177-1256 "multiExp is
# correct (case 1)"): 10 points (incl. a duplicate pair), scalars mostly 0
# ---------------------------------------------------------------------------

REF_POINTS = [
    (0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
     0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1),
    (0x0572CBEA904D67468808C8EB50A9450C9721DB309128012543902D0AC358A62AE28F75BB8F1C7C42C39A8C5529BF0F4E,
     0x166A9D8CABC673A322FDA673779D8E3822BA3ECB8670E461F73BB9021D5FD76A4C56D9D4CD16BD1BBA86881979749D28),
    (0x09ECE308F9D1F0131765212DECA99697B112D61F9BE9A5F1F3780A51335B3FF981747A0B2CA2179B96D2C0C9024E5224,
     0x032B80D3A6F5B09F8A84623389C5F80CA69A0CDDABC3097F9D9C27310FD43BE6E745256C634AF45CA3473B0590AE30D1),
    (0x10E7791FB972FE014159AA33A98622DA3CDC98FF707965E536D8636B5FCC5AC7A91A8C46E59A00DCA575AF0F18FB13DC,
     0x16BA437EDCC6551E30C10512367494BFB6B01CC6681E8A4C3CD2501832AB5C4ABC40B4578B85CBAFFBF0BCD70D67C6E2),
    (0x0C9B60D5AFCBD5663A8A44B7C5A02F19E9A77AB0A35BD65809BB5C67EC582C897FEB04DECC694B13E08587F3FF9B5B60,
     0x143BE6D078C2B79A7D4F1D1B21486A030EC93F56AA54E1DE880DB5A66DD833A652A95BEE27C824084006CB5644CBD43F),
    (0x06E82F6DA4520F85C5D27D8F329ECCFA05944FD1096B20734C894966D12A9E2A9A9744529D7212D33883113A0CADB909,
     0x17D81038F7D60BEE9110D9C0D6D1102FE2D998C957F28E31EC284CC04134DF8E47E8F82FF3AF2E60A6D9688A4563477C),
    (0x1928F3BEB93519EECF0145DA903B40A4C97DCA00B21F12AC0DF3BE9116EF2EF27B2AE6BCD4C5BC2D54EF5A70627EFCB7,
     0x108DADBAA4B636445639D5AE3089B3C43A8A1D47818EDD1839D7383959A41C10FDC66849CFA1B08C5A11EC7E28981A1C),
    (0x085AE765588126F5E860D019C0E26235F567A9C0C0B2D8FF30F3E8D436B1082596E5E7462D20F5BE3764FD473E57F9CF,
     0x19E7DFAB8A794B6ABB9F84E57739DE172A63415273F460D1607FA6A74F0ACD97D9671B801DD1FD4F18232DD1259359A1),
    (0x19CDF3807146E68E041314CA93E1FEE0991224EC2A74BEB2866816FD0826CE7B6263EE31E953A86D1B72CC2215A57793,
     0x07481B1F261AABACF45C6E4FC278055441BFAF99F604D1F835C0752AC9742B4522C9F5C77DB40989E7DA608505D48616),
    (0x19CDF3807146E68E041314CA93E1FEE0991224EC2A74BEB2866816FD0826CE7B6263EE31E953A86D1B72CC2215A57793,
     0x07481B1F261AABACF45C6E4FC278055441BFAF99F604D1F835C0752AC9742B4522C9F5C77DB40989E7DA608505D48616),
]
REF_SCALARS = [0, 0, 0, 0, 0, 0, 0, 0, 0x842, 0x842]
REF_EXPECTED = (
    0x08F98E551E647B5DA65F222E728A590A0BB89948D03D44768C2C2B9F87F74A30DB23C44009205A1AA81632166F20D284,
    0x1489FFC27FCC09DD72707B3D1D67DB85D1777DCC2E27849628F528154DAAF5846CF57D55119091BF7237DE9732BB45F6,
)


@pytest.mark.slow
def test_msm_reference_vector_bls12_381():
    X, Y = affine_to_dev(bls12_381, REF_POINTS)
    sc = ints_to_limbs(REF_SCALARS, bls12_381.fr.n_limbs)
    res = pippenger.msm(bls12_381, (X, Y), sc, c=8, max_bits=256, lanes=2)
    got = result_to_affine(bls12_381, res)
    assert got == REF_EXPECTED

    # cross-check with the oracle too
    oc = oracle_of(bls12_381)
    assert got == oc.msm(REF_POINTS, REF_SCALARS)


def test_resolve_config_explicit_large_c_pallas():
    """impl='pallas' with an explicit c > 6 must route to the sorted engine
    (the documented large-window path) instead of tripping the pl_bucket
    c <= 6 assertion (round-3 ADVICE item)."""
    from zprize_wasm_msm_tpu.models.curves import bls12_381

    impl, c, _ = pippenger.resolve_config(
        bls12_381, 1 << 10, 128, 12, None, 2 << 30, "pallas"
    )
    assert impl == "pallas-sorted" and c == 12


def test_engine_differential_naive_vs_bucket_toy(rng):
    """True second-engine differential (the reference's optimized-vs-legacy
    cross-check, test/batchAffine.js:1258-1301): the per-point
    double-and-add engine (ops.msm.naive — NO shared pipeline stage) vs
    the generic bucket engine on random points/scalars."""
    from zprize_wasm_msm_tpu.ops.msm.naive import msm_naive

    oc = oracle_of(toy)
    n = 96
    ks = [int(rng.integers(0, toy.r)) for _ in range(n)]
    ks[3] = 0
    pts = [oc.mul(oc.g, int(rng.integers(0, toy.r))) for _ in range(n)]
    X, Y = affine_to_dev(toy, pts)
    sc = ints_to_limbs(ks, toy.fr.n_limbs)
    a = result_to_affine(toy, msm_naive(toy, (X, Y), sc, max_bits=16))
    b = result_to_affine(
        toy, pippenger.msm(toy, (X, Y), sc, c=4, max_bits=16, lanes=8)
    )
    assert a == b
    assert a == oc.msm(pts, ks)


@pytest.mark.slow
def test_engine_differential_naive_vs_bucket_bls12_381(rng):
    """Full-width engine differential on BLS12-381 G1 random inputs."""
    from zprize_wasm_msm_tpu.ops.msm.naive import msm_naive

    oc = oracle_of(bls12_381)
    n = 16
    pts = [oc.mul(oc.g, int(rng.integers(1, 1 << 62))) for _ in range(n)]
    ks = [int.from_bytes(rng.bytes(31), "little") % bls12_381.r for _ in range(n)]
    X, Y = affine_to_dev(bls12_381, pts)
    sc = ints_to_limbs(ks, bls12_381.fr.n_limbs)
    a = result_to_affine(bls12_381, msm_naive(bls12_381, (X, Y), sc))
    b = result_to_affine(
        bls12_381, pippenger.msm(bls12_381, (X, Y), sc, c=8, max_bits=256, lanes=2)
    )
    assert a == b
    assert a == oc.msm(pts, ks)
