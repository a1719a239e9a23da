"""TPU hot-path tests: the Pallas kernels that produce the bench number.

Everything runs in Pallas TPU *interpret mode* on the CPU backend, so the
exact kernel bodies (ops.field.kcore, ops.curve.kgroup, ops.msm.pl_bucket,
ops.field.kernels) are exercised by `pytest -m "not slow"` without TPU
hardware.  Each test is a differential against the jnp path (ops.field.mont
/ ops.curve.group / pippenger's XLA bucket path), which is itself tested
against the pure-Python oracle — results must be bit-identical.

Mirrors the reference's strategy of testing every MSM stage through its
exported symbol (wasmcurves/test/batchAffine.js:43-1256).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from zprize_wasm_msm_tpu.models.curves import toy, toy_g2
from zprize_wasm_msm_tpu.ops.curve import group, kgroup
from zprize_wasm_msm_tpu.ops.field import kcore, kernels, ktower, mont
from zprize_wasm_msm_tpu.ops.msm import pippenger, pl_bucket, pl_sorted, windows
from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs

U32 = jnp.uint32
FQ = toy.fq
L = FQ.n_limbs


def rand_elems(rng, n):
    vals = [int(rng.integers(0, FQ.q)) for _ in range(n)]
    return jnp.asarray(ints_to_limbs([FQ.to_mont_int(v) for v in vals], L))


def run_kcore_binop(op_name, a, b):
    """Run one kcore binary op inside a real (interpreted) Pallas kernel."""
    n = a.shape[1]

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        av, bv = a_ref[:], b_ref[:]
        if op_name == "add":
            o_ref[:] = kcore.kadd(FQ, av, bv)
        elif op_name == "sub":
            o_ref[:] = kcore.ksub(FQ, av, bv)
        elif op_name == "mul":
            o_ref[:] = kcore.kmul(FQ, acc_ref, av, bv)
        elif op_name == "neg":
            o_ref[:] = kcore.kneg(FQ, av)

    with pltpu.force_tpu_interpret_mode():
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L, n), U32),
            scratch_shapes=[pltpu.VMEM((2 * L + 2, n), U32)],
        )(a, b)


@pytest.mark.parametrize("op", ["add", "sub", "mul", "neg"])
def test_kcore_matches_mont(rng, op):
    """kcore field ops ≡ ops.field.mont, bit-for-bit, on random operands."""
    n = 16
    a = rand_elems(rng, n)
    b = rand_elems(rng, n)
    got = np.asarray(run_kcore_binop(op, a, b))
    ref = {
        "add": lambda: mont.add(FQ, a, b),
        "sub": lambda: mont.sub(FQ, a, b),
        "mul": lambda: mont.mont_mul(FQ, a, b),
        "neg": lambda: mont.neg(FQ, a),
    }[op]()
    np.testing.assert_array_equal(got, np.asarray(ref))


def test_kcore_edge_values(rng):
    """Edge operands: 0, 1, q-1 in all combinations (genValues-style sweep,
    ref wasmcurves/test/helpers/helpers.js)."""
    edges = [0, 1, FQ.q - 1, FQ.q // 2, FQ.q // 2 + 1]
    pairs = [(x, y) for x in edges for y in edges]
    a = jnp.asarray(ints_to_limbs([FQ.to_mont_int(x) for x, _ in pairs], L))
    b = jnp.asarray(ints_to_limbs([FQ.to_mont_int(y) for _, y in pairs], L))
    for op, ref in [
        ("add", mont.add(FQ, a, b)),
        ("sub", mont.sub(FQ, a, b)),
        ("mul", mont.mont_mul(FQ, a, b)),
    ]:
        got = np.asarray(run_kcore_binop(op, a, b))
        np.testing.assert_array_equal(got, np.asarray(ref), err_msg=op)


def test_kgroup_matches_group(rng):
    """kgroup kadd/kadd_mixed/kdouble ≡ ops.curve.group, incl. identities."""
    from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve

    oc = OracleCurve(q=toy.q, a=toy.a, b=toy.b, r=toy.r, gx=toy.gx, gy=toy.gy)
    n = 8
    pts = [oc.mul(oc.g, int(rng.integers(1, toy.r))) for _ in range(n - 1)]
    pts.append(None)  # identity in the batch
    qts = [oc.mul(oc.g, int(rng.integers(1, toy.r))) for _ in range(n - 2)]
    qts.append(pts[0])  # duplicate -> doubling case inside add
    qts.append(None)

    def to_dev(ps):
        xs = [0 if p is None else FQ.to_mont_int(p[0]) for p in ps]
        ys = [0 if p is None else FQ.to_mont_int(p[1]) for p in ps]
        return (
            jnp.asarray(ints_to_limbs(xs, L)),
            jnp.asarray(ints_to_limbs(ys, L)),
        )

    PX, PY = to_dev(pts)
    QX, QY = to_dev(qts)
    P = group.from_affine(toy, (PX, PY))
    Q = group.from_affine(toy, (QX, QY))

    def kernel(mode, px, py, pz, qx, qy, qz, ox, oy, oz, acc_ref):
        p = (px[:], py[:], pz[:])
        q3 = (qx[:], qy[:], qz[:])
        if mode == "add":
            r = kgroup.kadd(toy, acc_ref, p, q3)
        elif mode == "add_mixed":
            r = kgroup.kadd_mixed(toy, acc_ref, p, (qx[:], qy[:]))
        else:
            r = kgroup.kdouble(toy, acc_ref, p)
        ox[:], oy[:], oz[:] = r

    def run(mode, p, q3):
        out = jax.ShapeDtypeStruct((L, n), U32)
        with pltpu.force_tpu_interpret_mode():
            return pl.pallas_call(
                functools.partial(kernel, mode),
                out_shape=(out, out, out),
                scratch_shapes=[pltpu.VMEM((2 * L + 2, n), U32)],
            )(*p, *q3)

    # add_mixed takes RAW affine coords (identity = (0,0), not (0:1:0))
    Qmixed = (QX, QY, Q[2])
    for mode, ref, qin in [
        ("add", group.add(toy, P, Q), Q),
        ("add_mixed", group.add_mixed(toy, P, (QX, QY)), Qmixed),
        ("double", group.double(toy, P), Q),
    ]:
        got = run(mode, P, qin)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r), err_msg=mode)


def test_pl_bucket_matches_xla_path(rng):
    """pl_bucket.bucket_accumulate ≡ pippenger's jnp bucket path as group
    elements.  (The two paths partition points to lanes differently —
    interleaved vs chunked — so projective representatives differ by
    addition order; affine coordinates must match exactly.)"""
    from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve

    oc = OracleCurve(q=toy.q, a=toy.a, b=toy.b, r=toy.r, gx=toy.gx, gy=toy.gy)
    n, c, T = 32, 4, 4
    pts = [oc.mul(oc.g, int(rng.integers(1, toy.r))) for _ in range(n)]
    ks = [int(rng.integers(0, toy.r)) for _ in range(n)]
    ks[0] = 0
    xs = [FQ.to_mont_int(p[0]) for p in pts]
    ys = [FQ.to_mont_int(p[1]) for p in pts]
    X = jnp.asarray(ints_to_limbs(xs, L))
    Y = jnp.asarray(ints_to_limbs(ys, L))
    sc = ints_to_limbs(ks, toy.fr.n_limbs)
    digits = windows.signed_window_digits(sc, c, 16)

    with pltpu.force_tpu_interpret_mode():
        raw = pl_bucket.bucket_accumulate(toy, (X, Y), digits, lanes=T, c=c)
        got = pippenger._lane_tree_reduce(toy, raw)
    ref = pippenger._bucket_accumulate_impl(toy, (X, Y), digits, T, c)
    got_aff = group.to_affine(toy, got)
    ref_aff = group.to_affine(toy, ref)
    for g, r in zip(got_aff, ref_aff):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_msm_pallas_impl_matches_xla(rng):
    """End-to-end msm(impl='pallas') ≡ msm(impl='xla') on the toy curve."""
    from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve

    oc = OracleCurve(q=toy.q, a=toy.a, b=toy.b, r=toy.r, gx=toy.gx, gy=toy.gy)
    n = 40
    pts = [oc.mul(oc.g, int(rng.integers(1, toy.r))) for _ in range(n)]
    ks = [int(rng.integers(0, toy.r)) for _ in range(n)]
    xs = [FQ.to_mont_int(p[0]) for p in pts]
    ys = [FQ.to_mont_int(p[1]) for p in pts]
    X = jnp.asarray(ints_to_limbs(xs, L))
    Y = jnp.asarray(ints_to_limbs(ys, L))
    sc = ints_to_limbs(ks, toy.fr.n_limbs)

    with pltpu.force_tpu_interpret_mode():
        got = pippenger.msm(
            toy, (X, Y), sc, c=4, max_bits=16, lanes=8, impl="pallas"
        )
    ref = pippenger.msm(toy, (X, Y), sc, c=4, max_bits=16, lanes=8, impl="xla")
    from tests.test_msm import result_to_affine

    expected = oc.msm(pts, ks)
    assert result_to_affine(toy, got) == expected
    assert result_to_affine(toy, ref) == expected


def test_batch_api_dispatch(rng, monkeypatch):
    """ops.field.batch routes to the Pallas kernels when forced, and both
    backends agree; round-trips to_mont∘from_mont = identity."""
    from zprize_wasm_msm_tpu.ops.field import batch

    n = 24
    a = rand_elems(rng, n)
    b = rand_elems(rng, n)
    monkeypatch.setenv("ZPTPU_FIELD_IMPL", "xla")
    ref = np.asarray(batch.batch_mul(FQ, a, b))
    monkeypatch.setenv("ZPTPU_FIELD_IMPL", "pallas")
    with pltpu.force_tpu_interpret_mode():
        got = np.asarray(batch.batch_mul(FQ, a, b))
        rt = np.asarray(batch.batch_from_mont(FQ, batch.batch_to_mont(FQ, a)))
    np.testing.assert_array_equal(got, ref)
    np.testing.assert_array_equal(rt, np.asarray(a))


def test_field_kernels_batch_ops(rng):
    """ops.field.kernels (Pallas batched mont_mul/mont_square) ≡ mont."""
    n = 40  # not a block multiple: exercises padding
    a = rand_elems(rng, n)
    b = rand_elems(rng, n)
    with pltpu.force_tpu_interpret_mode():
        gm = np.asarray(kernels.mont_mul(FQ, a, b))
        gs = np.asarray(kernels.mont_square(FQ, a))
    np.testing.assert_array_equal(gm, np.asarray(mont.mont_mul(FQ, a, b)))
    np.testing.assert_array_equal(gs, np.asarray(mont.mont_square(FQ, a)))


# ---------------------------------------------------------------------------
# ktower: the kernel Fq2 backend (G2-on-TPU support)
# ---------------------------------------------------------------------------

KF2 = toy_g2.kfield
F2T = toy_g2.field  # jnp tower backend
L2 = F2T.elem_len


def rand_f2_elems(rng, n):
    """Random Fq2 elements as flat (2L, n) Montgomery stacks."""
    q = toy_g2.q
    vals = [
        (int(rng.integers(0, q)), int(rng.integers(0, q))) for _ in range(n)
    ]
    cols = [F2T.const(v) for v in vals]
    return jnp.stack(cols, axis=1)


@pytest.mark.parametrize("op", ["add", "sub", "mul", "neg"])
def test_ktower_fq2_matches_tower(rng, op):
    """Kernel Fq2 ops ≡ ops.field.tower.Fq2, bit-for-bit."""
    n = 16
    a = rand_f2_elems(rng, n)
    b = rand_f2_elems(rng, n)

    def kernel(a_ref, b_ref, o_ref, acc_ref):
        av, bv = a_ref[:], b_ref[:]
        if op == "add":
            o_ref[:] = KF2.add(av, bv)
        elif op == "sub":
            o_ref[:] = KF2.sub(av, bv)
        elif op == "mul":
            o_ref[:] = KF2.mul(acc_ref, av, bv)
        elif op == "neg":
            o_ref[:] = KF2.neg(av)

    with pltpu.force_tpu_interpret_mode():
        got = pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((L2, n), U32),
            scratch_shapes=[pltpu.VMEM((KF2.acc_rows, n), U32)],
        )(a, b)
    ref = {
        "add": lambda: F2T.add(a, b),
        "sub": lambda: F2T.sub(a, b),
        "mul": lambda: F2T.mul(a, b),
        "neg": lambda: F2T.neg(a),
    }[op]()
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_kgroup_g2_matches_group(rng):
    """kgroup over Fq2 (toy_g2) ≡ ops.curve.group, incl. identities."""
    from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve, F2

    oc = OracleCurve(
        q=toy_g2.q, a=toy_g2.a, b=toy_g2.b, r=toy_g2.r,
        gx=toy_g2.gx, gy=toy_g2.gy, field=F2(toy_g2.q, toy_g2.nr),
    )
    n = 8
    pts = [oc.mul(oc.g, int(rng.integers(1, toy_g2.r))) for _ in range(n - 1)]
    pts.append(None)
    qts = [oc.mul(oc.g, int(rng.integers(1, toy_g2.r))) for _ in range(n - 2)]
    qts.append(pts[0])  # duplicate -> doubling case inside add
    qts.append(None)

    def to_dev(ps):
        xs = [F2T.const(p[0] if p else 0) for p in ps]
        ys = [F2T.const(p[1] if p else 0) for p in ps]
        return jnp.stack(xs, axis=1), jnp.stack(ys, axis=1)

    PX, PY = to_dev(pts)
    QX, QY = to_dev(qts)
    P = group.from_affine(toy_g2, (PX, PY))
    Q = group.from_affine(toy_g2, (QX, QY))

    def kernel(mode, px, py, pz, qx, qy, qz, ox, oy, oz, acc_ref):
        p = (px[:], py[:], pz[:])
        if mode == "add":
            r = kgroup.kadd(toy_g2, acc_ref, p, (qx[:], qy[:], qz[:]))
        elif mode == "add_mixed":
            r = kgroup.kadd_mixed(toy_g2, acc_ref, p, (qx[:], qy[:]))
        else:
            r = kgroup.kdouble(toy_g2, acc_ref, p)
        ox[:], oy[:], oz[:] = r

    def run(mode, p, q3):
        out = jax.ShapeDtypeStruct((L2, n), U32)
        with pltpu.force_tpu_interpret_mode():
            return pl.pallas_call(
                functools.partial(kernel, mode),
                out_shape=(out, out, out),
                scratch_shapes=[pltpu.VMEM((KF2.acc_rows, n), U32)],
            )(*p, *q3)

    for mode, ref, qin in [
        ("add", group.add(toy_g2, P, Q), Q),
        ("add_mixed", group.add_mixed(toy_g2, P, (QX, QY)), (QX, QY, Q[2])),
        ("double", group.double(toy_g2, P), Q),
    ]:
        got = run(mode, P, qin)
        for g, r in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(r), err_msg=mode)


# ---------------------------------------------------------------------------
# pl_sorted: the large-window sorted-runs engine (G1 and G2)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("c", [4, 7])
def test_sorted_engine_matches_oracle_g1(rng, c):
    """msm(impl='pallas-sorted') on the toy curve ≡ oracle and ≡ xla impl.

    Exercises all five stages (sort/sweep/compact/combine/scatter) in
    interpret mode, including duplicate buckets, zero scalars, and the
    empty-bucket identity fix."""
    from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve
    from tests.test_msm import result_to_affine

    oc = OracleCurve(q=toy.q, a=toy.a, b=toy.b, r=toy.r, gx=toy.gx, gy=toy.gy)
    n = 70
    pts = [oc.mul(oc.g, int(rng.integers(1, toy.r))) for _ in range(n)]
    ks = [int(rng.integers(0, toy.r)) for _ in range(n)]
    ks[0] = 0
    ks[1] = ks[2] = 5  # forced duplicate digits -> multi-point runs
    X = jnp.asarray(ints_to_limbs([FQ.to_mont_int(p[0]) for p in pts], L))
    Y = jnp.asarray(ints_to_limbs([FQ.to_mont_int(p[1]) for p in pts], L))
    sc = ints_to_limbs(ks, toy.fr.n_limbs)

    with pltpu.force_tpu_interpret_mode():
        got = pippenger.msm(
            toy, (X, Y), sc, c=c, max_bits=16, impl="pallas-sorted"
        )
    expected = oc.msm(pts, ks)
    assert result_to_affine(toy, got) == expected


def test_sorted_engine_matches_oracle_g2(rng):
    """G2 MSM through the sorted-runs kernels (the path the reference's
    G1-hardcoded engine cannot run, build_multiexp_opt.js:27-30)."""
    from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve, F2

    oc = OracleCurve(
        q=toy_g2.q, a=toy_g2.a, b=toy_g2.b, r=toy_g2.r,
        gx=toy_g2.gx, gy=toy_g2.gy, field=F2(toy_g2.q, toy_g2.nr),
    )
    n = 40
    pts = [oc.mul(oc.g, int(rng.integers(1, toy_g2.r))) for _ in range(n)]
    ks = [int(rng.integers(0, toy_g2.r)) for _ in range(n)]
    ks[0] = 0
    xs = jnp.stack([F2T.const(p[0]) for p in pts], axis=1)
    ys = jnp.stack([F2T.const(p[1]) for p in pts], axis=1)
    sc = ints_to_limbs(ks, toy_g2.fr.n_limbs)

    with pltpu.force_tpu_interpret_mode():
        got = pippenger.msm(
            toy_g2, (xs, ys), sc, c=5, max_bits=20, impl="pallas-sorted"
        )
    gx, gy = group.to_affine(toy_g2, got)
    gxh = F2T.to_host(gx)[0]
    gyh = F2T.to_host(gy)[0]
    expected = oc.msm(pts, ks)
    got_pt = None if (gxh == (0, 0) and gyh == (0, 0)) else (gxh, gyh)
    assert got_pt == expected


def test_segscan_xla_matches_pallas(rng):
    """The large-c XLA combine fallback ≡ the VMEM segscan kernel on the
    same (pieces, segments) input (stage 4 of the sorted engine)."""
    from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve

    oc = OracleCurve(q=toy.q, a=toy.a, b=toy.b, r=toy.r, gx=toy.gx, gy=toy.gy)
    Wp, K, T = 2, 128, 8
    pts = [oc.mul(oc.g, int(rng.integers(1, toy.r))) for _ in range(Wp * K)]
    px = jnp.asarray(
        ints_to_limbs([FQ.to_mont_int(p[0]) for p in pts], L)
    ).reshape(L, Wp, K)
    py = jnp.asarray(
        ints_to_limbs([FQ.to_mont_int(p[1]) for p in pts], L)
    ).reshape(L, Wp, K)
    pz = jnp.broadcast_to(
        jnp.asarray(ints_to_limbs([FQ.to_mont_int(1)], L)), (L, Wp * K)
    ).reshape(L, Wp, K)
    # sorted segment ids with runs of length <= T
    segs = []
    for _ in range(Wp):
        row, s = [], 0
        while len(row) < K:
            run = int(rng.integers(1, T + 1))
            row.extend([s] * min(run, K - len(row)))
            s += 1
        segs.append(row)
    seg = jnp.asarray(np.array(segs, np.int32))
    rounds = (T - 1).bit_length()

    with pltpu.force_tpu_interpret_mode():
        want = pl_sorted._segscan(toy, px, py, pz, seg, rounds)
    got = pl_sorted._segscan_xla(toy, px, py, pz, seg, rounds)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_pl_reduce_lane_and_finish(rng):
    """pl_reduce.lane_reduce ≡ the jnp lane tree, and pl_reduce.finish ≡
    bucket_reduce + window_fold, as group elements (toy, interpret mode)."""
    from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve
    from zprize_wasm_msm_tpu.ops.msm import pl_reduce

    oc = OracleCurve(q=toy.q, a=toy.a, b=toy.b, r=toy.r, gx=toy.gx, gy=toy.gy)
    n, c, T = 48, 4, 4
    pts = [oc.mul(oc.g, int(rng.integers(1, toy.r))) for _ in range(n)]
    ks = [int(rng.integers(0, toy.r)) for _ in range(n)]
    xs = [FQ.to_mont_int(p[0]) for p in pts]
    ys = [FQ.to_mont_int(p[1]) for p in pts]
    X = jnp.asarray(ints_to_limbs(xs, L))
    Y = jnp.asarray(ints_to_limbs(ys, L))
    sc = ints_to_limbs(ks, toy.fr.n_limbs)
    digits = windows.signed_window_digits(sc, c, 16)

    with pltpu.force_tpu_interpret_mode():
        raw = pl_bucket.bucket_accumulate(
            toy, (X, Y), digits, lanes=T, c=c, raw=True
        )
        got_b = pl_reduce.lane_reduce(toy, raw)  # (L, W, B)
        got_pt = pl_reduce.finish(toy, got_b, c)
    tr = tuple(jnp.transpose(r, (1, 2, 3, 0)) for r in raw)
    ref_b = pippenger._lane_tree_reduce(toy, tr)
    # bucket sums must match exactly (same addition order per bucket? no —
    # compare as group elements per (w, b))
    gb = group.to_affine(toy, got_b)
    rb = group.to_affine(toy, ref_b)
    for g, r in zip(gb, rb):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
    # finish == bucket_reduce + window_fold as a group element
    ref_pt = pippenger.window_fold(
        toy, pippenger.bucket_reduce(toy, ref_b), c
    )
    ga = group.to_affine(toy, tuple(x[:, None] for x in got_pt))
    ra = group.to_affine(toy, tuple(x[:, None] for x in ref_pt))
    for g, r in zip(ga, ra):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_pl_bucket_g2_matches_xla_path(rng):
    """The (field-generic) VMEM-bucket sweep over Fq2: msm(impl='pallas')
    on toy G2 ≡ the jnp engine and the host oracle (the reference's
    optimized engine is G1-hardcoded, build_multiexp_opt.js:27-30 — here
    even the small-c kernel engine runs G2)."""
    from zprize_wasm_msm_tpu.models.curves import toy_g2
    from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve, F2

    F = toy_g2.field
    oc = OracleCurve(
        q=toy_g2.q, a=toy_g2.a, b=toy_g2.b, r=toy_g2.r,
        gx=toy_g2.gx, gy=toy_g2.gy, field=F2(toy_g2.q, toy_g2.nr),
    )
    n = 24
    pts = [oc.mul(oc.g, int(rng.integers(1, toy_g2.r))) for _ in range(n)]
    ks = [int(rng.integers(0, toy_g2.r)) for _ in range(n)]
    ks[0] = 0
    X = jnp.stack([F.const(p[0]) for p in pts], axis=1)
    Y = jnp.stack([F.const(p[1]) for p in pts], axis=1)
    sc = ints_to_limbs(ks, toy_g2.fr.n_limbs)
    with pltpu.force_tpu_interpret_mode():
        got = pippenger.msm(
            toy_g2, (X, Y), sc, c=4, max_bits=32, lanes=8, impl="pallas"
        )
    ref = pippenger.msm(
        toy_g2, (X, Y), sc, c=4, max_bits=32, lanes=8, impl="xla"
    )
    ga = group.to_affine(toy_g2, tuple(v[:, None] for v in got))
    ra = group.to_affine(toy_g2, tuple(v[:, None] for v in ref))
    for g, r in zip(ga, ra):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
    want = oc.msm(pts, ks)
    assert (F.to_host(ga[0])[0], F.to_host(ga[1])[0]) == want


def test_pl_bucket_packed_matches_unpacked(rng):
    """packed=True (u16-packed VMEM bucket state, the c=7 / B=64 regime)
    must be bit-identical to the unpacked kernel: same addition order,
    only the state representation differs."""
    n, c, T = 32, 7, 4  # B = 64: the packed target regime
    from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve

    oc = OracleCurve(q=toy.q, a=toy.a, b=toy.b, r=toy.r, gx=toy.gx, gy=toy.gy)
    pts = [oc.mul(oc.g, int(rng.integers(1, toy.r))) for _ in range(n)]
    ks = [int(rng.integers(0, toy.r)) for _ in range(n)]
    ks[1] = 0
    xs = [FQ.to_mont_int(p[0]) for p in pts]
    ys = [FQ.to_mont_int(p[1]) for p in pts]
    X = jnp.asarray(ints_to_limbs(xs, L))
    Y = jnp.asarray(ints_to_limbs(ys, L))
    digits = windows.signed_window_digits(ints_to_limbs(ks, toy.fr.n_limbs), c, 16)

    with pltpu.force_tpu_interpret_mode():
        got = pl_bucket.bucket_accumulate(
            toy, (X, Y), digits, lanes=T, c=c, reduce_lanes=True, packed=True
        )
        ref = pl_bucket.bucket_accumulate(
            toy, (X, Y), digits, lanes=T, c=c, reduce_lanes=True, packed=False
        )
    for g, r in zip(got, ref):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_finish_large_matches_jnp_reduction(rng):
    """pl_reduce.finish_large (wide collapse + B=1 window fold) ≡
    bucket_reduce + window_fold as a group element (toy, interpret)."""
    from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve
    from zprize_wasm_msm_tpu.ops.msm import pl_reduce

    oc = OracleCurve(q=toy.q, a=toy.a, b=toy.b, r=toy.r, gx=toy.gx, gy=toy.gy)
    n, c, T = 48, 4, 4
    pts = [oc.mul(oc.g, int(rng.integers(1, toy.r))) for _ in range(n)]
    ks = [int(rng.integers(0, toy.r)) for _ in range(n)]
    xs = [FQ.to_mont_int(p[0]) for p in pts]
    ys = [FQ.to_mont_int(p[1]) for p in pts]
    X = jnp.asarray(ints_to_limbs(xs, L))
    Y = jnp.asarray(ints_to_limbs(ys, L))
    digits = windows.signed_window_digits(ints_to_limbs(ks, toy.fr.n_limbs), c, 16)

    with pltpu.force_tpu_interpret_mode():
        buckets = pl_bucket.bucket_accumulate(
            toy, (X, Y), digits, lanes=T, c=c, reduce_lanes=True
        )
        got_pt = pl_reduce.finish_large(toy, buckets, c)
    ref_pt = pippenger.window_fold(
        toy, pippenger.bucket_reduce(toy, buckets), c
    )
    ga = group.to_affine(toy, tuple(x[:, None] for x in got_pt))
    ra = group.to_affine(toy, tuple(x[:, None] for x in ref_pt))
    for g, r in zip(ga, ra):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_msm_c7_full_scalar_matches_oracle(rng):
    """End-to-end msm at c=7 (the non-GLV full-scalar headline config:
    packed buckets + finish_large routing at full width; at toy width it
    exercises the same code paths' correctness) ≡ host oracle."""
    from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve
    from tests.test_msm import result_to_affine

    oc = OracleCurve(q=toy.q, a=toy.a, b=toy.b, r=toy.r, gx=toy.gx, gy=toy.gy)
    n = 40
    pts = [oc.mul(oc.g, int(rng.integers(1, toy.r))) for _ in range(n)]
    ks = [int(rng.integers(0, toy.r)) for _ in range(n)]
    xs = [FQ.to_mont_int(p[0]) for p in pts]
    ys = [FQ.to_mont_int(p[1]) for p in pts]
    X = jnp.asarray(ints_to_limbs(xs, L))
    Y = jnp.asarray(ints_to_limbs(ys, L))
    sc = ints_to_limbs(ks, toy.fr.n_limbs)
    with pltpu.force_tpu_interpret_mode():
        got = pippenger.msm(
            toy, (X, Y), sc, c=7, max_bits=16, lanes=8, impl="pallas"
        )
    assert result_to_affine(toy, got) == oc.msm(pts, ks)


def test_msm_c7_packed_finish_large_route(rng):
    """End-to-end msm through the EXACT headline route: packed=True
    bucket sweep (forced via lanes=1024: unpacked state would exceed the
    14 MB VMEM budget, packed fits) composed with finish_large (W > 1024/B
    via max_bits=128 digit windows, mostly-zero top windows).  Pins the
    packed-sweep -> finish_large layout composition the full-width bench
    runs on hardware."""
    from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve
    from tests.test_msm import result_to_affine

    oc = OracleCurve(q=toy.q, a=toy.a, b=toy.b, r=toy.r, gx=toy.gx, gy=toy.gy)
    n = 24
    pts = [oc.mul(oc.g, int(rng.integers(1, toy.r))) for _ in range(n)]
    ks = [int(rng.integers(0, toy.r)) for _ in range(n)]
    ks[0] = 0
    xs = [FQ.to_mont_int(p[0]) for p in pts]
    ys = [FQ.to_mont_int(p[1]) for p in pts]
    X = jnp.asarray(ints_to_limbs(xs, L))
    Y = jnp.asarray(ints_to_limbs(ys, L))
    sc = ints_to_limbs(ks, toy.fr.n_limbs)
    # route assertions: W = 19+1 > 1024//64 -> finish_large; lanes=1024
    # trips the packed threshold
    from zprize_wasm_msm_tpu.ops.msm import pl_bucket

    W = windows.num_windows(128, 7)
    assert W > 1024 // 64
    assert pl_bucket.vmem_bytes(toy, 8, 1024, 7) > 14 << 20
    assert pl_bucket.vmem_bytes(toy, 8, 1024, 7, packed=True) <= 14 << 20
    with pltpu.force_tpu_interpret_mode():
        got = pippenger.msm(
            toy, (X, Y), sc, c=7, max_bits=128, lanes=1024, impl="pallas"
        )
    assert result_to_affine(toy, got) == oc.msm(pts, ks)
