"""Multi-chip MSM tests on the virtual 8-device CPU mesh.

The reference has no distributed axis (SURVEY.md §2.7); this is the
BASELINE north-star path.  conftest.py forces
--xla_force_host_platform_device_count=8, so these tests exercise the real
shard_map + all_gather collective reduction across 8 XLA devices — the
same program the driver's dryrun compiles and the TPU pod would run.
"""

import jax
import numpy as np
import pytest

from zprize_wasm_msm_tpu.models.curves import bls12_381, toy
from zprize_wasm_msm_tpu.ops.msm import glv as glv_mod
from zprize_wasm_msm_tpu.ops.msm import pippenger
from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve
from zprize_wasm_msm_tpu.parallel import mesh as mesh_mod
from zprize_wasm_msm_tpu.parallel.sharded_msm import msm_sharded
from zprize_wasm_msm_tpu.utils.limbs import ints_to_limbs

from tests.test_msm import affine_to_dev, oracle_of, result_to_affine


def test_eight_devices_available():
    assert len(jax.devices()) == 8, jax.devices()


def test_sharded_msm_toy_matches_oracle_and_single_device(rng):
    """msm_sharded over 8 devices ≡ single-device msm ≡ oracle (toy curve).

    A wrong collective reduction (e.g. summing only the local shard, or
    double-counting) cannot pass: every device holds different points.
    """
    oc = oracle_of(toy)
    mesh = mesh_mod.make_mesh(8)
    n = 8 * 16
    pts = [oc.mul(oc.g, int(rng.integers(1, toy.r))) for _ in range(n)]
    ks = [int(rng.integers(0, toy.r)) for _ in range(n)]
    ks[3] = 0  # zero scalar in shard 0
    X, Y = affine_to_dev(toy, pts)
    sc = ints_to_limbs(ks, toy.fr.n_limbs)
    Xs, Ys, scs = mesh_mod.shard_points(mesh, X, Y, sc)

    res = msm_sharded(toy, (Xs, Ys), scs, mesh, c=4, lanes=4)
    got = result_to_affine(toy, res)

    expected = oc.msm(pts, ks)
    assert got == expected

    single = pippenger.msm(toy, (X, Y), sc, c=4, max_bits=16, lanes=4)
    assert result_to_affine(toy, single) == expected


@pytest.mark.slow
def test_sharded_msm_bls12_381_glv(rng):
    """Full pipeline on BLS12-381 with GLV preprocessing inside shard_map."""
    oc = oracle_of(bls12_381)
    mesh = mesh_mod.make_mesh(8)
    n = 8 * 2
    pts = [oc.mul(oc.g, int(rng.integers(1, 1 << 60))) for _ in range(n)]
    ks = [int.from_bytes(rng.bytes(32), "little") % bls12_381.r for _ in range(n)]
    X, Y = affine_to_dev(bls12_381, pts)
    sc = ints_to_limbs(ks, bls12_381.fr.n_limbs)
    Xs, Ys, scs = mesh_mod.shard_points(mesh, X, Y, sc)

    res = msm_sharded(bls12_381, (Xs, Ys), scs, mesh, c=4, lanes=2)
    got = result_to_affine(bls12_381, res)
    assert got == oc.msm(pts, ks)
