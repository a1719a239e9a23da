"""Groth16 verifier: the end-to-end SNARK application of the framework.

The reference is the WASM engine underneath snarkjs' Groth16 pipeline
(wasmcurves feeds ffjavascript/snarkjs; its QAP builder build_qap.js,
applyKey build_applykey.js, MSM and pairingEq exports build_bls12381.js:
1592-1597 exist exactly to serve this protocol).  This module composes
the TPU-native layers the same way a snarkjs verifier composes the WASM
exports: one MSM for the public-input linear combination + one 4-pair
product-of-pairings check.

    e(A, B) = e(alpha, beta) * e(vk_x, gamma) * e(C, delta)
    vk_x    = IC_0 + sum_i publics_i * IC_{i+1}

checked as  e(-A, B) * e(alpha, beta) * e(vk_x, gamma) * e(C, delta) == 1
(the reference's pairingEq4 shape, build_bls12381.js pairingEq:1560-1590).

Works on any curve family with a pairing wired on CurveContext
(BLS12-381, BN254, MNT6753).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp

from ..ops.curve import group
from .context import CurveContext


@dataclass
class VerifyingKey:
    """Affine host-side points (ints / tuples for extension coords)."""

    alpha1: Tuple  # G1
    beta2: Tuple  # G2
    gamma2: Tuple  # G2
    delta2: Tuple  # G2
    ic: List[Tuple]  # G1, length n_publics + 1


@dataclass
class Proof:
    a: Tuple  # G1
    b: Tuple  # G2
    c: Tuple  # G1


def verify(
    ctx_g1: CurveContext,
    ctx_g2: CurveContext,
    vk: VerifyingKey,
    proof: Proof,
    publics: Sequence[int],
) -> bool:
    """Groth16 verification on device.

    ctx_g1/ctx_g2: the curve pair (e.g. build_curve(bls12_381) and
    build_curve(bls12_381_g2)).  Returns a python bool.
    """
    assert len(vk.ic) == len(publics) + 1, "IC length != n_publics + 1"
    spec = ctx_g1.spec

    # vk_x = IC_0 + sum_i publics_i * IC_{i+1}  — the MSM stage
    if publics:
        P = ctx_g1.points_to_device(vk.ic[1:])
        s = ctx_g1.scalars_to_device([int(p) % spec.r for p in publics])
        acc = ctx_g1.msm(P, s)
        ic0 = group.from_affine(spec, ctx_g1.points_to_device([vk.ic[0]]))
        vkx_p = group.add(
            spec, tuple(c[:, None] if c.ndim == 1 else c for c in acc), ic0
        )
    else:
        vkx_p = group.from_affine(spec, ctx_g1.points_to_device([vk.ic[0]]))
    vk_x = ctx_g1.result_to_affine(vkx_p)
    if vk_x is None:
        vk_x = (0, 0)  # affine identity encoding

    # -A: negate host-side (tiny); G1 is a base-field curve in every wired
    # family (bls12_381, bn254, mnt6753)
    ax, ay = proof.a
    assert not isinstance(ay, tuple), "G1 proof point must be base-field"
    neg_a = (ax, (-ay) % spec.q)

    Ps = ctx_g1.points_to_device([neg_a, vk.alpha1, vk_x, proof.c])
    Qs = ctx_g2.points_to_device([proof.b, vk.beta2, vk.gamma2, vk.delta2])
    ok = ctx_g1.pairing_eq(Ps, Qs)
    return bool(jnp.asarray(ok))
