"""Groth16 verifier end-to-end: MSM + product-of-pairings on device.

The instance is synthesized host-side from random exponents so the
pairing identity holds by construction iff the verifier computes
   e(-A,B) e(alpha,beta) e(vk_x,gamma) e(C,delta)
correctly: with A = a*G1, B = b*G2, vk_x = k*G1 (via the IC MSM) and
C = (ab - alpha*beta - k*gamma) * delta^{-1} * G1 the product is exactly
1.  A corrupted proof must fail.

Two tiers:
  * smoke: the toy-BN family (15-bit, seconds of compile) — the full
    verifier composition (MSM + 4-pair product + pairing stack) in CI;
  * full width: BLS12-381 — the XLA:CPU compile of that graph OOMs the
    125 GB test box, so it is skipped here and witnessed on the TPU
    backend by tools/check_groth16.py (which imports make_instance).
"""

import numpy as np
import pytest

from zprize_wasm_msm_tpu.models.context import build_curve
from zprize_wasm_msm_tpu.models.curves import (
    bls12_381,
    bls12_381_g2,
    toy_bn,
    toy_bn_g2,
)
from zprize_wasm_msm_tpu.models.groth16 import Proof, VerifyingKey, verify
from zprize_wasm_msm_tpu.oracle import Curve as OracleCurve, F2


def make_instance(rng, n_publics=2, g1c=bls12_381, g2c=bls12_381_g2):
    r = g1c.r
    oc1 = OracleCurve(q=g1c.q, a=0, b=g1c.b, r=r, gx=g1c.gx, gy=g1c.gy)
    oc2 = OracleCurve(
        q=g2c.q, a=0, b=g2c.b, r=r, gx=g2c.gx, gy=g2c.gy,
        field=F2(g2c.q, g2c.nr),
    )
    rnd = lambda: int.from_bytes(rng.bytes(31), "little") % r
    alpha, beta, gamma, delta, a, b = (rnd() for _ in range(6))
    publics = [rnd() for _ in range(n_publics)]
    ics = [rnd() for _ in range(n_publics + 1)]
    k = (ics[0] + sum(p * i for p, i in zip(publics, ics[1:]))) % r
    c = (a * b - alpha * beta - k * gamma) % r * pow(delta, -1, r) % r

    vk = VerifyingKey(
        alpha1=oc1.mul(oc1.g, alpha),
        beta2=oc2.mul(oc2.g, beta),
        gamma2=oc2.mul(oc2.g, gamma),
        delta2=oc2.mul(oc2.g, delta),
        ic=[oc1.mul(oc1.g, i) for i in ics],
    )
    proof = Proof(a=oc1.mul(oc1.g, a), b=oc2.mul(oc2.g, b), c=oc1.mul(oc1.g, c))
    return vk, proof, publics, oc1, c


@pytest.mark.smoke
def test_groth16_verify_toy_bn(rng):
    """The complete verifier (IC MSM + vk_x fold + pairingEq4) over the
    toy BN family — valid accepts, corrupted proof / public rejects."""
    ctx1 = build_curve(toy_bn)
    ctx2 = build_curve(toy_bn_g2)
    vk, proof, publics, oc1, c = make_instance(
        rng, g1c=toy_bn, g2c=toy_bn_g2
    )
    assert verify(ctx1, ctx2, vk, proof, publics) is True

    bad = Proof(a=proof.a, b=proof.b, c=oc1.mul(oc1.g, c + 1))
    assert verify(ctx1, ctx2, vk, bad, publics) is False

    assert verify(ctx1, ctx2, vk, proof, [publics[0] + 1] + publics[1:]) is False


@pytest.mark.slow
@pytest.mark.skip(
    reason="XLA:CPU compile OOMs (>122 GB); run tools/check_groth16.py "
    "on the TPU backend instead"
)
def test_groth16_verify_bls12_381(rng):
    ctx1 = build_curve(bls12_381)
    ctx2 = build_curve(bls12_381_g2)
    vk, proof, publics, oc1, c = make_instance(rng)
    assert verify(ctx1, ctx2, vk, proof, publics) is True

    # corrupt C -> must fail
    bad = Proof(a=proof.a, b=proof.b, c=oc1.mul(oc1.g, c + 1))
    assert verify(ctx1, ctx2, vk, bad, publics) is False

    # corrupt a public input -> must fail
    assert verify(ctx1, ctx2, vk, proof, [publics[0] + 1] + publics[1:]) is False
