"""Groth16 verifier end-to-end check on the active backend.

Same instance construction as tests/test_groth16.py (synthesized from
random exponents so the pairing identity holds by construction), run as
a standalone script because the XLA:CPU compile of the full-width
pairing + MSM composition OOMs the 125 GB test box — the TPU backend
compiles it server-side.  Prints ONE JSON line.
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tests.test_groth16 import make_instance
    from zprize_wasm_msm_tpu.models.context import build_curve
    from zprize_wasm_msm_tpu.models.curves import bls12_381, bls12_381_g2
    from zprize_wasm_msm_tpu.models.groth16 import Proof, verify

    rng = np.random.default_rng(0xBEEF)
    ctx1 = build_curve(bls12_381)
    ctx2 = build_curve(bls12_381_g2)
    vk, proof, publics, oc1, cexp = make_instance(rng)
    ok_valid = verify(ctx1, ctx2, vk, proof, publics)
    bad = Proof(a=proof.a, b=proof.b, c=oc1.mul(oc1.g, cexp + 1))
    ok_bad = verify(ctx1, ctx2, vk, bad, publics)
    ok_badpub = verify(ctx1, ctx2, vk, proof, [publics[0] + 1] + publics[1:])
    out = {
        "groth16_valid_accepts": bool(ok_valid),
        "groth16_corrupt_proof_rejects": not ok_bad,
        "groth16_corrupt_public_rejects": not ok_badpub,
        "pass": bool(ok_valid) and not ok_bad and not ok_badpub,
    }
    print(json.dumps(out))
    sys.exit(0 if out["pass"] else 1)


if __name__ == "__main__":
    main()
