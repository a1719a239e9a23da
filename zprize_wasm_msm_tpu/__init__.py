"""zprize_wasm_msm_tpu — a TPU-native multi-scalar-multiplication framework.

Brand-new JAX/XLA implementation with the capabilities of the reference
ZPrize WASM MSM library (Manta-Network/zprize-wasm-msm: wasmcurves with the
optimized BLS12-381 G1 Pippenger engine), re-designed for TPUs:

  * 16-bit-limb Montgomery field kernels vectorized over VPU lanes
    (ops.field) instead of handwritten WASM i64 arithmetic;
  * branch-free complete projective curve ops (ops.curve) instead of
    exception-laden Jacobian formulas;
  * a shape-static Pippenger pipeline (ops.msm) instead of pointer-machine
    schedules/bucket sorts;
  * GLV decomposition via vectorized Barrett division (ops.msm.glv);
  * mesh-sharded multi-chip MSM with collective reduction (parallel) —
    the distributed axis the single-threaded reference lacks.

Public API mirrors the reference's index.js:26-29 exports.
"""

from .models import curves as _curves
from .models.context import CurveContext, build_curve


def build_bls12381() -> CurveContext:
    """Analog of the reference's buildBls12381 (index.js:27)."""
    return build_curve(_curves.bls12_381)


def build_bls12377() -> CurveContext:
    """The ZPrize curve (not in the reference; BASELINE.json config 3)."""
    return build_curve(_curves.bls12_377)


def build_bn128() -> CurveContext:
    """Analog of the reference's buildBn128 (index.js:26); BN254."""
    return build_curve(_curves.bn254)


build_bn254 = build_bn128


def build_mnt6753() -> CurveContext:
    """Analog of the reference's buildMnt6753 (index.js:24, shipped but
    commented out of the public surface there; fully wired here)."""
    return build_curve(_curves.mnt6753)


def build_f1m(q: int):
    """Analog of the reference's buildF1m (index.js:28): a standalone
    Montgomery field spec usable with ops.field.mont."""
    from .ops.field.spec import field_spec

    return field_spec(q)


__all__ = [
    "CurveContext",
    "build_curve",
    "build_bls12381",
    "build_bls12377",
    "build_bn128",
    "build_bn254",
    "build_mnt6753",
    "build_f1m",
]
