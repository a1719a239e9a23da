"""Host <-> device conversion of bigint batches to limb-vector arrays.

The TPU analog of the protoboard's pb.set/pb.get marshalling
(wasmbuilder protoboard; see reference test/batchAffine.js:33-41), which
moves BigInts in/out of WASM linear memory.  Here batches of python ints
become (L, N) uint32 arrays of 16-bit little-endian limbs.
"""

from __future__ import annotations

from typing import Iterable, List, Sequence

import numpy as np

from .bigint import int_to_limbs, limbs_to_int


def ints_to_limbs(values: Sequence[int], n_limbs: int) -> np.ndarray:
    """(N,) python ints -> (L, N) uint32 limb array."""
    out = np.empty((n_limbs, len(values)), dtype=np.uint32)
    for j, v in enumerate(values):
        out[:, j] = int_to_limbs(v, n_limbs)
    return out


def limbs_to_ints(arr) -> List[int]:
    """(L, N) limb array -> list of N python ints."""
    a = np.asarray(arr)
    if a.ndim == 1:
        return [limbs_to_int(a)]
    flat = a.reshape(a.shape[0], -1)
    return [limbs_to_int(flat[:, j]) for j in range(flat.shape[1])]


def int_to_limbvec(value: int, n_limbs: int) -> np.ndarray:
    """single int -> (L,) uint32 limb vector."""
    return int_to_limbs(value, n_limbs)
