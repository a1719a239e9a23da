"""Device-mesh helpers for sharded MSM.

The reference is single-threaded WASM (SURVEY.md §2.7: no workers, no
collectives); this module introduces the distributed axis TPU-natively:
a 1-D (or (hosts, chips)) jax.sharding.Mesh over which the point/scalar
batch is sharded, with per-shard window sums reduced by collectives over
ICI/DCN.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

POINTS_AXIS = "pts"


def make_mesh(n_devices: Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over the point axis; uses all visible devices by default."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (POINTS_AXIS,))


def shard_points(mesh: Mesh, X, Y, scalars):
    """Place (L, N) point/scalar batches with N sharded over the mesh."""
    sh = NamedSharding(mesh, P(None, POINTS_AXIS))
    return (
        jax.device_put(X, sh),
        jax.device_put(Y, sh),
        jax.device_put(scalars, sh),
    )
