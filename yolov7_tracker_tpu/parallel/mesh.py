"""Mesh construction + sharding helpers.

The reference scales with torch DDP over NCCL (train.py:277-280,596).
TPU-native equivalent: one jax.sharding.Mesh over the chip slice; the
data axis carries batch (training) or sequences (tracking); parameters
replicate; XLA inserts the gradient psum over ICI automatically from the
shardings — no process groups, no explicit all-reduce.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place a host batch pytree with the leading axis split over the mesh."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), tree)
