"""Device mesh + sharding helpers — the framework's parallelism substrate.

The reference has no distributed backend at all (SURVEY.md §2.9: everything
on cuda:0); the TPU-native design is single-program data parallelism over an
ICI mesh: batches are sharded on a 'data' axis, parameters/optimizer state
replicated, XLA inserts the psum for the gradient all-reduce. Mining shards
*sequences* across hosts (they are independent), training shards the batch.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1D data-parallel mesh over the first num_devices devices."""
    devs = jax.devices()
    if num_devices is not None:
        devs = devs[:num_devices]
    return Mesh(np.asarray(devs), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Device-put a host batch pytree with batch-dim sharding. Leading dim of
    every leaf must be divisible by the mesh size."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
