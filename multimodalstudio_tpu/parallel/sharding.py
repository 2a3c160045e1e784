"""Device mesh and sharding helpers.

TPU-native replacement for the reference's Lightning-Fabric DDP/NCCL stack
(reference src/engine/trainer.py:57-63, src/utils/comms.py): a 1-D `data`
mesh over ICI; ray batches shard along the ray axis, parameters replicate,
and XLA inserts the gradient all-reduce automatically when the jitted step
consumes sharded batches with replicated params.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int = 0) -> Mesh:
    """1-D data-parallel mesh over the first n (or all) devices."""
    devices = jax.devices()
    if n_devices and n_devices < len(devices):
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place every leaf of a batch pytree sharded along its leading axis."""
    sharding = batch_sharding(mesh)

    def place(x):
        return jax.device_put(x, sharding)

    return jax.tree.map(place, batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
