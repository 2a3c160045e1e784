"""Device mesh and sharding helpers.

TPU-native replacement for the reference's Lightning-Fabric DDP/NCCL stack
(reference src/engine/trainer.py:57-63, src/utils/comms.py): a 1-D `data`
mesh over ICI; ray batches shard along the ray axis, parameters replicate,
and XLA inserts the gradient all-reduce automatically when the jitted step
consumes sharded batches with replicated params.

Multi-host (DCN): `initialize_distributed()` wires `jax.distributed` from
MMS_COORDINATOR / MMS_NUM_PROCESSES / MMS_PROCESS_ID (the reference's
multi-node Fabric launch config, trainer.py:57-63, generalizes by env the
same way). After it, `jax.devices()` is GLOBAL: the same 1-D data mesh
spans all hosts, gradient all-reduce rides ICI within a host and DCN
across hosts, and each host feeds only its addressable shard of every
global array (`host_local_to_global`) — per-host data placement, no
dataset bytes over DCN. Host work (checkpoints, eval renders, logging) is
gated to process 0 via `is_main_process()`.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed() -> bool:
    """Initialize jax.distributed from MMS_* env vars; True if multiprocess.

    Must run before any JAX computation. Env contract (one process per
    host, mirroring `torchrun`-style launchers):
      MMS_COORDINATOR   host:port of process 0 (required to enable)
      MMS_NUM_PROCESSES total process count
      MMS_PROCESS_ID    this process's rank
    """
    coord = os.environ.get("MMS_COORDINATOR")
    if not coord:
        return False
    jax.distributed.initialize(
        coordinator_address=coord,
        num_processes=int(os.environ["MMS_NUM_PROCESSES"]),
        process_id=int(os.environ["MMS_PROCESS_ID"]),
    )
    return jax.process_count() > 1


def is_main_process() -> bool:
    return jax.process_index() == 0


def make_mesh(n_devices: int = 0) -> Mesh:
    """1-D data-parallel mesh over the first n (or all) GLOBAL devices."""
    devices = jax.devices()
    if n_devices and n_devices < len(devices):
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), axis_names=("data",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _multiprocess(mesh: Mesh) -> bool:
    return jax.process_count() > 1


def _place(x, sharding: NamedSharding, mesh: Mesh):
    """device_put on a single host; per-host local-shard assembly on many.

    In multiprocess mode each host only owns its addressable slice of a
    global array, so placement goes through
    `jax.make_array_from_process_local_data`: replicated leaves are fed
    whole from every host's local copy (no DCN transfer of the data), and
    batch-sharded leaves are fed the host's local rows.
    """
    if not _multiprocess(mesh):
        return jax.device_put(x, sharding)
    x = np.asarray(x)
    if sharding.spec == P():
        return jax.make_array_from_process_local_data(sharding, x, x.shape)
    # leading-axis sharding: every host holds the full batch host-side and
    # contributes its contiguous slice (hosts are laid out in mesh order)
    n = x.shape[0]
    pc = jax.process_count()
    pi = jax.process_index()
    local = x[pi * n // pc : (pi + 1) * n // pc]
    return jax.make_array_from_process_local_data(sharding, local, x.shape)


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place every leaf of a batch pytree sharded along its leading axis."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: _place(x, sharding, mesh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: _place(x, sharding, mesh), tree)


def to_host(tree: Any) -> Any:
    """Fetch a (fully-replicated) global pytree to host numpy.

    Legal on every process for replicated arrays; used to hand the live
    train state to process-local consumers (evaluator renders, orbax
    checkpoint save on process 0)."""
    return jax.tree.map(lambda x: np.asarray(jax.device_get(x)), tree)
