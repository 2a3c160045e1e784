"""2-process CPU probe for the multi-host path (VERDICT r3 #8).

Each process runs this file with MMS_DIST_PROC_ID in {0, 1}; both build a
global 2x4-virtual-device mesh and run one psum across DCN (here: local
gloo). Verifies jax.distributed.initialize + global-mesh jit on this
image's JAX before wiring it into the Trainer.
"""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")

proc = int(os.environ["MMS_DIST_PROC_ID"])
jax.distributed.initialize(
    coordinator_address="127.0.0.1:9731",
    num_processes=2,
    process_id=proc,
)

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8, len(jax.devices())

mesh = Mesh(np.asarray(jax.devices()), ("data",))
sh = NamedSharding(mesh, P("data"))

# per-process local data -> global sharded array
local = np.arange(4, dtype=np.float32) + 10.0 * proc
glob = jax.make_array_from_process_local_data(sh, local, (8,))


@jax.jit
def f(x):
    return jnp.sum(x) * jnp.ones((), jnp.float32)


out = f(glob)  # cross-process reduction over DCN
val = float(out)
expected = float(np.sum(np.arange(4) + 0.0) + np.sum(np.arange(4) + 10.0))
assert abs(val - expected) < 1e-5, (val, expected)
print(f"proc {proc}: global sum = {val} OK", flush=True)
