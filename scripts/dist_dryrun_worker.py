"""One process of the multi-host CPU dryrun (launched by dist_dryrun.py).

Joins a 2-process gloo group (4 virtual CPU devices each), then runs the
REAL Trainer — fused device-cache loop, GSPMD data-parallel over the
global 8-device mesh — for a few steps of the tiny synthetic scene.
Prints `FINAL_LOSS <value>` so the driver can assert both processes
computed the identical replicated loss (the DCN gradient all-reduce
actually happened)."""

import os
import sys

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodalstudio_tpu.parallel.sharding import initialize_distributed

assert initialize_distributed(), "MMS_COORDINATOR env not set"
assert jax.process_count() == 2
assert len(jax.devices()) == 8

import dataclasses

from tests.test_integration import tiny_config
from multimodalstudio_tpu.data.synthetic import make_synthetic_dataset
from multimodalstudio_tpu.engine.trainer import Trainer

cfg = tiny_config(n_rays=64, iters=4)
cfg = dataclasses.replace(
    cfg,
    steps_per_save=0,
    steps_per_eval_batch=2,
    steps_per_eval_image=0,
    steps_per_eval_all_images=0,
    logging=dataclasses.replace(cfg.logging, steps_per_log=2, local_writer=True),
)
ds = make_synthetic_dataset(cfg.modalities, num_views=3, height=24, width=24, raw=True)
eval_ds = make_synthetic_dataset(
    cfg.modalities, num_views=1, height=24, width=24, raw=True
)

out_dir = os.environ.get("MMS_DRYRUN_OUT") or None
trainer = Trainer(cfg, ds, eval_ds, out_dir)
trainer.setup()
assert (trainer.mesh is not None) and trainer.mesh.devices.size == 8
trainer.train()

state, aux = trainer.fused_train(trainer.state, trainer.rng)
loss = float(aux["losses"]["total_loss"])
assert loss == loss, "NaN loss"
print(f"FINAL_LOSS {loss:.9g}", flush=True)
print(f"proc {jax.process_index()} done step={int(state.step)}", flush=True)

# on this 1-core host the two processes drift minutes apart (serialized
# compiles); sync before exit so the fast one doesn't trip the 1-minute
# coordination-service shutdown barrier while the slow one still computes
from jax.experimental import multihost_utils

multihost_utils.sync_global_devices("dryrun_done")
