"""Checkpointing: one orbax pytree per save, auto-resume from the newest.

TPU-native counterpart of reference src/engine/trainer.py:178-217 /
src/pipelines/base_pipeline.py:260-275: the checkpoint holds
{params (model + camera pose deltas), optimizer state, step}; schedules are
pure functions of step so every anneal re-syncs on resume for free.
"""

from __future__ import annotations

import os
import re
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from multimodalstudio_tpu.engine.train import TrainState

_CKPT_RE = re.compile(r"step-(\d+)")


def _checkpointer() -> ocp.Checkpointer:
    return ocp.Checkpointer(ocp.PyTreeCheckpointHandler())


def save_checkpoint(
    ckpt_dir: str, state: TrainState, keep_only_latest: bool = True
) -> str:
    """Write step-%09d; optionally prune older checkpoints
    (reference trainer.py:178-196)."""
    step = int(state.step)
    os.makedirs(ckpt_dir, exist_ok=True)
    path = os.path.join(ckpt_dir, f"step-{step:09d}")
    _checkpointer().save(
        os.path.abspath(path),
        {"params": state.params, "opt_state": state.opt_state, "step": np.asarray(step)},
        force=True,
    )
    # prune on the primary process only (multihost: every process calls
    # save — orbax coordinates the write — but fs mutation is rank 0's)
    if keep_only_latest and jax.process_index() == 0:
        for name in os.listdir(ckpt_dir):
            m = _CKPT_RE.fullmatch(name)
            if m and int(m.group(1)) != step:
                import shutil

                shutil.rmtree(os.path.join(ckpt_dir, name), ignore_errors=True)
    return path


def latest_checkpoint_step(ckpt_dir: str) -> Optional[int]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [
        int(m.group(1))
        for name in os.listdir(ckpt_dir)
        if (m := _CKPT_RE.fullmatch(name))
    ]
    return max(steps) if steps else None


def load_checkpoint(
    ckpt_dir: str, state: TrainState, step: Optional[int] = None
) -> Tuple[TrainState, int]:
    """Restore the newest (or given) step into an abstract-state template
    (reference trainer.py:198-217). Returns (state, next_step)."""
    step = step if step is not None else latest_checkpoint_step(ckpt_dir)
    if step is None:
        return state, 0
    path = os.path.abspath(os.path.join(ckpt_dir, f"step-{step:09d}"))
    template = {
        "params": state.params,
        "opt_state": state.opt_state,
        "step": np.asarray(int(state.step)),
    }
    # explicit per-leaf restore args (sharding/dtype from the template):
    # without them, checkpoints written on one platform (TPU run) cannot be
    # restored on another (CPU eval of a TPU-trained scene) — orbax demands
    # a concrete sharding for leaves saved as device arrays
    restore_args = ocp.checkpoint_utils.construct_restore_args(template)
    restored = _checkpointer().restore(
        path, item=template, restore_args=restore_args
    )
    new_state = TrainState(
        params=restored["params"],
        opt_state=restored["opt_state"],
        step=jax.numpy.asarray(int(restored["step"])),
    )
    return new_state, int(restored["step"]) + 1
