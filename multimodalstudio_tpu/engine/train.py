"""The training step: one jitted XLA program per step.

TPU-native counterpart of reference src/pipelines/base_pipeline.py:138-153 /
raw_pipeline.py:66-122 + src/engine/optimizers.py. Ray generation, NeuS
sampling, field evaluation, compositing, losses, gradient clipping and the
AdamW update all trace into a single `jax.jit` with donated state; the step
index is a traced scalar so schedules don't retrigger compilation.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from multimodalstudio_tpu.cameras.camera_optimizer import (
    CameraOptimizerSpec,
    camera_opt_transform,
    init_camera_poses,
)
from multimodalstudio_tpu.cameras.cameras import Cameras, generate_rays
from multimodalstudio_tpu.configs.config import TrainerConfig
from multimodalstudio_tpu.core.rays import RayBundle
from multimodalstudio_tpu.data.sampler import PixelBatch
from multimodalstudio_tpu.engine.losses import compute_losses
from multimodalstudio_tpu.engine.schedules import (
    active_level,
    cos_anneal_ratio,
    numerical_gradients_delta,
)
from multimodalstudio_tpu.models.model import MMSModel, ScheduleState
from multimodalstudio_tpu.ops.math import psnr


@struct.dataclass
class TrainState:
    params: Any  # {'model': ..., 'camera_poses': {mod: [K, 6]}}
    opt_state: Any
    step: jnp.ndarray


def _surface_grid(config: TrainerConfig):
    return config.model.surface.surface_field.field.grid


def make_schedules(config: TrainerConfig, step: jnp.ndarray) -> ScheduleState:
    grid = _surface_grid(config)
    return ScheduleState(
        cos_anneal_ratio=cos_anneal_ratio(
            step, config.max_num_iterations, config.model.surface.anneal_end_ratio
        ),
        active_level=active_level(step, config.max_num_iterations, grid),
        numerical_delta=numerical_gradients_delta(step, config.max_num_iterations, grid),
    )


def make_optimizer(config: TrainerConfig) -> optax.GradientTransformation:
    """Two AdamW groups (fields / camera_poses) with multistep-warmup LR
    schedules and global-norm clipping (reference base_pipeline.py:182-248,
    method_configs.py:260-269)."""

    def group_tx(spec) -> optax.GradientTransformation:
        if spec.scheduler is not None:
            sched = lambda count: spec.lr * spec.scheduler.factor(
                count, config.max_num_iterations
            )
        else:
            sched = spec.lr
        kind = spec.optimizer.lower()
        if kind == "adamw":
            return optax.adamw(
                sched, b1=spec.betas[0], b2=spec.betas[1], eps=spec.eps,
                weight_decay=spec.weight_decay,
            )
        if kind == "adam":
            return optax.adam(sched, b1=spec.betas[0], b2=spec.betas[1], eps=spec.eps)
        if kind == "radam":
            return optax.radam(sched, b1=spec.betas[0], b2=spec.betas[1], eps=spec.eps)
        raise ValueError(f"unknown optimizer {spec.optimizer}")

    fields_spec = config.optimizer_spec("fields")
    camera_spec = config.optimizer_spec("camera_poses")

    label_fn = lambda params: {
        "model": jax.tree.map(lambda _: "fields", params["model"]),
        "camera_poses": jax.tree.map(lambda _: "camera_poses", params["camera_poses"]),
    }
    return optax.chain(
        optax.clip_by_global_norm(fields_spec.max_norm),
        optax.multi_transform(
            {"fields": group_tx(fields_spec), "camera_poses": group_tx(camera_spec)}, label_fn
        ),
    )


def init_train_state(
    config: TrainerConfig,
    model: MMSModel,
    rng: jax.Array,
    num_cameras: Dict[str, int],
) -> TrainState:
    model_params = model.init(rng)
    camera_poses = init_camera_poses(
        config.datamanager.camera_optimizer, config.modalities, num_cameras
    )
    params = {"model": model_params, "camera_poses": camera_poses}
    tx = make_optimizer(config)
    return TrainState(params=params, opt_state=tx.init(params), step=jnp.asarray(0))


def stack_cameras(cameras: Dict[str, Cameras], modalities) -> Tuple[Cameras, Dict[str, int]]:
    """Concatenate per-modality camera tables into one, so ray generation for
    all modalities is a single program region. Returns (stacked, index
    offsets per modality). Requires a uniform camera type (MMS-DATA cameras
    are all PINHOLE/OPENCV)."""
    mods = list(modalities)
    types = {cameras[m].camera_type for m in mods}
    if len(types) > 1:
        raise ValueError("stacked ray generation requires a uniform camera type")
    any_dist = any(cameras[m].distortion_params is not None for m in mods)

    def dist(m):
        c = cameras[m]
        if c.distortion_params is not None:
            return c.distortion_params
        return jnp.zeros((c.num_cameras, 6))

    offsets = {}
    off = 0
    for m in mods:
        offsets[m] = off
        off += cameras[m].num_cameras
    stacked = Cameras(
        fx=jnp.concatenate([cameras[m].fx for m in mods]),
        fy=jnp.concatenate([cameras[m].fy for m in mods]),
        cx=jnp.concatenate([cameras[m].cx for m in mods]),
        cy=jnp.concatenate([cameras[m].cy for m in mods]),
        camera_to_worlds=jnp.concatenate([cameras[m].camera_to_worlds for m in mods]),
        distortion_params=jnp.concatenate([dist(m) for m in mods]) if any_dist else None,
        width=cameras[mods[0]].width,
        height=cameras[mods[0]].height,
        pixel_offset=cameras[mods[0]].pixel_offset,
        camera_type=cameras[mods[0]].camera_type,
    )
    return stacked, offsets


def build_rays(
    config: TrainerConfig,
    params: Any,
    cameras: Dict[str, Cameras],
    batch: Dict[str, PixelBatch],
) -> Tuple[RayBundle, Tuple[Tuple[str, int], ...]]:
    """Ray generation for all modalities as ONE generate_rays call on stacked
    camera tables (per-modality pose deltas still apply).

    Counterpart of reference src/model_components/ray_generators.py:43-81,
    inside jit (camera-optimizer exp maps included).

    Ray geometry (pose composition, exp maps, direction rotation) is pinned
    to f32 contract precision: the TPU flagships run the global matmul
    default at bf16 (configs/methods.py — the global-f32 program miscompiles
    on XLA:TPU, scripts/nan_jit_probe.py), and camera-sized matmuls are far
    too small to matter for speed but DO need f32 ray origins/directions.
    """
    with jax.default_matmul_precision("float32"):
        return _build_rays_f32(config, params, cameras, batch)


def _build_rays_f32(config, params, cameras, batch):
    stacked, offsets = stack_cameras(cameras, config.modalities)
    segments = tuple(
        (mod, batch[mod].pixel_coords.shape[0]) for mod in config.modalities
    )
    idx = jnp.concatenate(
        [batch[mod].camera_indices + offsets[mod] for mod in config.modalities]
    )
    coords = jnp.concatenate([batch[mod].pixel_coords for mod in config.modalities])

    opt_spec = config.datamanager.camera_optimizer
    opt = None
    if opt_spec.mode != "off" and params["camera_poses"]:
        opts = []
        for mod in config.modalities:
            o = camera_opt_transform(
                opt_spec, params["camera_poses"], mod, batch[mod].camera_indices
            )
            if o is None:
                n = batch[mod].camera_indices.shape[0]
                o = jnp.broadcast_to(jnp.eye(3, 4), (n, 3, 4))
            opts.append(o)
        opt = jnp.concatenate(opts)

    flat = generate_rays(stacked, idx, coords, opt)
    return flat, segments


def select_mosaick_channels(
    config: TrainerConfig, outputs: Dict[str, Any], batch: Dict[str, PixelBatch]
) -> Dict[str, Any]:
    """Raw pipeline: keep only the mosaick-dictated channel per pixel
    (reference raw_pipeline.py:112-122)."""
    if not config.datamanager.raw:
        return outputs
    out = dict(outputs)
    for mod in config.modalities:
        rendered = outputs[mod]  # [N, C]
        chan = batch[mod].mosaick_channel[:, None]
        out[mod] = jnp.take_along_axis(rendered, chan, axis=-1)
    return out


def _constrain_batch(batch, mesh):
    """Shard every batch leaf along its leading (ray) axis over the `data`
    mesh axis. Index computation stays replicated (cheap); the pixel gathers
    and everything downstream partition by ray, and XLA all-reduces the
    gradients — the TPU-native counterpart of the reference's DDP
    (reference src/engine/trainer.py:57-63, src/utils/comms.py)."""
    if mesh is None:
        return batch
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(a, sharding), batch
    )


def make_train_step(
    config: TrainerConfig, model: MMSModel, cameras: Dict[str, Cameras], mesh=None
):
    """Returns the jitted train_step(state, batch, rng) -> (state, aux)."""
    tx = make_optimizer(config)
    grid = _surface_grid(config)

    def train_step(state: TrainState, batch: Dict[str, PixelBatch], rng: jax.Array):
        step = state.step
        batch = _constrain_batch(batch, mesh)
        schedules = make_schedules(config, step)
        rng = jax.random.fold_in(rng, step)
        rng_model, rng_loss = jax.random.split(rng)

        total, losses, metrics, grads = _batch_loss_and_grads(
            config, model, cameras, grid, state.params, batch, step, schedules,
            rng_model, rng_loss, mesh,
        )
        params, opt_state = _guarded_update(tx, grads, state, metrics)
        new_state = TrainState(params=params, opt_state=opt_state, step=step + 1)
        losses["total_loss"] = total
        return new_state, {"losses": losses, "metrics": metrics}

    return jax.jit(train_step, donate_argnums=(0,))


def _guarded_update(tx, grads, state, metrics):
    """Optimizer update that SKIPS non-finite gradient steps.

    One all-dead sample can emit an inf/NaN gradient that
    clip_by_global_norm then spreads to every parameter (the r4 rehearsal
    died this way at step 44.3K from a finite loss). Reference parity: the
    torch stack's fp16 GradScaler skips inf steps the same way. The skip is
    structure-preserving — optimizer state passes through untouched on a
    bad step — so checkpoints stay pytree-compatible (optax.apply_if_finite
    would add wrapper state and break resume). metrics['grads_finite'] is
    1.0 on good steps.
    """
    finite = jnp.all(
        jnp.asarray([jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)])
    )
    safe_grads = jax.tree.map(lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
    updates, new_opt = tx.update(safe_grads, state.opt_state, state.params)
    updates = jax.tree.map(lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates)
    new_opt = jax.tree.map(
        lambda n, o: jnp.where(finite, n, o), new_opt, state.opt_state
    )
    metrics["grads_finite"] = finite.astype(jnp.float32)
    return optax.apply_updates(state.params, updates), new_opt


def _batch_loss_and_grads(
    config: TrainerConfig, model: MMSModel, cameras, grid, params, batch, step, schedules,
    rng_model, rng_loss, mesh=None,
):
    """value_and_grad of the step loss, with optional gradient accumulation
    over ray microbatches (jax.lax.scan) to bound activation memory — the
    structural analogue of the reference's eval-time ray chunking
    (eval_utils.py:31-75), applied to training."""

    def loss_fn(params, batch, rng_model, rng_loss):
        rays, segments = build_rays(config, params, cameras, batch)
        outputs = model.forward(
            params["model"], rays, segments, schedules, rng_model, train=True
        )
        outputs = select_mosaick_channels(config, outputs, batch)
        targets = {mod: batch[mod].pixels for mod in config.modalities}
        losses, total = compute_losses(
            config.loss_manager, outputs, targets, step,
            config.max_num_iterations, grid, rng_loss, train=True,
        )
        metrics = {
            f"psnr_{mod}": psnr(outputs[mod], targets[mod]) for mod in config.modalities
        }
        if outputs.get("gradients") is not None:
            # forensic: a min near 0 flags all-dead-activation samples (the
            # eikonal NaN-gradient failure mode, r4 rehearsal step 44.3K)
            g = outputs["gradients"]
            metrics["min_grad_norm"] = jnp.sqrt(
                jnp.min(jnp.sum(g * g, axis=-1))
            )
        return total, (losses, metrics)

    n = config.datamanager.num_rays_per_modality
    micro = config.datamanager.microbatch_rays
    if micro <= 0 or micro >= n:
        (total, (losses, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng_model, rng_loss
        )
        return total, losses, metrics, grads

    assert n % micro == 0, f"num_rays_per_modality {n} not divisible by microbatch {micro}"
    m = n // micro
    mb = jax.tree.map(lambda a: a.reshape(m, micro, *a.shape[1:]), batch)
    rngs_model = jax.random.split(rng_model, m)
    rngs_loss = jax.random.split(rng_loss, m)

    zero_grads = jax.tree.map(jnp.zeros_like, params)

    def body(acc, inp):
        slice_batch, rm, rl = inp
        slice_batch = _constrain_batch(slice_batch, mesh)
        (total, (losses, metrics)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, slice_batch, rm, rl
        )
        acc = jax.tree.map(jnp.add, acc, grads)
        return acc, (total, losses, metrics)

    grads, (totals, losses, metrics) = jax.lax.scan(
        body, zero_grads, (mb, rngs_model, rngs_loss)
    )
    grads = jax.tree.map(lambda g: g / m, grads)
    total = jnp.mean(totals)
    losses = jax.tree.map(jnp.mean, losses)
    metrics = jax.tree.map(jnp.mean, metrics)
    return total, losses, metrics, grads


def make_fused_train_fn(
    config: TrainerConfig,
    model: MMSModel,
    cameras: Dict[str, Cameras],
    cache,
    steps_per_call: int,
    mesh=None,
):
    """K training steps per dispatch via lax.scan with in-jit pixel sampling.

    The TPU-native hot loop: the dataset lives in HBM (DeviceDataCache), each
    scanned step samples its own pixel batch with jax.random, so a dispatch
    moves zero bytes host->device. Returns the last step's losses/metrics.
    """
    from multimodalstudio_tpu.data.device_cache import sample_pixel_batch

    tx = make_optimizer(config)
    grid = _surface_grid(config)

    def one_step(state: TrainState, rng: jax.Array):
        step = state.step
        schedules = make_schedules(config, step)
        step_rng = jax.random.fold_in(rng, step)
        rng_sample, rng_model, rng_loss = jax.random.split(step_rng, 3)
        batch = sample_pixel_batch(
            cache, rng_sample, config.datamanager.num_rays_per_modality, config.modalities
        )
        batch = _constrain_batch(batch, mesh)

        total, losses, metrics, grads = _batch_loss_and_grads(
            config, model, cameras, grid, state.params, batch, step, schedules,
            rng_model, rng_loss, mesh,
        )
        params, opt_state = _guarded_update(tx, grads, state, metrics)
        losses["total_loss"] = total
        return (
            TrainState(params=params, opt_state=opt_state, step=step + 1),
            {"losses": losses, "metrics": metrics},
        )

    def multi_step(state: TrainState, rng: jax.Array):
        if steps_per_call == 1:
            # no scan wrapper: dispatch is cheap and the scanned program
            # compiles an order of magnitude slower
            return one_step(state, rng)

        def body(carry, _):
            new_state, aux = one_step(carry, rng)
            return new_state, aux  # aux holds only scalars

        state, auxes = jax.lax.scan(body, state, None, length=steps_per_call)
        return state, jax.tree.map(lambda a: a[-1], auxes)

    return jax.jit(multi_step, donate_argnums=(0,))


def make_eval_batch_step(config: TrainerConfig, model: MMSModel, cameras: Dict[str, Cameras]):
    """Jitted eval-batch loss (reference base_pipeline.py:155-167)."""
    grid = _surface_grid(config)

    def eval_step(state: TrainState, batch: Dict[str, PixelBatch], rng: jax.Array):
        schedules = make_schedules(config, state.step)
        rays, segments = build_rays(config, state.params, cameras, batch)
        outputs = model.forward(
            state.params["model"], rays, segments, schedules, None, train=False
        )
        outputs = select_mosaick_channels(config, outputs, batch)
        targets = {mod: batch[mod].pixels for mod in config.modalities}
        losses, total = compute_losses(
            config.loss_manager, outputs, targets, state.step,
            config.max_num_iterations, grid, None, train=False,
        )
        metrics = {
            f"psnr_{mod}": psnr(outputs[mod], targets[mod]) for mod in config.modalities
        }
        losses["total_loss"] = total
        return {"losses": losses, "metrics": metrics}

    return jax.jit(eval_step)
