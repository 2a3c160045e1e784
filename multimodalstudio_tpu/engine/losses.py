"""Loss manager: per-modality radiance losses + geometry losses.

TPU-native counterpart of reference src/model_components/losses.py. All loss
weights are pure functions of the traced step (loss-weight schedulers,
reference losses.py:101-102, schedulers.py). Saturation skipping and channel
decimation are masked dense ops.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from multimodalstudio_tpu.engine.schedules import CurvatureWarmupSpec
from multimodalstudio_tpu.fields.components import FeatureGridSpec


@dataclasses.dataclass(frozen=True)
class RadianceLossSpec:
    """Reference LossConfig / SkipSaturationLossConfig (losses.py:30-75)."""

    loss: str = "L1"  # L1 | MSE
    weight: float = 1.0
    saturation_threshold: Optional[float] = None  # SkipSaturationLoss when set
    per_channel_probability: Optional[Tuple[float, ...]] = None  # channel decimation
    # optional weight scheduler: any spec with .factor(step, max_iters)
    # (reference loss-weight scheduling, losses.py:101-102)
    scheduler: Optional[object] = None


@dataclasses.dataclass(frozen=True)
class GeometryLossSpec:
    eikonal_loss: str = "MSE"
    eikonal_weight: float = 0.1
    curvature_loss: Optional[str] = None  # "L1" when enabled
    curvature_weight: float = 5e-4
    curvature_scheduler: Optional[CurvatureWarmupSpec] = None


@dataclasses.dataclass(frozen=True)
class LossManagerSpec:
    radiance_losses: Tuple[Tuple[str, RadianceLossSpec], ...] = ()
    geometry: GeometryLossSpec = GeometryLossSpec()

    def radiance_spec(self, mod: str) -> RadianceLossSpec:
        for name, spec in self.radiance_losses:
            if name == mod:
                return spec
        return RadianceLossSpec()


def _elementwise(loss: str, pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    if loss == "L1":
        return jnp.abs(pred - target)
    if loss == "MSE":
        return (pred - target) ** 2
    raise ValueError(f"unknown loss {loss}")


def radiance_loss(
    spec: RadianceLossSpec,
    pred: jnp.ndarray,
    target: jnp.ndarray,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Per-modality radiance loss [N, C] -> scalar.

    Saturation skipping (losses.py:152-164) zeroes residuals of saturated
    target pixels while keeping them in the mean's denominator — exactly the
    reference's masked_fill semantics. Channel decimation (losses.py:89-95)
    supervises one random channel per pixel drawn from the configured
    categorical distribution.
    """
    if spec.per_channel_probability is not None and rng is not None:
        probs = jnp.asarray(spec.per_channel_probability)
        idx = jax.random.categorical(rng, jnp.log(probs), shape=(pred.shape[0],))
        pred = jnp.take_along_axis(pred, idx[:, None], axis=-1)
        target = jnp.take_along_axis(target, idx[:, None], axis=-1)
    err = _elementwise(spec.loss, pred, target)
    if spec.saturation_threshold is not None:
        err = jnp.where(target > spec.saturation_threshold, 0.0, err)
    return jnp.mean(err)


def eikonal_loss(spec: GeometryLossSpec, gradients: jnp.ndarray) -> jnp.ndarray:
    """||grad sdf|| -> 1 (losses.py:107-119); gradients [..., 3].

    Safe norm: jnp.linalg.norm has a NaN gradient at exactly 0, and a
    single all-zero SDF gradient (SoftplusQuad's derivative is exactly 0
    on its linear-negative branch, so a sample whose every activation path
    is dead produces one) poisons the whole batch through
    clip_by_global_norm — root cause of the r4 rehearsal NaN at step 44.3K.
    The epsilon biases the norm by <=1e-6, vs a target of 1."""
    grad_norm = jnp.sqrt(jnp.sum(gradients * gradients, axis=-1) + 1e-12)
    return jnp.mean(_elementwise(spec.eikonal_loss, grad_norm, jnp.ones_like(grad_norm)))


def curvature_loss(spec: GeometryLossSpec, hessians: jnp.ndarray) -> jnp.ndarray:
    """L1 on the laplacian proxy (losses.py:143-150); hessians [..., 3]."""
    laplacian = jnp.sum(hessians, axis=-1)
    return jnp.mean(_elementwise(spec.curvature_loss or "L1", laplacian, jnp.zeros_like(laplacian)))


def compute_losses(
    spec: LossManagerSpec,
    outputs: Dict[str, jnp.ndarray],
    targets: Dict[str, jnp.ndarray],
    step: jnp.ndarray,
    max_iters: int,
    grid: Optional[FeatureGridSpec],
    rng: Optional[jax.Array] = None,
    train: bool = True,
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray]:
    """All losses + weighted total (reference LossManager.compute_loss,
    losses.py:213-265).

    `outputs[mod]` are rendered pixels [N_mod, C]; `targets[mod]` ground
    truth. Geometry losses consume outputs['gradients'] / ['hessians']
    concatenated across the flat batch (already flat here).
    """
    losses: Dict[str, jnp.ndarray] = {}
    total = jnp.asarray(0.0)

    mods = list(targets.keys())
    rngs = jax.random.split(rng, len(mods)) if rng is not None else [None] * len(mods)
    for r, mod in zip(rngs, mods):
        lspec = spec.radiance_spec(mod)
        loss = radiance_loss(lspec, outputs[mod], targets[mod], r)
        losses[mod] = loss
        weight = lspec.weight
        if lspec.scheduler is not None:
            weight = weight * lspec.scheduler.factor(step, max_iters)
        total = total + weight * loss

    if train:
        g = spec.geometry
        if outputs.get("gradients") is not None:
            loss = eikonal_loss(g, outputs["gradients"])
            losses["eikonal_loss"] = loss
            total = total + g.eikonal_weight * loss
        if g.curvature_loss is not None and outputs.get("hessians") is not None:
            loss = curvature_loss(g, outputs["hessians"])
            weight = g.curvature_weight
            if g.curvature_scheduler is not None and grid is not None:
                weight = weight * g.curvature_scheduler.factor(step, max_iters, grid)
            losses["curvature_loss"] = loss
            losses["curvature_weight"] = weight
            total = total + weight * loss

    return losses, total
