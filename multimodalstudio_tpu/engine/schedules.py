"""Per-step schedules as pure functions of the (traced) step scalar.

The reference mutates module state from BEFORE_TRAIN_ITERATION callbacks
(src/engine/callbacks.py; volume_rendering.py:219-239,
feature_structures.py:90-117, surface_model.py:240-281,
engine/schedulers.py). Here every schedule is a jit-safe function of `step`,
so the whole training step stays one compiled XLA program with `step` as a
traced input (no per-step recompilation).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax.numpy as jnp

from multimodalstudio_tpu.fields.components import FeatureGridSpec


def cos_anneal_ratio(step: jnp.ndarray, max_iters: int, anneal_end_ratio: float) -> jnp.ndarray:
    """NeuS cosine anneal, 0 -> 1 over the first `anneal_end_ratio` fraction
    (reference volume_rendering.py:225-238)."""
    if anneal_end_ratio <= 0:
        return jnp.asarray(1.0)
    anneal_end = max(int(max_iters * anneal_end_ratio), 1)
    return jnp.minimum(1.0, step / anneal_end)


def steps_per_level(max_iters: int, grid: FeatureGridSpec) -> int:
    """Coarse-to-fine cadence, capped so all levels activate in training
    (reference feature_structures.py:97-104)."""
    spl = int(max_iters * grid.steps_per_level_ratio)
    return max(min(spl, int(max_iters / grid.encoding.num_levels)), 1)


def active_level(step: jnp.ndarray, max_iters: int, grid: Optional[FeatureGridSpec]) -> jnp.ndarray:
    """Active hash-grid level for the coarse-to-fine mask
    (reference feature_structures.py:97-108)."""
    if grid is None or not grid.coarse_to_fine:
        return jnp.asarray(1 << 20)  # effectively "all levels"
    spl = steps_per_level(max_iters, grid)
    level = (step // spl).astype(jnp.int32) + 1
    level = jnp.maximum(level, grid.level_init)
    return jnp.minimum(level, grid.encoding.num_levels)


def numerical_gradients_delta(
    step: jnp.ndarray, max_iters: int, grid: Optional[FeatureGridSpec]
) -> jnp.ndarray:
    """Numerical-gradient epsilon annealed with the active grid resolution
    (reference surface_model.py:248-279)."""
    if grid is None:
        return jnp.asarray(1e-4)
    enc = grid.encoding
    spl = steps_per_level(max_iters, grid)
    growth = enc.growth_factor
    lvl = jnp.floor(step / spl)
    delta = 1.0 / (enc.min_res * jnp.power(growth, lvl))
    delta = jnp.maximum(1.0 / enc.max_res, delta)
    return delta * (grid.radius * 2.0)


@dataclasses.dataclass(frozen=True)
class MultiStepWarmupSpec:
    """Linear warm-up then gamma^k at milestone fractions
    (reference schedulers.py:249-270)."""

    warm_up_ratio: float = 0.1
    milestones: Sequence[float] = (0.5, 0.75, 0.9)
    gamma: float = 0.4

    def factor(self, step: jnp.ndarray, max_iters: int) -> jnp.ndarray:
        warm_up_end = max(int(max_iters * self.warm_up_ratio), 1)
        ms = jnp.asarray(self.milestones)
        progress = step / max_iters
        # searchsorted(milestones, progress, side='left')
        index = jnp.sum((ms < progress).astype(jnp.int32))
        after = self.gamma**index
        warm = step / warm_up_end
        return jnp.where(step < warm_up_end, warm, after)


@dataclasses.dataclass(frozen=True)
class ExponentialDecaySpec:
    """jaxnerf log-lerp decay (reference schedulers.py:45-77)."""

    lr_final_ratio: float = 0.1  # final/initial factor
    lr_delay_steps_ratio: float = 0.0
    lr_delay_mult: float = 1.0

    def factor(self, step: jnp.ndarray, max_iters: int) -> jnp.ndarray:
        delay_steps = int(max_iters * self.lr_delay_steps_ratio)
        if delay_steps > 0:
            delay = self.lr_delay_mult + (1 - self.lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / delay_steps, 0.0, 1.0)
            )
        else:
            delay = 1.0
        t = jnp.clip(step / max_iters, 0.0, 1.0)
        log_lerp = jnp.exp(jnp.log(1.0) * (1 - t) + jnp.log(self.lr_final_ratio) * t)
        return delay * log_lerp


@dataclasses.dataclass(frozen=True)
class NeuSSchedulerSpec:
    """Warm-up then cosine decay (reference schedulers.py:273-294)."""

    warm_up_ratio: float = 0.1
    learning_rate_alpha: float = 0.05

    def factor(self, step: jnp.ndarray, max_iters: int) -> jnp.ndarray:
        warm_up_end = max(int(max_iters * self.warm_up_ratio), 1)
        alpha = self.learning_rate_alpha
        progress = (step - warm_up_end) / max(max_iters - warm_up_end, 1)
        cos = (jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
        return jnp.where(step < warm_up_end, step / warm_up_end, cos)


@dataclasses.dataclass(frozen=True)
class CosineRaiseSpec:
    """Cosine raise to 1 over the first saturation fraction
    (reference schedulers.py:296-318)."""

    saturation_ratio: float = 0.5
    learning_rate_alpha: float = 0.05

    def factor(self, step: jnp.ndarray, max_iters: int) -> jnp.ndarray:
        start = max(int(max_iters * self.saturation_ratio), 1)
        alpha = self.learning_rate_alpha
        progress = step / start
        raise_ = (-jnp.cos(jnp.pi * progress) + 1.0) * 0.5 * (1 - alpha) + alpha
        return jnp.where(step < start, raise_, 1.0)


@dataclasses.dataclass(frozen=True)
class MaskedSchedulerSpec:
    """Zero until mask_ratio, then inner factor (reference schedulers.py:228-247)."""

    mask_ratio: float = 0.5
    inner: Optional[object] = None
    learning_factor: float = 1.0

    def factor(self, step: jnp.ndarray, max_iters: int) -> jnp.ndarray:
        inner = (
            self.inner.factor(step, max_iters)
            if self.inner is not None
            else jnp.asarray(self.learning_factor)
        )
        return jnp.where(step < self.mask_ratio * max_iters, 0.0, inner)


@dataclasses.dataclass(frozen=True)
class CurvatureWarmupSpec:
    """Curvature-loss weight: warm-up then decay 1/growth^(level-1), synced to
    the grid coarse-to-fine (reference schedulers.py:320-347, losses.py:121-150)."""

    warm_up_ratio: float = 0.1

    def factor(self, step: jnp.ndarray, max_iters: int, grid: FeatureGridSpec) -> jnp.ndarray:
        warm_up_end = max(int(max_iters * self.warm_up_ratio), 1)
        enc = grid.encoding
        spl = steps_per_level(max_iters, grid)
        level = (step // spl).astype(jnp.int32) + 1
        level = jnp.clip(level, grid.level_init, enc.num_levels)
        decay = 1.0 / jnp.power(enc.growth_factor, level - 1)
        return jnp.where(step < warm_up_end, step / warm_up_end, decay)
