"""Pixel sampling: random ray batches and dense full-view batches.

TPU-native counterpart of reference src/cameras/pixel_samplers.py and
src/data/dataloaders.py: the entire dataset is cached in host memory (the
reference's CacheDataloader caches a collated batch, dataloaders.py:137-167)
and each training step gathers a fresh random pixel batch per modality. Under
data parallelism each process samples with an independently folded seed, the
analogue of the per-rank seed at pixel_samplers.py:49-52.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax.numpy as jnp
from flax import struct

from multimodalstudio_tpu.data.dataset import MMSDataset


@struct.dataclass
class PixelBatch:
    """One modality's sampled pixels for a step."""

    camera_indices: jnp.ndarray  # [N] int32 (index into the split's frames)
    pixel_coords: jnp.ndarray  # [N, 2] float32 (y, x) + pixel_offset
    pixels: jnp.ndarray  # [N, C] targets
    mosaick_channel: jnp.ndarray  # [N] int32 (0 when not raw)


class UniformPixelSampler:
    """Uniform random (frame, y, x) sampling per modality
    (reference pixel_samplers.py:71-89)."""

    def __init__(self, dataset: MMSDataset, num_rays_per_modality: int, seed: int = 0):
        self.dataset = dataset
        self.num_rays = num_rays_per_modality
        self.rng = np.random.default_rng(seed)

    def sample(self) -> Dict[str, PixelBatch]:
        from multimodalstudio_tpu.data.native import sample_pixels

        batch = {}
        for mod in self.dataset.modalities:
            d = self.dataset.data[mod]
            n = self.num_rays
            mask = d.mosaick_mask if self.dataset.raw else None
            # threaded C++ gather when native/ is built; numpy otherwise
            fi, coords, pixels, chan = sample_pixels(
                d.images, mask, n, int(self.rng.integers(0, 2**62)),
                d.cameras.pixel_offset,
            )
            batch[mod] = PixelBatch(
                camera_indices=jnp.asarray(fi, jnp.int32),
                pixel_coords=jnp.asarray(coords),
                pixels=jnp.asarray(pixels),
                mosaick_channel=jnp.asarray(chan),
            )
        return batch


def dense_pixel_batch(
    dataset: MMSDataset, mod: str, frame_index: int, scale: float = 1.0
) -> PixelBatch:
    """Every pixel of one view in row-major order
    (reference DensePixelSampler, pixel_samplers.py:91-115).

    `scale` < 1 renders a downsampled grid (the evaluator's rendering_scale).
    """
    d = dataset.data[mod]
    h = int(d.cameras.height * scale)
    w = int(d.cameras.width * scale)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    ys = yy.reshape(-1)
    xs = xx.reshape(-1)
    # map to full-res pixel coordinates
    inv = 1.0 / scale
    coords = np.stack([ys * inv, xs * inv], axis=-1).astype(np.float32) + d.cameras.pixel_offset
    n = coords.shape[0]
    if scale == 1.0:
        pixels = d.images[frame_index].reshape(n, -1)
    else:
        pixels = d.images[frame_index][
            (ys * inv).astype(np.int64), (xs * inv).astype(np.int64)
        ].reshape(n, -1)
    if dataset.raw and d.mosaick_mask is not None:
        chan = d.mosaick_mask[(ys * inv).astype(np.int64), (xs * inv).astype(np.int64)]
        chan = chan.astype(np.int32)
    else:
        chan = np.zeros(n, np.int32)
    return PixelBatch(
        camera_indices=jnp.full((n,), frame_index, jnp.int32),
        pixel_coords=jnp.asarray(coords),
        pixels=jnp.asarray(pixels),
        mosaick_channel=jnp.asarray(chan),
    )
