"""Device-resident dataset cache with in-jit pixel sampling.

The TPU-native answer to the reference's CacheDataloader + UniformPixelSampler
(src/data/dataloaders.py:137-167, src/cameras/pixel_samplers.py:71-89): all
frames live in HBM (uint8/uint16 quantized when possible to halve bandwidth),
and each training step draws its random pixel batch with `jax.random` inside
the jitted program. Combined with a `lax.scan` over steps this removes every
per-step host<->device transfer — on tunneled or remote TPUs the transfer
alone otherwise costs ~10ms/step.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from flax import struct

from multimodalstudio_tpu.data.dataset import MMSDataset
from multimodalstudio_tpu.data.sampler import PixelBatch


@struct.dataclass
class DeviceModalityCache:
    # frames stored FLAT [F*H*W, C]: gathers use linearized indices — XLA TPU
    # compiles a multi-index-vector gather orders of magnitude slower than a
    # flat row gather
    images: jnp.ndarray  # [F*H*W, C] uint16 or float32
    mosaick_mask: jnp.ndarray  # [H*W] int32 (zeros when not raw)
    shape: tuple = struct.field(pytree_node=False, default=())  # (F, H, W)
    scale: float = struct.field(pytree_node=False, default=1.0)  # dequant factor
    pixel_offset: float = struct.field(pytree_node=False, default=0.5)


@struct.dataclass
class DeviceDataCache:
    data: Dict[str, DeviceModalityCache]


def build_device_cache(dataset: MMSDataset, quantize: bool = True) -> DeviceDataCache:
    out = {}
    for mod in dataset.modalities:
        d = dataset.data[mod]
        imgs = d.images
        if quantize:
            stored = (np.clip(imgs, 0.0, 1.0) * 65535.0 + 0.5).astype(np.uint16)
            scale = 1.0 / 65535.0
        else:
            stored = imgs.astype(np.float32)
            scale = 1.0
        mask = (
            d.mosaick_mask.astype(np.int32)
            if dataset.raw and d.mosaick_mask is not None
            else np.zeros(imgs.shape[1:3], np.int32)
        )
        f, h, w, c = imgs.shape
        out[mod] = DeviceModalityCache(
            images=jnp.asarray(stored.reshape(f * h * w, c)),
            mosaick_mask=jnp.asarray(mask.reshape(h * w)),
            shape=(f, h, w),
            scale=scale,
            pixel_offset=d.cameras.pixel_offset,
        )
    return DeviceDataCache(data=out)


def sample_pixel_batch(
    cache: DeviceDataCache,
    rng: jax.Array,
    num_rays_per_modality: int,
    modalities: Tuple[str, ...],
) -> Dict[str, PixelBatch]:
    """In-jit uniform pixel sampling for every modality."""
    batch = {}
    keys = jax.random.split(rng, len(modalities))
    for key, mod in zip(keys, modalities):
        c = cache.data[mod]
        f, h, w = c.shape
        kf, ky, kx = jax.random.split(key, 3)
        n = num_rays_per_modality
        fi = jax.random.randint(kf, (n,), 0, f)
        yi = jax.random.randint(ky, (n,), 0, h)
        xi = jax.random.randint(kx, (n,), 0, w)
        pixels = jnp.take(c.images, (fi * h + yi) * w + xi, axis=0).astype(jnp.float32) * c.scale
        chan = jnp.take(c.mosaick_mask, yi * w + xi)
        coords = jnp.stack([yi, xi], axis=-1).astype(jnp.float32) + c.pixel_offset
        batch[mod] = PixelBatch(
            camera_indices=fi.astype(jnp.int32),
            pixel_coords=coords,
            pixels=pixels,
            mosaick_channel=chan,
        )
    return batch
