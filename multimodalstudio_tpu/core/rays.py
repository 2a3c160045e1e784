"""Ray pytrees.

TPU-native counterparts of the reference's RayBundle / RaySamples tensor
dataclasses (reference: src/cameras/rays.py:240,117). Differences are
deliberate:

* flat, static shapes — a bundle is always ``[num_rays]``; samples are
  ``[num_rays, num_samples]`` with no trailing singleton dims, so XLA tiles
  them directly onto (8,128) vregs;
* no boolean-mask indexing — region-of-interest membership travels as a float
  ``mask`` next to the bundle (reference masks bundles with ``bundle[mask]``,
  src/models/base_model.py:88-93, which is a dynamic shape);
* no stored callables — spacing->euclidean conversion is a pure function of
  (nears, fars) chosen statically by the sampler.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RayBundle:
    """A flat batch of rays. All leaves have leading dim [num_rays].

    Mirrors reference src/cameras/rays.py:240-263 minus the torch
    TensorDataclass machinery.
    """

    origins: jnp.ndarray  # [N, 3]
    directions: jnp.ndarray  # [N, 3] unit
    up_directions: jnp.ndarray  # [N, 3] camera +Y in world (polarization)
    pixel_area: jnp.ndarray  # [N, 1]
    camera_indices: jnp.ndarray  # [N] int32
    directions_norm: jnp.ndarray  # [N, 1] pre-normalization norm
    nears: Optional[jnp.ndarray] = None  # [N, 1]
    fars: Optional[jnp.ndarray] = None  # [N, 1]

    @property
    def num_rays(self) -> int:
        return self.origins.shape[0]


@struct.dataclass
class RaySamples:
    """Samples along a flat batch of rays.

    ``starts``/``ends`` are euclidean bin edges split into per-sample
    start/end; ``spacing_*`` are the same in the sampler's normalized [0, 1]
    domain (reference src/cameras/rays.py:117-137). Positions for field
    evaluation are the *start* points of each bin (NeuS section convention,
    reference src/cameras/rays.py:69-81).
    """

    origins: jnp.ndarray  # [N, 3]
    directions: jnp.ndarray  # [N, 3]
    up_directions: jnp.ndarray  # [N, 3]
    starts: jnp.ndarray  # [N, S]
    ends: jnp.ndarray  # [N, S]
    deltas: jnp.ndarray  # [N, S]
    spacing_starts: jnp.ndarray  # [N, S]
    spacing_ends: jnp.ndarray  # [N, S]

    @property
    def num_rays(self) -> int:
        return self.starts.shape[0]

    @property
    def num_samples(self) -> int:
        return self.starts.shape[1]

    def start_positions(self) -> jnp.ndarray:
        """[N, S, 3] frustum start points (reference rays.py:69-81)."""
        return self.origins[:, None, :] + self.directions[:, None, :] * self.starts[..., None]

    def mid_positions(self) -> jnp.ndarray:
        """[N, S, 3] frustum centers (reference rays.py:54-63)."""
        mids = (self.starts + self.ends) * 0.5
        return self.origins[:, None, :] + self.directions[:, None, :] * mids[..., None]


def samples_from_bins(
    rays: RayBundle,
    euclid_bins: jnp.ndarray,
    spacing_bins: jnp.ndarray,
) -> RaySamples:
    """Builds RaySamples from [N, S+1] euclidean + spacing bin edges.

    Counterpart of reference RayBundle.get_ray_samples (rays.py:304-349).
    """
    return RaySamples(
        origins=rays.origins,
        directions=rays.directions,
        up_directions=rays.up_directions,
        starts=euclid_bins[:, :-1],
        ends=euclid_bins[:, 1:],
        deltas=euclid_bins[:, 1:] - euclid_bins[:, :-1],
        spacing_starts=spacing_bins[:, :-1],
        spacing_ends=spacing_bins[:, 1:],
    )


def weights_from_alphas(alphas: jnp.ndarray) -> jnp.ndarray:
    """NeuS-style compositing weights from per-sample alphas [N, S] -> [N, S].

    weights = alpha_i * prod_{j<i} (1 - alpha_j + 1e-7)
    (reference src/cameras/rays.py:201-217).
    """
    shifted = jnp.concatenate(
        [jnp.ones_like(alphas[:, :1]), 1.0 - alphas[:, :-1] + 1e-7], axis=-1
    )
    transmittance = jnp.cumprod(shifted, axis=-1)
    return alphas * transmittance


def alphas_from_densities(deltas: jnp.ndarray, densities: jnp.ndarray) -> jnp.ndarray:
    """alpha = 1 - exp(-delta * density), [N, S] (reference rays.py:138-151)."""
    return 1.0 - jnp.exp(-deltas * densities)


def weights_from_densities(deltas: jnp.ndarray, densities: jnp.ndarray) -> jnp.ndarray:
    """Exponential-transmittance weights (reference rays.py:153-174)."""
    delta_density = deltas * densities
    alphas = 1.0 - jnp.exp(-delta_density)
    accum = jnp.concatenate(
        [jnp.zeros_like(delta_density[:, :1]), jnp.cumsum(delta_density[:, :-1], axis=-1)],
        axis=-1,
    )
    transmittance = jnp.exp(-accum)
    return alphas * transmittance
