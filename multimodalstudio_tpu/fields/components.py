"""Field components: variance network, feature grid, grid+MLP stacks, heads.

TPU-native counterparts of reference src/field_components/single_variance.py,
feature_structures.py and field_heads.py. Coarse-to-fine masking is a pure
function of the (traced) level scalar — no module-state mutation.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from typing import Union

from multimodalstudio_tpu.fields.mlp import MLP, MLPSpec
from multimodalstudio_tpu.ops.encodings import HashEncoding, HashGridSpec
from multimodalstudio_tpu.ops.pallas.slot_grid import (
    SlotGridSpec,
    make_table_init,
    slot_grid_lookup,
)
from multimodalstudio_tpu.ops.polarization import (
    align_polarization_filters,
    stokes_to_intensity,
)


class SingleVariance(nn.Module):
    """NeuS single-parameter variance: inv_std = exp(10 * s), clipped.

    Reference src/field_components/single_variance.py:19-36.
    """

    init_val: float = 0.3

    @nn.compact
    def __call__(self) -> jnp.ndarray:
        s = self.param("s", lambda key, shape: jnp.full(shape, self.init_val), (1,))
        return jnp.clip(jnp.exp(s * 10.0), 1e-6, 1e6)


@dataclasses.dataclass(frozen=True)
class FeatureGridSpec:
    """Reference FeatureGridConfig (feature_structures.py:25-42).

    `encoding` selects the backend: HashGridSpec = XLA-gather hash grid
    (bit-faithful tcnn semantics, HBM gather-bound); SlotGridSpec =
    VMEM-resident slot-hash grid Pallas kernel (the TPU production path,
    ops/pallas/slot_grid.py)."""

    encoding: Union[HashGridSpec, SlotGridSpec] = HashGridSpec()
    coarse_to_fine: bool = True
    steps_per_level_ratio: float = 0.1
    level_init: int = 1
    radius: float = 1.0


class SlotGridEncoding(nn.Module):
    """Flax module owning a slot-grid table (ops/pallas/slot_grid)."""

    spec: SlotGridSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_levels: Optional[int] = None) -> jnp.ndarray:
        table = self.param("table", make_table_init(self.spec))
        return slot_grid_lookup(table, x, self.spec, num_levels)


class FeatureGrid(nn.Module):
    """Rescale [-r, r] -> [0, 1], hash-encode, apply coarse-to-fine mask.

    `active_level` is a traced int scalar derived from the training step
    (see engine/schedules.py); features of levels >= active_level are zeroed
    (reference feature_structures.py:78-117).
    """

    spec: FeatureGridSpec

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, active_level: Optional[jnp.ndarray] = None,
        max_level: Optional[int] = None,
    ) -> jnp.ndarray:
        spec = self.spec
        rescaled = (x + spec.radius) / (2.0 * spec.radius)
        # clamp to the grid domain: numerical-gradient taps and background
        # samples can step slightly outside [-r, r]; tcnn clamps likewise
        rescaled = jnp.clip(rescaled, 0.0, 1.0 - 1e-6)
        if isinstance(spec.encoding, SlotGridSpec):
            features = SlotGridEncoding(spec.encoding, name="encoding")(
                rescaled, max_level
            )
        else:
            features = HashEncoding(spec.encoding, name="encoding")(rescaled, max_level)
        if spec.coarse_to_fine and active_level is not None:
            fpl = spec.encoding.features_per_level
            level_of_feature = jnp.arange(spec.encoding.out_dim) // fpl
            mask = (level_of_feature < active_level).astype(features.dtype)
            features = features * mask
        return features


class FeatureGridAndMLP(nn.Module):
    """Hash-grid features concatenated with [xyz, auxiliary] into an MLP head.

    Reference feature_structures.py:130-169. The first 3 dims of the input are
    positions; any extra dims ride along into the MLP.
    """

    grid_spec: FeatureGridSpec
    mlp_spec: MLPSpec
    output_dim: int

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, active_level: Optional[jnp.ndarray] = None,
        max_level: Optional[int] = None,
    ) -> jnp.ndarray:
        positions = x[..., :3]
        features = FeatureGrid(self.grid_spec, name="feature_grid")(
            positions, active_level, max_level
        )
        if x.shape[-1] > 3:
            mlp_in = jnp.concatenate([positions, x[..., 3:], features], axis=-1)
        else:
            mlp_in = jnp.concatenate([positions, features], axis=-1)
        return MLP(self.mlp_spec, output_dim=self.output_dim, name="mlp_head")(mlp_in)


class ModalityHead(nn.Module):
    """Per-modality radiance decoder (reference field_heads.py:55-73)."""

    mlp_spec: MLPSpec
    output_dim: int

    @nn.compact
    def __call__(
        self,
        radiance_feature: jnp.ndarray,
        directions: Optional[jnp.ndarray] = None,
        up_directions: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        return MLP(self.mlp_spec, output_dim=self.output_dim, name="field")(radiance_feature)


class PolarizationHead(nn.Module):
    """Stokes-vector head with Mueller-optics projection to 4 intensities.

    Reference field_heads.py:75-106: s0 through leaky-ReLU, rotation into the
    camera polarizer frame, projection to 0/45/90/135-degree intensities.
    """

    mlp_spec: MLPSpec

    @nn.compact
    def __call__(
        self,
        radiance_feature: jnp.ndarray,
        directions: jnp.ndarray,
        up_directions: jnp.ndarray,
    ) -> jnp.ndarray:
        stokes = MLP(self.mlp_spec, output_dim=3, name="field")(radiance_feature)
        s0 = nn.leaky_relu(stokes[..., 0:1])
        stokes = jnp.concatenate([s0, stokes[..., 1:]], axis=-1)
        aligned = align_polarization_filters(stokes, directions, up_directions)
        channels, _ = stokes_to_intensity(aligned)
        return channels
