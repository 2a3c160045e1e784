"""Scene fields: SDF surface field, radiance trunk field, vanilla-NeRF field.

TPU-native counterparts of reference src/fields/surface_field.py,
radiance_field.py and nerf_field.py. A "field component" is either a plain
MLP or a hash FeatureGrid + MLP head, selected statically by spec.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from multimodalstudio_tpu.fields.components import FeatureGridAndMLP, FeatureGridSpec, ModalityHead
from multimodalstudio_tpu.fields.mlp import MLP, MLPSpec
from multimodalstudio_tpu.ops.encodings import nerf_encoding


@dataclasses.dataclass(frozen=True)
class NeRFEncodingSpec:
    num_frequencies: int = 6
    min_freq_exp: float = 0.0
    max_freq_exp: float = 5.0
    include_input: bool = True

    def apply(self, x: jnp.ndarray) -> jnp.ndarray:
        return nerf_encoding(
            x, self.num_frequencies, self.min_freq_exp, self.max_freq_exp, self.include_input
        )

    def out_dim(self, in_dim: int) -> int:
        return in_dim * self.num_frequencies * 2 + (in_dim if self.include_input else 0)


@dataclasses.dataclass(frozen=True)
class FieldComponentSpec:
    """MLP-only when `grid` is None, else hash grid + MLP head."""

    mlp: MLPSpec = MLPSpec()
    grid: Optional[FeatureGridSpec] = None


class FieldComponent(nn.Module):
    """Dispatch wrapper over MLP vs FeatureGridAndMLP."""

    spec: FieldComponentSpec
    output_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, active_level=None, max_level=None) -> jnp.ndarray:
        if self.spec.grid is None:
            return MLP(self.spec.mlp, output_dim=self.output_dim, name="mlp")(x)
        return FeatureGridAndMLP(
            self.spec.grid, self.spec.mlp, output_dim=self.output_dim, name="grid_mlp"
        )(x, active_level, max_level)


@dataclasses.dataclass(frozen=True)
class SDFFieldSpec:
    """Reference SDFFieldConfig (surface_field.py:27-47)."""

    field: FieldComponentSpec = FieldComponentSpec()
    use_position_encoding: bool = True
    position_encoding: NeRFEncodingSpec = NeRFEncodingSpec()
    geo_feature_dim: int = 256
    inside_outside: bool = False


class SDFField(nn.Module):
    """SDF + geometric feature from positions (surface_field.py:86-116).

    When a feature grid is present, the positional encoding (if enabled) rides
    as auxiliary input dims alongside raw xyz.
    """

    spec: SDFFieldSpec

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, active_level=None, max_level=None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        spec = self.spec
        inp = spec.position_encoding.apply(x) if spec.use_position_encoding else x
        out = FieldComponent(
            spec.field, output_dim=1 + spec.geo_feature_dim, name="field"
        )(inp, active_level, max_level)
        return out[..., :1], out[..., 1:]


@dataclasses.dataclass(frozen=True)
class RadianceFieldSpec:
    """Reference RadianceFieldConfig (radiance_field.py:31-36)."""

    base_field: FieldComponentSpec = FieldComponentSpec()


class RadianceField(nn.Module):
    """Shared radiance trunk: concat(pos, dir-enc, extras) -> feature.

    Reference radiance_field.py:55-81.
    """

    spec: RadianceFieldSpec
    output_dim: int

    @nn.compact
    def __call__(
        self,
        positions: jnp.ndarray,
        view_directions: jnp.ndarray,
        additional_inputs: jnp.ndarray,
        active_level=None,
    ) -> jnp.ndarray:
        parts = [positions, view_directions, additional_inputs]
        if self.spec.base_field.mlp.dtype == "bfloat16" and self.spec.base_field.grid is None:
            # the trunk consumes bf16 anyway — casting the pieces first
            # keeps the wide [N, 541] concat out of f32 HBM traffic
            parts = [p.astype(jnp.bfloat16) for p in parts]
        x = jnp.concatenate(parts, axis=-1)
        return FieldComponent(self.spec.base_field, output_dim=self.output_dim, name="base_field")(
            x, active_level
        )


@dataclasses.dataclass(frozen=True)
class NeRFFieldSpec:
    """Reference NeRFFieldConfig (nerf_field.py:33-52)."""

    base_field: FieldComponentSpec = FieldComponentSpec(
        mlp=MLPSpec(num_layers=4, hidden_dim=256, activation="ReLU", out_activation="ReLU")
    )
    base_output_dim: int = 256
    head_field: MLPSpec = MLPSpec(num_layers=4, hidden_dim=128, out_activation="ReLU")
    use_position_encoding: bool = True
    position_encoding: NeRFEncodingSpec = NeRFEncodingSpec()
    use_direction_encoding: bool = True
    direction_encoding: NeRFEncodingSpec = NeRFEncodingSpec(
        num_frequencies=4, min_freq_exp=0.0, max_freq_exp=3.0
    )


class NeRFField(nn.Module):
    """Vanilla-NeRF background field: density + radiance feature.

    Reference nerf_field.py:53-105: base field -> (density head: 1x64 MLP with
    softplus) and (head field on [feature, dir-enc] -> radiance feature).
    """

    spec: NeRFFieldSpec
    radiance_output_dim: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray, viewing_direction: jnp.ndarray, active_level=None):
        spec = self.spec
        if spec.use_position_encoding:
            x = spec.position_encoding.apply(x)
        if spec.use_direction_encoding:
            viewing_direction = spec.direction_encoding.apply(viewing_direction)

        feature = FieldComponent(
            spec.base_field, output_dim=spec.base_output_dim, name="base_field"
        )(x, active_level)
        density = MLP(
            MLPSpec(num_layers=1, hidden_dim=64, weight_norm=True, out_activation="Softplus",
                    activation_beta=1.0),
            output_dim=1,
            name="density_head",
        )(feature)
        head_in = jnp.concatenate([feature, viewing_direction], axis=-1)
        radiance_feature = MLP(spec.head_field, output_dim=self.radiance_output_dim, name="head_field")(
            head_in
        )
        return density, radiance_feature
