"""Input encodings: NeRF frequency, spherical harmonics, multiresolution hash grid.

The hash grid is the TPU-native replacement for tiny-cuda-nn's CUDA HashGrid
(reference src/field_components/encodings.py:184-310): a pure-XLA gather +
smoothstep-interpolation formulation whose backward pass is XLA's scatter-add.
Levels whose dense size fits the table are indexed densely (collision-free),
as in Instant-NGP; finer levels use the spatial XOR hash with the same primes
as the reference fallback (encodings.py:256).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn

_HASH_PRIMES = np.array([1, 2654435761, 805459861], dtype=np.uint32)

# corner offsets of a unit cube, [8, 3]
_CORNERS = np.stack(
    np.meshgrid(np.arange(2), np.arange(2), np.arange(2), indexing="ij"), axis=-1
).reshape(8, 3).astype(np.int32)


def nerf_encoding(
    x: jnp.ndarray,
    num_frequencies: int,
    min_freq_exp: float,
    max_freq_exp: float,
    include_input: bool = True,
) -> jnp.ndarray:
    """Sin/cos frequency encoding, [..., D] -> [..., D*2*F (+D)].

    Matches reference NeRFEncoding (encodings.py:131-182): frequencies
    2**linspace(min, max, F), sin of [scaled, scaled + pi/2] concatenated,
    optional raw input prepended.
    """
    freqs = 2.0 ** jnp.linspace(min_freq_exp, max_freq_exp, num_frequencies)
    scaled = x[..., None] * freqs  # [..., D, F]
    scaled = scaled.reshape(*scaled.shape[:-2], -1)  # [..., D*F]
    encoded = jnp.sin(jnp.concatenate([scaled, scaled + jnp.pi / 2.0], axis=-1))
    if include_input:
        encoded = jnp.concatenate([x, encoded], axis=-1)
    return encoded


def nerf_encoding_out_dim(in_dim: int, num_frequencies: int, include_input: bool = True) -> int:
    return in_dim * num_frequencies * 2 + (in_dim if include_input else 0)


def sh_encoding(directions: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Spherical-harmonics encoding of unit directions, degree -> (degree+1)^2.

    TPU-native closed form standing in for tcnn SphericalHarmonics
    (reference encodings.py:368-392).
    """
    from multimodalstudio_tpu.ops.math import components_from_spherical_harmonics

    return components_from_spherical_harmonics(degree + 1, directions)


def sh_encoding_out_dim(degree: int) -> int:
    return (degree + 1) ** 2


@dataclasses.dataclass(frozen=True)
class HashGridSpec:
    """Static geometry of a multiresolution hash grid."""

    num_levels: int = 16
    features_per_level: int = 2
    min_res: int = 16
    max_res: int = 2048
    log2_hashmap_size: int = 19
    hash_init_scale: float = 0.001
    interpolation: str = "Smoothstep"  # Nearest | Linear | Smoothstep

    @property
    def growth_factor(self) -> float:
        if self.num_levels == 1:
            return 1.0
        return float(
            np.exp((np.log(self.max_res) - np.log(self.min_res)) / (self.num_levels - 1))
        )

    @property
    def table_size(self) -> int:
        return 2 ** self.log2_hashmap_size

    @property
    def resolutions(self) -> np.ndarray:
        levels = np.arange(self.num_levels)
        return np.floor(self.min_res * self.growth_factor ** levels).astype(np.int32)

    @property
    def out_dim(self) -> int:
        return self.num_levels * self.features_per_level


def _level_axis_weights(x: jnp.ndarray, level: int, spec: HashGridSpec):
    """Per-axis base cell + interpolation weights for one level.

    x: [N, 3] in [0,1]. Returns (base [N, 3] int32 cell coords,
    w [N, 3] per-axis interp weights, offset [N, 3] raw fractional offsets).

    All tensors stay [N, 3] or 1-D — never [N, 8] — because TPU (8,128)
    tiling pads a materialized last-dim-8 array 16x in HBM.
    """
    res = float(spec.resolutions[level])
    scaled = x * res
    floor = jnp.floor(scaled)
    offset = scaled - floor  # [N, 3]
    base = floor.astype(jnp.int32)

    if spec.interpolation == "Smoothstep":
        w = offset * offset * (3.0 - 2.0 * offset)
    elif spec.interpolation == "Linear":
        w = offset
    elif spec.interpolation == "Nearest":
        w = jnp.round(offset)
    else:
        raise ValueError(f"unknown interpolation {spec.interpolation}")
    return base, w, offset


def _corner_index(base: jnp.ndarray, bits, level: int, spec: HashGridSpec) -> jnp.ndarray:
    """Flat table index of one cube corner: [N, 3] base + corner bits -> [N]."""
    cu = (base + jnp.asarray(bits, jnp.int32)).astype(jnp.uint32)  # [N, 3]
    res_i = int(spec.resolutions[level])
    if (res_i + 1) ** 3 <= spec.table_size:
        # dense, collision-free indexing (Instant-NGP policy for coarse levels)
        stride = np.uint32(res_i + 1)
        idx = cu[:, 0] + cu[:, 1] * stride + cu[:, 2] * stride * stride
    else:
        primes = _HASH_PRIMES
        idx = cu[:, 0] * primes[0]
        idx = jnp.bitwise_xor(idx, cu[:, 1] * primes[1])
        idx = jnp.bitwise_xor(idx, cu[:, 2] * primes[2])
        idx = idx & jnp.uint32(spec.table_size - 1)
    return (idx + jnp.uint32(level * spec.table_size)).astype(jnp.int32)


def _corner_weight(w: jnp.ndarray, bits) -> jnp.ndarray:
    """Trilinear weight of one corner: [N, 3] axis weights -> [N]."""
    wx = w[:, 0] if bits[0] else 1.0 - w[:, 0]
    wy = w[:, 1] if bits[1] else 1.0 - w[:, 1]
    wz = w[:, 2] if bits[2] else 1.0 - w[:, 2]
    return wx * wy * wz


def _hash_lookup_impl(table: jnp.ndarray, x: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    outs = []
    for level in range(spec.num_levels):
        base, w, _ = _level_axis_weights(x, level, spec)
        acc = None
        for bits in _CORNERS:
            idx = _corner_index(base, bits, level, spec)
            feats = jnp.take(table, idx, axis=0)  # [N, F]
            contrib = feats * _corner_weight(w, bits)[:, None]
            acc = contrib if acc is None else acc + contrib
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _hash_lookup_vjp(table: jnp.ndarray, x: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    return _hash_lookup_impl(table, x, spec)


def _hash_lookup_fwd(table, x, spec):
    # save only (table ref, positions): indices/weights recompute in backward
    return _hash_lookup_impl(table, x, spec), (table, x)


def _hash_lookup_bwd(spec, residuals, g):
    """Backward: scatter-add into the table + chain rule through the
    interpolation weights for position gradients.

    This is the memory-critical path the reference delegates to tcnn's CUDA
    backward (encodings.py:207-221): residuals are just (table, x); per-level
    intermediates are recomputed, so activations never exceed [N, 8, F].
    """
    table, x = residuals
    f = spec.features_per_level
    d_table = jnp.zeros_like(table)
    d_x = jnp.zeros_like(x)

    for level in range(spec.num_levels):
        base, w, offset = _level_axis_weights(x, level, spec)
        g_l = g[:, level * f : (level + 1) * f]  # [N, F]

        dw_sum = jnp.zeros_like(x)  # d out / d w accumulated over corners
        for bits in _CORNERS:
            idx = _corner_index(base, bits, level, spec)
            axis_facs = [
                (w[:, d] if bits[d] else 1.0 - w[:, d]) for d in range(3)
            ]  # each [N]
            cw = axis_facs[0] * axis_facs[1] * axis_facs[2]

            # table gradient: scatter-add cw * g_l at idx
            d_table = d_table.at[idx].add(cw[:, None] * g_l)

            # position gradient chain
            feats = jnp.take(table, idx, axis=0)  # [N, F]
            fg = jnp.sum(feats * g_l, axis=-1)  # [N]
            # d cw/d w_d = sign_d * prod of the other two axis factors
            dcw = jnp.stack(
                [
                    (1.0 if bits[0] else -1.0) * axis_facs[1] * axis_facs[2],
                    (1.0 if bits[1] else -1.0) * axis_facs[0] * axis_facs[2],
                    (1.0 if bits[2] else -1.0) * axis_facs[0] * axis_facs[1],
                ],
                axis=-1,
            )  # [N, 3]
            dw_sum = dw_sum + fg[:, None] * dcw

        if spec.interpolation == "Smoothstep":
            dw_doff = 6.0 * offset * (1.0 - offset)
        elif spec.interpolation == "Linear":
            dw_doff = jnp.ones_like(offset)
        else:  # Nearest
            dw_doff = jnp.zeros_like(offset)
        res = float(spec.resolutions[level])
        d_x = d_x + dw_sum * dw_doff * res

    return d_table, d_x


_hash_lookup_vjp.defvjp(_hash_lookup_fwd, _hash_lookup_bwd)


def hash_grid_lookup(table: jnp.ndarray, x: jnp.ndarray, spec: HashGridSpec) -> jnp.ndarray:
    """Multiresolution hash-grid encoding.

    Args:
        table: [num_levels * table_size, features_per_level] parameters.
        x: [N, 3] positions in [0, 1].
        spec: static grid geometry.

    Returns:
        [N, num_levels * features_per_level] interpolated features.

    TPU-native replacement for tcnn's CUDA HashGrid (reference
    encodings.py:184-310): per-level gather + smoothstep trilerp with a
    custom VJP that recomputes indices/weights in the backward pass and
    scatter-adds into the table — peak activation memory is [N, 8, F] per
    level instead of the naive [N, L, 8, F] residual chain. Dense
    (collision-free) indexing is used for every level whose (res+1)^3 fits
    the table, XOR hashing (same primes as the reference fallback,
    encodings.py:256) otherwise. Golden-tested against an independent numpy
    implementation.
    """
    return _hash_lookup_vjp(table, x, spec)


class HashEncoding(nn.Module):
    """Flax module owning the hash table parameters.

    Table init: uniform in [-scale, scale] as in the reference fallback
    (encodings.py:230-233).
    """

    spec: HashGridSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        spec = self.spec

        def init(key, shape, dtype=jnp.float32):
            return (
                jax.random.uniform(key, shape, dtype, minval=-1.0, maxval=1.0)
                * spec.hash_init_scale
            )

        table = self.param(
            "table", init, (spec.num_levels * spec.table_size, spec.features_per_level)
        )
        return hash_grid_lookup(table, x, spec)
