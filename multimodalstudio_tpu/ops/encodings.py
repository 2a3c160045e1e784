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


@functools.lru_cache(maxsize=None)
def _sh_dense_coeffs(levels: int):
    """Monomial-basis coefficients C_k with SH(d) = 1*C0 + d@C1 + d2@C2 +
    d3@C3 + d4@C4, where d_k are the (redundant) outer-product monomial
    tensors of degree k. Fitted by least squares on the unit sphere — exact
    (residual ~1e-7): every real SH component up to degree 4 is a
    polynomial of degree <= 4 in (x, y, z)."""
    import numpy as np

    from multimodalstudio_tpu.ops.math import components_from_spherical_harmonics

    rng = np.random.default_rng(0)
    d = rng.normal(size=(4096, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    m1 = d
    m2 = (d[:, :, None] * d[:, None, :]).reshape(-1, 9)
    m3 = (m2[:, :, None] * d[:, None, :]).reshape(-1, 27)
    m4 = (m3[:, :, None] * d[:, None, :]).reshape(-1, 81)
    design = np.concatenate([np.ones((d.shape[0], 1)), m1, m2, m3, m4], axis=1)
    # may be reached first from inside a jit trace — force eager evaluation
    # of the closed form (omnistaging would otherwise stage it)
    with jax.ensure_compile_time_eval():
        target = np.asarray(
            jax.device_get(components_from_spherical_harmonics(levels, jnp.asarray(d)))
        ).astype(np.float64)
    c, *_ = np.linalg.lstsq(design.astype(np.float64), target, rcond=None)
    c = c.astype(np.float32)
    return (c[0:1], c[1:4], c[4:13], c[13:40], c[40:121])


def sh_encoding_dense(directions: jnp.ndarray, degree: int) -> jnp.ndarray:
    """SH via dense monomial outer products + small matmuls.

    Numerically equal to `sh_encoding` for unit directions (fit residual
    ~1e-7), but TPU-friendly: the closed form builds every component as a
    separate [N, 1] column, and on TPU each such column tiles to 128 lanes
    — 25 latency-bound padded ops per step (profiled ~8 ms). Here the
    monomials are four dense outer-product tensors and the basis change is
    four lane-friendly matmuls."""
    c0, c1, c2, c3, c4 = _sh_dense_coeffs(degree + 1)
    d = directions
    lead = d.shape[:-1]
    d = d.reshape(-1, 3)
    m2 = (d[:, :, None] * d[:, None, :]).reshape(-1, 9)
    m3 = (m2[:, :, None] * d[:, None, :]).reshape(-1, 27)
    m4 = (m3[:, :, None] * d[:, None, :]).reshape(-1, 81)
    out = (
        jnp.asarray(c0)[0]
        + d @ jnp.asarray(c1)
        + m2 @ jnp.asarray(c2)
        + m3 @ jnp.asarray(c3)
        + m4 @ jnp.asarray(c4)
    )
    return out.reshape(*lead, -1)


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
    dense: bool = False  # DenseGrid: require collision-free indexing at every
    # level (reference DenseEncoding, encodings.py:312-366)
    # "custom": memory-lean custom VJP (recomputes indices in backward) —
    #   reverse-mode only. "autodiff": plain XLA AD — supports jax.jvp, so
    #   forward-mode SDF gradients reuse (CSE) the primal gathers instead of
    #   paying 4 extra numerical-tap field evaluations.
    vjp_mode: str = "custom"
    # "rows": ONE [M, F] row gather for all feature columns (~1.5x higher
    #   row-issue rate, measured scripts/gather_study.py) at the cost of a
    #   lane-padded [M, F] intermediate; "flat": one 1-D element take per
    #   feature column with clean N-minor layouts throughout (round 1).
    gather_mode: str = "rows"

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


def _grid_geometry(x: jnp.ndarray, spec: HashGridSpec, num_levels: Optional[int] = None):
    """Vectorized corner indices + interpolation data for ALL levels.

    x: [N, 3] in [0,1]. Returns (idx [L, 8, N] int32 flat table indices,
    axis_fac [L, 8, 3, N] per-corner per-axis interp factors,
    offset [L, 3, N] raw fractional offsets).

    Layout note: arrays keep N in the minor (lane) dimension — a
    materialized last-dim-8 or last-dim-3 array tiles as (8, 128) on TPU and
    pads its minor dim to 128 (up to 16x HBM amplification); [.., 8, N] and
    [.., 3, N] shapes tile clean.
    """
    n_levels = min(num_levels, spec.num_levels) if num_levels is not None else spec.num_levels
    res_np = spec.resolutions[:n_levels]
    res = jnp.asarray(res_np, x.dtype)  # [L]
    x_t = x.T  # [3, N]
    scaled = res[:, None, None] * x_t[None]  # [L, 3, N]
    floor = jnp.floor(scaled)
    offset = scaled - floor  # [L, 3, N]
    base = floor.astype(jnp.int32)

    bits = jnp.asarray(_CORNERS, jnp.int32)  # [8, 3]
    cu = (base[:, None] + bits[None, :, :, None]).astype(jnp.uint32)  # [L, 8, 3, N]

    # hashed index (fine levels)
    hashed = cu[:, :, 0] * _HASH_PRIMES[0]
    hashed = jnp.bitwise_xor(hashed, cu[:, :, 1] * _HASH_PRIMES[1])
    hashed = jnp.bitwise_xor(hashed, cu[:, :, 2] * _HASH_PRIMES[2])
    hashed = hashed & np.uint32(spec.table_size - 1)  # [L, 8, N]

    # dense, collision-free index (coarse levels; Instant-NGP policy)
    res_i = res_np
    stride = jnp.asarray((res_i + 1).astype(np.uint32))[:, None, None]  # [L,1,1]
    dense = cu[:, :, 0] + cu[:, :, 1] * stride + cu[:, :, 2] * stride * stride

    dense_mask = (res_i.astype(np.int64) + 1) ** 3 <= spec.table_size  # [L] static
    if spec.dense and not dense_mask.all():
        bad = res_i[~dense_mask]
        raise ValueError(
            f"dense grid requested but levels with res {bad.tolist()} exceed "
            f"table size 2^{spec.log2_hashmap_size}; raise log2_hashmap_size"
        )
    idx = jnp.where(jnp.asarray(dense_mask)[:, None, None], dense, hashed)
    level_offsets = (
        jnp.arange(n_levels, dtype=jnp.uint32) * np.uint32(spec.table_size)
    )[:, None, None]
    idx = (idx + level_offsets).astype(jnp.int32)  # [L, 8, N]

    if spec.interpolation == "Smoothstep":
        w = offset * offset * (3.0 - 2.0 * offset)
    elif spec.interpolation == "Linear":
        w = offset
    elif spec.interpolation == "Nearest":
        w = jnp.round(offset)
    else:
        raise ValueError(f"unknown interpolation {spec.interpolation}")

    fbits = jnp.asarray(_CORNERS, x.dtype)[None, :, :, None]  # [1, 8, 3, 1]
    axis_fac = fbits * w[:, None] + (1.0 - fbits) * (1.0 - w[:, None])  # [L, 8, 3, N]
    return idx, axis_fac, offset


def _hash_lookup_impl(
    table: jnp.ndarray, x: jnp.ndarray, spec: HashGridSpec,
    num_levels: Optional[int] = None,
) -> jnp.ndarray:
    n = x.shape[0]
    # clamp: a sampler_levels truncation larger than the grid is a no-op
    k = min(num_levels, spec.num_levels) if num_levels is not None else spec.num_levels
    idx, axis_fac, _ = _grid_geometry(x, spec, k)
    cw = axis_fac[:, :, 0] * axis_fac[:, :, 1] * axis_fac[:, :, 2]  # [L, 8, N]
    flat_idx = idx.reshape(-1)  # [L*8*N]
    if spec.gather_mode == "rows":
        # ONE row gather for all feature columns: measured
        # (scripts/gather_study.py) a [M, F] row take sustains ~145-190M
        # rows/s on v5e vs ~120M rows/s per 1-D element take — the encode is
        # gather-issue-rate-bound, so this nearly halves its cost at F=2.
        feats = jnp.take(table, flat_idx, axis=0).reshape(*idx.shape, -1)  # [L, 8, N, F]
        out = jnp.sum(cw[..., None] * feats, axis=1)  # [L, N, F]
        out = out.transpose(1, 0, 2).reshape(n, k * spec.features_per_level)
    else:
        outs = []
        for f in range(spec.features_per_level):
            feats = jnp.take(table[:, f], flat_idx).reshape(idx.shape)  # [L, 8, N]
            outs.append(jnp.sum(cw * feats, axis=1))  # [L, N]
        out = jnp.stack(outs, axis=1)  # [L, F, N]
        out = out.transpose(2, 0, 1).reshape(n, k * spec.features_per_level)
    if k < spec.num_levels:
        # truncated query (coarse-only sampler path): zero-pad fine levels —
        # identical to the coarse-to-fine mask zeroing them
        out = jnp.pad(out, ((0, 0), (0, (spec.num_levels - k) * spec.features_per_level)))
    return out


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
    n = x.shape[0]
    nf = spec.features_per_level

    idx, axis_fac, offset = _grid_geometry(x, spec)  # recomputed, not stored
    cw = axis_fac[:, :, 0] * axis_fac[:, :, 1] * axis_fac[:, :, 2]  # [L, 8, N]
    flat_idx = idx.reshape(-1)

    g_lfn = g.reshape(n, spec.num_levels, nf).transpose(1, 2, 0)  # [L, F, N]

    if spec.gather_mode == "rows":
        # HYBRID backward (measured, scripts/encode_ab.py): the [M, F] row
        # gather is ~2x faster than per-feature 1-D takes, but the [M, F] row
        # SCATTER is ~3x slower than per-feature 1-D scatter-adds — so gather
        # rows, scatter per feature column.
        feats = jnp.take(table, flat_idx, axis=0).reshape(*idx.shape, nf)  # [L,8,N,F]
        fg = jnp.einsum("lcnf,lfn->lcn", feats, g_lfn)
        cols = []
        for f in range(nf):
            updates = cw * g_lfn[:, f][:, None, :]  # [L, 8, N]
            cols.append(
                jnp.zeros((table.shape[0],), table.dtype).at[flat_idx].add(
                    updates.reshape(-1)
                )
            )
        d_table = jnp.stack(cols, axis=-1)  # [L*T, F]
    else:
        # one flat scatter-add per feature column
        cols = []
        fg = jnp.zeros_like(cw)  # sum_f feats_f * g_f, for the position grad
        for f in range(nf):
            updates = cw * g_lfn[:, f][:, None, :]  # [L, 8, N]
            col = jnp.zeros((table.shape[0],), table.dtype).at[flat_idx].add(
                updates.reshape(-1)
            )
            cols.append(col)
            feats = jnp.take(table[:, f], flat_idx).reshape(idx.shape)
            fg = fg + feats * g_lfn[:, f][:, None, :]
        d_table = jnp.stack(cols, axis=-1)  # [L*T, F]

    # ---- position gradient: d cw/d w_d = sign_d * prod of other axis factors
    signs = (2.0 * jnp.asarray(_CORNERS, x.dtype) - 1.0)[None, :, :, None]  # [1,8,3,1]
    partial = jnp.stack(
        [
            axis_fac[:, :, 1] * axis_fac[:, :, 2],
            axis_fac[:, :, 0] * axis_fac[:, :, 2],
            axis_fac[:, :, 0] * axis_fac[:, :, 1],
        ],
        axis=2,
    )  # [L, 8, 3, N]
    dw = jnp.sum(fg[:, :, None, :] * signs * partial, axis=1)  # [L, 3, N]

    if spec.interpolation == "Smoothstep":
        dw_doff = 6.0 * offset * (1.0 - offset)
    elif spec.interpolation == "Linear":
        dw_doff = jnp.ones_like(offset)
    else:  # Nearest
        dw_doff = jnp.zeros_like(offset)
    res = jnp.asarray(spec.resolutions, x.dtype)[:, None, None]
    d_x = jnp.sum(dw * dw_doff * res, axis=0).T  # [N, 3]

    return d_table, d_x


_hash_lookup_vjp.defvjp(_hash_lookup_fwd, _hash_lookup_bwd)


def hash_grid_lookup(
    table: jnp.ndarray, x: jnp.ndarray, spec: HashGridSpec,
    num_levels: Optional[int] = None,
) -> jnp.ndarray:
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
    if spec.vjp_mode == "autodiff" or num_levels is not None:
        # plain XLA AD under remat: jax.jvp-compatible (forward-mode SDF
        # gradients CSE their primal gathers with the value computation),
        # and reverse-mode residuals stay (table, x) instead of the [L, 8, N]
        # index/weight intermediates.
        # Formulation: XLA transposes a [M, F] row gather into a [M, F] row
        # scatter, which is ~3x slower than per-feature 1-D scatters
        # (scripts/encode_ab.py) — so differentiated autodiff lookups use the
        # 'flat' formulation, while num_levels-truncated sampler queries
        # (evaluation-only: importance bins are detached) keep the ~2x-faster
        # 'rows' gather.
        mode = "rows" if (num_levels is not None and spec.vjp_mode != "autodiff") \
            else "flat"
        spec_q = dataclasses.replace(spec, gather_mode=mode)
        fn = jax.checkpoint(lambda t, q: _hash_lookup_impl(t, q, spec_q, num_levels))
        return fn(table, x)
    return _hash_lookup_vjp(table, x, spec)


class HashEncoding(nn.Module):
    """Flax module owning the hash table parameters.

    Table init: uniform in [-scale, scale] as in the reference fallback
    (encodings.py:230-233).
    """

    spec: HashGridSpec

    @nn.compact
    def __call__(self, x: jnp.ndarray, num_levels: Optional[int] = None) -> jnp.ndarray:
        spec = self.spec

        def init(key, shape, dtype=jnp.float32):
            return (
                jax.random.uniform(key, shape, dtype, minval=-1.0, maxval=1.0)
                * spec.hash_init_scale
            )

        table = self.param(
            "table", init, (spec.num_levels * spec.table_size, spec.features_per_level)
        )
        return hash_grid_lookup(table, x, spec, num_levels)
