"""Ray samplers: spaced (uniform / linear-disparity), PDF, and NeuS hierarchical.

TPU-native counterparts of reference src/model_components/ray_samplers.py.
Everything is static-shape: the NeuS upsampling rounds are unrolled (fixed
trip count), bin merging is an argsort + gather that also carries cached SDF
values (the reference's sorted_index trick, ray_samplers.py:480-511), and the
inverse-CDF lookup is a comparison-sum instead of searchsorted — an [N, K, S]
elementwise reduce that maps cleanly onto the VPU.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from multimodalstudio_tpu.core.rays import (
    RayBundle,
    RaySamples,
    samples_from_bins,
    weights_from_alphas,
)


@dataclasses.dataclass(frozen=True)
class SpacedSamplerSpec:
    """Reference SamplerConfig (ray_samplers.py:71-82)."""

    num_samples: int = 32
    train_stratified: bool = True
    single_jitter: bool = False
    spacing: str = "uniform"  # uniform | lin_disparity


@dataclasses.dataclass(frozen=True)
class NeuSSamplerSpec:
    """Reference NeuSSamplerConfig (ray_samplers.py:108-120)."""

    num_samples: int = 32
    num_samples_importance: int = 64
    num_upsample_steps: int = 4
    base_variance: float = 64.0
    train_stratified: bool = True
    single_jitter: bool = True


def _spacing_fns(spacing: str):
    if spacing == "uniform":
        return (lambda x: x), (lambda x: x)
    if spacing == "lin_disparity":
        return (lambda x: 1.0 / x), (lambda x: 1.0 / x)
    raise ValueError(f"unknown spacing {spacing}")


def spacing_to_euclidean(
    spacing_bins: jnp.ndarray, nears: jnp.ndarray, fars: jnp.ndarray, spacing: str
) -> jnp.ndarray:
    """Map normalized [0, 1] bins to euclidean depth (ray_samplers.py:178-181)."""
    fn, fn_inv = _spacing_fns(spacing)
    s_near, s_far = fn(nears), fn(fars)
    return fn_inv(s_far * spacing_bins + s_near * (1.0 - spacing_bins))


def _stratify_bins(
    bins: jnp.ndarray, rng: jax.Array, num_rays: int, single_jitter: bool
) -> jnp.ndarray:
    """Jitter [S+1] bin edges within half-bin neighborhoods
    (ray_samplers.py:212-220)."""
    num_edges = bins.shape[-1]
    shape = (num_rays, 1) if single_jitter else (num_rays, num_edges)
    t_rand = jax.random.uniform(rng, shape, dtype=bins.dtype)
    centers = (bins[..., 1:] + bins[..., :-1]) / 2.0
    upper = jnp.concatenate([centers, bins[..., -1:]], -1)
    lower = jnp.concatenate([bins[..., :1], centers], -1)
    return lower + (upper - lower) * t_rand


def spaced_sampling(
    rays: RayBundle,
    spec: SpacedSamplerSpec,
    rng: jax.Array | None,
    train: bool,
    num_samples: int | None = None,
) -> RaySamples:
    """Stratified sampling through a spacing function
    (reference ray_samplers.py:183-233)."""
    ns = num_samples or spec.num_samples
    n = rays.num_rays
    bins = jnp.linspace(0.0, 1.0, ns + 1)[None, :]  # [1, S+1]
    if train and spec.train_stratified and rng is not None:
        bins = _stratify_bins(bins, rng, n, spec.single_jitter)
    else:
        bins = jnp.broadcast_to(bins, (n, ns + 1))
    euclid = spacing_to_euclidean(bins, rays.nears, rays.fars, spec.spacing)
    return samples_from_bins(rays, euclid, bins)


def pdf_sample_bins(
    existing_bins: jnp.ndarray,
    weights: jnp.ndarray,
    num_samples: int,
    rng: jax.Array | None,
    train: bool,
    stratified: bool = True,
    single_jitter: bool = True,
    histogram_padding: float = 0.01,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Inverse-CDF sampling of new spacing-bin edges.

    existing_bins: [N, S+1] normalized edges; weights: [N, S].
    Returns [N, num_samples+1] new edges (reference PDFSampler,
    ray_samplers.py:316-422, include_original=False path).
    """
    num_bins = num_samples + 1
    w = weights + histogram_padding
    w_sum = jnp.sum(w, axis=-1, keepdims=True)
    padding = jax.nn.relu(eps - w_sum)
    w = w + padding / w.shape[-1]
    w_sum = w_sum + padding

    pdf = w / w_sum
    cdf = jnp.minimum(jnp.ones_like(pdf), jnp.cumsum(pdf, axis=-1))
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N, S+1]

    u_base = jnp.linspace(0.0, 1.0 - 1.0 / num_bins, num_bins)  # [K]
    if train and stratified and rng is not None:
        shape = (cdf.shape[0], 1) if single_jitter else (cdf.shape[0], num_bins)
        rand = jax.random.uniform(rng, shape) / num_bins
        u = u_base[None, :] + rand
    else:
        u = jnp.broadcast_to(u_base + 1.0 / (2 * num_bins), (cdf.shape[0], num_bins))

    # searchsorted + the 4 boundary lookups, gather-free: cdf and bins are
    # both ASCENDING per row, so `x[below]` is a masked max and `x[above]`
    # a masked min over the same comparison tensor. Gathers here are
    # latency-bound (16 x ~0.6 ms for 276 KB each, profiled); these masked
    # reductions fuse into two [N, K, S+1] sweeps.
    cmp = u[:, :, None] >= cdf[:, None, :]  # [N, K, S+1]; cmp[..., 0] always True
    big = jnp.float32(1e10)
    cdf_g0 = jnp.max(jnp.where(cmp, cdf[:, None, :], -big), axis=-1)
    bins_g0 = jnp.max(jnp.where(cmp, existing_bins[:, None, :], -big), axis=-1)
    # u < cdf[..., -1] *almost* always: cdf[-1] = min(1, cumsum) can round
    # below 1 in f32 while stratified u approaches 1, leaving ~cmp empty and
    # the mins at the +big sentinel. Clamp to the row's last entry, restoring
    # the old take_along_axis clamp semantics (denom <= 0 -> t = 0).
    cdf_g1 = jnp.min(jnp.where(cmp, big, cdf[:, None, :]), axis=-1)
    bins_g1 = jnp.min(jnp.where(cmp, big, existing_bins[:, None, :]), axis=-1)
    cdf_g1 = jnp.minimum(cdf_g1, cdf[:, -1:])
    bins_g1 = jnp.minimum(bins_g1, existing_bins[:, -1:])

    denom = cdf_g1 - cdf_g0
    t = jnp.clip(jnp.nan_to_num(jnp.where(denom > 0, (u - cdf_g0) / denom, 0.0)), 0.0, 1.0)
    new_bins = bins_g0 + t * (bins_g1 - bins_g0)
    return jax.lax.stop_gradient(new_bins)


def merge_sorted(a: jnp.ndarray, b: jnp.ndarray, *value_pairs):
    """Merge two per-row SORTED lists without sorting.

    a: [N, Sa], b: [N, Sb] (each row ascending). Rank computation by
    comparison counting (stable: ties keep a before b, matching argsort of
    concat([a, b])), then a one-hot matmul places values — no XLA sort,
    gather or scatter (TPU sorts cost hundreds of ms at these shapes).

    value_pairs: optional (va [N, Sa], vb [N, Sb]) carried through with the
    same permutation (the reference's sorted-index sdf merge,
    ray_samplers.py:486-489).

    Returns (merged [N, Sa+Sb], *merged_values).
    """
    n, sa = a.shape
    sb = b.shape[1]
    rank_a = jnp.arange(sa)[None] + jnp.sum(b[:, None, :] < a[:, :, None], axis=-1)
    rank_b = jnp.arange(sb)[None] + jnp.sum(a[:, None, :] <= b[:, :, None], axis=-1)
    k = jnp.arange(sa + sb)
    oh_a = (rank_a[:, :, None] == k).astype(a.dtype)  # [N, Sa, S]
    oh_b = (rank_b[:, :, None] == k).astype(a.dtype)  # [N, Sb, S]

    def place(va, vb):
        # pin f32 contract precision: bin POSITIONS ride this matmul, and the
        # global default is bf16 on the TPU flagships (configs/methods.py) —
        # a bf16-rounded one-hot placement would quantize sample depths ~0.4%
        with jax.default_matmul_precision("float32"):
            return jnp.einsum("ns,nsk->nk", va, oh_a) + jnp.einsum("ns,nsk->nk", vb, oh_b)

    out = [place(a, b)]
    for va, vb in value_pairs:
        out.append(place(va, vb))
    return tuple(out) if len(out) > 1 else out[0]


def rendering_sdf_with_fixed_inv_s(
    euclid_bins: jnp.ndarray, sdf: jnp.ndarray, inv_s: float
) -> jnp.ndarray:
    """NeuS section-alpha at a fixed inverse variance (ray_samplers.py:516-551).

    euclid_bins: [N, S+1] euclidean edges (sdf evaluated at the first S edges).
    sdf: [N, S]. Returns alphas [N, S-1].
    """
    prev_sdf = sdf[:, :-1]
    next_sdf = sdf[:, 1:]
    deltas = euclid_bins[:, 1:] - euclid_bins[:, :-1]  # [N, S]
    deltas = deltas[:, :-1]  # [N, S-1], matches ray_samples.deltas[:, :-1]
    mid_sdf = (prev_sdf + next_sdf) * 0.5
    cos_val = (next_sdf - prev_sdf) / (deltas + 1e-5)

    # min(prev_cos, cos) stabilization (ray_samplers.py:539-542)
    prev_cos = jnp.concatenate([jnp.zeros_like(cos_val[:, :1]), cos_val[:, :-1]], axis=-1)
    cos_val = jnp.minimum(prev_cos, cos_val)
    cos_val = jnp.clip(cos_val, -1e3, 0.0)

    prev_esti = mid_sdf - cos_val * deltas * 0.5
    next_esti = mid_sdf + cos_val * deltas * 0.5
    prev_cdf = jax.nn.sigmoid(prev_esti * inv_s)
    next_cdf = jax.nn.sigmoid(next_esti * inv_s)
    return (prev_cdf - next_cdf + 1e-5) / (prev_cdf + 1e-5)


def neus_sampling(
    rays: RayBundle,
    sdf_fn: Callable[[jnp.ndarray], jnp.ndarray],
    spec: NeuSSamplerSpec,
    rng: jax.Array | None,
    train: bool,
) -> RaySamples:
    """NeuS hierarchical sampling (reference NeuSSampler, ray_samplers.py:424-514).

    sdf_fn maps positions [N, S, 3] -> sdf [N, S] and is evaluated without
    gradient flow (bins are stop_gradient'ed, matching the reference's
    detached bins + no_grad SDF queries).

    The upsample rounds are unrolled; round i evaluates SDF only at the
    newly drawn samples and merges cached values through the bin argsort.
    """
    n_steps = spec.num_upsample_steps
    n_per_round = spec.num_samples_importance // n_steps

    rng_uniform, *rng_rounds = (
        jax.random.split(rng, n_steps + 1) if rng is not None else [None] * (n_steps + 1)
    )

    uniform = spaced_sampling(
        rays,
        SpacedSamplerSpec(
            num_samples=spec.num_samples,
            train_stratified=spec.train_stratified,
            single_jitter=spec.single_jitter,
            spacing="uniform",
        ),
        rng_uniform,
        train,
    )

    bins = jnp.concatenate([uniform.spacing_starts, uniform.spacing_ends[:, -1:]], axis=-1)
    bins = jax.lax.stop_gradient(bins)
    euclid = spacing_to_euclidean(bins, rays.nears, rays.fars, "uniform")

    def eval_sdf_at(spacing_starts: jnp.ndarray) -> jnp.ndarray:
        e = spacing_to_euclidean(spacing_starts, rays.nears, rays.fars, "uniform")
        pos = rays.origins[:, None, :] + rays.directions[:, None, :] * e[..., None]
        return jax.lax.stop_gradient(sdf_fn(pos))

    sdf = eval_sdf_at(bins[:, :-1])  # [N, S]

    for i in range(n_steps):
        alphas = rendering_sdf_with_fixed_inv_s(
            euclid, sdf, inv_s=spec.base_variance * 2.0**i
        )  # [N, S-1]
        weights = weights_from_alphas(alphas)
        weights = jnp.concatenate([weights, jnp.zeros_like(weights[:, :1])], axis=-1)  # [N, S]

        new_edges = pdf_sample_bins(
            bins,
            weights,
            n_per_round,
            rng_rounds[i],
            train,
            stratified=spec.train_stratified,
            single_jitter=spec.single_jitter,
            histogram_padding=1e-5,
        )  # [N, n_per_round+1]
        new_starts = new_edges[:, :-1]  # [N, n_per_round]
        end = jnp.maximum(bins[:, -1:], new_edges[:, -1:])

        if i < n_steps - 1:
            new_sdf = eval_sdf_at(new_starts)
            sorted_starts, sdf = merge_sorted(
                bins[:, :-1], new_starts, (sdf, new_sdf)
            )
        else:
            sorted_starts = merge_sorted(bins[:, :-1], new_starts)
        bins = jnp.concatenate([sorted_starts, end], axis=-1)
        euclid = spacing_to_euclidean(bins, rays.nears, rays.fars, "uniform")

    return samples_from_bins(rays, euclid, bins)
