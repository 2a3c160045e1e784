"""LPIPS perceptual metric in JAX (AlexNet variant).

TPU-native port of the paper-protocol metric the reference scores with
(`/root/reference/scripts/evaluate_average_metrics.py:173-191`, which calls
the `lpips` package's `LPIPS(net='alex')`). The architecture is implemented
here exactly — input scaling layer, the 5-stage AlexNet feature trunk,
channel unit-normalization, non-negative 1x1 linear heads on squared
feature differences, spatial mean, layer sum (Zhang et al., CVPR 2018,
"The Unreasonable Effectiveness of Deep Features as a Perceptual Metric").

Weights: this environment has no network egress and ships no pretrained
checkpoints, so trained AlexNet/linear weights cannot be downloaded.
Resolution order:

1. `lpips_weights.npz` next to this file (produced by
   `scripts/vendor_lpips_weights.py` from the official torch checkpoints on
   a machine that has them) -> the paper-faithful metric.
2. Deterministic random-init fallback (fixed seed, He-normal convs, uniform
   averaging heads). Zhang et al. SS3/Table 5 validate untrained nets as
   perceptual metrics (random AlexNet scores well above per-pixel metrics
   on 2AFC, below trained). Scores are comparable ACROSS renders evaluated
   with the same weights — which is how the paper table uses the column —
   but are not numerically interchangeable with trained-LPIPS values, so
   every consumer reports the weight source (`LPIPS_WEIGHT_SOURCE`).

Inputs follow the lpips-package convention: NHWC float arrays in [-1, 1],
3 channels. `lpips()` returns one scalar per batch element.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

# (out_ch, kernel, stride, pad) per AlexNet conv stage; maxpool 3x3/2
# between stages 1-2, 2-3 (torchvision AlexNet.features layout).
_ALEX = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
_POOL_AFTER = (0, 1)  # maxpool follows these conv indices
_CHANNELS = tuple(c for c, _, _, _ in _ALEX)

# Input scaling layer constants (published in the LPIPS reference
# implementation; they whiten [-1,1] RGB with ImageNet statistics).
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

_WEIGHTS_FILE = os.path.join(os.path.dirname(__file__), "lpips_weights.npz")


def _rand_params(seed: int = 0) -> dict:
    """Deterministic untrained-AlexNet LPIPS parameters.

    He-normal conv kernels (the init the trunk would be trained from) and
    uniform non-negative averaging heads (w_l = 1/C_l), so the metric is a
    mean over unit-normalized random-feature channels.
    """
    rng = np.random.RandomState(seed)
    params = {"source": "randinit"}
    c_in = 3
    for i, (c_out, k, _, _) in enumerate(_ALEX):
        fan_in = c_in * k * k
        params[f"conv{i}_w"] = (
            rng.standard_normal((k, k, c_in, c_out)) * np.sqrt(2.0 / fan_in)
        ).astype(np.float32)
        params[f"conv{i}_b"] = np.zeros((c_out,), np.float32)
        params[f"lin{i}_w"] = np.full((c_out,), 1.0 / c_out, np.float32)
        c_in = c_out
    return params


@functools.lru_cache(maxsize=1)
def load_params() -> dict:
    """Load vendored trained weights if present, else the rand-init set."""
    if os.path.exists(_WEIGHTS_FILE):
        with np.load(_WEIGHTS_FILE) as z:
            params = {k: z[k] for k in z.files}
        params["source"] = "trained"
        return params
    return _rand_params()


def weight_source() -> str:
    """'trained' (vendored official weights) or 'randinit' (fallback)."""
    return load_params()["source"]


def _features(params: dict, x: jnp.ndarray) -> list[jnp.ndarray]:
    """AlexNet relu1_1..relu5 feature maps for NHWC input in [-1, 1]."""
    x = (x - _SHIFT) / _SCALE
    feats = []
    for i, (_, _, stride, pad) in enumerate(_ALEX):
        x = jax.lax.conv_general_dilated(
            x,
            jnp.asarray(params[f"conv{i}_w"]),
            window_strides=(stride, stride),
            padding=((pad, pad), (pad, pad)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(params[f"conv{i}_b"])
        x = jax.nn.relu(x)
        feats.append(x)
        if i in _POOL_AFTER:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 3, 3, 1),
                window_strides=(1, 2, 2, 1),
                padding="VALID",
            )
    return feats


def _unit_normalize(f: jnp.ndarray) -> jnp.ndarray:
    return f * jax.lax.rsqrt(jnp.sum(f * f, axis=-1, keepdims=True) + 1e-10)


@functools.partial(jax.jit, static_argnames=())
def _lpips_jit(params_arrays: tuple, x0: jnp.ndarray, x1: jnp.ndarray):
    params = {}
    idx = 0
    for i in range(len(_ALEX)):
        params[f"conv{i}_w"] = params_arrays[idx]; idx += 1
        params[f"conv{i}_b"] = params_arrays[idx]; idx += 1
        params[f"lin{i}_w"] = params_arrays[idx]; idx += 1
    f0, f1 = _features(params, x0), _features(params, x1)
    total = jnp.zeros((x0.shape[0],), jnp.float32)
    for i, (a, b) in enumerate(zip(f0, f1)):
        d = _unit_normalize(a) - _unit_normalize(b)
        w = jnp.asarray(params[f"lin{i}_w"])
        # non-negative 1x1 head on squared differences, spatial mean
        total = total + jnp.mean(jnp.sum(d * d * w, axis=-1), axis=(1, 2))
    return total


def lpips(x0, x1, params: dict | None = None) -> jnp.ndarray:
    """LPIPS distance per batch element.

    x0, x1: [N, H, W, 3] (or [H, W, 3]) in [-1, 1]. H, W >= 32.
    """
    if params is None:
        params = load_params()
    x0 = jnp.asarray(x0, jnp.float32)
    x1 = jnp.asarray(x1, jnp.float32)
    if x0.ndim == 3:
        x0, x1 = x0[None], x1[None]
    arrays = []
    for i in range(len(_ALEX)):
        arrays += [
            jnp.asarray(params[f"conv{i}_w"]),
            jnp.asarray(params[f"conv{i}_b"]),
            jnp.maximum(jnp.asarray(params[f"lin{i}_w"]), 0.0),
        ]
    return _lpips_jit(tuple(arrays), x0, x1)
