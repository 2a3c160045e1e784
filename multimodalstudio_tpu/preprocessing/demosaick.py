"""Demosaicking for Bayer, polarization and multispectral mosaicks.

Host-side CPU tools (cv2/numpy), counterpart of reference
src/preprocessing/preprocess_mmsdata.py:30-48 and the SILIOS CMS-C1
multispectral demosaicking at src/preprocessing/utils.py:215-253.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def demosaick_bayer(raw: np.ndarray, pattern: str = "RGGB") -> np.ndarray:
    """Bayer -> RGB via OpenCV edge-aware demosaicing."""
    import cv2

    codes = {
        "RGGB": cv2.COLOR_BayerBG2RGB,
        "BGGR": cv2.COLOR_BayerRG2RGB,
        "GRBG": cv2.COLOR_BayerGB2RGB,
        "GBRG": cv2.COLOR_BayerGR2RGB,
    }
    raw2 = raw[..., 0] if raw.ndim == 3 else raw
    return cv2.demosaicing(raw2, codes[pattern])


def demosaick_polarization(raw: np.ndarray) -> np.ndarray:
    """2x2 polarizer-filter array (0/45/90/135 deg) -> [H/1, W/1, 4] by
    per-channel bilinear interpolation of each sub-mosaic."""
    pattern = np.array([[0, 1], [3, 2]])
    return demosaick_grid(raw, pattern)


def demosaick_multispectral(raw: np.ndarray, bands: int = 9) -> np.ndarray:
    """3x3 multispectral filter array -> [H, W, 9] by per-channel grid
    interpolation (reference utils.py:215-253)."""
    side = int(np.sqrt(bands))
    pattern = np.arange(bands).reshape(side, side)
    return demosaick_grid(raw, pattern)


def demosaick_grid(raw: np.ndarray, pattern: np.ndarray) -> np.ndarray:
    """Generic mosaick demosaicking: for each channel, collect its sparse
    sample grid and bilinearly resize back to full frame."""
    import cv2

    raw2 = raw[..., 0] if raw.ndim == 3 else raw
    h, w = raw2.shape
    ph, pw = pattern.shape
    channels = int(pattern.max()) + 1
    out = np.zeros((h, w, channels), dtype=np.float32)
    for c in range(channels):
        ys, xs = np.nonzero(pattern == c)
        # a channel may appear multiple times in the pattern (e.g. G in RGGB):
        # average the subsampled grids
        acc = np.zeros((h, w), np.float32)
        for y0, x0 in zip(ys, xs):
            sub = raw2[y0::ph, x0::pw].astype(np.float32)
            up = cv2.resize(sub, (w, h), interpolation=cv2.INTER_LINEAR)
            acc += up
        out[..., c] = acc / len(ys)
    return out


def mosaick(frame: np.ndarray, pattern: np.ndarray) -> np.ndarray:
    """Full-channel frame -> single-channel mosaicked frame (the inverse
    operation, used to synthesize raw data and in the raw evaluator)."""
    from multimodalstudio_tpu.data.dataset import build_mosaick_mask

    h, w = frame.shape[:2]
    mask = build_mosaick_mask(pattern, h, w).astype(np.int64)
    return np.take_along_axis(frame, mask[..., None], axis=-1)[..., :1]
