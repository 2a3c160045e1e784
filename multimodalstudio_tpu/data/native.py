"""Loader for the optional native (C++) host data-path extension.

`native/mms_native.cpp` provides threaded pixel-batch sampling and uint16
frame normalization for the host data path (counterpart of the reference's
threaded CacheDataloader, src/data/dataloaders.py:137-162). Falls back to
numpy when unbuilt. Build with:

    cd native && python setup.py build_ext --inplace
"""

from __future__ import annotations

import glob
import os
import sys
from typing import Optional

import numpy as np

_native = None


def _load():
    global _native
    if _native is not None:
        return _native
    root = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")
    for path in glob.glob(os.path.join(root, "_mms_native*.so")) + glob.glob(
        os.path.join(root, "**", "_mms_native*.so"), recursive=True
    ):
        sys.path.insert(0, os.path.dirname(path))
        try:
            import _mms_native  # noqa: F401

            _native = _mms_native
            return _native
        except ImportError:
            pass
        finally:
            sys.path.pop(0)
    _native = False
    return _native


def available() -> bool:
    return bool(_load())


def sample_pixels(
    images: np.ndarray,
    mosaick_mask: Optional[np.ndarray],
    n: int,
    seed: int,
    pixel_offset: float = 0.5,
    threads: int = 0,
):
    """Threaded uniform (frame, y, x) sampling + pixel gather.

    Returns (frame_idx [n] int32, coords [n,2] float32, pixels [n,C] float32,
    channels [n] int32). Falls back to numpy when the extension is absent.
    """
    native = _load()
    if native:
        threads = threads or (os.cpu_count() or 1)
        fi_b, co_b, px_b, ch_b = native.sample_pixels(
            np.ascontiguousarray(images, np.float32),
            None if mosaick_mask is None else np.ascontiguousarray(mosaick_mask, np.int8),
            int(n), int(seed), int(threads), float(pixel_offset),
        )
        c = images.shape[-1]
        return (
            np.frombuffer(fi_b, np.int32),
            np.frombuffer(co_b, np.float32).reshape(n, 2),
            np.frombuffer(px_b, np.float32).reshape(n, c),
            np.frombuffer(ch_b, np.int32),
        )

    rng = np.random.default_rng(seed)
    f, h, w, _ = images.shape
    fi = rng.integers(0, f, n).astype(np.int32)
    yi = rng.integers(0, h, n)
    xi = rng.integers(0, w, n)
    coords = np.stack([yi, xi], -1).astype(np.float32) + pixel_offset
    pixels = images[fi, yi, xi]
    chan = (
        mosaick_mask[yi, xi].astype(np.int32)
        if mosaick_mask is not None
        else np.zeros(n, np.int32)
    )
    return fi, coords, pixels, chan


def normalize_u16(frames: np.ndarray, threads: int = 0) -> np.ndarray:
    """uint16 -> float32 in [0,1], threaded when the extension is present."""
    native = _load()
    if native:
        threads = threads or (os.cpu_count() or 1)
        out = native.normalize_u16(np.ascontiguousarray(frames, np.uint16), int(threads))
        return np.frombuffer(out, np.float32).reshape(frames.shape)
    return frames.astype(np.float32) / 65535.0
