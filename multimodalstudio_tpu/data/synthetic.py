"""Synthetic multimodal scene generator for tests and benchmarks.

The reference ships no tests and relies on MMS-DATA captures; this module
provides an analytic stand-in: a lambertian sphere inside the unit ROI with a
direction-dependent background, rendered in all five modalities (RGB, mono,
NIR, polarization, multispectral), optionally mosaicked to raw frames. It can
also write a scene to disk in the reference's meta_data.json layout
(reference src/preprocessing/utils.py:437-571) to exercise the parser.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from multimodalstudio_tpu.cameras.cameras import PERSPECTIVE, Cameras
from multimodalstudio_tpu.core.scene_box import SceneBox
from multimodalstudio_tpu.data.dataset import (
    MMSDataset,
    ModalityData,
    build_masks_across_modalities,
    build_mosaick_mask,
)

MOSAICK_PATTERNS = {
    "rgb": np.array([[1, 2], [0, 1]]),  # RGGB-like (reference README: [[1,2],[0,1]])
    "mono": np.array([[0]]),
    "infrared": np.array([[0]]),
    "polarization": np.array([[0, 1], [3, 2]]),
    "multispectral": np.arange(9).reshape(3, 3),
}

CHANNELS = {"rgb": 3, "mono": 1, "infrared": 1, "polarization": 4, "multispectral": 9}

_LIGHT = np.array([0.4, 0.5, 0.7]) / np.linalg.norm([0.4, 0.5, 0.7])
_SPHERE_RADIUS = 0.5


def _look_at(position: np.ndarray, target: np.ndarray, up=np.array([0.0, 0.0, 1.0])):
    """c2w [3,4] with -Z forward, +Y up (the ray-generation convention)."""
    forward = target - position
    forward = forward / np.linalg.norm(forward)
    z = -forward
    x = np.cross(up, z)
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    return np.concatenate([np.stack([x, y, z], axis=-1), position[:, None]], axis=-1)


def _shade(points: np.ndarray, normals: np.ndarray, mod: str,
           tex_freq: float = 6.0) -> np.ndarray:
    """Analytic per-modality appearance on the sphere surface.

    `tex_freq` sets the albedo band frequency — the capacity stress knob
    (VERDICT r3 #4): at 6.0 the sphere carries ~1 texture period (any table
    resolves it); at 40+ the appearance has sub-centimeter detail that only
    a high-capacity feature table can represent.
    """
    lam = np.clip(normals @ _LIGHT, 0.0, 1.0)
    # spatially varying albedo so texture is learnable; the second
    # (incommensurate, rotated) band keeps the pattern from aliasing into
    # a low-frequency moiré that an undersized table could still fit
    tex = 0.5 + 0.5 * np.sin(tex_freq * points[..., 0]) * np.cos(tex_freq * points[..., 1])
    if tex_freq > 6.0:
        tex = 0.5 * tex + 0.25 + 0.25 * np.sin(
            tex_freq * 0.7071 * (points[..., 1] + points[..., 2]) + 1.3
        )
    base = 0.15 + 0.75 * lam * tex
    if mod == "rgb":
        return np.stack([base, base * 0.8 + 0.1, base * 0.6 + 0.2], axis=-1)
    if mod == "mono":
        return base[..., None]
    if mod == "infrared":
        return (0.3 + 0.6 * lam)[..., None]
    if mod == "multispectral":
        ramps = np.linspace(0.4, 1.0, 9)
        return base[..., None] * ramps
    if mod == "polarization":
        s0 = base
        dop = 0.3 * (1.0 - lam)
        psi = np.arctan2(normals[..., 1], normals[..., 0])
        s1 = s0 * dop * np.cos(2 * psi)
        s2 = s0 * dop * np.sin(2 * psi)
        rows = 0.5 * np.array([[1, 1, 0], [1, 0, 1], [1, -1, 0], [1, 0, -1]], dtype=np.float64)
        stokes = np.stack([s0, s1, s2], axis=-1)
        return np.clip(stokes @ rows.T, 0.0, 1.0)
    raise ValueError(mod)


def _background(dirs: np.ndarray, mod: str) -> np.ndarray:
    g = 0.5 + 0.3 * dirs[..., 2] + 0.1 * dirs[..., 0]
    c = CHANNELS[mod]
    scale = np.linspace(0.9, 1.1, c) if c > 1 else np.array([1.0])
    return np.clip(g[..., None] * scale, 0.0, 1.0)


def render_view(c2w: np.ndarray, fx: float, fy: float, cx: float, cy: float,
                height: int, width: int, mod: str,
                tex_freq: float = 6.0) -> np.ndarray:
    """Analytically ray-trace one view of the synthetic scene."""
    ys, xs = np.meshgrid(np.arange(height) + 0.5, np.arange(width) + 0.5, indexing="ij")
    cam_dirs = np.stack([(xs - cx) / fx, -(ys - cy) / fy, -np.ones_like(xs)], axis=-1)
    dirs = cam_dirs @ c2w[:3, :3].T
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    origin = c2w[:3, 3]

    oc = origin[None, None, :]
    b = np.sum(dirs * oc, axis=-1)
    c_ = np.sum(oc * oc, axis=-1) - _SPHERE_RADIUS**2
    disc = b * b - c_
    hit = disc > 0
    t = -b - np.sqrt(np.maximum(disc, 0.0))
    hit &= t > 0

    points = oc + t[..., None] * dirs
    normals = points / _SPHERE_RADIUS
    fg = _shade(points, normals, mod, tex_freq)
    bg = _background(dirs, mod)
    return np.where(hit[..., None], fg, bg).astype(np.float32)


def make_synthetic_dataset(
    modalities: Sequence[str] = ("rgb",),
    num_views: int = 8,
    height: int = 64,
    width: int = 64,
    raw: bool = False,
    view_ids: Optional[Sequence[int]] = None,
    tex_freq: float = 6.0,
) -> MMSDataset:
    """Build an in-memory MMSDataset of the analytic scene."""
    view_ids = list(view_ids) if view_ids is not None else list(range(num_views))
    fx = fy = 1.2 * width
    cx, cy = width / 2.0, height / 2.0

    data: Dict[str, ModalityData] = {}
    for mod in modalities:
        images, c2ws = [], []
        for vid in view_ids:
            angle = 2 * np.pi * vid / max(num_views, 1)
            pos = np.array(
                [2.5 * np.cos(angle), 2.5 * np.sin(angle), 1.0 + 0.3 * np.sin(2 * angle)]
            )
            c2w = _look_at(pos, np.zeros(3))
            img = render_view(c2w, fx, fy, cx, cy, height, width, mod,
                              tex_freq=tex_freq)
            if raw:
                mask = build_mosaick_mask(MOSAICK_PATTERNS[mod], height, width)
                img = np.take_along_axis(img, mask[..., None].astype(np.int64), axis=-1)[..., :1]
            images.append(img)
            c2ws.append(c2w.astype(np.float32))

        n = len(view_ids)
        cameras = Cameras(
            fx=jnp.full((n,), fx),
            fy=jnp.full((n,), fy),
            cx=jnp.full((n,), cx),
            cy=jnp.full((n,), cy),
            camera_to_worlds=jnp.asarray(np.stack(c2ws)),
            distortion_params=None,
            width=width,
            height=height,
            pixel_offset=0.5,
            camera_type=PERSPECTIVE,
        )
        pattern = MOSAICK_PATTERNS[mod] if raw else None
        data[mod] = ModalityData(
            images=np.stack(images),
            cameras=cameras,
            frame_ids=np.asarray(view_ids),
            mosaick_pattern=pattern,
            mosaick_mask=build_mosaick_mask(pattern, height, width) if raw else None,
        )

    masks_across = None
    if raw:
        masks_across = build_masks_across_modalities(
            {m: d.mosaick_pattern for m, d in data.items()},
            {m: (height, width) for m in data},
        )

    return MMSDataset(
        modalities=tuple(modalities),
        data=data,
        scene_box=SceneBox(collider_type="sphere", radius=1.0),
        worldtogt=np.eye(4, dtype=np.float32),
        raw=raw,
        mosaick_masks_across=masks_across,
    )


def write_synthetic_scene(
    out_dir: str,
    modalities: Sequence[str] = ("rgb", "mono"),
    num_views: int = 6,
    height: int = 32,
    width: int = 32,
    raw: bool = False,
) -> str:
    """Write the synthetic scene to disk in the reference meta_data.json layout."""
    import cv2

    ds = make_synthetic_dataset(modalities, num_views, height, width, raw=raw)
    meta: dict = {
        "worldtogt": np.eye(4).tolist(),
        "undistorted": True,
        "raw": bool(raw),
        "pixel_offset": 0.5,
        "scene_box": {"collider_type": "sphere", "radius": 1.0},
        "modalities": {},
    }
    for mod in modalities:
        d = ds.data[mod]
        frames = []
        mod_dir = os.path.join(out_dir, "modalities", mod)
        os.makedirs(mod_dir, exist_ok=True)
        for i, vid in enumerate(d.frame_ids):
            fname = f"{int(vid):04d}.png"
            img16 = (np.clip(d.images[i], 0, 1) * 65535.0).astype(np.uint16)
            if not raw and mod == "rgb":
                img16 = img16[..., ::-1]  # store as BGR like the reference loader expects
            cv2.imwrite(os.path.join(mod_dir, fname), img16)
            c2w = np.concatenate(
                [np.asarray(d.cameras.camera_to_worlds[i]), [[0, 0, 0, 1]]], axis=0
            )
            frames.append(
                {"frame_id": int(vid), "file_name": fname, "camtoworld": c2w.tolist()}
            )
        meta["modalities"][mod] = {
            "fx": float(d.cameras.fx[0]),
            "fy": float(d.cameras.fy[0]),
            "cx": float(d.cameras.cx[0]),
            "cy": float(d.cameras.cy[0]),
            "width": width,
            "height": height,
            "camera_model": "PINHOLE",
            "distortion_params": [0.0] * 6,
            "mosaick_pattern": MOSAICK_PATTERNS[mod].tolist(),
            "frames": frames,
        }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "meta_data.json"), "w") as f:
        json.dump(meta, f)
    return out_dir
