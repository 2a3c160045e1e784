"""Tests for the offline preprocessing subsystem."""

import numpy as np
import pytest

from multimodalstudio_tpu.preprocessing.demosaick import (
    demosaick_bayer,
    demosaick_grid,
    demosaick_multispectral,
    mosaick,
)
from multimodalstudio_tpu.preprocessing.metadata import (
    cluster_points,
    generate_bounding_box,
)
from multimodalstudio_tpu.preprocessing.colmap import (
    qvec_to_rotmat,
    w2c_to_c2w,
)


class TestDemosaick:
    def test_constant_frame_roundtrip(self):
        frame = np.zeros((12, 12, 4), np.float32)
        for c in range(4):
            frame[..., c] = (c + 1) / 5.0
        pattern = np.array([[0, 1], [3, 2]])
        rec = demosaick_grid(mosaick(frame, pattern), pattern)
        np.testing.assert_allclose(rec, frame, atol=1e-6)

    def test_multispectral_shape(self):
        raw = np.random.rand(18, 18).astype(np.float32)
        out = demosaick_multispectral(raw)
        assert out.shape == (18, 18, 9)

    def test_bayer(self):
        raw = (np.random.rand(16, 16) * 65535).astype(np.uint16)
        assert demosaick_bayer(raw).shape == (16, 16, 3)


class TestBoundingBox:
    def test_cluster_and_normalize(self):
        rng = np.random.default_rng(0)
        roi = rng.normal(size=(500, 3)) * 0.3  # dense central cluster
        outliers = rng.normal(size=(50, 3)) * 0.05 + np.array([10.0, 0, 0])
        points = np.concatenate([roi, outliers])
        gt2w, bbox = generate_bounding_box(points, radius=0.5)
        # ROI cluster maps into the unit sphere, centered
        h = np.concatenate([roi, np.ones((500, 1))], -1)
        mapped = (gt2w @ h.T).T[:, :3]
        assert np.abs(mapped.mean(0)).max() < 0.3
        assert np.linalg.norm(mapped, axis=-1).max() <= 1.001

    def test_clusters_separate(self):
        a = np.zeros((200, 3)) + np.random.default_rng(1).normal(size=(200, 3)) * 0.1
        b = a + 5.0
        clusters = cluster_points(np.concatenate([a, b]), radius=0.5)
        sizes = sorted(len(c) for c in clusters)
        assert sizes == [200, 200]


class TestColmapParsing:
    def test_qvec_identity(self):
        np.testing.assert_allclose(qvec_to_rotmat(np.array([1.0, 0, 0, 0])), np.eye(3))

    def test_w2c_inversion(self):
        q = np.array([0.92388, 0.0, 0.38268, 0.0])  # 45 deg about y
        t = np.array([1.0, 2.0, 3.0])
        c2w = w2c_to_c2w(q, t)
        r = qvec_to_rotmat(q)
        w2c = np.eye(4)
        w2c[:3, :3] = r
        w2c[:3, 3] = t
        np.testing.assert_allclose(c2w @ w2c, np.eye(4), atol=1e-5)


class TestNativeDataPath:
    def test_sample_pixels_matches_frames(self):
        import numpy as np

        from multimodalstudio_tpu.data import native

        imgs = np.random.rand(3, 16, 16, 4).astype(np.float32)
        mask = np.tile(np.array([[0, 1], [3, 2]], np.int8), (8, 8))
        fi, co, px, ch = native.sample_pixels(imgs, mask, 64, seed=7)
        for i in range(64):
            y, x = int(co[i, 0] - 0.5), int(co[i, 1] - 0.5)
            np.testing.assert_allclose(px[i], imgs[fi[i], y, x])
            assert ch[i] == mask[y, x]

    def test_normalize_u16(self):
        import numpy as np

        from multimodalstudio_tpu.data import native

        u = (np.random.rand(1000) * 65535).astype(np.uint16)
        np.testing.assert_allclose(
            native.normalize_u16(u), u.astype(np.float32) / 65535.0, atol=1e-7
        )
