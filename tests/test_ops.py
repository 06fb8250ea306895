"""Unit tests for the pure-JAX op kit vs straightforward NumPy references.

Pattern: differential oracle (reference src/test_cuda.cpp:39-56 — CPU path
vs accelerated path, element-wise tolerance)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from patchwork_tpu.ops import pointcloud as pc
from patchwork_tpu.ops.sampling import random_subsample_mask, voxel_grid_filter

RNG = np.random.default_rng(0)


def cloud(n=1000, extent=10.0):
    return RNG.uniform(-extent, extent, (n, 3)).astype(np.float32)


class TestPointcloudOps:
    def test_finite_mask(self):
        pts = cloud(100)
        pts[3, 0] = np.nan
        pts[7, 2] = np.inf
        m = np.asarray(pc.finite_mask(jnp.asarray(pts)))
        assert not m[3] and not m[7]
        assert m.sum() == 98

    def test_rotate_2d_matches_numpy(self):
        pts = cloud()
        for deg in [0.0, 45.0, 120.0, -120.0, 361.0]:
            r = np.deg2rad(np.float32(deg))
            c, s = np.cos(r), np.sin(r)
            expect = pts.copy()
            expect[:, 0] = pts[:, 0] * c - pts[:, 1] * s
            expect[:, 1] = pts[:, 0] * s + pts[:, 1] * c
            got = np.asarray(pc.rotate_2d(jnp.asarray(pts), deg))
            np.testing.assert_allclose(got, expect, atol=1e-4)

    def test_rotate_roundtrip(self):
        pts = cloud()
        back = pc.rotate_2d(pc.rotate_2d(jnp.asarray(pts), 120.0), -120.0)
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)

    def test_transform_4x4(self):
        pts = cloud()
        t = np.eye(4, dtype=np.float32)
        t[:3, 3] = [1.0, -2.0, 3.0]
        got = np.asarray(pc.transform_4x4(jnp.asarray(pts), t))
        np.testing.assert_allclose(got, pts + t[:3, 3], atol=1e-5)

    def test_transform_4x4_homogeneous_divide(self):
        pts = cloud(10)
        t = np.eye(4, dtype=np.float32)
        t[3, 3] = 2.0  # w = 2 -> halves coordinates
        got = np.asarray(pc.transform_4x4(jnp.asarray(pts), t))
        np.testing.assert_allclose(got, pts / 2.0, atol=1e-5)

    def test_distance_and_angle(self):
        pts = cloud()
        d = np.asarray(pc.distance_2d(jnp.asarray(pts)))
        np.testing.assert_allclose(d, np.hypot(pts[:, 0], pts[:, 1]), rtol=1e-6)
        a = np.asarray(pc.polar_angle(jnp.asarray(pts)))
        expect = np.arctan2(pts[:, 1], pts[:, 0])
        expect = np.where(expect < 0, expect + 2 * np.pi, expect)
        np.testing.assert_allclose(a, expect, atol=1e-5)
        assert (a >= 0).all() and (a < 2 * np.pi + 1e-5).all()

    def test_masks(self):
        pts = cloud()
        d = np.hypot(pts[:, 0], pts[:, 1])
        np.testing.assert_array_equal(
            np.asarray(pc.radius_mask(jnp.asarray(d), 5.0)), d <= 5.0
        )
        np.testing.assert_array_equal(
            np.asarray(pc.ego_mask(jnp.asarray(pts), 2.5)), d > 2.5
        )
        np.testing.assert_array_equal(
            np.asarray(pc.height_band_mask(jnp.asarray(pts), -1.0, 1.0)),
            (pts[:, 2] >= -1) & (pts[:, 2] <= 1),
        )
        np.testing.assert_array_equal(
            np.asarray(pc.distance_band_mask(jnp.asarray(pts), 2.0, 8.0)),
            (d >= 2) & (d <= 8),
        )

    def test_plane_distances(self):
        pts = cloud()
        c = np.array([0.5, -0.5, 0.1], np.float32)
        n = np.array([0.1, 0.2, 0.97], np.float32)
        n = n / np.linalg.norm(n)
        got = np.asarray(
            pc.plane_distances(jnp.asarray(pts), jnp.asarray(c), jnp.asarray(n))
        )
        np.testing.assert_allclose(got, np.abs((pts - c) @ n), atol=1e-5)


class TestSampling:
    def test_random_subsample_counts(self):
        valid = np.ones(1000, bool)
        valid[500:] = False
        key = jax.random.key(0)
        sel = np.asarray(random_subsample_mask(key, jnp.asarray(valid), 100))
        assert sel.sum() == 100
        assert not sel[500:].any()

    def test_random_subsample_all_when_small(self):
        valid = np.zeros(100, bool)
        valid[:30] = True
        sel = np.asarray(
            random_subsample_mask(jax.random.key(1), jnp.asarray(valid), 2000)
        )
        assert sel.sum() == 30

    def test_random_subsample_uniformity(self):
        valid = jnp.ones(200, bool)
        counts = np.zeros(200)
        for i in range(200):
            counts += np.asarray(random_subsample_mask(jax.random.key(i), valid, 50))
        # each point expected 50 times; loose 5-sigma band
        assert (counts > 20).all() and (counts < 90).all()

    def test_voxel_grid_matches_dict_impl(self):
        pts = cloud(2000, extent=5.0)
        valid = np.ones(2000, bool)
        valid[1500:] = False
        got_c, got_v = voxel_grid_filter(jnp.asarray(pts), jnp.asarray(valid), 1.0)
        got = np.asarray(got_c)[np.asarray(got_v)]

        # dict-based reference (point_cloud_processor.cpp:150-196 semantics)
        vox = {}
        for p in pts[:1500]:
            k = tuple(np.floor(p / 1.0).astype(int))
            vox.setdefault(k, []).append(p)
        expect = np.array([np.mean(v, axis=0) for v in vox.values()], np.float32)

        assert len(got) == len(expect)
        got_s = got[np.lexsort(got.T)]
        exp_s = expect[np.lexsort(expect.T)]
        np.testing.assert_allclose(got_s, exp_s, atol=1e-4)
