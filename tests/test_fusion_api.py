"""Fusion, high-level API, and enhanced-filtering pipeline tests."""

import numpy as np
import jax.numpy as jnp

from patchwork_tpu.api import RecursivePatchwork
from patchwork_tpu.core.config import LidarConfig, PatchworkConfig
from patchwork_tpu.fusion.fusion import (
    LidarFusion,
    fuse_stacked,
    rotation_matrix_2d,
    stack_extrinsics,
    translation_matrix,
)
from patchwork_tpu.io.synthetic import demo_point_cloud

RNG = np.random.default_rng(5)


class TestFusion:
    def test_rotation_matrix(self):
        m = rotation_matrix_2d(90.0)
        v = m @ np.array([1, 0, 0, 1], np.float32)
        np.testing.assert_allclose(v[:3], [0, 1, 0], atol=1e-6)

    def test_translation_matrix(self):
        m = translation_matrix(1, 2, 3)
        v = m @ np.array([0, 0, 0, 1], np.float32)
        np.testing.assert_allclose(v[:3], [1, 2, 3])

    def test_fuse_stacked_rotation_and_ego(self):
        # one sensor at +90deg; point at (0, 5) must land at (-5, 0);
        # point inside ego radius must be masked out
        xyz = np.zeros((1, 3, 3), np.float32)
        xyz[0, 0] = [0, 5, 1]
        xyz[0, 1] = [1, 0, 0]   # rotates to (0,1): within ego 2.5 -> dropped
        xyz[0, 2] = [10, 0, 2]
        valid = np.ones((1, 3), bool)
        ext = rotation_matrix_2d(90.0)[None]
        fx, fv = fuse_stacked(
            jnp.asarray(xyz), jnp.asarray(valid), jnp.asarray(ext),
            jnp.asarray([2.5], np.float32),
        )
        fx, fv = np.asarray(fx), np.asarray(fv)
        np.testing.assert_allclose(fx[0], [-5, 0, 1], atol=1e-5)
        assert not fv[1]
        assert fv[0] and fv[2]

    def test_default_three_lidar_layout(self):
        fusion = LidarFusion()
        assert [c.rotation_angle_deg for c in fusion.configs] == [0.0, 120.0, -120.0]
        clouds = [demo_point_cloud(500, seed=i) + [0, 0, 0] for i in range(3)]
        fused = fusion.fuse(clouds)
        n = int(fused.count())
        # fused count = sum minus ego-removed points
        assert 0 < n <= 1500

    def test_fusion_size_relations(self):
        # reference testLidarFusion semantics (test_recursive_patchwork.cpp:120-144)
        p1 = demo_point_cloud(1000, seed=1)
        fusion = LidarFusion()
        fused = fusion.fuse([p1, demo_point_cloud(1000, seed=2)])
        assert int(fused.count()) > 0

    def test_extrinsics_stack_shape(self):
        cfgs = [LidarConfig(1, "/a", 0.0), LidarConfig(2, "/b", 120.0)]
        assert stack_extrinsics(cfgs).shape == (2, 4, 4)


class TestApi:
    def test_filter_ground_points_counts(self):
        pts = demo_point_cloud(5000, seed=42)
        eng = RecursivePatchwork(
            PatchworkConfig(filtering_radius=50.0, num_sectors=8, max_iter=50)
        )
        ground, non_ground = eng.filter_ground_points(pts)
        assert len(ground) + len(non_ground) <= len(pts)
        assert len(ground) > 0 and len(non_ground) > 0

    def test_matches_oracle(self):
        from patchwork_tpu.oracle.reference import filter_ground_oracle

        pts = demo_point_cloud(4000, seed=8)
        cfg = PatchworkConfig(filtering_radius=60.0)
        eng = RecursivePatchwork(cfg)
        ground, non_ground = eng.filter_ground_points(pts)
        g_o, v_o, *_ = filter_ground_oracle(pts, cfg)
        assert len(ground) == g_o.sum()
        assert len(non_ground) == (v_o & ~g_o).sum()

    def test_sample_ground_and_obstacles(self):
        # reference testEnhancedFiltering (test_recursive_patchwork.cpp:81-98)
        pts = demo_point_cloud(3000, seed=4)
        eng = RecursivePatchwork()
        filtered = eng.sample_ground_and_obstacles(pts, 1.1, 0.5)
        assert 0 < len(filtered) <= len(pts)
        # obstacles in band + <=2000 ground samples
        assert len(filtered) <= 2000 + 3000

    def test_clean_rotate_ego_utilities(self):
        pts = demo_point_cloud(1000, seed=6).copy()
        pts[5] = np.nan
        cleaned = RecursivePatchwork.clean_points(pts)
        assert len(cleaned) == 999
        rot = RecursivePatchwork.rotate_points_2d(cleaned, 45.0)
        assert rot.shape == cleaned.shape
        kept = RecursivePatchwork.remove_ego_vehicle(cleaned, 2.5)
        d = np.hypot(kept[:, 0], kept[:, 1])
        assert (d > 2.5).all()

    def test_capacity_bucket_reuse(self):
        eng = RecursivePatchwork(PatchworkConfig(filtering_radius=50.0))
        eng.filter_ground_points(demo_point_cloud(1000, seed=1))
        eng.filter_ground_points(demo_point_cloud(900, seed=2))
        assert len(eng._filter_cache) == 1  # same 1024 bucket
