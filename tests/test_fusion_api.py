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

    def test_iac_three_sensor_end_to_end(self):
        """BASELINE configs[3] recorded end-to-end: a 3-sensor IAC-style
        scene (per-sensor extrinsics, overlapping FoV, reference layout
        lidar_fusion.cpp:20-36) -> fuse_stacked -> engine, with the fused
        cloud's masks bit-identical to the oracle and the fusion itself
        matching a NumPy reference transform."""
        from patchwork_tpu import make_filter_ground
        from patchwork_tpu.core.config import default_lidar_configs
        from patchwork_tpu.io.synthetic import iac_three_lidar_scene
        from patchwork_tpu.oracle.reference import filter_ground_oracle

        clouds = iac_three_lidar_scene(3000, seed=11)
        cfgs = list(default_lidar_configs())
        fusion = LidarFusion(cfgs)
        fused = fusion.fuse(clouds)
        fx = np.asarray(fused.xyz)
        fv = np.asarray(fused.valid)

        # fusion parity vs plain NumPy per-sensor transform + ego mask
        ref_pts, ref_keep = [], []
        for c, cf in zip(clouds, cfgs):
            m = rotation_matrix_2d(cf.rotation_angle_deg)
            w = c @ m[:3, :3].T.astype(np.float32)
            ref_pts.append(w)
            ref_keep.append(
                np.hypot(w[:, 0], w[:, 1]) > np.float32(cf.ego_radius))
        ref_pts = np.concatenate(ref_pts)
        ref_keep = np.concatenate(ref_keep)
        np.testing.assert_allclose(fx, ref_pts, atol=1e-5)
        np.testing.assert_array_equal(fv, ref_keep)
        assert fv.sum() < len(fv)          # ego removal really fired
        # overlapping FoV: all three sensors contribute points in the
        # +x world wedge (the front sensor's heading)
        ang = np.arctan2(fx[:, 1], fx[:, 0])
        n = len(clouds[0])
        for s in range(3):
            sel = fv[s * n:(s + 1) * n]
            a = ang[s * n:(s + 1) * n][sel]
            assert (np.abs(a) < np.deg2rad(45)).any(), s

        # engine on the fused cloud == oracle on the fused cloud, bitwise
        # (the oracle has no valid mask; NaN rows are dropped by its
        # cleanPoints exactly as the engine drops valid=False rows)
        cfg = PatchworkConfig(filtering_radius=60.0)
        fx_o = fx.copy()
        fx_o[~fv] = np.nan
        g_o, v_o, z_o, p_o = filter_ground_oracle(fx_o, cfg)
        res = make_filter_ground(cfg)(jnp.asarray(fx), jnp.asarray(fv))
        np.testing.assert_array_equal(np.asarray(res.ground), g_o)
        assert g_o.sum() > 1000 and (~g_o & fv).sum() > 100

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
