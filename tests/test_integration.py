"""End-to-end integration: IAC-style 3-LiDAR fusion -> segmentation
(BASELINE configs[3]), batched streaming (configs[2]), and the enhanced
filtering pipeline vs a NumPy restatement."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from patchwork_tpu import LidarFusion, PatchworkConfig, RecursivePatchwork
from patchwork_tpu.io.synthetic import demo_point_cloud
from patchwork_tpu.node import NodeParams, PatchworkNode
from patchwork_tpu.oracle.reference import filter_ground_oracle
from patchwork_tpu.ops.pointcloud import rotate_2d


class TestFusionSegmentation:
    def test_three_lidar_fused_segmentation(self):
        """Three sensors with distinct fields of view (different point
        sets), fused with the default IAC extrinsics, then segmented: the
        mask must match the oracle on the fused cloud exactly (configs[3])."""
        views = [demo_point_cloud(3000, seed=40 + s) for s in range(3)]
        fusion = LidarFusion()
        fused = fusion.fuse(views)
        pts = fused.to_numpy()
        assert len(pts) > 0

        cfg = PatchworkConfig(filtering_radius=60.0)
        eng = RecursivePatchwork(cfg)
        ground, non_ground = eng.filter_ground_points(pts)
        g_o, v_o, *_ = filter_ground_oracle(pts, cfg)
        assert len(ground) == g_o.sum()
        assert len(non_ground) == (v_o & ~g_o).sum()
        # fused size = sum of views minus per-sensor ego-radius cuts
        expect = sum(
            (np.hypot(*np.array(rotate_2d(jnp.asarray(v),
                                          fusion.configs[i].rotation_angle_deg))[:, :2].T)
             > 2.5).sum()
            for i, v in enumerate(views)
        )
        assert len(pts) == expect

    def test_triplicated_world_is_iou_level(self):
        """Sensors seeing the IDENTICAL world produce coincident point
        triples after fusion; fp tie-breaking then legitimately diverges
        between engine and oracle -> IoU-level parity (documented)."""
        world = demo_point_cloud(6000, seed=31)
        views = [
            np.array(rotate_2d(jnp.asarray(world), -angle))
            for angle in (0.0, 120.0, -120.0)
        ]
        pts = LidarFusion().fuse(views).to_numpy()
        cfg = PatchworkConfig(filtering_radius=60.0)
        g_o, *_ = filter_ground_oracle(pts, cfg)
        eng = RecursivePatchwork(cfg)
        res, n = eng.segment(pts)
        g = np.asarray(res.ground)[:n]
        iou = (g & g_o).sum() / max((g | g_o).sum(), 1)
        assert iou > 0.99, iou

    def test_fusion_alignment(self):
        """Rotating a view by its sensor angle must land points back on the
        world frame (sensor extrinsic = inverse view rotation)."""
        world = demo_point_cloud(500, seed=7)
        view_left = np.array(rotate_2d(jnp.asarray(world), -120.0))
        fusion = LidarFusion()
        fused = fusion.fuse([world, view_left, world])  # left slot rotated
        pts = fused.to_numpy()
        d = np.hypot(world[:, 0], world[:, 1])
        kept = world[d > 2.5]
        # middle sensor's points must align with the world-frame points
        n = len(kept)
        mid = pts[n : 2 * n]
        np.testing.assert_allclose(mid, kept, atol=1e-4)


class TestBatchedStreaming:
    @pytest.mark.slow
    def test_batched_node_matches_single(self):
        scans = [demo_point_cloud(3000, seed=i) for i in range(5)]
        mk = lambda b: PatchworkNode(
            NodeParams(),
            config=PatchworkConfig(filtering_radius=50.0, max_levels=2),
            capacity=4096,
            batch_size=b,
        )
        r1 = mk(1).run(iter(scans))
        r4 = mk(4).run(iter(scans))  # 5 frames -> batch of 4 + short batch
        assert [r.index for r in r4] == [r.index for r in r1]
        for a, b in zip(r1, r4):
            np.testing.assert_array_equal(a.ground_mask, b.ground_mask)
            assert a.num_ground == b.num_ground

    def test_batched_skips_short_frames(self):
        scans = [demo_point_cloud(3000, seed=0), demo_point_cloud(10, seed=1),
                 demo_point_cloud(3000, seed=2)]
        node = PatchworkNode(
            NodeParams(min_points=100),
            config=PatchworkConfig(filtering_radius=50.0, max_levels=1),
            capacity=4096, batch_size=2,
        )
        results = node.run(iter(scans))
        assert [r.index for r in results] == [0, 2]


class TestEnhancedFilteringParity:
    def test_obstacle_band_matches_reference_semantics(self):
        """The deterministic part of sampleGroundAndObstacles (cpp:428-449):
        obstacles = non-ground, ego-removed, |z - target| <= tol."""
        pts = demo_point_cloud(4000, seed=9)
        cfg = PatchworkConfig(filtering_radius=60.0)
        target, tol = 1.1, 0.5

        g_o, v_o, *_ = filter_ground_oracle(pts, cfg)
        non_ground = pts[v_o & ~g_o]
        d = np.hypot(non_ground[:, 0], non_ground[:, 1])
        kept = non_ground[d > 2.5]
        expect = kept[np.abs(kept[:, 2] - target) <= tol]

        eng = RecursivePatchwork(cfg)
        out = eng.sample_ground_and_obstacles(pts, target, tol, seed=0)
        # out = obstacles + <=2000 random ground samples; the obstacle part
        # must equal the reference computation exactly (set comparison)
        out_set = {tuple(p) for p in np.round(out, 5)}
        for p in np.round(expect, 5):
            assert tuple(p) in out_set
        # everything in out is either an expected obstacle or a ground point
        ground_set = {tuple(p) for p in np.round(pts[g_o], 5)}
        exp_set = {tuple(p) for p in np.round(expect, 5)}
        for p in np.round(out, 5):
            assert tuple(p) in ground_set or tuple(p) in exp_set
