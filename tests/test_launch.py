"""Deployment descriptor (launch-file analogue) round-trip tests.

Round-1 VERDICT item 7: one operator-editable file carrying the node
parameter block, algorithm config, input source and capacity — the
middleware-free equivalent of launch/recursive_patchwork.launch.py:11-73.
"""

import json

import numpy as np
import pytest

from patchwork_tpu.core.config import PatchworkConfig
from patchwork_tpu.io.bag import write_mcap
from patchwork_tpu.io.synthetic import demo_point_cloud
from patchwork_tpu.launch import LaunchDescription, load_launch, run_launch
from patchwork_tpu.node import NodeParams

YAML_DOC = """
node:
  input_topic: /lidar/points
  min_points: 100
  max_iterations: 50
  distance_threshold: 0.1
  angle_threshold: 0.1
config:
  filtering_radius: 80.0
  max_levels: 3
source:
  demo:
    frames: 3
    points: 2000
capacity: 2048
"""


class TestDescriptor:
    def test_yaml_parse(self, tmp_path):
        p = tmp_path / "launch.yaml"
        p.write_text(YAML_DOC)
        desc = load_launch(str(p))
        assert desc.node.max_iterations == 50
        assert desc.config.filtering_radius == 80.0
        assert desc.config.max_levels == 3
        assert desc.capacity == 2048
        assert desc.source["demo"]["frames"] == 3

    def test_json_parse_and_roundtrip(self, tmp_path):
        p = tmp_path / "launch.yaml"
        p.write_text(YAML_DOC)
        desc = load_launch(str(p))
        # descriptor -> dict -> json file -> descriptor: identical
        j = tmp_path / "launch.json"
        j.write_text(json.dumps(desc.to_dict()))
        back = load_launch(str(j))
        assert back.node == desc.node
        assert back.config == desc.config
        assert back.capacity == desc.capacity

    def test_unknown_node_param_rejected(self):
        with pytest.raises(ValueError, match="unknown node parameters"):
            LaunchDescription.from_dict(
                {"node": {"nonsense": 1}, "source": {"demo": {}}})

    def test_source_required(self):
        with pytest.raises(ValueError, match="exactly one"):
            LaunchDescription.from_dict({"source": {}})
        with pytest.raises(ValueError, match="exactly one"):
            LaunchDescription.from_dict(
                {"source": {"demo": {}, "kitti": "/x"}})


class TestRunLaunch:
    def test_demo_run(self, tmp_path):
        p = tmp_path / "launch.yaml"
        p.write_text(YAML_DOC + f"out_prefix: {tmp_path}/run\n")
        desc = load_launch(str(p))
        results, node = run_launch(desc, log=lambda *a: None)
        assert len(results) == 3
        assert all(r.num_ground > 0 for r in results)
        from patchwork_tpu.utils.checkpoint import load_masks

        ground, valid, frame_ids = load_masks(f"{tmp_path}/run_masks.npz")
        assert ground.shape == (3, 2048)
        assert list(frame_ids) == [0, 1, 2]

    def test_bag_source(self, tmp_path):
        clouds = [demo_point_cloud(1500, seed=i) for i in range(2)]
        bag = tmp_path / "in.mcap"
        write_mcap(str(bag), clouds, topic="/lidar/points")
        desc = LaunchDescription(
            node=NodeParams(), config=PatchworkConfig(),
            source={"bag": str(bag)}, capacity=2048)
        results, _ = run_launch(desc, log=lambda *a: None)
        assert len(results) == 2

    def test_cli_launch_flag(self, tmp_path, capsys):
        from patchwork_tpu.cli import main

        p = tmp_path / "launch.yaml"
        p.write_text(YAML_DOC)
        assert main(["--launch", str(p)]) == 0
        outp = capsys.readouterr().out
        assert "Processed frame 2" in outp

    def test_frame_limit(self):
        desc = LaunchDescription(
            node=NodeParams(), config=PatchworkConfig(),
            source={"demo": {"frames": 5, "points": 1000}, "limit": 2},
            capacity=1024)
        results, _ = run_launch(desc, log=lambda *a: None)
        assert len(results) == 2
