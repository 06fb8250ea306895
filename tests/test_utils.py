"""Metrics, checkpointing, and the parity harness tool."""

import os
import subprocess
import sys

import numpy as np
import pytest

from patchwork_tpu.core.config import PatchworkConfig
from patchwork_tpu.io.synthetic import simulate_sequence, simulate_world
from patchwork_tpu.utils.checkpoint import (
    load_masks,
    load_odometry,
    save_masks,
    save_odometry,
)
from patchwork_tpu.utils.metrics import format_metrics, mask_metrics


class TestMetrics:
    def test_perfect(self):
        t = np.array([1, 1, 0, 0], bool)
        m = mask_metrics(t, t)
        assert m["iou"] == 1.0 and m["f1"] == 1.0

    def test_half(self):
        pred = np.array([1, 1, 0, 0], bool)
        truth = np.array([1, 0, 1, 0], bool)
        m = mask_metrics(pred, truth)
        assert abs(m["iou"] - 1 / 3) < 1e-9
        assert abs(m["precision"] - 0.5) < 1e-9
        assert abs(m["recall"] - 0.5) < 1e-9

    def test_valid_filter(self):
        pred = np.array([1, 0, 1], bool)
        truth = np.array([1, 0, 0], bool)
        valid = np.array([1, 1, 0], bool)
        m = mask_metrics(pred, truth, valid)
        assert m["iou"] == 1.0
        assert "IoU" in format_metrics(m)


class TestCheckpoint:
    def test_masks_roundtrip(self, tmp_path):
        rng = np.random.default_rng(0)
        g = rng.random((5, 1000)) < 0.5
        v = rng.random((5, 1000)) < 0.9
        p = str(tmp_path / "masks.npz")
        save_masks(p, g, v)
        g2, v2, ids = load_masks(p)
        np.testing.assert_array_equal(g, g2)
        np.testing.assert_array_equal(v, v2)
        np.testing.assert_array_equal(ids, np.arange(5))

    def test_odometry_roundtrip(self, tmp_path):
        from patchwork_tpu.slam import LidarOdometry, OdometryConfig

        world = simulate_world(seed=3, num_pillars=40)
        scans, _ = simulate_sequence(num_frames=3, seed=3, world=world)
        odo = LidarOdometry(
            patchwork=PatchworkConfig(filtering_radius=80.0, max_levels=1),
            cfg=OdometryConfig(capacity=16384, obstacle_samples=512,
                               ground_samples=256, icp_iters=5),
        )
        for i, s in enumerate(scans):
            odo.add_scan(s, seed=i)
        p = str(tmp_path / "odo.npz")
        save_odometry(p, odo)
        poses, edges, cfg = load_odometry(p)
        assert poses.shape == (3, 4, 4)
        assert len(edges) == 2
        assert cfg.filtering_radius == 80.0


class TestParityTool:
    @pytest.mark.slow
    def test_runs_and_passes(self, tmp_path):
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "tools", "parity_bench.py"),
             "--points", "4096", "--impls", "scatter", "onehot", "--reps", "1"],
            capture_output=True, text=True, timeout=600, env=env, cwd=repo,
        )
        assert r.returncode == 0, r.stdout + r.stderr
        assert "ALL PARITY PASS" in r.stdout


class TestDeviceAndDebug:
    @pytest.mark.slow
    def test_device_info(self):
        from patchwork_tpu.core.device import (
            accelerator_available,
            cleanup,
            device_info,
            initialize,
        )

        assert isinstance(accelerator_available(), bool)
        assert initialize() in (True, False)
        info = device_info()
        assert len(info) >= 1 and "platform" in info[0]
        cleanup()

    def test_floor_median_update(self):
        """bench._update_floor_doc: recorded = lower median of the last 5
        appended runs — one fast-tunnel-day outlier must not raise the
        floor above a typical day (VERDICT r3 item 3)."""
        import bench

        doc = {"recorded": {"m": 1000.0}}
        # outlier run: median of [1000, 1554] is the LOWER value
        assert bench._update_floor_doc(doc, {"m": 1554.2})
        assert doc["recorded"]["m"] == 1000.0
        # normal days keep the floor at the typical level
        for v in (990.0, 1016.0, 1020.0):
            bench._update_floor_doc(doc, {"m": v})
        assert doc["recorded"]["m"] == 1016.0  # median(1000,1554,990,1016,1020)
        # history is capped at 5: the seed value rotates out
        bench._update_floor_doc(doc, {"m": 995.0})
        assert doc["history"]["m"] == [1554.2, 990.0, 1016.0, 1020.0, 995.0]
        assert doc["recorded"]["m"] == 1016.0
        # None values are ignored
        assert bench._update_floor_doc(doc, {"x": None}) is False

    def test_measure_stall_guard(self, monkeypatch):
        """bench._measure_guarded: a cell measuring <0.5x its floors median
        is re-measured once; a recovered re-measure wins, a persistent low
        cell is flagged degraded so _refresh_floors never records it
        (VERDICT r4 item 2 — the BENCH_r04 demo_fast=95.4 poisoning)."""
        import bench

        monkeypatch.setattr(bench, "_floors_recorded",
                            lambda: {"k": 1000.0})
        # transient stall: second measurement recovers -> not degraded
        seq = iter([(100.0, ["s"]), (990.0, ["s"])])
        monkeypatch.setattr(bench, "_measure", lambda *a, **kw: next(seq))
        deg = set()
        rate, _ = bench._measure_guarded("k", deg, None, 1, 1, 1, None)
        assert rate == 990.0 and not deg
        # persistent collapse -> degraded, and excluded from floor refresh
        monkeypatch.setattr(bench, "_measure",
                            lambda *a, **kw: (100.0, ["s"]))
        deg = set()
        rate, _ = bench._measure_guarded("k", deg, None, 1, 1, 1, None)
        assert rate == 100.0 and deg == {"k"}
        # a plausible cell is measured exactly once (no probe overhead)
        calls = []
        monkeypatch.setattr(
            bench, "_measure",
            lambda *a, **kw: (calls.append(1), (980.0, ["s"]))[1])
        deg = set()
        rate, _ = bench._measure_guarded("k", deg, None, 1, 1, 1, None)
        assert rate == 980.0 and not deg and len(calls) == 1

    def test_enable_compilation_cache(self, tmp_path, monkeypatch):
        """core/device.enable_compilation_cache: idempotent, env-overridable,
        'off' disables, and the jax config actually points at the dir."""
        import jax

        from patchwork_tpu.core.device import enable_compilation_cache

        d = str(tmp_path / "xla_cache")
        monkeypatch.setenv("PATCHWORK_TPU_COMPILE_CACHE", d)
        assert enable_compilation_cache() == d
        assert os.path.isdir(d)
        assert jax.config.jax_compilation_cache_dir == d
        # explicit path wins over env; second call is idempotent
        d2 = str(tmp_path / "other")
        assert enable_compilation_cache(d2) == d2
        assert enable_compilation_cache(d2) == d2
        assert jax.config.jax_compilation_cache_dir == d2
        # 'off' leaves config untouched
        monkeypatch.setenv("PATCHWORK_TPU_COMPILE_CACHE", "off")
        enable_compilation_cache()
        assert jax.config.jax_compilation_cache_dir == d2

    def test_multihost_noop(self):
        from patchwork_tpu.parallel.multihost import (
            host_summary,
            initialize_multihost,
            is_multihost,
        )

        assert initialize_multihost() is False  # no coordinator configured
        assert is_multihost() is False
        assert "process 0/1" in host_summary()

    def test_debug_nans_toggle(self):
        import jax
        import jax.numpy as jnp
        import pytest as _pytest

        from patchwork_tpu.utils.debug import assert_finite, debug_nans

        # the 0/0 executable may already be compiled (and cached) WITHOUT
        # nan-checking by an earlier test; debug_nans only instruments
        # fresh compilations
        jax.clear_caches()
        with debug_nans(True):
            with _pytest.raises(FloatingPointError):
                jax.block_until_ready(jnp.zeros(4) / jnp.zeros(4))
        # restored afterwards
        assert not jax.config.jax_debug_nans
        with _pytest.raises(FloatingPointError):
            assert_finite(np.array([1.0, np.nan]))
        assert_finite(np.ones(3))
