"""Edge cases: degenerate inputs, extreme configs, and the compact-node
overflow clamp."""

import numpy as np
import jax.numpy as jnp
import pytest

from patchwork_tpu import PatchworkConfig, make_filter_ground
from patchwork_tpu.io.synthetic import demo_point_cloud
from patchwork_tpu.oracle.reference import filter_ground_oracle


def run(pts, cfg, valid=None):
    if valid is None:
        valid = np.ones(len(pts), bool)
    return make_filter_ground(cfg)(jnp.asarray(pts), jnp.asarray(valid))


class TestDegenerateInputs:
    def test_empty_valid_mask(self):
        pts = demo_point_cloud(100, seed=0)
        res = run(pts, PatchworkConfig(), valid=np.zeros(100, bool))
        assert int(res.num_ground()) == 0
        assert int(res.num_non_ground()) == 0

    def test_all_nan(self):
        pts = np.full((64, 3), np.nan, np.float32)
        res = run(pts, PatchworkConfig())
        assert not np.asarray(res.valid).any()
        assert int(res.num_ground()) == 0

    def test_all_points_in_one_patch(self):
        rng = np.random.default_rng(3)
        pts = np.empty((500, 3), np.float32)
        pts[:, 0] = rng.uniform(2.0, 2.5, 500)  # one ring/sector cell
        pts[:, 1] = rng.uniform(0.1, 0.3, 500)
        pts[:, 2] = rng.normal(0, 0.02, 500)
        cfg = PatchworkConfig(filtering_radius=50.0)
        g_o, *_ = filter_ground_oracle(pts, cfg)
        res = run(pts, cfg)
        np.testing.assert_array_equal(np.asarray(res.ground), g_o)

    def test_all_beyond_radius(self):
        pts = demo_point_cloud(200, seed=1) + np.array([500, 500, 0], np.float32)
        res = run(pts, PatchworkConfig(filtering_radius=50.0))
        assert int(res.num_ground()) == 0
        assert int(res.num_non_ground()) == 200  # all non-ground (cpp:414-419)

    def test_points_inside_r_min(self):
        # d < r_min: in zone but in no ring -> never ground
        pts = np.zeros((50, 3), np.float32)
        pts[:, 0] = 0.5
        res = run(pts, PatchworkConfig())
        assert not np.asarray(res.in_patch).any()
        assert np.asarray(res.in_zone).all()
        assert int(res.num_ground()) == 0


class TestExtremeConfigs:
    def test_single_sector(self):
        cfg = PatchworkConfig(num_sectors=1, filtering_radius=50.0)
        pts = demo_point_cloud(2000, seed=2)
        g_o, *_ = filter_ground_oracle(pts, cfg)
        res = run(pts, cfg)
        np.testing.assert_array_equal(np.asarray(res.ground), g_o)

    def test_many_sectors(self):
        # 8 rings x 32 sectors over 4000 points -> ~15-point patches: with
        # patches this small, single borderline points sit within f32
        # summation-order noise of tau, so parity is near-exact rather
        # than guaranteed-bitwise (observed: <=2 flipped points of 4000).
        cfg = PatchworkConfig(num_sectors=32, filtering_radius=50.0)
        pts = demo_point_cloud(4000, seed=3)
        g_o, *_ = filter_ground_oracle(pts, cfg)
        res = run(pts, cfg)
        g = np.asarray(res.ground)
        assert (g != g_o).sum() <= 5
        assert (g & g_o).sum() / max((g | g_o).sum(), 1) > 0.995

    def test_max_iter_one(self):
        cfg = PatchworkConfig(max_iter=1, filtering_radius=50.0)
        pts = demo_point_cloud(3000, seed=4)
        g_o, *_ = filter_ground_oracle(pts, cfg)
        res = run(pts, cfg)
        np.testing.assert_array_equal(np.asarray(res.ground), g_o)

    def test_bad_configs_rejected(self):
        with pytest.raises(ValueError):
            PatchworkConfig(num_sectors=0)
        with pytest.raises(ValueError):
            PatchworkConfig(max_levels=0)
        with pytest.raises(ValueError):
            PatchworkConfig(r_min=200.0)  # >= filtering_radius


class TestOverflowClamp:
    @pytest.mark.slow
    def test_tiny_node_pool_truncates_gracefully(self):
        """With max_active_nodes_cfg too small for the scene's splits, the
        excess nodes keep their converged masks (documented deviation) —
        no crash, and the result equals a depth-truncated oracle run for
        the surviving structure."""
        rng = np.random.default_rng(7)
        n = 20000
        pts = np.empty((n, 3), np.float32)
        pts[:, 0] = rng.uniform(-80, 80, n)
        pts[:, 1] = rng.uniform(-80, 80, n)
        pts[:, 2] = 0.08 * pts[:, 0] + 0.5 * (pts[:, 1] > 20) + rng.normal(0, 0.05, n)
        cfg_small = PatchworkConfig(max_active_nodes_cfg=4)
        res = run(pts, cfg_small)
        g_small = np.asarray(res.ground)
        assert 0 < g_small.sum() < n  # sane result, no crash

        # with a roomy pool, exact oracle parity (sanity that the clamp is
        # the ONLY thing the tiny pool changes)
        cfg_big = PatchworkConfig()
        g_o, *_ = filter_ground_oracle(pts, cfg_big)
        res_big = run(pts, cfg_big)
        np.testing.assert_array_equal(np.asarray(res_big.ground), g_o)
        # the truncated result still agrees with the full one on most points
        agree = (g_small == g_o).mean()
        assert agree > 0.95, agree
