"""Differential parity: flattened TPU engine vs the recursive NumPy oracle.

The oracle (patchwork_tpu/oracle/reference.py) restates the C++ reference's
semantics exactly (src/recursive_patchwork.cpp:109-426, modulo the
documented combine-order bug fix); the engine must reproduce its masks
bit-for-bit on seeded synthetic clouds, including configs that exercise
recursive splits, NaN cleaning, early-outs, and the non-adaptive seed path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from patchwork_tpu import PatchworkConfig, make_filter_ground
from patchwork_tpu.io.synthetic import demo_point_cloud
from patchwork_tpu.oracle.reference import filter_ground_oracle


def run_both(pts, cfg, valid=None):
    if valid is None:
        valid = np.ones(len(pts), bool)
    g_o, v_o, z_o, p_o = filter_ground_oracle(pts, cfg)
    res = make_filter_ground(cfg)(jnp.asarray(pts), jnp.asarray(valid))
    return (g_o, v_o, z_o, p_o), res


def assert_parity(pts, cfg, min_ground=1):
    (g_o, v_o, z_o, p_o), res = run_both(pts, cfg)
    g_j = np.asarray(res.ground)
    np.testing.assert_array_equal(np.asarray(res.valid), v_o)
    np.testing.assert_array_equal(np.asarray(res.in_zone), z_o)
    np.testing.assert_array_equal(np.asarray(res.in_patch), p_o)
    np.testing.assert_array_equal(g_j, g_o)
    assert g_o.sum() >= min_ground


class TestEngineParity:
    def test_synthetic_testsuite_config(self):
        # reference test_recursive_patchwork.cpp:51-79 configuration
        cfg = PatchworkConfig(filtering_radius=50.0, num_sectors=8, max_iter=50)
        assert_parity(demo_point_cloud(5000, seed=42), cfg)

    def test_default_config(self):
        assert_parity(demo_point_cloud(10000, seed=1), PatchworkConfig())

    def test_split_recursion(self):
        # sloped terrain + height step -> residual-triggered splits to depth 3
        rng = np.random.default_rng(7)
        n = 20000
        pts = np.empty((n, 3), np.float32)
        pts[:, 0] = rng.uniform(-80, 80, n)
        pts[:, 1] = rng.uniform(-80, 80, n)
        pts[:, 2] = 0.08 * pts[:, 0] + 0.5 * (pts[:, 1] > 20) + rng.normal(0, 0.05, n)
        obst = rng.uniform(-40, 40, (4000, 2))
        oz = rng.uniform(0.5, 3.0, 4000)
        pts = np.concatenate(
            [pts, np.column_stack([obst, oz]).astype(np.float32)]
        ).astype(np.float32)
        assert_parity(pts, PatchworkConfig())

    def test_nan_inf_cleaning(self):
        pts = demo_point_cloud(5000, seed=3).copy()
        pts[::97, 0] = np.nan
        pts[::131, 2] = np.inf
        cfg = PatchworkConfig(filtering_radius=50.0)
        (g_o, v_o, *_), res = run_both(pts, cfg)
        np.testing.assert_array_equal(np.asarray(res.ground), g_o)
        assert not np.asarray(res.valid)[::97].any()

    def test_nan_inf_cleaning_onehot(self):
        # regression: 0 * NaN = NaN used to poison every segment column of
        # the one-hot matmul reductions (the default TPU impl), zeroing the
        # ground mask on any scan containing non-finite returns
        pts = demo_point_cloud(5000, seed=3).copy()
        pts[::37] = np.nan
        pts[5] = np.inf
        cfg = PatchworkConfig(filtering_radius=50.0)
        g_o, *_ = filter_ground_oracle(pts, cfg)
        res = make_filter_ground(cfg, impl="onehot")(
            jnp.asarray(pts), jnp.ones(len(pts), bool)
        )
        np.testing.assert_array_equal(np.asarray(res.ground), g_o)
        assert g_o.sum() > 0

    def test_tiny_cloud(self):
        assert_parity(demo_point_cloud(10, seed=5), PatchworkConfig(), min_ground=0)

    def test_non_adaptive_seeds(self):
        cfg = PatchworkConfig(adaptive_seed_height=False, filtering_radius=60.0)
        assert_parity(demo_point_cloud(8000, seed=9), cfg)

    def test_no_split_depth(self):
        cfg = PatchworkConfig(max_split_depth=0)
        assert_parity(demo_point_cloud(8000, seed=11), cfg)

    def test_validity_mask_padding(self):
        # engine must ignore padded rows entirely
        pts = demo_point_cloud(4000, seed=13)
        cfg = PatchworkConfig(filtering_radius=50.0)
        padded = np.concatenate([pts, np.full((512, 3), 1e9, np.float32)])
        valid = np.zeros(len(padded), bool)
        valid[:4000] = True
        res = make_filter_ground(cfg)(jnp.asarray(padded), jnp.asarray(valid))
        g_o, *_ = filter_ground_oracle(pts, cfg)
        np.testing.assert_array_equal(np.asarray(res.ground)[:4000], g_o)
        assert not np.asarray(res.ground)[4000:].any()

    @pytest.mark.parametrize("fast", [False, True])
    @pytest.mark.slow
    def test_fused_padded_capacity_trailing_tiles(self, fast):
        # Regression: with whole trailing kernel tiles made of invalid
        # padding (the api.RecursivePatchwork capacity path), those tiles
        # are never stale in the fused kernel's dirty-tile scheme, so
        # their cache blocks must be initialized — an uninitialized m2
        # cache block re-added into the covariance accumulation poisoned
        # every plane (caught in exact mode, 2026-08).
        pts = demo_point_cloud(4000, seed=3)
        cap = 8192  # tile 4096 -> tile 1 entirely invalid padding
        padded = np.zeros((cap, 3), np.float32)
        padded[:4000] = pts
        valid = np.zeros(cap, bool)
        valid[:4000] = True
        cfg = PatchworkConfig(fast_covariance=fast)
        res = make_filter_ground(cfg, impl="fused")(
            jnp.asarray(padded), jnp.asarray(valid))
        g_o, *_ = filter_ground_oracle(pts, cfg)
        np.testing.assert_array_equal(np.asarray(res.ground)[:4000], g_o)
        assert not np.asarray(res.ground)[4000:].any()

    def test_counts_conserved(self):
        # reference test assertions (test_recursive_patchwork.cpp:74-76)
        pts = demo_point_cloud(5000, seed=21)
        cfg = PatchworkConfig(filtering_radius=50.0, num_sectors=8)
        res = make_filter_ground(cfg)(jnp.asarray(pts), jnp.ones(len(pts), bool))
        ng = int(res.num_ground())
        nn = int(res.num_non_ground())
        assert ng + nn <= len(pts)
        assert ng > 0 and nn > 0

    def test_accuracy_against_construction_labels(self):
        # labels known by construction; the reference never checks this —
        # we do: ground recall/precision must be high on the easy scene
        from patchwork_tpu.io.synthetic import demo_labels

        n = 10000
        pts = demo_point_cloud(n, seed=17)
        labels = demo_labels(n)
        cfg = PatchworkConfig(filtering_radius=60.0)
        res = make_filter_ground(cfg)(jnp.asarray(pts), jnp.ones(n, bool))
        g = np.asarray(res.ground)
        inz = np.asarray(res.in_patch)
        recall = (g & labels)[inz].sum() / max((labels & inz).sum(), 1)
        assert recall > 0.95


class TestDeficientSeeds:
    def test_all_deficient_iou(self):
        # Every patch's adaptive seed threshold lies below all points ->
        # the "3 lowest-z" fallback fires everywhere.  Plane fits through
        # exactly 3 near-degenerate seeds amplify eigensolver fp
        # differences, so oracle parity is IoU-level here (SURVEY.md §4);
        # the two engine impls must still agree bitwise.
        pts = demo_point_cloud(3000, seed=5).copy()
        pts[:, 2] += 2.0
        cfg = PatchworkConfig(filtering_radius=60.0)
        g_o, *_ = filter_ground_oracle(pts, cfg)
        res_s = make_filter_ground(cfg, impl="scatter")(
            jnp.asarray(pts), jnp.ones(len(pts), bool)
        )
        res_o = make_filter_ground(cfg, impl="onehot")(
            jnp.asarray(pts), jnp.ones(len(pts), bool)
        )
        g_s = np.asarray(res_s.ground)
        np.testing.assert_array_equal(g_s, np.asarray(res_o.ground))
        union = (g_s | g_o).sum()
        iou = (g_s & g_o).sum() / max(union, 1)
        assert iou > 0.95, iou

    def test_sparse_patch_fallback_exact(self):
        # deficient nodes with >3 well-separated points: fallback must be
        # exactly the 3 lowest (stable tiebreak) -> bitwise oracle parity
        rng = np.random.default_rng(19)
        n = 2000
        pts = np.empty((n, 3), np.float32)
        pts[:, 0] = rng.uniform(2, 45, n)
        pts[:, 1] = rng.uniform(-45, 45, n)
        pts[:, 2] = rng.uniform(1.5, 4.0, n)  # all above z_th -> deficient
        cfg = PatchworkConfig(filtering_radius=50.0, max_iter=5)
        g_o, *_ = filter_ground_oracle(pts, cfg)
        res = make_filter_ground(cfg, impl="scatter")(
            jnp.asarray(pts), jnp.ones(n, bool)
        )
        g = np.asarray(res.ground)
        union = (g | g_o).sum()
        assert (g & g_o).sum() / max(union, 1) > 0.97


class TestVelodyneDistribution:
    def test_spinning_lidar_parity(self):
        # realistic ring-structured scan with KITTI-style ground height:
        # every point seeds (z < z_th), driving the fit loop deep -- the
        # regime where the reference's per-patch iteration cost explodes
        from patchwork_tpu.io.synthetic import velodyne_like_cloud

        pts = velodyne_like_cloud(16384, seed=0)
        cfg = PatchworkConfig()
        g_o, *_ = filter_ground_oracle(pts, cfg)
        res = make_filter_ground(cfg)(jnp.asarray(pts), jnp.ones(len(pts), bool))
        np.testing.assert_array_equal(np.asarray(res.ground), g_o)
        # sensible segmentation: most beams are ground returns
        assert g_o.sum() > 0.6 * len(pts)
