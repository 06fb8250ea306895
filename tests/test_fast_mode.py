"""Fast (IoU-parity) covariance mode: single-sweep raw moments on
patch-center-shifted coordinates (cfg.fast_covariance).

The exact path reproduces the reference's two-pass centered covariance
(src/recursive_patchwork.cpp:86-95) bit-for-bit; fast mode replaces it
with cov = M2 - S S^T/n fused into the apply sweep.  The contract is
IoU-level parity vs the oracle — in practice the patch-center shift keeps
the masks bitwise equal on every tested scene, which these tests pin at
IoU >= 0.999 (not equality, so legitimate last-ulp divergence on new
scenes doesn't flake).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from patchwork_tpu import PatchworkConfig, make_filter_ground
from patchwork_tpu.io.synthetic import demo_point_cloud, velodyne_like_cloud
from patchwork_tpu.oracle.reference import filter_ground_oracle
from patchwork_tpu.segment.binning import patch_centers


def _iou(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return (a & b).sum() / max((a | b).sum(), 1)


def _run(cfg, xyz, valid=None):
    n = xyz.shape[0]
    valid = jnp.ones((n,), bool) if valid is None else valid
    return np.asarray(make_filter_ground(cfg)(jnp.asarray(xyz), valid).ground)


class TestPatchCenters:
    def test_shape_and_trash_row(self):
        cfg = PatchworkConfig()
        c = patch_centers(cfg)
        assert c.shape == (cfg.num_patches + 1, 3)
        np.testing.assert_array_equal(c[-1], 0.0)
        assert np.all(c[:, 2] == 0.0)  # xy-only shift: z semantics untouched

    def test_centers_inside_their_patch(self):
        from patchwork_tpu.segment.binning import ring_edges, sector_edges

        cfg = PatchworkConfig()
        c = patch_centers(cfg)[:-1]
        d = np.hypot(c[:, 0], c[:, 1])
        a = np.arctan2(c[:, 1], c[:, 0]) % (2 * np.pi)
        r_e, s_e = ring_edges(cfg), sector_edges(cfg)
        ring = np.repeat(np.arange(cfg.num_rings), cfg.num_sectors)
        sec = np.tile(np.arange(cfg.num_sectors), cfg.num_rings)
        assert np.all((d >= r_e[ring]) & (d <= r_e[ring + 1] + 1e-4))
        assert np.all((a >= s_e[sec] - 1e-5) & (a <= s_e[sec + 1] + 1e-5))


class TestFastVsExact:
    @pytest.mark.parametrize("gen", [demo_point_cloud, velodyne_like_cloud])
    @pytest.mark.slow
    def test_iou_vs_exact_fused(self, gen):
        xyz = gen(8192, seed=3)
        g_exact = _run(PatchworkConfig(segment_impl="fused"), xyz)
        g_fast = _run(
            PatchworkConfig(segment_impl="fused", fast_covariance=True), xyz
        )
        assert _iou(g_exact, g_fast) >= 0.999

    @pytest.mark.slow
    def test_iou_vs_oracle(self):
        xyz = demo_point_cloud(8192, seed=7)
        cfg = PatchworkConfig(segment_impl="fused", fast_covariance=True)
        g_fast = _run(cfg, xyz)
        g_oracle = filter_ground_oracle(xyz, cfg)[0]
        assert _iou(g_oracle, g_fast) >= 0.999

    @pytest.mark.slow
    def test_nan_points_excluded(self):
        xyz = demo_point_cloud(4096, seed=1).copy()
        xyz[::17] = np.nan
        cfg = PatchworkConfig(segment_impl="fused", fast_covariance=True)
        g = _run(cfg, xyz)
        assert not g[::17].any()
        g_exact = _run(PatchworkConfig(segment_impl="fused"), xyz)
        assert _iou(g_exact, g) >= 0.999

    @pytest.mark.slow
    def test_non_adaptive_percentile_path(self):
        # percentile seeds force the XLA level body + v1 fit megakernel
        xyz = demo_point_cloud(4096, seed=2)
        cfg_e = PatchworkConfig(segment_impl="fused",
                                adaptive_seed_height=False)
        cfg_f = cfg_e.replace(fast_covariance=True)
        assert _iou(_run(cfg_e, xyz), _run(cfg_f, xyz)) >= 0.999

    def test_fast_flag_ignored_off_fused(self):
        # scatter/onehot impls keep exact semantics even with the flag set
        xyz = demo_point_cloud(4096, seed=4)
        cfg = PatchworkConfig(segment_impl="scatter", fast_covariance=True)
        g = _run(cfg, xyz)
        g_oracle = filter_ground_oracle(xyz, cfg)[0]
        np.testing.assert_array_equal(g, g_oracle)
