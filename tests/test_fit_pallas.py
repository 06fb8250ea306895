"""Differential tests: fused Pallas fit-loop kernels vs the scatter oracle.

The reference's CPU-vs-GPU parity harness pattern (src/test_cuda.cpp:39-56)
applied to the fused kernels: every output must match a composition of
exact scatter segment ops, and the full engine under impl='fused' must
stay bit-identical to impl='scatter' (itself oracle-exact).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from patchwork_tpu import PatchworkConfig, make_filter_ground
from patchwork_tpu.io.synthetic import demo_point_cloud, velodyne_like_cloud
from patchwork_tpu.kernels.fit_pallas import (
    fit_pack, fused_apply, fused_moments2, sp_width,
)
from patchwork_tpu.oracle.reference import filter_ground_oracle
from patchwork_tpu.segment.engine import filter_ground


def _scene(n=4096, seed=0):
    rng = np.random.default_rng(seed)
    xyz = rng.normal(0, 20, (n, 3)).astype(np.float32)
    xyz[:, 2] = rng.normal(0, 0.3, n).astype(np.float32)
    seg = rng.integers(0, 80, n).astype(np.int32)
    g = rng.random(n) < 0.5
    am = rng.random(n) < 0.8
    tau = rng.uniform(0.1, 0.4, n).astype(np.float32)
    return (jnp.asarray(xyz), jnp.asarray(seg), jnp.asarray(g),
            jnp.asarray(am), jnp.asarray(tau))


class TestFusedApply:
    def test_moments_and_gather_vs_scatter(self):
        xyz, seg, g, am, tau = _scene()
        n, s = xyz.shape[0], 81
        sp = sp_width(s)
        rng = np.random.default_rng(1)
        c = rng.normal(0, 5, (s, 3)).astype(np.float32)
        nrm = rng.normal(0, 1, (s, 3)).astype(np.float32)
        can = (rng.random(s) < 0.7).astype(np.float32)
        tab = np.zeros((8, sp), np.float32)
        tab[0:3, :s] = c.T
        tab[3:6, :s] = nrm.T
        tab[6, :s] = can

        p = fit_pack(xyz, tau, am, seg)
        g_row = g.astype(jnp.float32)[None, :]
        g_out, stats = fused_apply(p, g_row, jnp.asarray(tab), s)

        # NumPy oracle of the same contract
        c_pt, n_pt, can_pt = c[np.asarray(seg)], nrm[np.asarray(seg)], can[np.asarray(seg)]
        d = np.asarray(xyz) - c_pt
        dist = np.abs((d * n_pt).sum(1))
        new_g = dist < np.asarray(tau)
        apply_m = np.asarray(am) & (can_pt > 0.5)
        g_exp = np.where(apply_m, new_g, np.asarray(g))
        np.testing.assert_array_equal(np.asarray(g_out[0]) > 0.5, g_exp)

        gf = g_exp.astype(np.float32)
        sums = np.zeros((s, 4), np.float32)
        np.add.at(sums, np.asarray(seg),
                  np.column_stack([gf, np.asarray(xyz) * gf[:, None]]))
        got = np.asarray(stats[:4, :s]).T
        np.testing.assert_allclose(got, sums, rtol=2e-6, atol=2e-4)

        dsum = np.zeros(s, np.float32)
        np.add.at(dsum, np.asarray(seg), dist * np.asarray(g, np.float32))
        np.testing.assert_allclose(np.asarray(stats[4, :s]), dsum,
                                   rtol=2e-6, atol=2e-3)

        chg = np.zeros(s, np.float32)
        np.add.at(chg, np.asarray(seg),
                  (apply_m & (new_g != np.asarray(g))).astype(np.float32))
        np.testing.assert_array_equal(np.asarray(stats[5, :s]), chg)

    def test_zero_table_is_identity(self):
        xyz, seg, g, am, tau = _scene(seed=3)
        s = 81
        p = fit_pack(xyz, tau, am, seg)
        g_row = g.astype(jnp.float32)[None, :]
        g_out, stats = fused_apply(p, g_row, jnp.zeros((8, sp_width(s))), s)
        np.testing.assert_array_equal(np.asarray(g_out), np.asarray(g_row))
        # counts are the mask's own first moments
        cnt = np.zeros(s, np.float32)
        np.add.at(cnt, np.asarray(seg), np.asarray(g, np.float32))
        np.testing.assert_array_equal(np.asarray(stats[0, :s]), cnt)


class TestFusedMoments2:
    def test_vs_scatter(self):
        xyz, seg, g, am, tau = _scene(seed=5)
        s = 81
        sp = sp_width(s)
        rng = np.random.default_rng(2)
        c = rng.normal(0, 5, (s, 3)).astype(np.float32)
        ctab = np.zeros((8, sp), np.float32)
        ctab[0:3, :s] = c.T
        p = fit_pack(xyz, tau, am, seg)
        g_row = g.astype(jnp.float32)[None, :]
        m2 = fused_moments2(p, g_row, jnp.asarray(ctab), s)

        d = (np.asarray(xyz) - c[np.asarray(seg)]) * np.asarray(g, np.float32)[:, None]
        prods = np.column_stack([d[:, 0] * d[:, 0], d[:, 0] * d[:, 1],
                                 d[:, 0] * d[:, 2], d[:, 1] * d[:, 1],
                                 d[:, 1] * d[:, 2], d[:, 2] * d[:, 2]])
        exp = np.zeros((s, 6), np.float32)
        np.add.at(exp, np.asarray(seg), prods)
        np.testing.assert_allclose(np.asarray(m2[:6, :s]).T, exp,
                                   rtol=2e-5, atol=2e-2)


@pytest.mark.slow
class TestEngineFusedParity:
    CFGS = [
        ("testsuite", PatchworkConfig(filtering_radius=50.0, num_sectors=8,
                                      max_iter=50), 5000),
        ("default", PatchworkConfig(), 10000),
        ("non_adaptive", PatchworkConfig(adaptive_seed_height=False,
                                         filtering_radius=60.0), 8000),
    ]

    @pytest.mark.parametrize("name,cfg,n", CFGS, ids=[c[0] for c in CFGS])
    def test_bitwise_vs_scatter(self, name, cfg, n):
        pts = demo_point_cloud(n, seed=42)
        xyz, valid = jnp.asarray(pts), jnp.ones(n, bool)
        g_s = filter_ground(xyz, valid, cfg, impl="scatter").ground
        g_f = filter_ground(xyz, valid, cfg, impl="fused").ground
        np.testing.assert_array_equal(np.asarray(g_s), np.asarray(g_f))

    def test_split_scene_oracle(self):
        # sloped terrain + step: residual-triggered splits to depth 3
        rng = np.random.default_rng(7)
        n = 20000
        pts = np.empty((n, 3), np.float32)
        pts[:, 0] = rng.uniform(-80, 80, n)
        pts[:, 1] = rng.uniform(-80, 80, n)
        pts[:, 2] = (0.08 * pts[:, 0] + 0.5 * (pts[:, 1] > 20)
                     + rng.normal(0, 0.05, n))
        g_o, *_ = filter_ground_oracle(pts, PatchworkConfig())
        res = make_filter_ground(PatchworkConfig(), impl="fused")(
            jnp.asarray(pts), jnp.ones(n, bool))
        np.testing.assert_array_equal(np.asarray(res.ground), g_o)

    def test_velodyne_oracle(self):
        pts = velodyne_like_cloud(16384, seed=0)
        g_o, *_ = filter_ground_oracle(pts, PatchworkConfig())
        res = make_filter_ground(PatchworkConfig(), impl="fused")(
            jnp.asarray(pts), jnp.ones(len(pts), bool))
        np.testing.assert_array_equal(np.asarray(res.ground), g_o)

    def test_under_vmap(self):
        from patchwork_tpu.segment.engine import make_filter_ground_batched

        cfg = PatchworkConfig(filtering_radius=60.0)
        pts = np.stack([demo_point_cloud(4096, seed=i) for i in range(3)])
        xyz, valid = jnp.asarray(pts), jnp.ones((3, 4096), bool)
        g_f = make_filter_ground_batched(cfg, impl="fused")(xyz, valid).ground
        g_s = make_filter_ground_batched(cfg, impl="scatter")(xyz, valid).ground
        np.testing.assert_array_equal(np.asarray(g_f), np.asarray(g_s))

    def test_nan_scene(self):
        pts = demo_point_cloud(4096, seed=0).copy()
        pts[::37] = np.nan
        cfg = PatchworkConfig()
        g_o, *_ = filter_ground_oracle(pts, cfg)
        res = make_filter_ground(cfg, impl="fused")(
            jnp.asarray(pts), jnp.ones(len(pts), bool))
        np.testing.assert_array_equal(np.asarray(res.ground), g_o)

    def test_odd_point_count_padding(self):
        pts = demo_point_cloud(5001, seed=2)
        cfg = PatchworkConfig()
        g_s = filter_ground(jnp.asarray(pts), jnp.ones(5001, bool), cfg,
                            impl="scatter").ground
        g_f = filter_ground(jnp.asarray(pts), jnp.ones(5001, bool), cfg,
                            impl="fused").ground
        np.testing.assert_array_equal(np.asarray(g_s), np.asarray(g_f))

    def test_small_tile_bitwise(self, monkeypatch):
        # Small kernel tiles change the dirty-tile cache granularity and
        # the per-tile accumulation split; masks must stay bitwise equal
        # to the scatter golden path in both covariance modes.
        from patchwork_tpu.kernels import fit_pallas

        monkeypatch.setattr(fit_pallas, "_TILE_OVERRIDE", 1024)
        n = 16384
        pts = velodyne_like_cloud(n, seed=3)
        xyz, valid = jnp.asarray(pts), jnp.ones(n, bool)
        for fast in (False, True):
            cfg = PatchworkConfig(fast_covariance=fast)
            g_s = filter_ground(xyz, valid, cfg, impl="scatter").ground
            g_f = filter_ground(xyz, valid, cfg, impl="fused").ground
            np.testing.assert_array_equal(np.asarray(g_s), np.asarray(g_f))


class TestOrderStatKernel:
    """In-kernel exact order statistic (histogram refinement, no sort) vs
    a NumPy sort — the machinery behind the in-kernel percentile seeds
    (cpp:156-159) and split medians (cpp:253-269)."""

    def test_vs_numpy_sort(self):
        from patchwork_tpu.kernels.fit_pallas import seg_order_stat

        rng = np.random.default_rng(0)
        n, s = 5000, 37
        seg = rng.integers(0, s, n).astype(np.int32)
        vals = rng.normal(0, 50, n).astype(np.float32)
        # ties, signed zeros, duplicates, denormals
        vals[::7] = 0.0
        vals[1::13] = -0.0
        vals[2::11] = vals[0]
        vals[3::17] = np.float32(1e-42)
        valid = rng.random(n) > 0.2
        k = np.zeros(s, np.int32)
        expected = np.full(s, np.nan, np.float32)
        for i in range(s):
            v = np.sort(vals[(seg == i) & valid])
            if len(v):
                k[i] = min(len(v) - 1, int(0.3 * len(v)))
                expected[i] = v[k[i]]
        got = np.asarray(seg_order_stat(
            jnp.asarray(vals), jnp.asarray(seg), jnp.asarray(valid),
            jnp.asarray(k), s))
        ok = np.isnan(expected) | (got == expected)
        assert ok.all(), np.nonzero(~ok)

    def test_extreme_magnitudes(self):
        from patchwork_tpu.kernels.fit_pallas import seg_order_stat

        vals = np.array([-3e38, -1.0, -1e-40, 0.0, 1e-40, 1.0, 3e38, 2.0],
                        np.float32)
        seg = np.zeros(8, np.int32)
        for k in range(8):
            got = np.asarray(seg_order_stat(
                jnp.asarray(vals), jnp.asarray(seg),
                jnp.ones(8, bool), jnp.asarray([k], np.int32), 1))
            assert got[0] == np.sort(vals)[k]


def _bimodal_far_scene(n=24000, seed=5):
    """Zero-noise bimodal z at far range: the residual window where the
    reference's split rule actually fires under BOTH seed modes (the fit
    dynamics collapse bimodal patches in most natural scenes)."""
    rng = np.random.default_rng(seed)
    r = rng.uniform(90, 149, n)
    a = rng.uniform(0, 2 * np.pi, n)
    pts = np.empty((n, 3), np.float32)
    pts[:, 0] = r * np.cos(a)
    pts[:, 1] = r * np.sin(a)
    pts[:, 2] = 0.528 * (rng.random(n) > 0.5)
    return pts.astype(np.float32)


@pytest.mark.slow
class TestEngineFusedSplitSeedMatrix:
    """Round-2 coverage: the in-kernel split execution (remap prologue)
    and the in-kernel percentile seed threshold, jointly and separately,
    must stay bit-identical to the recursive oracle."""

    @pytest.mark.parametrize("adaptive", [True, False],
                             ids=["adaptive", "percentile"])
    def test_split_with_seed_mode(self, adaptive):
        from patchwork_tpu.oracle import reference as oref

        pts = _bimodal_far_scene()
        cfg = PatchworkConfig(adaptive_seed_height=adaptive, th_dist=0.24,
                              th_seeds=0.9, max_iter=1)

        orig = oref.fit_plane_and_split
        calls = {"n": 0}

        def wrapped(pp, md, depth, c):
            if depth > 0:
                calls["n"] += 1
            return orig(pp, md, depth, c)

        oref.fit_plane_and_split = wrapped
        try:
            g_o, *_ = filter_ground_oracle(pts, cfg)
        finally:
            oref.fit_plane_and_split = orig
        assert calls["n"] > 0, "scene must actually trigger splits"

        res = make_filter_ground(cfg, impl="fused")(
            jnp.asarray(pts), jnp.ones(len(pts), bool))
        np.testing.assert_array_equal(np.asarray(res.ground), g_o)

    def test_percentile_deficient_fallback(self):
        # percentile so extreme every node goes through the 3-lowest-z
        # fallback (cpp:171-182), through the fused kernels
        pts = demo_point_cloud(8000, seed=9)
        cfg = PatchworkConfig(adaptive_seed_height=False,
                              seed_percentile=0.0001, th_seeds=-10.0)
        g_o, *_ = filter_ground_oracle(pts, cfg)
        res = make_filter_ground(cfg, impl="fused")(
            jnp.asarray(pts), jnp.ones(len(pts), bool))
        np.testing.assert_array_equal(np.asarray(res.ground), g_o)

    def test_node_pool_truncation_matches_onehot(self):
        # overflowing the compact node pool truncates identically on the
        # kernel and XLA paths (fused has no oracle here by design)
        rng = np.random.default_rng(7)
        n = 20000
        pts = np.empty((n, 3), np.float32)
        pts[:, 0] = rng.uniform(-80, 80, n)
        pts[:, 1] = rng.uniform(-80, 80, n)
        pts[:, 2] = (0.08 * pts[:, 0] + 0.5 * (pts[:, 1] > 20)
                     + rng.normal(0, 0.05, n))
        cfg = PatchworkConfig(max_active_nodes_cfg=4)
        xyz, valid = jnp.asarray(pts), jnp.ones(n, bool)
        g_f = filter_ground(xyz, valid, cfg, impl="fused").ground
        g_x = filter_ground(xyz, valid, cfg, impl="onehot").ground
        np.testing.assert_array_equal(np.asarray(g_f), np.asarray(g_x))

    def test_fast_covariance_split_scene(self):
        # fast mode on the split scene: bit-equal to the oracle here
        # (guaranteed IoU-level in general, bitwise on these scenes)
        rng = np.random.default_rng(7)
        n = 20000
        pts = np.empty((n, 3), np.float32)
        pts[:, 0] = rng.uniform(-80, 80, n)
        pts[:, 1] = rng.uniform(-80, 80, n)
        pts[:, 2] = (0.08 * pts[:, 0] + 0.5 * (pts[:, 1] > 20)
                     + rng.normal(0, 0.05, n))
        cfg = PatchworkConfig(fast_covariance=True)
        g_o, *_ = filter_ground_oracle(pts, cfg)
        res = make_filter_ground(cfg, impl="fused")(
            jnp.asarray(pts), jnp.ones(n, bool))
        np.testing.assert_array_equal(np.asarray(res.ground), g_o)
