"""Pallas TPU kernels, differentially tested against the scatter golden
path (interpret mode on CPU — same kernels compile on real TPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from patchwork_tpu.kernels.seg_pallas import (
    seg_gather_pallas,
    seg_minmax_pallas,
    seg_sum_pallas,
)
from patchwork_tpu.segment.segops import SegOps

RNG = np.random.default_rng(7)
N, S = 4096, 161


def rand_seg():
    return jnp.asarray(RNG.integers(0, S, N).astype(np.int32))


class TestKernels:
    def test_seg_sum_matches_scatter(self):
        seg = rand_seg()
        data = jnp.asarray(RNG.normal(size=(N, 8)).astype(np.float32))
        ref = jax.ops.segment_sum(data, seg, num_segments=S)
        got = seg_sum_pallas(data, seg, S)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)

    def test_seg_sum_empty_segments(self):
        seg = jnp.zeros(N, jnp.int32)  # everything in segment 0
        data = jnp.ones((N, 2), jnp.float32)
        got = np.asarray(seg_sum_pallas(data, seg, S))
        assert got[0, 0] == N and got[1:].sum() == 0

    def test_gather_matches_indexing(self):
        seg = rand_seg()
        table = jnp.asarray(RNG.normal(size=(S, 5)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(seg_gather_pallas(table, seg)), np.asarray(table[seg])
        )

    def test_minmax_matches_scatter(self):
        seg = rand_seg()
        vals = jnp.asarray(RNG.normal(size=(N, 3)).astype(np.float32))
        mask = jnp.asarray(RNG.random(N) < 0.7)
        mins, maxs = seg_minmax_pallas(vals, seg, mask, S)
        for i in range(3):
            ref_min = jax.ops.segment_min(
                jnp.where(mask, vals[:, i], jnp.inf), seg, num_segments=S
            )
            ref_max = jax.ops.segment_max(
                jnp.where(mask, vals[:, i], -jnp.inf), seg, num_segments=S
            )
            np.testing.assert_array_equal(np.asarray(mins[i]), np.asarray(ref_min))
            np.testing.assert_array_equal(np.asarray(maxs[i]), np.asarray(ref_max))


class TestSegOpsPallasImpl:
    def test_ops_surface(self):
        seg = rand_seg()
        ops_p = SegOps(seg, S, "pallas")
        ops_s = SegOps(seg, S, "scatter")
        data = jnp.asarray(RNG.normal(size=(N, 4)).astype(np.float32))
        np.testing.assert_allclose(
            np.asarray(ops_p.sum(data)), np.asarray(ops_s.sum(data)), atol=1e-4
        )
        mask = jnp.asarray(RNG.random(N) < 0.5)
        np.testing.assert_array_equal(
            np.asarray(ops_p.count(mask)), np.asarray(ops_s.count(mask))
        )
        xyz = jnp.asarray(RNG.normal(size=(N, 3)).astype(np.float32))
        mp, xp = ops_p.bbox(xyz, mask)
        ms, xs = ops_s.bbox(xyz, mask)
        np.testing.assert_array_equal(np.asarray(mp), np.asarray(ms))
        np.testing.assert_array_equal(np.asarray(xp), np.asarray(xs))
        table = jnp.asarray(RNG.normal(size=(S,)).astype(np.float32))
        np.testing.assert_array_equal(
            np.asarray(ops_p.gather(table)), np.asarray(ops_s.gather(table))
        )

    def test_engine_pallas_impl_matches_oracle(self):
        from patchwork_tpu import PatchworkConfig
        from patchwork_tpu.io.synthetic import demo_point_cloud
        from patchwork_tpu.oracle.reference import filter_ground_oracle
        from patchwork_tpu.segment.engine import make_filter_ground

        pts = demo_point_cloud(2048, seed=13)
        cfg = PatchworkConfig(filtering_radius=50.0, max_levels=2, num_sectors=8)
        g_o, *_ = filter_ground_oracle(pts, cfg)
        res = make_filter_ground(cfg, impl="pallas")(
            jnp.asarray(pts), jnp.ones(len(pts), bool)
        )
        np.testing.assert_array_equal(np.asarray(res.ground), g_o)

    def test_engine_pallas_impl_batched_vmap(self):
        # pallas kernels must batch correctly under vmap (interpret mode)
        from patchwork_tpu import PatchworkConfig
        from patchwork_tpu.io.synthetic import demo_point_cloud
        from patchwork_tpu.segment.engine import (
            make_filter_ground,
            make_filter_ground_batched,
        )

        cfg = PatchworkConfig(filtering_radius=50.0, max_levels=1, num_sectors=8)
        xyz = jnp.asarray(
            np.stack([demo_point_cloud(1024, seed=i) for i in range(2)])
        )
        valid = jnp.ones((2, 1024), bool)
        gb = np.asarray(
            make_filter_ground_batched(cfg, impl="pallas")(xyz, valid).ground
        )
        single = make_filter_ground(cfg, impl="scatter")
        for i in range(2):
            np.testing.assert_array_equal(
                gb[i], np.asarray(single(xyz[i], valid[i]).ground)
            )
