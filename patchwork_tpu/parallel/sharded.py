"""Mesh-sharded batch segmentation (pjit / GSPMD).

The full engine jit-compiles with the scan batch sharded over the mesh:
frames over ``dp``, points within each frame over ``sp``.  XLA GSPMD
partitions the segment reductions and inserts the ICI collectives; the
per-node arrays (one slot per tree node) stay replicated — they are tiny
(num_patches * 2^level floats) next to the point data, so the collective
traffic per step is O(nodes), not O(points).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..core.config import PatchworkConfig
from ..segment.engine import filter_ground
from ..segment.segops import default_impl
from .mesh import scan_batch_sharding

__all__ = ["make_sharded_filter_ground", "make_sharded_pipeline"]


def make_sharded_filter_ground(
    cfg: PatchworkConfig, mesh, shard_points: bool = True
):
    """jit-compiled (B, N) batched engine with mesh input/output shardings.

    Returns fn(xyz (B,N,3), valid (B,N)) -> GroundResult of (B,N) masks.
    """
    xyz_s, valid_s = scan_batch_sharding(mesh, shard_points)

    # GSPMD partitions XLA ops only: force the pure-XLA segment impl (the
    # 'fused' pallas path cannot be auto-sharded over the point axis)
    impl = cfg.segment_impl or default_impl(gspmd=True)

    @functools.partial(
        jax.jit,
        in_shardings=(xyz_s, valid_s),
        out_shardings=valid_s,
    )
    def fn(xyz, valid):
        return jax.vmap(lambda p, v: filter_ground(p, v, cfg, impl=impl))(
            xyz, valid)

    return fn


def make_sharded_pipeline(cfg: PatchworkConfig, mesh, shard_points: bool = True):
    """Full streaming step: segmentation + per-frame summary stats.

    The summary (ground/non-ground counts per frame — what the reference's
    ROS2 node publishes as markers, recursive_patchwork_node.cpp:159-221)
    reduces on device so only (B, 2) ints cross to the host.
    """
    xyz_s, valid_s = scan_batch_sharding(mesh, shard_points)
    impl = cfg.segment_impl or default_impl(gspmd=True)

    @functools.partial(jax.jit, in_shardings=(xyz_s, valid_s))
    def fn(xyz, valid):
        res = jax.vmap(lambda p, v: filter_ground(p, v, cfg, impl=impl))(
            xyz, valid)
        ground_cnt = jnp.sum(res.ground, axis=-1, dtype=jnp.int32)
        nong_cnt = jnp.sum(res.valid & ~res.ground, axis=-1, dtype=jnp.int32)
        return res, ground_cnt, nong_cnt

    return fn
