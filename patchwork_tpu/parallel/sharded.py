"""Mesh-sharded batch segmentation (pjit/GSPMD + shard_map fused).

Two sharded execution paths:

* ``sp > 1`` (points sharded within a scan): the engine jit-compiles under
  GSPMD with the pure-XLA 'onehot' segment impl — XLA partitions the
  segment reductions and inserts the ICI collectives.  Per-node arrays
  stay replicated (tiny next to the points), so collective traffic per
  step is O(nodes), not O(points).
* ``sp == 1`` (whole scans per device, the common pod layout): scans are
  independent across ``dp``, so :func:`make_shardmap_fused` runs the FULL
  fused Pallas mega-kernel engine on each device's local shard under
  ``shard_map`` — a ``pallas_call`` cannot be GSPMD-auto-partitioned, but
  inside shard_map it only ever sees local, unsharded arrays.  Per-chip
  throughput on a pod therefore matches the single-chip fused rate
  (~9x the onehot rate at KITTI scale); no collective is needed until
  the summary reduce.  Masks are bit-identical to a single-device run
  (asserted in __graft_entry__.dryrun_multichip).

The reference has no multi-device analogue at all (single
cudaSetDevice(0), cuda/cuda_interface.cu:68).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..core.config import PatchworkConfig
from ..segment.engine import filter_ground
from ..segment.segops import default_impl
from .mesh import DATA_AXIS, POINT_AXIS, scan_batch_sharding

__all__ = ["make_sharded_filter_ground", "make_sharded_pipeline",
           "make_shardmap_fused"]


def _use_fused_shardmap(cfg: PatchworkConfig, shard_points: bool) -> bool:
    """Route whole-scan-per-device execution through the fused engine."""
    impl = cfg.segment_impl or default_impl()
    return (not shard_points) and impl == "fused"


def make_shardmap_fused(cfg: PatchworkConfig, mesh, with_counts: bool = False):
    """dp-sharded batched engine running the fused mega-kernel per device.

    fn(xyz (B,N,3), valid (B,N)) -> GroundResult of (B,N) masks (plus
    per-frame (B,) ground / non-ground counts when ``with_counts``).
    B must divide by the mesh's dp size.  If the mesh has an sp axis of
    size > 1 the computation is replicated across it (inputs and outputs
    are unsharded along points) — prefer an sp=1 mesh.
    """

    def local(xyz, valid):
        res = jax.vmap(
            lambda p, v: filter_ground(p, v, cfg, impl="fused"))(xyz, valid)
        if not with_counts:
            return res
        ground_cnt = jnp.sum(res.ground, axis=-1, dtype=jnp.int32)
        nong_cnt = jnp.sum(res.valid & ~res.ground, axis=-1, dtype=jnp.int32)
        return res, ground_cnt, nong_cnt

    mask_spec = P(DATA_AXIS, None)
    out_specs = (mask_spec, P(DATA_AXIS), P(DATA_AXIS)) if with_counts \
        else mask_spec
    smapped = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(DATA_AXIS, None, None), P(DATA_AXIS, None)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(smapped)


def make_sharded_filter_ground(
    cfg: PatchworkConfig, mesh, shard_points: bool = True
):
    """jit-compiled (B, N) batched engine with mesh input/output shardings.

    Returns fn(xyz (B,N,3), valid (B,N)) -> GroundResult of (B,N) masks.
    With ``shard_points=False`` on a fused-capable backend this routes
    through :func:`make_shardmap_fused` (full per-chip kernel speed);
    otherwise GSPMD partitions the 'onehot' engine.
    """
    if _use_fused_shardmap(cfg, shard_points):
        return make_shardmap_fused(cfg, mesh)

    xyz_s, valid_s = scan_batch_sharding(mesh, shard_points)

    # GSPMD partitions XLA ops only: force the pure-XLA segment impl (the
    # 'fused' pallas path cannot be auto-sharded over the point axis)
    impl = cfg.segment_impl or default_impl(gspmd=True)
    if impl == "fused":
        impl = "onehot"

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
    if _use_fused_shardmap(cfg, shard_points):
        return make_shardmap_fused(cfg, mesh, with_counts=True)

    xyz_s, valid_s = scan_batch_sharding(mesh, shard_points)
    impl = cfg.segment_impl or default_impl(gspmd=True)
    if impl == "fused":
        impl = "onehot"

    @functools.partial(jax.jit, in_shardings=(xyz_s, valid_s))
    def fn(xyz, valid):
        res = jax.vmap(lambda p, v: filter_ground(p, v, cfg, impl=impl))(
            xyz, valid)
        ground_cnt = jnp.sum(res.ground, axis=-1, dtype=jnp.int32)
        nong_cnt = jnp.sum(res.valid & ~res.ground, axis=-1, dtype=jnp.int32)
        return res, ground_cnt, nong_cnt

    return fn
