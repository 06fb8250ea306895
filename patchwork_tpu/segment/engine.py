"""The Recursive Patchwork engine, TPU-first.

The reference algorithm (src/recursive_patchwork.cpp:109-426) is a
host-side loop nest: for each of rings*sectors patches, gather the patch's
points (O(rings*sectors*N) rescans), run a data-dependent iterative PCA
plane fit, and recurse into median splits of unbounded depth — with a GPU
round-trip per plane-distance evaluation (cpp:206).

Here the same semantics are re-stated as a fixed-shape SPMD program:

* every point carries a *node id*; level k has num_patches * 2^k nodes —
  the recursion is flattened into ``max_levels`` batched levels;
* per-node statistics (counts, bounding boxes, seeds, plane moments,
  medians) are segment reductions / segment sorts over the whole cloud —
  every node of a level is processed simultaneously;
* the <= max_iter re-fit loop runs as ONE ``lax.while_loop`` over the whole
  level with per-node convergence masks (converged nodes freeze; the loop
  exits when all nodes converged — same early-exit as the reference's
  per-patch ``break``, cpp:215);
* plane normals come from the batched closed-form 3x3 eigensolve
  (ops/geometry.py) instead of per-patch host Eigen calls (cpp:89).

Everything is jit-compiled once per (capacity, config); arrays never leave
device; ``vmap`` batches scans and ``pjit``/``shard_map`` shard them across
a TPU mesh (patchwork_tpu.parallel).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import PatchworkConfig
from ..core.types import GroundResult
from ..ops.geometry import eigh3x3
from .binning import assign_patches
from .segops import seg_max, seg_min, seg_sum, sort_by_segment

__all__ = ["filter_ground", "make_filter_ground", "make_filter_ground_batched"]

_F32 = jnp.float32
_INF = jnp.float32(jnp.inf)


def _fit_planes(xyz, gmask, seg, num_segs):
    """Batched masked PCA plane fit per segment.

    Returns (gcnt (S,), normal (S,3), dist (N,)) where ``dist`` is each
    point's |(p - c_seg) . n_seg| against its own segment's plane.
    Mirrors fitPlanePCA (cpp:77-107) + computePlaneDistances (cuda_wrapper.cu:89-102).
    """
    g = gmask.astype(_F32)
    first = seg_sum(jnp.concatenate([xyz * g[:, None], g[:, None]], axis=1), seg, num_segs)
    gcnt = first[:, 3]
    centroid = first[:, :3] / jnp.maximum(gcnt, 1.0)[:, None]

    d = xyz - centroid[seg]
    dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
    prods = jnp.stack([dx * dx, dx * dy, dx * dz, dy * dy, dy * dz, dz * dz], axis=1)
    second = seg_sum(prods * g[:, None], seg, num_segs)
    denom = jnp.maximum(gcnt - 1.0, 1.0)[:, None]
    m = second / denom  # (S, 6): xx, xy, xz, yy, yz, zz
    cov = jnp.stack(
        [
            jnp.stack([m[:, 0], m[:, 1], m[:, 2]], axis=-1),
            jnp.stack([m[:, 1], m[:, 3], m[:, 4]], axis=-1),
            jnp.stack([m[:, 2], m[:, 4], m[:, 5]], axis=-1),
        ],
        axis=-2,
    )
    _, normal = eigh3x3(cov)
    normal = jnp.where(normal[:, 2:3] < 0, -normal, normal)
    dist = jnp.abs(jnp.einsum("ni,ni->n", d, normal[seg], precision="highest"))
    return gcnt, normal, dist


def filter_ground(
    xyz: jax.Array, valid: jax.Array, cfg: PatchworkConfig
) -> GroundResult:
    """Segment one scan into ground / non-ground masks.

    ``xyz``: (N, 3) float32, ``valid``: (N,) bool.  Shapes are static; jit
    this with ``cfg`` static (see :func:`make_filter_ground`).
    """
    pa = assign_patches(xyz, valid, cfg)
    num_p = cfg.num_patches
    eff_levels = cfg.effective_levels

    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    n_points = xyz.shape[0]

    # Per-base-patch thresholds, threaded unchanged through all split
    # levels (reference passes mean_dist down the recursion, cpp:286-287).
    rel = pa.rel_dist  # (P+1,)
    tau_patch = _F32(cfg.th_dist) * (1.0 + _F32(cfg.tau_slope) * rel)
    zth_patch = _F32(cfg.sensor_height) + _F32(cfg.seed_slope) * rel

    node = pa.patch.astype(jnp.int32)  # level-0 node id == patch id
    done = ~pa.in_patch
    ground = jnp.zeros((n_points,), bool)

    for level in range(eff_levels):
        num_nodes = num_p * (1 << level)
        trash = num_nodes
        num_segs = num_nodes + 1

        active = pa.in_patch & ~done
        seg = jnp.where(active, node, trash)
        w = active.astype(_F32)

        # ---- per-node stats (counts + bounding box) ----
        cnt_i = seg_sum(active.astype(jnp.int32), seg, num_segs)
        big = _INF
        xmin = seg_min(jnp.where(active, x, big), seg, num_segs)
        xmax = seg_max(jnp.where(active, x, -big), seg, num_segs)
        ymin = seg_min(jnp.where(active, y, big), seg, num_segs)
        ymax = seg_max(jnp.where(active, y, -big), seg, num_segs)
        zmin = seg_min(jnp.where(active, z, big), seg, num_segs)
        zmax = seg_max(jnp.where(active, z, -big), seg, num_segs)

        node_ids = jnp.arange(num_segs, dtype=jnp.int32)
        real = node_ids < num_nodes
        patch_of_node = jnp.minimum(node_ids >> level, num_p)  # trash -> P slot

        # ---- early-outs, in reference order (cpp:111-140) ----
        too_small = cnt_i < 3
        area = (xmax - xmin) * (ymax - ymin)
        flat_area = (area < _F32(cfg.flat_area_m2)) if level > 0 else jnp.zeros_like(too_small)
        flat_area = flat_area & ~too_small
        flat_z = ((zmax - zmin) < _F32(cfg.flat_dz)) & (cnt_i > cfg.flat_min_points)
        flat_z = flat_z & ~too_small & ~flat_area
        finished_now = real & (too_small | flat_area | flat_z)
        label_true = flat_area | flat_z
        fit_node = real & ~finished_now & (cnt_i >= 3)

        # ---- seed selection (cpp:143-182) ----
        sortz = sort_by_segment(seg, z, num_segs)
        if cfg.adaptive_seed_height:
            z_th = zth_patch[patch_of_node]
        else:
            k10 = (_F32(cfg.seed_percentile) * cnt_i.astype(_F32)).astype(jnp.int32)
            z_th = sortz.order_stat(k10) + _F32(cfg.th_seeds)
        seed = active & (z < z_th[seg])
        seed_cnt = seg_sum(seed.astype(jnp.int32), seg, num_segs)
        deficient = fit_node & (seed_cnt < cfg.min_seed_points)
        low3 = sortz.scatter_rank_below(cfg.min_seed_points)
        seed = jnp.where(deficient[seg], low3, seed) & active

        # ---- write early-out labels; init fitting nodes with seeds ----
        ground = jnp.where(active & finished_now[seg], label_true[seg], ground)
        ground = jnp.where(active & fit_node[seg], seed, ground)
        done = done | (active & finished_now[seg])

        # ---- batched iterative plane fitting (cpp:186-217) ----
        tau_node = tau_patch[patch_of_node]

        def _cond(state):
            _, iter_active, it = state
            return (it < cfg.max_iter) & jnp.any(iter_active)

        def _body(state):
            g_mask, iter_active, it = state
            gcnt, _, dist = _fit_planes(xyz, g_mask & active, seg, num_segs)
            can_fit = gcnt >= 3.0
            update_node = iter_active & can_fit
            new_g = dist < tau_node[seg]
            apply_pt = active & update_node[seg]
            changed = apply_pt & (new_g != g_mask)
            node_changed = seg_sum(changed.astype(jnp.int32), seg, num_segs) > 0
            g_next = jnp.where(apply_pt, new_g, g_mask)
            return g_next, update_node & node_changed, it + 1

        ground, _, _ = jax.lax.while_loop(
            _cond, _body, (ground, fit_node, jnp.int32(0))
        )

        # ---- final fit, residual, split decision (cpp:219-235) ----
        g_final = ground & active
        gcnt, _, dist = _fit_planes(xyz, g_final, seg, num_segs)
        resid = seg_sum(dist * g_final.astype(_F32), seg, num_segs) / jnp.maximum(
            gcnt, 1.0
        )
        resid = jnp.where(gcnt >= 3.0, resid, _INF)

        can_split_level = (level < eff_levels - 1) and (level < cfg.max_split_depth)
        if can_split_level:
            split_thresh = _F32(cfg.th_dist) * (
                1.0 + _F32(cfg.split_residual_slope) * level
            )
            min_sz = cfg.split_min_points_base + cfg.split_min_points_slope * level
            split = fit_node & (resid > split_thresh) & (cnt_i >= min_sz)

            done = done | (active & fit_node[seg] & ~split[seg])

            # ---- variance-axis median split (cpp:237-283) ----
            sums = seg_sum(
                jnp.stack([x, y], axis=1) * w[:, None], seg, num_segs
            )
            c_all = sums / jnp.maximum(cnt_i.astype(_F32), 1.0)[:, None]
            dx = (x - c_all[seg, 0]) * w
            dy = (y - c_all[seg, 1]) * w
            var = seg_sum(jnp.stack([dx * dx, dy * dy], axis=1), seg, num_segs)
            axis_is_x = var[:, 0] > var[:, 1]

            val = jnp.where(axis_is_x[seg], x, y)
            sortv = sort_by_segment(seg, val, num_segs)
            median = sortv.order_stat(cnt_i // 2)

            go_right = active & split[seg] & (val > median[seg])
            node = node * 2 + go_right.astype(jnp.int32)
        else:
            # Last level: every remaining fitting node keeps its converged
            # mask (reference recursion would have split further; depth is
            # truncated at cfg.max_levels — see PatchworkConfig.max_levels).
            done = done | (active & fit_node[seg])

    ground = ground & pa.in_patch
    return GroundResult(
        ground=ground, valid=pa.finite, in_zone=pa.in_zone, in_patch=pa.in_patch
    )


def make_filter_ground(cfg: PatchworkConfig):
    """jit-compiled single-scan engine: (xyz (N,3), valid (N,)) -> GroundResult."""

    @jax.jit
    def fn(xyz, valid):
        return filter_ground(xyz, valid, cfg)

    return fn


def make_filter_ground_batched(cfg: PatchworkConfig):
    """jit-compiled batched engine: (xyz (B,N,3), valid (B,N)) -> GroundResult."""

    @jax.jit
    @functools.partial(jax.vmap, in_axes=(0, 0))
    def fn(xyz, valid):
        return filter_ground(xyz, valid, cfg)

    return fn
