"""Per-stage slope profile of the fused engine on the current backend.

Times each pipeline stage of the production (impl='fused') path by slope
(t(2R) - t(R)) / R so the tunnel's constant scalar-fetch cost cancels
(CLAUDE.md: single-call timings are fetch-dominated on the axon tunnel).

Stages:
  full_fast / full_exact   the complete batched engine
  binning                  assign_patches incl. the rel_dist segment mean
  binning_elemwise         assign_patches minus the segment mean
  prepack                  binning + fast shift + tau/zth + level-0 pack
  level0_kernel            one level_megakernel launch on pre-packed input
Prints one JSON object with ms-per-batch for every stage.
"""

import argparse
import functools
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--cloud", default="velodyne",
                    choices=["velodyne", "demo"])
    ap.add_argument("--kernel-sweep", action="store_true",
                    help="sweep level-0 kernel tile sizes x max_iter")
    ap.add_argument("--sweep-only", action="store_true",
                    help="skip the per-stage base profile (implies "
                         "--kernel-sweep)")
    ap.add_argument("--tiles", type=int, nargs="+",
                    default=[1024, 2048, 4096],
                    help="tile sizes for --kernel-sweep")
    ap.add_argument("--iters", type=int, nargs="+",
                    default=[1, 2, 4, 8, 16, 32, 64, 100],
                    help="max_iter values for --kernel-sweep")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from patchwork_tpu import PatchworkConfig
    from patchwork_tpu.io.synthetic import (demo_point_cloud,
                                            velodyne_like_cloud)
    from patchwork_tpu.segment.binning import assign_patches
    from patchwork_tpu.segment.engine import make_filter_ground_batched

    gen = {"velodyne": velodyne_like_cloud, "demo": demo_point_cloud}[
        args.cloud]
    b, n = args.batch, args.points
    xyz = jnp.asarray(np.stack([gen(n, seed=i) for i in range(b)]))
    valid = jnp.ones((b, n), bool)
    cfg_fast = PatchworkConfig(fast_covariance=True)
    cfg_exact = PatchworkConfig(fast_covariance=False)

    def slope_ms(fn, out_scalar, reps):
        """ms per call by slope; fn() must return device arrays."""
        r = fn()
        float(out_scalar(r))  # compile + warmup
        t_at = {}
        for k in (reps, 2 * reps):
            t0 = time.perf_counter()
            for _ in range(k):
                r = fn()
            float(out_scalar(r))
            t_at[k] = time.perf_counter() - t0
        return (t_at[2 * reps] - t_at[reps]) / reps * 1e3

    out = {}
    if args.sweep_only:
        args.kernel_sweep = True

    # ---- full engine ----
    if not args.sweep_only:
        fn_fast = make_filter_ground_batched(cfg_fast)
        fn_exact = make_filter_ground_batched(cfg_exact)
        out["full_fast_ms"] = slope_ms(
            lambda: fn_fast(xyz, valid), lambda r: r.ground.sum(), args.reps)
        out["full_exact_ms"] = slope_ms(
            lambda: fn_exact(xyz, valid), lambda r: r.ground.sum(), args.reps)

    # ---- binning ----
    @jax.jit
    @jax.vmap
    def bin_full(x, v):
        return assign_patches(x, v, cfg_fast, impl="onehot")

    if not args.sweep_only:
        out["binning_ms"] = slope_ms(
            lambda: bin_full(xyz, valid), lambda r: r.rel_dist.sum(),
            args.reps)

    from patchwork_tpu.ops.pointcloud import (distance_2d, finite_mask,
                                              polar_angle)
    from patchwork_tpu.segment.binning import ring_edges, sector_edges

    r_edges = jnp.asarray(ring_edges(cfg_fast))
    s_edges = jnp.asarray(sector_edges(cfg_fast))

    @jax.jit
    @jax.vmap
    def bin_elem(x, v):
        fin = v & finite_mask(x)
        x = jnp.where(fin[:, None], x, 0.0)
        d = distance_2d(x)
        ang = polar_angle(x)
        in_zone = fin & (d <= jnp.float32(cfg_fast.filtering_radius))
        ring = jnp.sum(d[:, None] >= r_edges[None, 1:-1], axis=1)
        in_ring = (d >= r_edges[0]) & (d < r_edges[-1])
        sector = jnp.sum(ang[:, None] >= s_edges[None, 1:-1], axis=1)
        in_sector = ang < s_edges[-1]
        in_patch = in_zone & in_ring & in_sector
        patch = jnp.where(in_patch, ring * cfg_fast.num_sectors + sector,
                          cfg_fast.num_patches)
        return patch, in_patch, d

    if not args.sweep_only:
        out["binning_elemwise_ms"] = slope_ms(
            lambda: bin_elem(xyz, valid), lambda r: r[2].sum(), args.reps)

    # ---- pre-pack (everything before the first kernel launch) ----
    from patchwork_tpu.kernels.fit_pallas import sp_width

    _F32 = jnp.float32
    num_p = cfg_fast.num_patches

    def prepack_one(x, v, cfg):
        # mirrors segment/engine._fused_levels (level-0 node id == patch id)
        pa = assign_patches(x, v, cfg, impl="onehot")
        x = jnp.where(pa.finite[:, None], x, 0.0)
        if cfg.fast_covariance:
            ring = (pa.patch // cfg.num_sectors).astype(_F32)
            sec = (pa.patch % cfg.num_sectors).astype(_F32)
            ln_r = math.log(cfg.filtering_radius / cfg.r_min) / cfg.num_rings
            r_c = _F32(0.5 * cfg.r_min * (1.0 + math.exp(ln_r))) * jnp.exp(
                ring * _F32(ln_r))
            a_c = (sec + _F32(0.5)) * _F32(2.0 * math.pi / cfg.num_sectors)
            w = pa.in_patch.astype(_F32) * r_c
            shift = jnp.stack(
                [w * jnp.cos(a_c), w * jnp.sin(a_c), jnp.zeros_like(w)],
                axis=1)
            x = x - shift
        tau_patch = _F32(cfg.th_dist) * (1.0 + _F32(cfg.tau_slope)
                                         * pa.rel_dist)
        zth_patch = _F32(cfg.sensor_height) + _F32(cfg.seed_slope) * pa.rel_dist
        npad = (-n) % 128
        idx_row = jnp.arange(n + npad, dtype=_F32)[None, :]
        xyz_t = jnp.pad(x.T, ((0, 0), (0, npad)))
        seg0 = jnp.where(pa.in_patch, pa.patch.astype(_F32), _F32(num_p))
        rows = jnp.stack([
            jnp.pad(seg0, (0, npad), constant_values=float(num_p)),
            jnp.pad(jnp.zeros((n,), _F32), (0, npad)),
            jnp.pad((~pa.in_patch).astype(_F32), (0, npad),
                    constant_values=1.0),
        ])
        pts = jnp.concatenate(
            [xyz_t, rows[0:1], rows[1:3], idx_row,
             jnp.zeros((1, n + npad), _F32)], axis=0)
        return pts, tau_patch, zth_patch

    prepack = jax.jit(jax.vmap(lambda x, v: prepack_one(x, v, cfg_fast)))
    if not args.sweep_only:
        out["prepack_ms"] = slope_ms(
            lambda: prepack(xyz, valid), lambda r: r[0].sum(), args.reps)

    # ---- level-0 kernel alone on pre-packed input ----
    from patchwork_tpu.kernels.fit_pallas import level_megakernel

    pts_b, tau_b, zth_b = jax.block_until_ready(prepack(xyz, valid))
    sp0 = sp_width(num_p + 1)

    def tables_one(tau_patch, zth_patch, cfg):
        def _row0(vv):
            return jnp.pad(vv, (0, sp0 - (num_p + 1)))[None, :]
        real = jnp.pad((jnp.arange(num_p + 1) < num_p).astype(_F32),
                       (0, sp0 - (num_p + 1)))[None, :]
        thresh = _F32(cfg.th_dist)
        min_sz = _F32(cfg.split_min_points_base)
        return jnp.concatenate([
            _row0(tau_patch), _row0(zth_patch), real,
            jnp.full((1, sp0), thresh, _F32),
            jnp.full((1, sp0), min_sz, _F32),
            jnp.ones((1, sp0), _F32),
            jnp.zeros((2, sp0), _F32),
        ], axis=0)

    def lvl0_one_t(pts, tau_patch, zth_patch, cfg, max_iter, tile=None):
        tabs = tables_one(tau_patch, zth_patch, cfg)
        return level_megakernel(
            pts, tabs, num_p + 1, max_iter, True,
            cfg.min_seed_points, cfg.flat_area_m2, cfg.flat_dz,
            cfg.flat_min_points, tile=tile, fast=cfg.fast_covariance,
            adaptive=cfg.adaptive_seed_height,
            seed_percentile=cfg.seed_percentile, th_seeds=cfg.th_seeds,
            remap=False)

    def lvl0_one(pts, tau_patch, zth_patch, cfg):
        return lvl0_one_t(pts, tau_patch, zth_patch, cfg, cfg.max_iter)

    if not args.sweep_only:
        for name, cfg in (("fast", cfg_fast), ("exact", cfg_exact)):
            lvl0 = jax.jit(jax.vmap(
                lambda p, t, z: lvl0_one(p, t, z, cfg)))
            out[f"level0_kernel_{name}_ms"] = slope_ms(
                lambda: lvl0(pts_b, tau_b, zth_b), lambda r: r[1].sum(),
                args.reps)

    # ---- kernel sweep: per-iteration cost + tile-size sensitivity ----
    if args.kernel_sweep:
        for tile in args.tiles:
            for mi in args.iters:
                for name, cfg in (("fast", cfg_fast), ("exact", cfg_exact)):
                    lvl0 = jax.jit(jax.vmap(functools.partial(
                        lvl0_one_t, cfg=cfg, max_iter=mi, tile=tile)))
                    out[f"lvl0_{name}_t{tile}_i{mi}_ms"] = slope_ms(
                        lambda: lvl0(pts_b, tau_b, zth_b),
                        lambda r: r[1].sum(), max(6, args.reps // 2))

    out["backend"] = jax.devices()[0].device_kind
    out["batch"], out["points"] = b, n
    print(json.dumps({k: (round(v, 3) if isinstance(v, float) else v)
                      for k, v in out.items()}))


if __name__ == "__main__":
    main()
