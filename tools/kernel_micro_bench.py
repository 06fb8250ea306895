"""Micro-bench: per-iteration cost of fit-loop formulations on the TPU.

Times each candidate inside a fori_loop under one jit so dispatch overhead
amortizes; reports us/iteration.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--segs", type=int, default=81)
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from patchwork_tpu.kernels.fit_pallas import (
        fit_pack, fused_apply, fused_moments2, sp_width)
    from patchwork_tpu.segment.segops import SegOps
    from patchwork_tpu.segment.engine import _fit_step, _cov_normal

    n, s, iters = args.points, args.segs, args.iters
    sp = sp_width(s)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(rng.normal(0, 20, (n, 3)).astype(np.float32))
    seg = jnp.asarray(rng.integers(0, s, n).astype(np.int32))
    g0 = jnp.asarray((rng.random(n) < 0.5))
    am = jnp.ones(n, bool)
    tau = jnp.asarray(rng.uniform(0.1, 0.4, n).astype(np.float32))
    tab = jnp.asarray(rng.normal(0, 1, (8, sp)).astype(np.float32))
    tab = tab.at[6].set(1.0)
    p = fit_pack(xyz, tau, am, seg)
    g_row = g0.astype(jnp.float32)[None]

    def timeit(name, fn, *a):
        f = jax.jit(fn)
        r = f(*a)
        float(jnp.sum(r))  # sync
        t0 = time.perf_counter()
        r = f(*a)
        float(jnp.sum(r))
        dt = time.perf_counter() - t0
        print(f"{name:34s} {dt / iters * 1e6:9.1f} us/iter")

    # fused pallas kernels at several tiles
    for tile in (1024, 2048, 4096, 8192):
        def loop_apply(g, tile=tile):
            def body(i, g):
                g2, stats = fused_apply(p, g, tab, s, tile=tile)
                return g2 * (1.0 - 1e-9 * stats[0, 0])  # keep dependency
            return lax.fori_loop(0, iters, body, g)
        try:
            timeit(f"fused_apply tile={tile}", loop_apply, g_row)
        except Exception as e:
            print(f"fused_apply tile={tile}: {type(e).__name__} {str(e)[:80]}")

    for tile in (2048, 8192):
        def loop_m2(g, tile=tile):
            def body(i, acc):
                m2 = fused_moments2(p, g, tab, s, tile=tile)
                return acc + m2[0, 0]
            return lax.fori_loop(0, iters, body, jnp.float32(0))
        try:
            timeit(f"fused_moments2 tile={tile}", loop_m2, g_row)
        except Exception as e:
            print(f"fused_moments2 tile={tile}: {type(e).__name__} {str(e)[:80]}")

    # full fused iteration (moments2 + eig + apply), as the engine runs it
    def loop_full_fused(g):
        def body(i, st):
            g, stats = st
            gcnt = stats[0]
            c = stats[1:4] / jnp.maximum(gcnt, 1.0)[None]
            ctab = jnp.concatenate([c, jnp.zeros((5, sp))], 0)
            m2 = fused_moments2(p, g, ctab, s)
            normal = _cov_normal(m2[:6].T, gcnt).T
            can = (gcnt >= 3.0).astype(jnp.float32)
            t2 = jnp.concatenate([c, normal, can[None], jnp.zeros((1, sp))], 0)
            return fused_apply(p, g, t2, s)
        g, stats = lax.fori_loop(0, iters, body, (g, jnp.ones((8, sp))))
        return g
    timeit("FULL fused iteration", loop_full_fused, g_row)

    # XLA onehot: one _fit_step + threshold per iteration (engine generic path)
    ops = SegOps(seg, s, "onehot")
    def loop_onehot(g):
        def body(i, g):
            gcnt, dist = _fit_step(ops, xyz, g)
            can_pt = ops.gather((gcnt >= 3.0).astype(jnp.float32)) > 0.5
            return jnp.where(can_pt, dist < tau, g)
        return lax.fori_loop(0, iters, body, g)
    timeit("FULL onehot iteration", loop_onehot, g0)


if __name__ == "__main__":
    main()
