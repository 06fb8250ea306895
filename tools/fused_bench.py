"""Compare segment-op impls (onehot vs fused pallas) on the real TPU.

Usage: python tools/fused_bench.py [--points N] [--batch B] [--reps R]
Prints per-impl scans/s and mask agreement.
"""

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cloud", choices=["demo", "velodyne"], default="demo")
    ap.add_argument("--impls", nargs="+", default=["onehot", "fused"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from patchwork_tpu import PatchworkConfig
    from patchwork_tpu.io.synthetic import demo_point_cloud, velodyne_like_cloud
    from patchwork_tpu.segment.engine import make_filter_ground_batched

    cfg = PatchworkConfig()
    gen = demo_point_cloud if args.cloud == "demo" else velodyne_like_cloud
    b, n = args.batch, args.points
    xyz = jnp.asarray(np.stack([gen(n, seed=i) for i in range(b)]))
    valid = jnp.ones((b, n), bool)
    print(f"# backend={jax.default_backend()} cloud={args.cloud} B={b} N={n}")

    masks = {}
    for impl in args.impls:
        fn = make_filter_ground_batched(cfg, impl=impl)
        t0 = time.perf_counter()
        r = fn(xyz, valid)
        s = float(r.ground.sum())  # honest sync (axon: block_until_ready no-ops)
        compile_t = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(args.reps):
            r = fn(xyz, valid)
        s = float(r.ground.sum())
        dt = time.perf_counter() - t0
        masks[impl] = np.asarray(r.ground)
        print(f"{impl:8s} {args.reps * b / dt:9.2f} scans/s  "
              f"({dt / args.reps / b * 1e3:.2f} ms/scan, compile {compile_t:.1f}s, "
              f"ground={int(s)})")

    ks = list(masks)
    for i in range(1, len(ks)):
        eq = bool((masks[ks[0]] == masks[ks[i]]).all())
        print(f"# masks {ks[0]} == {ks[i]}: {eq}")


if __name__ == "__main__":
    main()
