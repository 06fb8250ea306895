#!/usr/bin/env python
"""Measure one engine configuration's scans/s (slope-timed, one JSON
line) — the config-regime probe used for kernel go/no-go decisions.

History: this tool settled the banded-compact-sweep question (VERDICT r3
item 7).  Probes on real v5e (2026-08-20): banded 531 vs dense 1068
scans/s at the default config (reproducing the r3 529-vs-1059 loss); the
hypothesized winning regimes could not even run it — num_sectors=64
blows the megakernel VMEM budget before banding matters, and the B=1
banded arm never finished compiling inside 20 minutes.  The banded path
was DELETED in round 4 (see ARCHITECTURE.md); the probe remains for
future regime A/Bs (tile sizes, sector counts, batch shapes).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--sectors", type=int, default=10)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--cloud", default="velodyne", choices=["velodyne", "demo"])
    ap.add_argument("--fast", action="store_true", default=True)
    ap.add_argument("--exact", dest="fast", action="store_false")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from patchwork_tpu import PatchworkConfig
    from patchwork_tpu.io.synthetic import demo_point_cloud, velodyne_like_cloud
    from patchwork_tpu.segment.engine import make_filter_ground_batched

    gen = {"velodyne": velodyne_like_cloud, "demo": demo_point_cloud}[args.cloud]
    b, n = args.batch, args.points
    cfg = PatchworkConfig(num_sectors=args.sectors,
                          fast_covariance=args.fast)
    xyz = jnp.asarray(np.stack([gen(n, seed=i) for i in range(b)]))
    valid = jnp.ones((b, n), bool)
    fn = make_filter_ground_batched(cfg)

    def sync(r):
        return float(r.ground.sum())

    sync(fn(xyz, valid))
    t_at = {}
    for k in (args.reps, 2 * args.reps):
        t0 = time.perf_counter()
        for _ in range(k):
            r = fn(xyz, valid)
        sync(r)
        t_at[k] = time.perf_counter() - t0
    rate = args.reps * b / max(t_at[2 * args.reps] - t_at[args.reps], 1e-9)

    print(json.dumps({
        "metric": "config_probe_scans_per_s",
        "value": round(rate, 3),
        "unit": "scans/s",
        "sectors": args.sectors, "batch": b, "points": n,
        "cloud": args.cloud, "fast": args.fast,
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    sys.exit(main())
