#!/usr/bin/env python
"""Measure one engine configuration's scans/s — the banded-sweep decision
tool (VERDICT r3 weak #5 / next-round #7).

The banded compact sweeps (kernels/fit_pallas.py band_E) cut MXU flops
4x on paper but measured 2x SLOWER than the dense cached one-hot at the
default num_sectors=10 on real v5e (CLAUDE.md cautionary tale).  The
hypothesized winning regimes are (a) many sectors (Sp >> 128 lanes, where
the dense one-hot width hurts) and (b) B=1 latency mode.  PATCHWORK_TPU_
BANDED is read at import, so each arm runs as its own process:

  for s in 10 64; do for b in 0 1; do
    PATCHWORK_TPU_BANDED=$b python tools/banded_probe.py --sectors $s
  done; done

Prints one JSON line (slope-timed scans/s) per invocation.
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
        "metric": "banded_probe_scans_per_s",
        "value": round(rate, 3),
        "unit": "scans/s",
        "banded": os.environ.get("PATCHWORK_TPU_BANDED") == "1",
        "sectors": args.sectors, "batch": b, "points": n,
        "cloud": args.cloud, "fast": args.fast,
        "platform": jax.devices()[0].platform,
    }))


if __name__ == "__main__":
    sys.exit(main())
