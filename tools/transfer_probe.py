#!/usr/bin/env python
"""Upload-vs-kernel cost probe for the odometry extraction path.

The decisive diagnostic for round 4's SLAM odometry mystery: at the
1000-kf scale, extraction measured 44.6 s in one window and 250-1942 s
in others with IDENTICAL code, while the engine itself held ~1000
scans/s.  This probe separates the two costs with slope timing:

  kernel_resident_s_per_batch  engine on device-resident arrays
  with_upload_s_per_batch      same, re-uploading the batch every call

Measured v5e (2026-08-21): 1.6 ms resident vs 116 ms with upload at the
odometry config (B=8 x 32768 pts, 3.1 MB/batch) — extraction is tunnel-
UPLOAD-bound, and the per-chunk cost tracks tunnel weather (the tiny-op
latency probe can pass while bandwidth is degraded; probe BOTH before
believing an end-to-end SLAM number).  One JSON line on stdout.
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
    ap.add_argument("--points", type=int, default=32768)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--radius", type=float, default=80.0)
    ap.add_argument("--max-levels", type=int, default=1)
    ap.add_argument("--reps", type=int, default=6)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from patchwork_tpu import PatchworkConfig
    from patchwork_tpu.io.synthetic import velodyne_like_cloud
    from patchwork_tpu.segment.engine import make_filter_ground_batched

    cfg = PatchworkConfig(filtering_radius=args.radius,
                          max_levels=args.max_levels)
    b, n = args.batch, args.points
    fn = make_filter_ground_batched(cfg)
    host = np.stack([velodyne_like_cloud(n, seed=i)
                     for i in range(b)]).astype(np.float32)
    valid_h = np.ones((b, n), bool)
    xyz_d, valid_d = jnp.asarray(host), jnp.asarray(valid_h)
    float(fn(xyz_d, valid_d).ground.sum())  # compile + warmup

    def slope(f):
        t = {}
        for k in (args.reps, 2 * args.reps):
            t0 = time.perf_counter()
            r = None
            for _ in range(k):
                r = f()
            float(r.ground.sum())
            t[k] = time.perf_counter() - t0
        return max(t[2 * args.reps] - t[args.reps], 1e-9) / args.reps

    resident = slope(lambda: fn(xyz_d, valid_d))
    uploading = slope(lambda: fn(jnp.asarray(host), jnp.asarray(valid_h)))
    print(json.dumps({
        "metric": "upload_cost_s_per_batch",
        "value": round(uploading - resident, 4),
        "unit": "s",
        "kernel_resident_s_per_batch": round(resident, 4),
        "with_upload_s_per_batch": round(uploading, 4),
        "mb_per_batch": round((host.nbytes + valid_h.nbytes) / 1e6, 1),
        "effective_upload_MB_s": round(
            (host.nbytes + valid_h.nbytes) / 1e6
            / max(uploading - resident, 1e-9), 1),
        "platform": jax.devices()[0].platform,
        "batch": b, "points": n,
    }))


if __name__ == "__main__":
    sys.exit(main())
