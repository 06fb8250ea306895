"""Benchmark: scans/s of the TPU engine vs the single-core CPU reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no numbers (BASELINE.md), so the baseline is
self-established per BASELINE.json: the single-threaded recursive oracle
(exact reference semantics, NumPy) on this host's CPU, against the batched
jit engine on the default accelerator (the real TPU chip under the
driver).  Target: > 10x scans/s per chip.
"""

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=131072,
                    help="points per scan (KITTI-360 scale)")
    ap.add_argument("--batch", type=int, default=8, help="scans per step")
    ap.add_argument("--reps", type=int, default=20, help="timed steps")
    ap.add_argument("--baseline-scans", type=int, default=1,
                    help="oracle scans to time for the CPU baseline")
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--cloud", choices=["demo", "velodyne"], default="demo",
                    help="scan distribution: uniform demo or spinning-LiDAR-like")
    ap.add_argument("--exact", action="store_true",
                    help="bit-exact two-pass covariance instead of the fast "
                         "single-sweep production mode (fast_covariance); "
                         "on both bench scenes the two produce identical "
                         "masks — fast is only IoU-guaranteed in general")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from patchwork_tpu import PatchworkConfig
    from patchwork_tpu.io.synthetic import demo_point_cloud, velodyne_like_cloud
    from patchwork_tpu.segment.engine import make_filter_ground_batched

    cfg = PatchworkConfig(fast_covariance=not args.exact)
    b, n = args.batch, args.points

    gen = demo_point_cloud if args.cloud == "demo" else velodyne_like_cloud
    rng_scans = [gen(n, seed=i) for i in range(b)]
    xyz = jnp.asarray(np.stack(rng_scans))
    valid = jnp.ones((b, n), bool)

    fn = make_filter_ground_batched(cfg)

    def sync(r):
        # NOTE: block_until_ready is not a reliable barrier on every PJRT
        # transport (observed on tunneled backends); a scalar device->host
        # fetch always drains the stream.
        return float(r.ground.sum())

    # warmup/compile
    sync(fn(xyz, valid))

    t0 = time.perf_counter()
    for _ in range(args.reps):
        res = fn(xyz, valid)
    sync(res)
    dt = time.perf_counter() - t0
    scans_per_s = args.reps * b / dt

    vs_baseline = None
    if not args.skip_baseline:
        from patchwork_tpu.oracle.reference import filter_ground_oracle

        t0 = time.perf_counter()
        for i in range(args.baseline_scans):
            filter_ground_oracle(rng_scans[i], cfg)
        cpu_dt = time.perf_counter() - t0
        cpu_scans_per_s = args.baseline_scans / cpu_dt
        vs_baseline = scans_per_s / cpu_scans_per_s
        print(
            f"# cpu oracle: {cpu_scans_per_s:.3f} scans/s; "
            f"device: {scans_per_s:.3f} scans/s on {jax.devices()[0].device_kind}",
            file=sys.stderr,
        )

    print(json.dumps({
        "metric": f"synthetic_{args.cloud}_{n}pt_scans_per_s_per_chip",
        "value": round(scans_per_s, 3),
        "unit": "scans/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
    }))


if __name__ == "__main__":
    main()
