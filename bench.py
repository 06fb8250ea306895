"""Benchmark: scans/s of the TPU engine vs the single-core CPU reference.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

The headline metric is the HARD scene — the spinning-LiDAR-like
``velodyne`` cloud (dense near field, ring structure, split-heavy) in the
production fast_covariance mode.  The easy uniform demo scene and the
bit-exact two-pass mode are recorded alongside in ``extra`` so every mode
stays measured (VERDICT round-1 item 1).

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


def _floors_recorded():
    """Median-of-history floors (BENCH_FLOORS.json) for plausibility gates."""
    import os
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_FLOORS.json")
    try:
        with open(path) as f:
            return json.load(f).get("recorded", {})
    except (OSError, ValueError):
        return {}


_IMPLAUSIBLE_FRACTION = 0.5  # cell < 0.5x its floors median -> re-measure


def _measure_guarded(key, degraded, gen, n, b, reps, cfg):
    """_measure with a mid-run-stall guard (VERDICT r4 item 2).

    The driver's BENCH_r04 demo cell collapsed 32x (95.4 vs ~3074 scans/s)
    while sibling cells in the same run were normal — a transient tunnel
    stall that slope timing alone cannot reject, and which then poisoned
    the BENCH_FLOORS.json history.  Guard: any cell measuring below
    _IMPLAUSIBLE_FRACTION of its floors median is re-measured once after a
    tiny probe op; if still implausible it is reported but flagged in
    ``degraded`` so _refresh_floors never records it.
    """
    rate, scans = _measure(gen, n, b, reps, cfg)
    floor = _floors_recorded().get(key)
    if floor and rate < _IMPLAUSIBLE_FRACTION * floor:
        print(f"# {key}: {rate:.1f} scans/s < {_IMPLAUSIBLE_FRACTION}x "
              f"floor median {floor:.1f} — probing and re-measuring",
              file=sys.stderr)
        import jax.numpy as jnp
        float(jnp.ones((8, 8)).sum())  # drain/re-establish the stream
        rate2, scans = _measure(gen, n, b, reps, cfg)
        rate = max(rate, rate2)
        if rate < _IMPLAUSIBLE_FRACTION * floor:
            degraded.add(key)
            print(f"# {key}: still {rate:.1f} after re-measure — marked "
                  "degraded (excluded from floors)", file=sys.stderr)
    return rate, scans


def _measure(gen, n, b, reps, cfg, seeds=None):
    """Engine scans/s for one (scene, config): batched jit, honest sync."""
    import jax.numpy as jnp

    from patchwork_tpu.segment.engine import make_filter_ground_batched

    scans = [gen(n, seed=i) for i in range(b)]
    xyz = jnp.asarray(np.stack(scans))
    valid = jnp.ones((b, n), bool)
    fn = make_filter_ground_batched(cfg)

    def sync(r):
        # NOTE: block_until_ready is not a reliable barrier on every PJRT
        # transport (observed on tunneled backends); a scalar device->host
        # fetch always drains the stream.
        return float(r.ground.sum())

    sync(fn(xyz, valid))  # warmup/compile
    # Slope timing (t(2R) - t(R)) / R: the tunnel's constant ramp/fetch
    # cost cancels, leaving the steady-state per-step rate (CLAUDE.md:
    # single-run timings are fetch/ramp-dominated on the axon tunnel).
    t_at = {}
    for k in (reps, 2 * reps):
        t0 = time.perf_counter()
        for _ in range(k):
            res = fn(xyz, valid)
        sync(res)
        t_at[k] = time.perf_counter() - t0
    dt = max(t_at[2 * reps] - t_at[reps], 1e-9)
    return reps * b / dt, scans


def _oracle_scans_per_s(scan, cfg, min_time=0.5):
    from patchwork_tpu.oracle.reference import filter_ground_oracle

    t0 = time.perf_counter()
    reps = 0
    while True:
        filter_ground_oracle(scan, cfg)
        reps += 1
        dt = time.perf_counter() - t0
        if dt >= min_time or reps >= 3:
            return reps / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=131072,
                    help="points per scan (KITTI-360 scale)")
    ap.add_argument("--batch", type=int, default=8, help="scans per step")
    ap.add_argument("--reps", type=int, default=20, help="timed steps")
    ap.add_argument("--skip-baseline", action="store_true")
    ap.add_argument("--cloud", choices=["velodyne", "demo"], default="velodyne",
                    help="headline scan distribution (velodyne = realistic "
                         "spinning-LiDAR; demo = easy uniform scene)")
    ap.add_argument("--headline-only", action="store_true",
                    help="measure only the headline (cloud, fast) cell, "
                         "skipping the extra demo/exact recordings")
    args = ap.parse_args()

    import jax

    from patchwork_tpu import PatchworkConfig
    from patchwork_tpu.core.device import enable_compilation_cache

    enable_compilation_cache()  # slope timing already excludes compile;
    # this just stops fresh processes re-paying multi-second XLA compiles
    from patchwork_tpu.io.synthetic import (demo_point_cloud,
                                            fused_iac_cloud,
                                            velodyne_like_cloud)

    b, n, reps = args.batch, args.points, args.reps
    cfg_fast = PatchworkConfig(fast_covariance=True)
    cfg_exact = PatchworkConfig(fast_covariance=False)
    gens = {"demo": demo_point_cloud, "velodyne": velodyne_like_cloud}

    degraded = set()
    head_rate, head_scans = _measure_guarded(
        f"{args.cloud}_fast_scans_per_s", degraded,
        gens[args.cloud], n, b, reps, cfg_fast)
    extra = {}
    if not args.headline_only:
        other = "demo" if args.cloud == "velodyne" else "velodyne"
        extra[f"{args.cloud}_exact_scans_per_s"], _ = _measure_guarded(
            f"{args.cloud}_exact_scans_per_s", degraded,
            gens[args.cloud], n, b, reps, cfg_exact)
        extra[f"{other}_fast_scans_per_s"], other_scans = _measure_guarded(
            f"{other}_fast_scans_per_s", degraded,
            gens[other], n, b, reps, cfg_fast)
        # multi-LiDAR end-to-end (BASELINE configs[3]): merged 3-sensor
        # IAC scene through the same engine path
        extra["fused_iac_fast_scans_per_s"], _ = _measure(
            fused_iac_cloud, n, b, reps, cfg_fast)

    vs_baseline = None
    if not args.skip_baseline:
        cpu_rate = _oracle_scans_per_s(head_scans[0], cfg_exact)
        vs_baseline = head_rate / cpu_rate
        extra[f"{args.cloud}_oracle_scans_per_s"] = cpu_rate
        if not args.headline_only:
            other_cpu = _oracle_scans_per_s(other_scans[0], cfg_exact)
            extra[f"{other}_oracle_scans_per_s"] = other_cpu
            extra[f"{other}_fast_vs_baseline"] = (
                extra[f"{other}_fast_scans_per_s"] / other_cpu)
        print(
            f"# cpu oracle ({args.cloud}): {cpu_rate:.3f} scans/s; "
            f"device: {head_rate:.3f} scans/s on "
            f"{jax.devices()[0].device_kind}",
            file=sys.stderr,
        )

    out = {
        "metric": f"synthetic_{args.cloud}_{n}pt_scans_per_s_per_chip",
        "value": round(head_rate, 3),
        "unit": "scans/s",
        "vs_baseline": round(vs_baseline, 3) if vs_baseline else None,
        "extra": {k: round(v, 3) for k, v in extra.items()},
    }
    if degraded:
        out["extra"]["degraded_cells"] = sorted(degraded)
    print(json.dumps(out))

    _refresh_floors(args, head_rate, extra, degraded)


_FLOOR_HISTORY = 5  # full runs kept per metric; recorded = median of these


def _update_floor_doc(doc, fresh):
    """Append fresh full-run values to the history, recompute medians.

    Pure helper (unit-tested in tests/test_utils.py): ``recorded[k]``
    becomes the LOWER MEDIAN of the last _FLOOR_HISTORY appended runs.
    """
    rec = doc.setdefault("recorded", {})
    hist = doc.setdefault("history", {})
    changed = False
    for k, v in fresh.items():
        if v is None:
            continue
        runs = hist.setdefault(k, [rec[k]] if k in rec else [])
        runs.append(round(v, 3))
        del runs[:-_FLOOR_HISTORY]
        med = sorted(runs)[(len(runs) - 1) // 2]  # lower median: conservative
        if rec.get(k) != med:
            rec[k] = med
        changed = True
    return changed


def _refresh_floors(args, head_rate, extra, degraded=()):
    """Record this full default-shape TPU run into BENCH_FLOORS.json.

    The perf guard (tests/test_perf_regression.py) derives its floors from
    this file, so floors track real measurements instead of drifting stale
    (VERDICT r2 item 3).  The tunnel's day-to-day variance spans +-5% to
    +47% (VERDICT r3 item 3: one fast-tunnel run ratcheted the old
    max-based floor ABOVE a normal day's throughput, arming the guard to
    false-fail).  So instead of ratcheting on the maximum, every run
    appends to a short per-metric history and ``recorded`` becomes the
    MEDIAN of the last _FLOOR_HISTORY runs — one outlier day (fast or
    slow) cannot move the floor by more than its weight in the median,
    and a genuine regression still needs to persist across runs before it
    can lower its own floor.  CPU runs never refresh.
    """
    import os

    import jax

    default_shape = (args.cloud == "velodyne" and args.points == 131072
                     and args.batch == 8 and not args.headline_only)
    on_accel = jax.default_backend() not in ("cpu",)
    if not (default_shape and on_accel):
        return
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "BENCH_FLOORS.json")
    try:
        with open(path) as f:
            doc = json.load(f)
    except (OSError, ValueError):
        return
    fresh = {
        "velodyne_fast_scans_per_s": head_rate,
        "velodyne_exact_scans_per_s": extra.get("velodyne_exact_scans_per_s"),
        "demo_fast_scans_per_s": extra.get("demo_fast_scans_per_s"),
    }
    # stall-guarded cells that stayed implausible never enter the history
    # (the r4 demo_fast=95.392 poisoning — VERDICT r4 item 2)
    fresh = {k: v for k, v in fresh.items() if k not in set(degraded)}
    if _update_floor_doc(doc, fresh):
        doc["source"] = "bench.py auto-refresh (median of history)"
        with open(path, "w") as f:
            json.dump(doc, f, indent=2)


if __name__ == "__main__":
    main()
