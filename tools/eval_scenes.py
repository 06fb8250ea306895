"""Per-scene segmentation ACCURACY eval on hard labeled synthetics.

Real KITTI-360 cannot be mounted in this environment, so segmentation
quality is tracked per round on the hard labeled scenes in
io/synthetic.HARD_SCENES (slope, curb+ramp, overhanging structure,
sparse far field, rolling valley) — exactly the geometry the flat-ground
demo scene and the reference's own synthetic tests never exercise (the
reference asserts only point counts, test/test_recursive_patchwork.cpp:
74-76; this records IoU/F1 against by-construction labels).

Masks are backend-bit-identical (tests/test_engine_parity.py), so the
accuracy numbers are valid measured on CPU — no tunnel-weather hazard.

Usage:
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/eval_scenes.py \
      [--points 65536] [--seeds 2] [--json-out EVAL_r05.json]

Prints one JSON line; per-scene detail in "scenes".
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _log_stderr(msg):
    print(msg, file=sys.stderr)


def run(points: int = 65536, seeds: int = 2, log=_log_stderr):
    import jax.numpy as jnp

    from patchwork_tpu import PatchworkConfig
    from patchwork_tpu.io.synthetic import HARD_SCENES, hard_labeled_scene
    from patchwork_tpu.segment.engine import make_filter_ground
    from patchwork_tpu.utils.metrics import mask_metrics

    cfgs = {
        "exact": PatchworkConfig(),
        "fast": PatchworkConfig(fast_covariance=True),
    }
    fns = {k: make_filter_ground(c) for k, c in cfgs.items()}

    scenes = {}
    for name in HARD_SCENES:
        per_cfg = {}
        for cfg_name, fn in fns.items():
            ious, f1s, recs, precs = [], [], [], []
            for seed in range(seeds):
                xyz, labels = hard_labeled_scene(name, points, seed=seed)
                res = fn(jnp.asarray(xyz), jnp.ones((points,), bool))
                m = mask_metrics(np.asarray(res.ground), labels)
                ious.append(m["iou"])
                f1s.append(m["f1"])
                recs.append(m["recall"])
                precs.append(m["precision"])
            per_cfg[cfg_name] = {
                "iou": round(float(np.mean(ious)), 4),
                "f1": round(float(np.mean(f1s)), 4),
                "precision": round(float(np.mean(precs)), 4),
                "recall": round(float(np.mean(recs)), 4),
            }
        scenes[name] = per_cfg
        log(f"# {name}: exact IoU {per_cfg['exact']['iou']:.4f} "
            f"fast IoU {per_cfg['fast']['iou']:.4f}")

    mean_iou = float(np.mean([s["exact"]["iou"] for s in scenes.values()]))
    return {
        "metric": "hard_scene_mean_iou",
        "value": round(mean_iou, 4),
        "unit": "IoU",
        "points": points,
        "seeds": seeds,
        "scenes": scenes,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=65536)
    ap.add_argument("--seeds", type=int, default=2)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()
    t0 = time.perf_counter()
    out = run(args.points, args.seeds)
    out["wall_s"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
