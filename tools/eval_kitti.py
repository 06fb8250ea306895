#!/usr/bin/env python
"""KITTI(-360) sequence evaluation: throughput + optional label metrics.

Streams a directory of velodyne ``.bin`` scans through the engine,
reporting scans/s and per-stage latency; when a labels directory is given
(per-point semantic labels, one ``.label``/``.bin`` uint32 file per scan,
SemanticKITTI format: lower 16 bits = semantic class), computes
ground-mask IoU/F1 against the ground-class ids.

No KITTI data ships with this repo (offline environment), but the full
path — directory listing, .bin decode, label read + 16-bit split,
per-frame metrics, sequence aggregation — is exercised end-to-end by
tests/test_eval_kitti.py on fabricated SemanticKITTI-format fixtures, so
this tool is one data mount away from the BASELINE.md parity number.

Usage:
  python tools/eval_kitti.py /data/kitti/velodyne [--labels /data/kitti/labels]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# SemanticKITTI ground-ish classes: road, parking, sidewalk, other-ground,
# lane-marking, terrain
GROUND_LABELS = {40, 44, 48, 49, 60, 72}


def evaluate(velodyne_dir, labels_dir=None, limit=None, capacity=131072,
             config=None, log=print):
    """Run the sequence; returns a summary dict (tested hook for main()).

    Keys: scans, scans_per_s, and — when labels_dir is given — iou, f1,
    precision, recall aggregated over the sequence.
    """
    from patchwork_tpu.core.config import PatchworkConfig
    from patchwork_tpu.io.kitti import list_sequence, read_bin
    from patchwork_tpu.node import NodeParams, PatchworkNode
    from patchwork_tpu.utils.metrics import format_metrics, mask_metrics

    cfg = config or PatchworkConfig()
    node = PatchworkNode(NodeParams(), config=cfg, capacity=capacity)

    paths = list_sequence(velodyne_dir)
    if limit:
        paths = paths[:limit]
    label_paths = None
    if labels_dir:
        label_paths = sorted(
            os.path.join(labels_dir, p) for p in os.listdir(labels_dir)
        )[: len(paths)]

    agg = {"tp": 0.0, "fp": 0.0, "fn": 0.0}
    results = node.run(read_bin(p) for p in paths)
    for r in results:
        if label_paths:
            raw = np.fromfile(label_paths[r.index], dtype=np.uint32) & 0xFFFF
            pts = read_bin(paths[r.index])
            n = min(len(raw), len(pts), capacity)
            truth = np.isin(raw[:n], list(GROUND_LABELS))
            m = mask_metrics(r.ground_mask[:n], truth, r.valid_mask[:n])
            agg["tp"] += m["tp"]; agg["fp"] += m["fp"]; agg["fn"] += m["fn"]
            log(f"frame {r.index:4d}: {format_metrics(m)} "
                f"({r.latency_s*1e3:.1f} ms)")

    log(node.times.report())
    total = sum(r.latency_s for r in results)
    out = {"scans": len(results),
           "scans_per_s": len(results) / max(total, 1e-9)}
    if results:
        log(f"\n{len(results)} scans, {out['scans_per_s']:.1f} scans/s")
    if label_paths and agg["tp"] + agg["fn"] > 0:
        tp, fp, fn = agg["tp"], agg["fp"], agg["fn"]
        out["iou"] = tp / max(tp + fp + fn, 1.0)
        out["precision"] = tp / max(tp + fp, 1.0)
        out["recall"] = tp / max(tp + fn, 1.0)
        out["f1"] = 2 * tp / max(2 * tp + fp + fn, 1.0)
        log(f"sequence ground IoU: {out['iou']:.4f}")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("velodyne", help="directory of .bin scans")
    ap.add_argument("--labels", help="directory of per-scan label files")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--capacity", type=int, default=131072)
    ap.add_argument("--config-json", default=None)
    args = ap.parse_args()

    from patchwork_tpu.core.config import PatchworkConfig

    cfg = (PatchworkConfig.from_json(open(args.config_json).read())
           if args.config_json else PatchworkConfig())
    evaluate(args.velodyne, args.labels, args.limit, args.capacity, cfg)
    return 0


if __name__ == "__main__":
    sys.exit(main())
