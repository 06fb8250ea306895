#!/usr/bin/env python
"""KITTI(-360) sequence evaluation: throughput + optional label metrics.

Streams a directory of velodyne ``.bin`` scans through the engine,
reporting scans/s and per-stage latency; when a labels directory is given
(per-point semantic labels, one ``.label``/``.bin`` uint32 file per scan,
SemanticKITTI format), computes ground-mask IoU/F1 against the
ground-class ids.

No KITTI data ships with this repo (offline environment) — this is the
evaluation entry point for when data is mounted.

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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("velodyne", help="directory of .bin scans")
    ap.add_argument("--labels", help="directory of per-scan label files")
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--capacity", type=int, default=131072)
    ap.add_argument("--config-json", default=None)
    args = ap.parse_args()

    from patchwork_tpu.core.config import PatchworkConfig
    from patchwork_tpu.io.kitti import list_sequence, read_bin
    from patchwork_tpu.node import NodeParams, PatchworkNode
    from patchwork_tpu.utils.metrics import format_metrics, mask_metrics

    cfg = (PatchworkConfig.from_json(open(args.config_json).read())
           if args.config_json else PatchworkConfig())
    node = PatchworkNode(NodeParams(), config=cfg, capacity=args.capacity)

    paths = list_sequence(args.velodyne)
    if args.limit:
        paths = paths[: args.limit]
    label_paths = None
    if args.labels:
        label_paths = sorted(
            os.path.join(args.labels, p) for p in os.listdir(args.labels)
        )[: len(paths)]

    agg = {"tp": 0.0, "fp": 0.0, "fn": 0.0}
    results = node.run(read_bin(p) for p in paths)
    for i, r in enumerate(results):
        if label_paths:
            raw = np.fromfile(label_paths[r.index], dtype=np.uint32) & 0xFFFF
            pts = read_bin(paths[r.index])
            n = min(len(raw), len(pts), args.capacity)
            truth = np.isin(raw[:n], list(GROUND_LABELS))
            m = mask_metrics(r.ground_mask[:n], truth, r.valid_mask[:n])
            agg["tp"] += m["tp"]; agg["fp"] += m["fp"]; agg["fn"] += m["fn"]
            print(f"frame {r.index:4d}: {format_metrics(m)} "
                  f"({r.latency_s*1e3:.1f} ms)")

    print(node.times.report())
    total = sum(r.latency_s for r in results)
    if results:
        print(f"\n{len(results)} scans, {len(results)/max(total,1e-9):.1f} scans/s")
    if label_paths and agg["tp"] + agg["fn"] > 0:
        tp, fp, fn = agg["tp"], agg["fp"], agg["fn"]
        iou = tp / max(tp + fp + fn, 1.0)
        print(f"sequence ground IoU: {iou:.4f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
