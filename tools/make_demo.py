#!/usr/bin/env python
"""Render the reference README's comparison figure: raw LiDAR vs
Patchwork vs Patchwork++ vs Recursive Patchwork BEV images, side by side.

Usage: python tools/make_demo.py [--out demo_comparison.png] [--points 40000]
       python tools/make_demo.py --kitti /data/velodyne --frame 0
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="demo_comparison.png")
    ap.add_argument("--points", type=int, default=40000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--kitti", help="KITTI velodyne dir (else synthetic)")
    ap.add_argument("--frame", type=int, default=0)
    ap.add_argument("--size", type=int, nargs=2, default=(400, 400),
                    metavar=("W", "H"))
    ap.add_argument("--extent", type=float, default=60.0)
    args = ap.parse_args()

    import jax.numpy as jnp
    from PIL import Image, ImageDraw

    from patchwork_tpu import PatchworkConfig, make_filter_ground
    from patchwork_tpu.io.synthetic import velodyne_like_cloud
    from patchwork_tpu.viz.bev import bev_ground_nonground_image, bev_height_image

    if args.kitti:
        from patchwork_tpu.io.kitti import list_sequence, read_bin

        pts = read_bin(list_sequence(args.kitti)[args.frame])
    else:
        pts = velodyne_like_cloud(args.points, seed=args.seed)
    w, h = args.size
    e = args.extent
    xyz = jnp.asarray(pts[:, :3])
    valid = jnp.ones(len(pts), bool)

    panels = [("raw", None)]
    for name in ("patchwork", "patchwork_pp", "recursive"):
        panels.append((name, PatchworkConfig.variant(name)))

    imgs = []
    for name, cfg in panels:
        if cfg is None:
            img = np.asarray(bev_height_image(xyz, valid, w, h, -e, -e, e, e))
        else:
            res = make_filter_ground(cfg)(xyz, valid)
            img = np.asarray(bev_ground_nonground_image(
                xyz, res.ground, res.valid & ~res.ground, w, h, -e, -e, e, e
            ))
        imgs.append((name, img))

    pad, label_h = 8, 18
    canvas = Image.new(
        "RGB", (len(imgs) * (w + pad) + pad, h + label_h + 2 * pad), (20, 20, 20)
    )
    draw = ImageDraw.Draw(canvas)
    for i, (name, img) in enumerate(imgs):
        x0 = pad + i * (w + pad)
        canvas.paste(Image.fromarray(img), (x0, label_h + pad))
        draw.text((x0 + 4, pad // 2), name, fill=(230, 230, 230))
    canvas.save(args.out)
    print(f"Saved: {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
