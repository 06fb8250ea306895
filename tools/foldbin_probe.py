"""Decisive probe for the fold-binning-into-kernel lever (PROFILE_r04 (a)).

The last exact-mode lever is folding the 0.54 ms/batch XLA binning+prepack
into the mega-kernel prologue.  Its bitwise risk (named in PROFILE_r04):
the in-kernel (Mosaic) sqrt/atan2 diverging from XLA:TPU's by ulps, which
would reassign edge points to neighboring rings/sectors and break the
masks-bit-identical-to-oracle contract.  This probe answers that question
directly and cheaply, BEFORE any kernel surgery:

  * compute d = sqrt(x^2+y^2), a = atan2 wrap, ring id, sector id for a
    velodyne-like scan via the production XLA path (ops/pointcloud.py +
    segment/binning.py semantics);
  * compute the same inside a minimal Pallas TPU kernel;
  * compare d/a bitwise and the ring/sector ids exactly.

If ids differ at all, the lever cannot preserve exact-mode parity and is
rejected with numbers; if bitwise-identical, kernel folding is safe.

Usage: python tools/foldbin_probe.py [--points 131072] [--json-out ...]
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=131072)
    ap.add_argument("--seeds", type=int, default=4)
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from patchwork_tpu import PatchworkConfig
    from patchwork_tpu.io.synthetic import velodyne_like_cloud
    from patchwork_tpu.segment.binning import ring_edges, sector_edges

    cfg = PatchworkConfig()
    r_e = ring_edges(cfg)
    s_e = sector_edges(cfg)
    two_pi = np.float32(2.0 * math.pi)

    @jax.jit
    def xla_path(x, y):
        d = jnp.sqrt(x * x + y * y)
        a = jnp.arctan2(y, x)
        a = jnp.where(a < 0, a + two_pi, a)
        ring = jnp.sum(d[:, None] >= jnp.asarray(r_e)[None, 1:-1],
                       axis=1).astype(jnp.int32)
        sector = jnp.sum(a[:, None] >= jnp.asarray(s_e)[None, 1:-1],
                         axis=1).astype(jnp.int32)
        return d, a, ring, sector

    # Mosaic (Pallas TPU) has NO atan2/arctan lowering at all
    # (NotImplementedError: atan2, jax 0.8.x — first decisive fact of this
    # probe).  The only in-kernel option is a hand-rolled implementation;
    # this Cephes-style atanf (the same family as the kernel's in-kernel
    # acos) quantifies how far any such reimplementation diverges from
    # XLA:TPU's atan2 — ulps AND binned ids.
    def _atan_cephes(z):  # |z| <= 1, Cephes atanf minimax polynomial
        z2 = z * z
        p = ((np.float32(8.05374449538e-2) * z2
              - np.float32(1.38776856032e-1)) * z2
             + np.float32(1.99777106478e-1)) * z2 - np.float32(3.33329491539e-1)
        return z * z2 * p + z

    def _atan2_handrolled(y, x):
        ax, ay = jnp.abs(x), jnp.abs(y)
        hi = jnp.maximum(ax, ay)
        q = jnp.where(hi > 0, jnp.minimum(ax, ay) / jnp.where(hi > 0, hi, 1.0),
                      0.0)
        t = _atan_cephes(q)
        t = jnp.where(ay > ax, np.float32(math.pi / 2) - t, t)
        t = jnp.where(x < 0, np.float32(math.pi) - t, t)
        return jnp.where(y < 0, -t, t)

    def kernel(x_ref, y_ref, d_ref, a_ref, ring_ref, sec_ref):
        x = x_ref[:]
        y = y_ref[:]
        d = jnp.sqrt(x * x + y * y)
        a = _atan2_handrolled(y, x)
        a = jnp.where(a < 0, a + two_pi, a)
        ring = jnp.zeros(x.shape, jnp.int32)
        for e in r_e[1:-1]:
            ring += (d >= np.float32(e)).astype(jnp.int32)
        sec = jnp.zeros(x.shape, jnp.int32)
        for e in s_e[1:-1]:
            sec += (a >= np.float32(e)).astype(jnp.int32)
        d_ref[:] = d
        a_ref[:] = a
        ring_ref[:] = ring
        sec_ref[:] = sec

    interpret = jax.default_backend() == "cpu"  # CPU smoke only: interpret
    # mode says nothing about Mosaic bitwise behavior — the real verdict
    # needs the TPU chip.

    @jax.jit
    def pallas_path(x, y):
        n = x.shape[0]
        shp = (8, n // 8)
        x2, y2 = x.reshape(shp), y.reshape(shp)
        outs = pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct(shp, jnp.float32),
                jax.ShapeDtypeStruct(shp, jnp.float32),
                jax.ShapeDtypeStruct(shp, jnp.int32),
                jax.ShapeDtypeStruct(shp, jnp.int32),
            ],
            interpret=interpret,
        )(x2, y2)
        return tuple(o.reshape(n) for o in outs)

    rows = []
    for seed in range(args.seeds):
        pts = velodyne_like_cloud(args.points, seed=seed)
        x = jnp.asarray(pts[:, 0])
        y = jnp.asarray(pts[:, 1])
        dx, ax, rx, sx = (np.asarray(v) for v in xla_path(x, y))
        dp, app, rp, sp_ = (np.asarray(v) for v in pallas_path(x, y))
        d_bits = int((dx.view(np.int32) != dp.view(np.int32)).sum())
        a_bits = int((ax.view(np.int32) != app.view(np.int32)).sum())
        d_ulp = int(np.abs(dx.view(np.int32).astype(np.int64)
                           - dp.view(np.int32).astype(np.int64)).max())
        a_ulp = int(np.abs(ax.view(np.int32).astype(np.int64)
                           - app.view(np.int32).astype(np.int64)).max())
        ring_mm = int((rx != rp).sum())
        sec_mm = int((sx != sp_).sum())
        rows.append({"seed": seed, "d_bit_mismatches": d_bits,
                     "a_bit_mismatches": a_bits, "d_max_ulp": d_ulp,
                     "a_max_ulp": a_ulp, "ring_id_mismatches": ring_mm,
                     "sector_id_mismatches": sec_mm})
        print(f"# seed {seed}: sqrt bits {d_bits} (max ulp {d_ulp}), "
              f"atan2 bits {a_bits} (max ulp {a_ulp}), "
              f"ring mm {ring_mm}, sector mm {sec_mm}", file=sys.stderr)

    ids_identical = all(
        r["ring_id_mismatches"] == 0 and r["sector_id_mismatches"] == 0
        for r in rows)
    out = {
        "metric": "foldbin_ids_identical",
        "value": int(ids_identical),
        "unit": "bool",
        "platform": jax.devices()[0].platform,
        "points": args.points,
        "mosaic_native_atan2": False,
        "rows": rows,
        "verdict": ("SAFE: in-kernel sqrt + hand-rolled atan2 bin "
                    "identically to XLA on these scans"
                    if ids_identical else
                    "REJECT: Mosaic has no native atan2 (NotImplemented) "
                    "and the hand-rolled Cephes atan2 reassigns "
                    "ring/sector ids vs XLA — folding the binning into "
                    "the kernel prologue cannot preserve the exact-mode "
                    "bit-parity contract"),
    }
    print(json.dumps(out))
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
