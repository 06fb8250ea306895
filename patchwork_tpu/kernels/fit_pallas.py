"""Fused Pallas TPU kernels for the iterative plane-fit loop.

The engine's hot path is the per-level ``lax.while_loop`` that re-fits
every node's plane until no point changes side (segment/engine.py
``_fit_step``; reference semantics src/recursive_patchwork.cpp:186-217
with the per-iteration GPU round-trip at cpp:206).  The XLA 'onehot'
formulation spends one (N, S) one-hot matmul per segment op — 4-5 passes
per fit iteration — and XLA materializes the one-hot in HBM, so each
iteration moves ~5 * N * S bytes instead of ~N * 10 floats.

These two kernels collapse one fit iteration into exactly two sweeps over
the points, with the one-hot living only in VMEM, one (Sp, T) tile at a
time:

* :func:`fused_apply` — one sweep: gathers each point's node plane
  (centroid, normal, can-update flag) via an MXU one-hot matmul, computes
  the point-plane distance, re-thresholds the ground mask
  (d < tau * (1 + 0.2 * rel_dist), cpp:203-212), and accumulates the NEW
  mask's first moments [count, sum x, sum y, sum z], the OLD mask's
  distance sum (for the residual, cpp:228), and the per-node changed
  count — six segment reductions and one segment gather fused into two
  MXU contractions per tile.
* :func:`fused_moments2` — the other sweep: gathers the centroid and
  accumulates the centered second moments [xx, xy, xz, yy, yz, zz]
  (fitPlanePCA's covariance accumulation, cpp:86-95).

Point data is packed once per level into an (8, N) float32 array
(:func:`fit_pack`) so every tile is one aligned (8, tile) VMEM block —
(N, 3)-style layouts waste VMEM lanes and DMA bandwidth.

Differentially tested against SegOps('scatter') composition
(tests/test_fit_pallas.py), the reference's CPU-vs-GPU oracle pattern
(src/test_cuda.cpp:39-56).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fit_pack", "fused_apply", "fused_moments2", "sp_width",
           "fit_level_megakernel", "megakernel_fits", "level_megakernel",
           "seg_order_stat"]

_HIGHEST = jax.lax.Precision.HIGHEST


def _interp() -> bool:
    """Interpreter mode off-TPU (CPU tests run the same kernels)."""
    return jax.default_backend() not in ("tpu", "axon")


def sp_width(num_segs: int) -> int:
    """Lane-aligned segment width: one-hot columns pad to a lane multiple."""
    return max(128, ((num_segs + 127) // 128) * 128)


def _pick_tile(n: int) -> int:
    for t in (2048, 1024, 512, 256, 128):
        if n % t == 0:
            return t
    return n


def fit_pack(xyz: jax.Array, tau_pt: jax.Array, amask: jax.Array,
             seg: jax.Array) -> jax.Array:
    """Pack per-point data into the (8, N) row layout the kernels stream.

    Rows: [x, y, z, tau, apply-mask, seg-id (exact as f32), 0, 0].
    """
    n = xyz.shape[0]
    return jnp.concatenate(
        [
            xyz.T.astype(jnp.float32),
            tau_pt[None, :].astype(jnp.float32),
            amask.astype(jnp.float32)[None, :],
            seg.astype(jnp.float32)[None, :],
            jnp.zeros((2, n), jnp.float32),
        ],
        axis=0,
    )


# ---------------------------------------------------------------------------
# kernel bodies
# ---------------------------------------------------------------------------

def _apply_kernel(p_ref, g_ref, tab_ref, gout_ref, stats_ref, acc_ref, *, sp):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = p_ref[:]          # (8, T)
    g_in = g_ref[:]       # (1, T) 0/1 f32
    tab = tab_ref[:]      # (8, Sp): [cx, cy, cz, nx, ny, nz, can, 0]

    x, y, z = p[0:1], p[1:2], p[2:3]
    tau, am, segf = p[3:4], p[4:5], p[5:6]

    ids = jax.lax.broadcasted_iota(jnp.int32, (sp, 1), 0).astype(jnp.float32)
    oht = (ids == segf).astype(jnp.float32)          # (Sp, T)

    gat = jax.lax.dot_general(                        # (8, T) per-point plane
        tab, oht, (((1,), (0,)), ((), ())),
        precision=_HIGHEST, preferred_element_type=jnp.float32,
    )
    dx, dy, dz = x - gat[0:1], y - gat[1:2], z - gat[2:3]
    dist = jnp.abs(dx * gat[3:4] + dy * gat[4:5] + dz * gat[5:6])
    apply_m = am * gat[6:7]                           # both exact 0/1
    new_g = (dist < tau).astype(jnp.float32)
    g_out = apply_m * new_g + (1.0 - apply_m) * g_in
    changed = apply_m * jnp.abs(new_g - g_in)

    gout_ref[:] = g_out

    prod = jnp.concatenate(
        [g_out, x * g_out, y * g_out, z * g_out, dist * g_in, changed,
         jnp.zeros_like(g_out), jnp.zeros_like(g_out)],
        axis=0,
    )                                                 # (8, T)
    acc_ref[:] += jax.lax.dot_general(                # (8, Sp)
        prod, oht, (((1,), (1,)), ((), ())),
        precision=_HIGHEST, preferred_element_type=jnp.float32,
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        stats_ref[:] = acc_ref[:]


def _moments2_kernel(p_ref, g_ref, ctab_ref, out_ref, acc_ref, *, sp):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    p = p_ref[:]
    g = g_ref[:]          # (1, T)
    ctab = ctab_ref[:]    # (8, Sp): [cx, cy, cz, 0...]

    x, y, z, segf = p[0:1], p[1:2], p[2:3], p[5:6]
    ids = jax.lax.broadcasted_iota(jnp.int32, (sp, 1), 0).astype(jnp.float32)
    oht = (ids == segf).astype(jnp.float32)           # (Sp, T)

    cg = jax.lax.dot_general(
        ctab, oht, (((1,), (0,)), ((), ())),
        precision=_HIGHEST, preferred_element_type=jnp.float32,
    )
    dx = (x - cg[0:1]) * g
    dy = (y - cg[1:2]) * g
    dz = (z - cg[2:3]) * g
    prod = jnp.concatenate(
        [dx * dx, dx * dy, dx * dz, dy * dy, dy * dz, dz * dz,
         jnp.zeros_like(dx), jnp.zeros_like(dx)],
        axis=0,
    )
    acc_ref[:] += jax.lax.dot_general(
        prod, oht, (((1,), (1,)), ((), ())),
        precision=_HIGHEST, preferred_element_type=jnp.float32,
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


# ---------------------------------------------------------------------------
# wrappers
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("num_segs", "tile"))
def fused_apply(p: jax.Array, g: jax.Array, table_t: jax.Array,
                num_segs: int, tile: int | None = None):
    """One fused apply-and-accumulate sweep.

    p: (8, N) packed points (:func:`fit_pack`); g: (1, N) 0/1 f32 current
    ground mask; table_t: (8, Sp) rows [cx, cy, cz, nx, ny, nz, can, 0]
    (Sp = :func:`sp_width`; can=0 everywhere turns the sweep into a pure
    moments/distsum pass that leaves the mask unchanged).

    Returns (g_out (1, N) f32, stats (8, Sp) f32) with stats rows
    [count, sum x, sum y, sum z (of g_out); dist sum (of g_in);
    changed count; 0; 0].
    """
    n = p.shape[1]
    sp = table_t.shape[1]
    tile = tile or _pick_tile(n)
    grid = n // tile
    g_out, stats = pl.pallas_call(
        functools.partial(_apply_kernel, sp=sp),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, sp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, sp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((8, sp), jnp.float32),
        ),
        scratch_shapes=[pltpu.VMEM((8, sp), jnp.float32)],
        interpret=_interp(),
    )(p, g, table_t)
    return g_out, stats


@functools.partial(jax.jit, static_argnames=("num_segs", "tile"))
def fused_moments2(p: jax.Array, g: jax.Array, ctab_t: jax.Array,
                   num_segs: int, tile: int | None = None) -> jax.Array:
    """Centered second moments per segment, one sweep.

    ctab_t: (8, Sp) rows [cx, cy, cz, 0...].  Returns (8, Sp) rows
    [xx, xy, xz, yy, yz, zz, 0, 0] of d = (p - centroid) * g.
    """
    n = p.shape[1]
    sp = ctab_t.shape[1]
    tile = tile or _pick_tile(n)
    grid = n // tile
    return pl.pallas_call(
        functools.partial(_moments2_kernel, sp=sp),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((8, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, sp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, sp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, sp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, sp), jnp.float32)],
        interpret=_interp(),
    )(p, g, ctab_t)


# ---------------------------------------------------------------------------
# whole-level mega-kernel: the full fit while_loop in ONE pallas call
# ---------------------------------------------------------------------------
#
# Motivation (measured on the v5e): per-pallas-call / per-grid-step dispatch
# overhead dominates small kernels, and the XLA 'onehot' fit iteration is
# bound by re-reading its HBM-materialized (N, S) one-hot (~33 MB) five
# times per iteration.  At KITTI scale the ENTIRE packed cloud fits in VMEM
# (8 * N * 4 B = 4.2 MB at N=131072), so this kernel loads it once and runs
# the complete convergence loop on-chip: per iteration two sweeps over
# VMEM-resident tiles, zero HBM traffic, one kernel launch per level.
# One-hot contractions run as bf16 matmuls with an exact 3-term bf16
# split of the f32 operand (the one-hot itself is exact in bf16), which
# measured 2.2x faster than f32 HIGHEST matmuls for the same results.

_EPS = 1e-12
_TWO_PI_3 = 2.0943951023931953


def _split3(x):
    """Exact 3-term bf16 decomposition of f32 (24 = 3 x 8 mantissa bits)."""
    h = x.astype(jnp.bfloat16)
    r = x - h.astype(jnp.float32)
    m = r.astype(jnp.bfloat16)
    l = (r - m.astype(jnp.float32)).astype(jnp.bfloat16)
    return h, m, l


def _dot3(a_parts, b, dims):
    """Exact f32-operand contraction against a one-hot via bf16 MXU.

    The three split terms are stacked into ONE (3r, K) matmul and the
    output slices summed — same arithmetic as three separate dots (term
    order preserved), but 2.4x faster on the MXU (measured): one M=3r
    pass instead of three M=r passes.
    """
    r = a_parts[0].shape[0]
    packed = jnp.concatenate(a_parts, axis=0)
    out = jax.lax.dot_general(packed, b, (dims, ((), ())),
                              preferred_element_type=jnp.float32)
    return out[0:r] + out[r:2 * r] + out[2 * r:3 * r]


def _acos(x):
    """Elementwise arccos from Mosaic-supported primitives only.

    Mosaic has no acos lowering; this is the classic Cephes ``asinf``
    reduction (|t| <= 0.5 polynomial + half-angle identity), accurate to
    ~1 ulp in f32 over [-1, 1] — used for the eigenvalue trig formula.
    """
    a = jnp.abs(x)
    big = a > 0.5
    # asin polynomial argument: t = a (small branch) or sqrt((1-a)/2)
    z_big = (1.0 - a) * 0.5
    t = jnp.where(big, jnp.sqrt(z_big), a)
    z = jnp.where(big, z_big, a * a)
    p = (((4.2163199048e-2 * z + 2.4181311049e-2) * z + 4.5470025998e-2)
         * z + 7.4953002686e-2) * z + 1.6666752422e-1
    asin_t = t + t * z * p
    acos_a = jnp.where(big, 2.0 * asin_t,
                       jnp.float32(1.5707963267948966) - asin_t)
    return jnp.where(x < 0, jnp.float32(3.141592653589793) - acos_a, acos_a)


def _plane_rows(m2, gcnt):
    """Row-form port of segment/engine._cov_normal + ops/geometry.eigh3x3.

    m2: (8, Sp) rows [xx, xy, xz, yy, yz, zz, *, *] centered second-moment
    sums; gcnt: (1, Sp).  Returns (3, Sp) unit normals flipped to +Z
    (fitPlanePCA, src/recursive_patchwork.cpp:86-95).  Pure VPU math, runs
    inside the kernel.  The expression tree mirrors ops/geometry.py
    term-for-term so results track the XLA path.
    """
    denom = jnp.maximum(gcnt - 1.0, 1.0)
    a00, a01, a02 = m2[0:1] / denom, m2[1:2] / denom, m2[2:3] / denom
    a11, a12, a22 = m2[3:4] / denom, m2[4:5] / denom, m2[5:6] / denom

    # eigvals3x3 (Smith 1961), smallest eigenvalue only
    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.maximum(p, _EPS)
    b00, b11, b22 = d0 / safe_p, d1 / safe_p, d2 / safe_p
    b01, b02, b12 = a01 / safe_p, a02 / safe_p, a12 / safe_p
    detb = (b00 * (b11 * b22 - b12 * b12)
            - b01 * (b01 * b22 - b12 * b02)
            + b02 * (b01 * b12 - b11 * b02))
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = _acos(r) / 3.0
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + jnp.float32(_TWO_PI_3))
    diag_min = jnp.minimum(a00, jnp.minimum(a11, a22))
    e_min = jnp.where(p <= _EPS, diag_min, e_lo)

    # smallest_eigenvector3x3: largest cross product of rows of (A - e I)
    r0x, r0y, r0z = a00 - e_min, a01, a02
    r1x, r1y, r1z = a01, a11 - e_min, a12
    r2x, r2y, r2z = a02, a12, a22 - e_min

    c0x = r0y * r1z - r0z * r1y
    c0y = r0z * r1x - r0x * r1z
    c0z = r0x * r1y - r0y * r1x
    c1x = r0y * r2z - r0z * r2y
    c1y = r0z * r2x - r0x * r2z
    c1z = r0x * r2y - r0y * r2x
    c2x = r1y * r2z - r1z * r2y
    c2y = r1z * r2x - r1x * r2z
    c2z = r1x * r2y - r1y * r2x

    n0 = jnp.sqrt(c0x * c0x + c0y * c0y + c0z * c0z)
    n1 = jnp.sqrt(c1x * c1x + c1y * c1y + c1z * c1z)
    n2 = jnp.sqrt(c2x * c2x + c2y * c2y + c2z * c2z)
    sel0 = (n0 >= n1) & (n0 >= n2)   # argmax first-max tiebreak
    sel1 = (~sel0) & (n1 >= n2)
    vx = jnp.where(sel0, c0x, jnp.where(sel1, c1x, c2x))
    vy = jnp.where(sel0, c0y, jnp.where(sel1, c1y, c2y))
    vz = jnp.where(sel0, c0z, jnp.where(sel1, c1z, c2z))
    nn = jnp.sqrt(vx * vx + vy * vy + vz * vz)
    ok = nn > 1e-20
    sn = jnp.maximum(nn, 1e-30)
    vx = jnp.where(ok, vx / sn, 0.0)
    vy = jnp.where(ok, vy / sn, 0.0)
    vz = jnp.where(ok, vz / sn, 1.0)   # degenerate fallback +Z

    flip = vz < 0
    vx = jnp.where(flip, -vx, vx)
    vy = jnp.where(flip, -vy, vy)
    vz = jnp.where(flip, -vz, vz)
    return jnp.concatenate([vx, vy, vz], axis=0)   # (3, Sp)


def _centered_m2(m1):
    """Raw fast-sweep moments -> centered second-moment sums, (8, Sp).

    m1 rows (the 12-row fast accumulate): [cnt, sx, sy, sz, distsum,
    changed, xx, xy, xz, yy, yz, zz] with xx..zz raw (uncentered) sums.
    cov sums = M2 - S S^T / n — algebraically identical to the two-pass
    centered accumulation; numerically safe only because fast mode shifts
    points to their patch center first (segment/binning.patch_centers).
    """
    n = jnp.maximum(m1[0:1], 1.0)
    sx, sy, sz = m1[1:2], m1[2:3], m1[3:4]
    rows = jnp.concatenate(
        [m1[6:7] - sx * sx / n, m1[7:8] - sx * sy / n, m1[8:9] - sx * sz / n,
         m1[9:10] - sy * sy / n, m1[10:11] - sy * sz / n,
         m1[11:12] - sz * sz / n], axis=0)
    return jnp.concatenate([rows, jnp.zeros((2, rows.shape[1]),
                                            jnp.float32)], axis=0)


def _mega_kernel(p_ref, g_ref, gout_ref, stats_ref, *, sp, tile, max_iter,
                 fast):
    n = p_ref.shape[1]
    ntiles = n // tile
    gout_ref[:] = g_ref[:]

    def sweep(tab):
        """One pass over all tiles with the (8, Sp) plane table
        [cx, cy, cz, nx, ny, nz, can, 0]: gather the point's plane, apply
        the re-threshold where allowed, write the mask, and accumulate
        (8, Sp) stats [cnt, sx, sy, sz, distsum(old mask), changed, 0, 0].
        In fast mode the accumulate grows to 12 rows, appending the NEW
        mask's raw second moments [xx, xy, xz, yy, yz, zz] so the whole
        fit iteration needs no second (m2) sweep.  With can = 0 the mask
        is untouched and the sweep reduces to a moments/distsum pass
        (used for init and the final residual)."""
        tparts = _split3(tab)
        nrows = 12 if fast else 8

        def body(t, acc):
            sl = pl.ds(t * tile, tile)
            p = p_ref[:, sl]
            g = gout_ref[:, sl]
            ids = jax.lax.broadcasted_iota(
                jnp.int32, (sp, 1), 0).astype(jnp.float32)
            oht = (ids == p[5:6]).astype(jnp.bfloat16)       # (Sp, T)
            gat = _dot3(tparts, oht, ((1,), (0,)))           # (8, T) exact
            dx, dy, dz = p[0:1] - gat[0:1], p[1:2] - gat[1:2], p[2:3] - gat[2:3]
            dist = jnp.abs(dx * gat[3:4] + dy * gat[4:5] + dz * gat[5:6])
            apply_m = p[4:5] * gat[6:7]
            new_g = (dist < p[3:4]).astype(jnp.float32)
            g2 = apply_m * new_g + (1.0 - apply_m) * g
            gout_ref[:, sl] = g2
            xg, yg, zg = p[0:1] * g2, p[1:2] * g2, p[2:3] * g2
            rows = [g2, xg, yg, zg, dist * g, apply_m * jnp.abs(new_g - g)]
            if fast:
                rows += [p[0:1] * xg, p[1:2] * xg, p[2:3] * xg,
                         p[1:2] * yg, p[2:3] * yg, p[2:3] * zg]
            else:
                rows += [jnp.zeros_like(g2), jnp.zeros_like(g2)]
            prod = jnp.concatenate(rows, axis=0)
            return acc + _dot3(_split3(prod), oht, ((1,), (1,)))

        return jax.lax.fori_loop(0, ntiles, body,
                                 jnp.zeros((nrows, sp), jnp.float32))

    def m2_sweep(ctab):
        """Centered second moments of the current mask (two-pass form,
        bit-compatible with the reference's covariance accumulation)."""
        cparts = _split3(ctab)

        def body(t, acc):
            sl = pl.ds(t * tile, tile)
            p = p_ref[:, sl]
            g = gout_ref[:, sl]
            ids = jax.lax.broadcasted_iota(
                jnp.int32, (sp, 1), 0).astype(jnp.float32)
            oht = (ids == p[5:6]).astype(jnp.bfloat16)
            cg = _dot3(cparts, oht, ((1,), (0,)))
            dx = (p[0:1] - cg[0:1]) * g
            dy = (p[1:2] - cg[1:2]) * g
            dz = (p[2:3] - cg[2:3]) * g
            prod = jnp.concatenate(
                [dx * dx, dx * dy, dx * dz, dy * dy, dy * dz, dz * dz,
                 jnp.zeros_like(dx), jnp.zeros_like(dx)], axis=0)
            return acc + _dot3(_split3(prod), oht, ((1,), (1,)))

        return jax.lax.fori_loop(0, ntiles, body,
                                 jnp.zeros((8, sp), jnp.float32))

    zeros8 = jnp.zeros((8, sp), jnp.float32)
    m1_0 = sweep(zeros8)   # moments of the seeded mask, mask unchanged

    def make_tab(m1, with_can):
        gcnt = m1[0:1]
        c = m1[1:4] / jnp.maximum(gcnt, 1.0)
        if fast:
            m2 = _centered_m2(m1)
        else:
            ctab = jnp.concatenate([c, jnp.zeros((5, sp), jnp.float32)],
                                   axis=0)
            m2 = m2_sweep(ctab)
        normal = _plane_rows(m2, gcnt)
        can = (gcnt >= 3.0).astype(jnp.float32) if with_can \
            else jnp.zeros((1, sp), jnp.float32)
        return jnp.concatenate(
            [c, normal, can, jnp.zeros((1, sp), jnp.float32)], axis=0)

    def cond(st):
        _, changed, it = st
        return changed & (it < max_iter)

    def body(st):
        m1, _, it = st
        tab = make_tab(m1, True)
        m1_next = sweep(tab)
        return m1_next, jnp.sum(m1_next[5:6]) > 0.0, it + 1

    m1, changed_fin, _ = jax.lax.while_loop(
        cond, body, (m1_0, True, jnp.int32(0)))

    # final fit of the converged mask: can=0 -> pure distance-sum sweep.
    # On a CONVERGENCE exit the re-fit plane and distance sum are bitwise
    # the values already in ``m1`` (the mask did not change, so the
    # re-fit recomputes the same moments); only a max_iter exit needs it.
    @pl.when(changed_fin)
    def _():
        m_f = sweep(make_tab(m1, False))
        stats_ref[:] = jnp.concatenate(
            [m_f[0:6], jnp.zeros((2, sp), jnp.float32)], axis=0)

    @pl.when(jnp.logical_not(changed_fin))
    def _():
        stats_ref[:] = jnp.concatenate(
            [m1[0:6], jnp.zeros((2, sp), jnp.float32)], axis=0)


def megakernel_fits(n_padded: int, sp: int) -> bool:
    """Whole-cloud-in-VMEM feasibility (conservative 10 MB budget)."""
    point_bytes = (8 + 3) * 4 * n_padded          # packed rows + in/out masks
    onehot_bytes = 2 * sp * 4096 * 2              # (Sp, T) bf16, double-ish
    return point_bytes + onehot_bytes + 64 * sp * 4 < 10 * 1024 * 1024


@functools.partial(jax.jit, static_argnames=("num_segs", "max_iter", "tile",
                                             "fast"))
def fit_level_megakernel(p: jax.Array, g0: jax.Array, num_segs: int,
                         max_iter: int, tile: int | None = None,
                         fast: bool = False):
    """Run one level's complete fit loop in a single kernel launch.

    p: (8, N) packed points (:func:`fit_pack`), N a multiple of the tile;
    g0: (1, N) seeded 0/1 mask.  Returns (g (1, N) f32 converged mask,
    stats (8, Sp) f32 rows [cnt, sx, sy, sz, distsum, changed, 0, 0] of the
    final fit).  ``fast`` fuses the covariance into the apply sweep (one
    sweep per iteration; expects patch-center-shifted coordinates).
    """
    n = p.shape[1]
    sp = sp_width(num_segs)
    if tile is None:
        tile = next(t for t in (8192, 4096, 2048, 1024, 512, 256, 128)
                    if n % t == 0)
    return pl.pallas_call(
        functools.partial(_mega_kernel, sp=sp, tile=tile, max_iter=max_iter,
                          fast=fast),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((8, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, sp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, n), jnp.float32),
            jax.ShapeDtypeStruct((8, sp), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interp(),
    )(p, g0)


# ---------------------------------------------------------------------------
# exact per-segment order statistics, in-kernel (no sort)
# ---------------------------------------------------------------------------
#
# The reference needs two order statistics: the 10th-percentile z for the
# non-adaptive seed threshold (src/recursive_patchwork.cpp:156-159) and the
# per-patch median for the variance-axis split (cpp:253-269).  A segment
# sort of the whole cloud is the XLA formulation (segops.sort_by_segment)
# but costs milliseconds of HBM-bound sorting passes.  Here the k-th
# smallest value per segment is found EXACTLY with 5 histogram-refinement
# sweeps over the VMEM-resident points:
#
# * f32 values map to order-preserving int32 keys (the classic radix trick:
#   flip the low 31 bits of negatives), so selection runs on exact integer
#   arithmetic — no convergence/tie issues;
# * each round partitions the current key interval into 128 buckets
#   (arithmetic shift), counts per (bucket, segment) with ONE bf16 MXU
#   matmul per tile (0/1 operands, f32 accumulation => exact), locates the
#   bucket containing rank k via a triangular cumulative matmul, and
#   narrows the interval 128x;
# * 7 bits per round x 5 rounds covers the full 32-bit key space, so after
#   round 5 the interval is a single key — the answer, exactly
#   sorted(values)[k], independent of summation order or ties.

_MANT31 = 0x7FFFFFFF


def _f32_key(v):
    """f32 -> order-preserving int32 key (involution with _key_f32)."""
    u = jax.lax.bitcast_convert_type(v, jnp.int32)
    return u ^ (jnp.right_shift(u, 31) & jnp.int32(_MANT31))


def _key_f32(k):
    """int32 key -> f32 value (inverse of _f32_key; same bit trick)."""
    u = k ^ (jnp.right_shift(k, 31) & jnp.int32(_MANT31))
    return jax.lax.bitcast_convert_type(u, jnp.float32)


# shift per round: 7 key bits resolved per round, 4 on the last
_OS_SHIFTS = (25, 18, 11, 4, 0)


def _orderstat_rounds(count_round, k, sp):
    """Run the 5 histogram rounds; returns (1, sp) f32 k-th smallest values.

    ``count_round(lo_rows, shift, first)`` must return (128, sp) f32 exact
    per-(bucket, segment) counts of candidate points, where ``lo_rows`` is
    the (2, sp) f32 [hi16, lo16] decomposition of the current lower-bound
    key (so in-kernel gathers of the 32-bit bound stay exact through bf16
    matmuls) and ``first`` selects the unbounded full-keyspace round.
    ``k`` is (1, sp) f32 target rank (0-indexed).  Segments whose k is out
    of range return garbage — callers mask.
    """
    tri_r = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    tri_c = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
    tri = (tri_r >= tri_c).astype(jnp.float32)  # cum_j = sum_{b<=j} counts_b
    bidx = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)

    lo = jnp.zeros((1, sp), jnp.int32)
    k = k.astype(jnp.float32)
    for r, shift in enumerate(_OS_SHIFTS):
        hi16 = jnp.right_shift(lo, 16).astype(jnp.float32)
        lo16 = (lo & jnp.int32(0xFFFF)).astype(jnp.float32)
        counts = count_round(
            jnp.concatenate([hi16, lo16], axis=0), shift, r == 0)
        cum = jax.lax.dot_general(
            tri, counts, (((1,), (0,)), ((), ())),
            precision=_HIGHEST, preferred_element_type=jnp.float32)
        j = jnp.sum((cum <= k).astype(jnp.float32), axis=0,
                    keepdims=True)  # first bucket with cum > k
        excl = cum - counts
        sel = (bidx.astype(jnp.float32) == j).astype(jnp.float32)
        base = jnp.sum(excl * sel, axis=0, keepdims=True)
        k = k - base
        j_i = j.astype(jnp.int32)
        if r == 0:
            lo = jnp.left_shift(j_i - 64, 25)
        else:
            lo = lo + jnp.left_shift(j_i, shift)
    return _key_f32(lo)


def _gather_lo(lo_rows_parts, oht):
    """Per-point int32 lower bound from its split [hi16, lo16] gather."""
    g = _dot3(lo_rows_parts, oht, ((1,), (0,)))     # (2, T) exact f32
    return (g[0:1].astype(jnp.int32) * 65536 + g[1:2].astype(jnp.int32))


def _bucket_onehot(key, lo_pt, shift, first, valid):
    """(128, T) bf16 bucket one-hot of each point's key this round."""
    if first:
        bucket = jnp.right_shift(key, 25) + 64
        ok = valid
    else:
        bucket = jnp.right_shift(key - lo_pt, shift)
        ok = valid & (key >= lo_pt)
    bidx = jax.lax.broadcasted_iota(jnp.int32, (128, 1), 0)
    return ((bidx == bucket) & ok).astype(jnp.bfloat16)


def _orderstat_kernel(v_ref, s_ref, k_ref, out_ref, *, sp, tile):
    n = v_ref.shape[1]
    ntiles = n // tile
    ids = jax.lax.broadcasted_iota(jnp.int32, (sp, 1), 0).astype(jnp.float32)

    def count_round(lo_rows, shift, first):
        lo_parts = _split3(lo_rows)

        def body(t, acc):
            sl = pl.ds(t * tile, tile)
            key = _f32_key(v_ref[0:1, sl])
            segf = s_ref[0:1, sl]
            oht = (ids == segf).astype(jnp.bfloat16)    # (Sp, T)
            valid = s_ref[1:2, sl] > 0.5
            lo_pt = (jnp.zeros_like(key) if first
                     else _gather_lo(lo_parts, oht))
            boh = _bucket_onehot(key, lo_pt, shift, first, valid)
            return acc + jax.lax.dot_general(
                boh, oht, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        return jax.lax.fori_loop(0, ntiles, body,
                                 jnp.zeros((128, sp), jnp.float32))

    out_ref[:] = _orderstat_rounds(count_round, k_ref[0:1, :], sp)


@functools.partial(jax.jit, static_argnames=("num_segs", "tile"))
def seg_order_stat(vals: jax.Array, seg: jax.Array, valid: jax.Array,
                   k: jax.Array, num_segs: int, tile: int | None = None):
    """Exact per-segment k-th smallest value (sorted(vals of seg)[k]).

    vals (N,) f32, seg (N,) int32, valid (N,) bool candidate mask,
    k (num_segs,) int32 0-indexed rank.  Returns (num_segs,) f32; segments
    with no candidates or k out of range return garbage (mask downstream).
    Standalone wrapper around the same histogram machinery the level
    megakernel uses in-kernel; differentially tested against
    segops.sort_by_segment.
    """
    n = vals.shape[0]
    sp = sp_width(num_segs)
    n_pad = (-n) % 128
    v2 = jnp.pad(vals.astype(jnp.float32), (0, n_pad))[None, :]
    s2 = jnp.stack([
        jnp.pad(seg.astype(jnp.float32), (0, n_pad), constant_values=-1.0),
        jnp.pad(valid.astype(jnp.float32), (0, n_pad)),
    ], axis=0)
    k2 = jnp.pad(k.astype(jnp.float32), (0, sp - num_segs))[None, :]
    npad = n + n_pad
    if tile is None:
        tile = next(t for t in (8192, 4096, 2048, 1024, 512, 256, 128)
                    if npad % t == 0)
    out = pl.pallas_call(
        functools.partial(_orderstat_kernel, sp=sp, tile=tile),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((1, npad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((2, npad), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sp), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, sp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interp(),
    )(v2, s2, k2)
    return out[0, :num_segs]


# ---------------------------------------------------------------------------
# v3: the ENTIRE level in one kernel launch — split execution (remap),
#     seeds (adaptive OR percentile), stats, fit loop, split decision
# ---------------------------------------------------------------------------
#
# Beyond the fit loop, each level of the XLA path spends ~6 more one-hot
# matmul / masked-reduce passes on per-node statistics (counts, seed
# counts, bounding boxes), the seed/early-out per-point gathers, and the
# split bookkeeping (segment/engine.py _level_body; reference semantics
# src/recursive_patchwork.cpp:109-308).  This kernel runs the complete
# level with the cloud VMEM-resident and ONE launch:
#
#   remap prologue (deep levels): execute the parent level's splits —
#     per-parent variance axis, EXACT per-parent median (histogram order
#     statistic, no sort — replaces the XLA segment sort that dominated
#     split-heavy scenes), compact child-slot assignment, per-point
#     reassignment, child inheritance of tau/zth (cpp:237-304)
#   -> stats (cnt, bbox) -> early-outs -> seeds (adaptive gather OR the
#     reference's percentile order statistic, cpp:156-159, again in-kernel;
#     incl. the "3 lowest-z" deficient fallback, cpp:171-182)
#   -> iterative fit -> split decision -> done/ground updates.
#
# Inputs
#   pts    (8, N) f32 rows [x, y, z, seg, ground, done, index, 0]
#          seg = live node id (trash if done/out-of-patch); for remap
#          levels these are PARENT ids — the prologue renumbers them
#   tables (8, Sp) f32 rows [tau_node, zth_node, real, split_thresh,
#                            min_split_size, depth_ok, parent_split, 0]
#          (rows 3-5 are per-level scalars broadcast across Sp; tau/zth
#          are indexed by parent ids for remap levels)
# Outputs
#   state  (4, N) f32 rows [ground, done, chosen (scratch), seg_out]
#   stats  (8, Sp) f32 rows [split, gcnt, resid-sum/cnt, cnt, seed_cnt,
#                            tau_out, zth_out, 0]
#          tau_out/zth_out are the POST-remap per-node rows (children
#          inherit their parent's, cpp:286-287) for feeding the next level.


# perf knob (bitwise-neutral either way), read at import:
# - the one-hot VMEM cache measurably wins on v5e (A/B 2026-08-20:
#   velodyne 1059 fast / 634 exact with it vs 928/575 before it landed)
#   and defaults ON (PATCHWORK_TPU_OHT_CACHE=0 disables).
# A second knob used to gate "banded compact sweeps" (contract each tile
# against a 32-wide compact one-hot band instead of the dense (Sp, T)
# one).  They cut MXU flops 4x in interpret-mode counts but measured ~2x
# SLOWER on real v5e twice (529 vs 1059 r3; 531 vs 1068 r4 probes), could
# not engage at all in their hypothesized winning regimes (num_sectors
# >> 10 exceeds the megakernel's VMEM budget before banding matters; the
# B=1 arm never finished compiling inside 20 min), and were DELETED in
# round 4 — see ARCHITECTURE.md "banded compact sweeps" for the full
# cautionary writeup.
_ENABLE_OHT_CACHE = os.environ.get("PATCHWORK_TPU_OHT_CACHE") != "0"
_TILE_OVERRIDE = None   # tests: force a level_megakernel tile size


def _level_kernel(p_ref, tab_ref, state_ref, stats_ref, acache_ref,
                  mcache_ref, pres_ref, words_ref, live_ref, ohtc_ref,
                  *, sp, tile, max_iter, is_level0,
                  min_seed, flat_area, flat_dz, flat_minpts, fast, adaptive,
                  seed_percentile, th_seeds, remap, trash, cache_oht):
    n = p_ref.shape[1]
    ntiles = n // tile
    n_words = (ntiles + 31) // 32
    inf = jnp.float32(jnp.inf)
    big = jnp.float32(3.0e38)
    trash_f = jnp.float32(trash)

    state_ref[0:1, :] = p_ref[4:5, :]   # ground
    state_ref[1:2, :] = p_ref[5:6, :]   # done
    state_ref[2:3, :] = jnp.zeros((1, n), jnp.float32)   # chosen

    ids = jax.lax.broadcasted_iota(jnp.int32, (sp, 1), 0).astype(jnp.float32)

    def oht_sl(sl):
        """(Sp, T) one-hot of the LIVE seg (post-remap, state row 3)."""
        return ids == state_ref[3:4, sl]

    def oht_b(sl):
        """(Sp, T) bf16 one-hot of the live seg, VMEM-cached per level.

        The seg row is STATIC for the whole level (set in phase 0, next
        mutated only by the NEXT level's remap prologue), so the bf16
        one-hot every sweep feeds to the MXU can be materialized once and
        re-read: the per-tile broadcast compare + 2 MB store drop out of
        every stale-tile visit of every sweep of every fit iteration.
        Bitwise-neutral: the cached values are exactly the ones the inline
        compare produces.
        """
        if cache_oht:
            return ohtc_ref[:, sl]
        return oht_sl(sl).astype(jnp.bfloat16)

    def gat_via(tparts, t, sl):
        """Gather node rows to points: (rows, Sp) x (Sp, T) MXU contraction."""
        return _dot3(tparts, oht_b(sl), ((1,), (0,)))

    def acc_via(prod, t, sl):
        """Accumulate point rows into node columns: (rows, T) x (T, Sp)."""
        return _dot3(_split3(prod), oht_b(sl), ((1,), (1,)))

    def act_sl(sl):
        """(1, T) 0/1 activity from the live seg (trash = inactive)."""
        return (state_ref[3:4, sl] < trash_f).astype(jnp.float32)

    # ---- live-tile skip (remap levels only) ------------------------------
    # After a split level the only still-active points are those of SPLIT
    # parents (_level_body marked everything else done), typically a small
    # azimuth-contiguous subset of the cloud.  The mandatory first remap
    # sweep (R1) bit-packs per-tile liveness into SMEM; every later sweep
    # of the level skips dead tiles outright.  A dead tile's contribution
    # to any accumulation is exactly zero and its ref writes are no-ops
    # (activity-masked), so skipping is bit-identical to the dense sweep.
    def tile_live(t):
        w = live_ref[t >> 5]
        return (jax.lax.shift_right_logical(w, t & 31) & 1) > 0

    def _maybe(t, carry, go):
        """Run go() -> new carry (may write refs) only if tile t is live."""
        if not remap:
            return go()
        return jax.lax.cond(tile_live(t), go, lambda: carry)

    # ---- phase 0: split execution / remap prologue (cpp:237-304) --------
    if not remap:
        state_ref[3:4, :] = p_ref[3:4, :]
        if cache_oht:
            def fill_body(t, _):
                sl = pl.ds(t * tile, tile)
                seg = state_ref[3:4, sl]
                ohtc_ref[:, sl] = (ids == seg).astype(jnp.bfloat16)
                return 0

            jax.lax.fori_loop(0, ntiles, fill_body, 0)
        tau_row = tab_ref[0:1, :]
        zth_row = tab_ref[1:2, :]
    else:
        for i in range(n_words):
            live_ref[i] = jnp.int32(0)
        # R5 only touches live tiles: park every point on trash first so
        # skipped (dead) tiles read a fully-initialized seg row.
        state_ref[3:4, :] = jnp.full((1, n), trash_f, jnp.float32)

        def p_oht(p):
            return ids == p[3:4]        # (Sp, T) one-hot of PARENT ids

        # R1: per-parent xy variance about the full-node centroid
        # (population variance, cpp:237-250).  fast mode folds the second
        # moments into one raw-moment sweep (patch-shifted coords keep the
        # cancellation bounded); exact mode keeps the two-pass form.
        # Also the liveness census: the one sweep that must touch every
        # tile records which tiles contain any live point.
        nr1 = 5 if fast else 3

        def r1_body(t, acc):
            sl = pl.ds(t * tile, tile)
            p = p_ref[:, sl]
            a = (p[3:4] < trash_f).astype(jnp.float32)
            bit = (jnp.sum(a) > 0.0).astype(jnp.int32)
            w = live_ref[t >> 5]
            live_ref[t >> 5] = w | jnp.left_shift(bit, t & 31)
            oht = p_oht(p).astype(jnp.bfloat16)
            xa, ya = p[0:1] * a, p[1:2] * a
            rows = [a, xa, ya]
            if fast:
                rows += [p[0:1] * xa, p[1:2] * ya]
            prod = jnp.concatenate(rows, axis=0)
            return acc + _dot3(_split3(prod), oht, ((1,), (1,)))

        m1 = jax.lax.fori_loop(0, ntiles, r1_body,
                               jnp.zeros((nr1, sp), jnp.float32))
        pcnt = m1[0:1]
        safe_n = jnp.maximum(pcnt, 1.0)
        cx, cy = m1[1:2] / safe_n, m1[2:3] / safe_n
        if fast:
            vx = m1[3:4] - m1[1:2] * m1[1:2] / safe_n
            vy = m1[4:5] - m1[2:3] * m1[2:3] / safe_n
        else:
            c2 = _split3(jnp.concatenate([cx, cy], axis=0))

            def r1b_body(t, acc):
                def go():
                    sl = pl.ds(t * tile, tile)
                    p = p_ref[:, sl]
                    oht = p_oht(p).astype(jnp.bfloat16)
                    a = (p[3:4] < trash_f).astype(jnp.float32)
                    cg = _dot3(c2, oht, ((1,), (0,)))
                    dx = (p[0:1] - cg[0:1]) * a
                    dy = (p[1:2] - cg[1:2]) * a
                    prod = jnp.concatenate([dx * dx, dy * dy], axis=0)
                    return acc + _dot3(_split3(prod), oht, ((1,), (1,)))
                return _maybe(t, acc, go)

            v2 = jax.lax.fori_loop(0, ntiles, r1b_body,
                                   jnp.zeros((2, sp), jnp.float32))
            vx, vy = v2[0:1], v2[1:2]
        axis_x = (vx > vy).astype(jnp.float32)   # (1, Sp)

        # R2: EXACT per-parent median sorted[cnt // 2] (cpp:253-269) via
        # the histogram order statistic — 5 sweeps, no sort.
        k_med = jnp.floor(pcnt * 0.5)

        def count_round_med(lo_rows, shift, first):
            gparts = _split3(jnp.concatenate([axis_x, lo_rows], axis=0))

            def body(t, acc):
                def go():
                    sl = pl.ds(t * tile, tile)
                    p = p_ref[:, sl]
                    ohb = p_oht(p)
                    oht = ohb.astype(jnp.bfloat16)
                    g = _dot3(gparts, oht, ((1,), (0,)))  # [axis, hi16, lo16]
                    v = g[0:1] * p[0:1] + (1.0 - g[0:1]) * p[1:2]
                    key = _f32_key(v)
                    a = p[3:4] < trash_f
                    lo_pt = (g[1:2].astype(jnp.int32) * 65536
                             + g[2:3].astype(jnp.int32))
                    boh = _bucket_onehot(key, lo_pt, shift, first, a)
                    return acc + jax.lax.dot_general(
                        boh, oht, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                return _maybe(t, acc, go)

            return jax.lax.fori_loop(0, ntiles, body,
                                     jnp.zeros((128, sp), jnp.float32))

        median = _orderstat_rounds(count_round_med, k_med, sp)

        # R3: compact child slots — children of split parents renumber
        # into [0, trash); overflowing parents keep their converged mask
        # (depth truncation; raise cfg.max_active_nodes if hit).
        split_p = tab_ref[6:7, :]
        tri_r = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 0)
        tri_c = jax.lax.broadcasted_iota(jnp.int32, (sp, sp), 1)
        tri_strict = (tri_r < tri_c).astype(jnp.bfloat16)
        rank = jax.lax.dot_general(                     # rank_j = #{i<j: split}
            split_p.astype(jnp.bfloat16), tri_strict,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        base_slot = 2.0 * rank
        okp = split_p * (base_slot + 1.0 < trash_f).astype(jnp.float32)

        # R4: children inherit the parent's tau/zth rows (cpp:286-287):
        # permutation matmul new[i] <- old[j] for i in {slot_j, slot_j+1}
        srow = jax.lax.broadcasted_iota(jnp.int32, (sp, 1), 0)\
            .astype(jnp.float32)
        pm = (((srow == base_slot) | (srow == base_slot + 1.0))
              & (okp > 0.5)).astype(jnp.bfloat16)       # (Sp_new, Sp_old)
        tz = _dot3(_split3(tab_ref[0:2, :]), pm, ((1,), (1,)))
        tau_row, zth_row = tz[0:1], tz[1:2]

        # R5: reassign points: left (val <= median) -> slot, right ->
        # slot+1 (cpp:270-283, order-preserving combine); overflow -> done.
        g5 = _split3(jnp.concatenate(
            [median, okp, base_slot, axis_x], axis=0))

        def r5_body(t, _):
            @pl.when(tile_live(t))
            def _():
                sl = pl.ds(t * tile, tile)
                p = p_ref[:, sl]
                oht = p_oht(p).astype(jnp.bfloat16)
                g = _dot3(g5, oht, ((1,), (0,)))
                med, okg, slot, ax = g[0:1], g[1:2], g[2:3], g[3:4]
                v = ax * p[0:1] + (1.0 - ax) * p[1:2]
                gr = (v > med).astype(jnp.float32)
                a = (p[3:4] < trash_f).astype(jnp.float32)
                newseg = okg * (slot + gr) + (1.0 - okg) * trash_f
                state_ref[3:4, sl] = a * newseg + (1.0 - a) * trash_f
                state_ref[1:2, sl] = jnp.maximum(
                    state_ref[1:2, sl], a * (1.0 - okg))
                if cache_oht:
                    # dead tiles keep a stale cache block: every reader of
                    # oht_b is live-gated (_maybe), so it is never seen
                    ohtc_ref[:, sl] = oht_sl(sl).astype(jnp.bfloat16)
            return 0

        jax.lax.fori_loop(0, ntiles, r5_body, 0)

    # ---- phase 1: per-node stats (cnt, bbox; + seed_cnt if adaptive) ----
    zth_parts = _split3(zth_row)

    def s1_body(t, carry):
        def go():
            sums, mins, maxs = carry
            sl = pl.ds(t * tile, tile)
            p = p_ref[:, sl]
            ohb = oht_sl(sl)
            oht = ohb.astype(jnp.bfloat16)
            act = act_sl(sl)
            if adaptive:
                zth_pt = _dot3(zth_parts, oht, ((1,), (0,)))
                seed = act * (p[2:3] < zth_pt[0:1]).astype(jnp.float32)
            else:
                seed = jnp.zeros_like(act)
            prod = jnp.concatenate(
                [act, seed, jnp.zeros((6, p.shape[1]), jnp.float32)], axis=0)
            sums2 = sums + _dot3(_split3(prod), oht, ((1,), (1,)))
            sel = ohb & (act > 0.5)
            new_mins, new_maxs = [], []
            for ch in range(3):
                v = p[ch:ch + 1]
                new_mins.append(jnp.min(jnp.where(sel, v, inf), axis=1))
                new_maxs.append(jnp.max(jnp.where(sel, v, -inf), axis=1))
            pad = jnp.full((5, sp), inf, jnp.float32)
            mins2 = jnp.minimum(mins, jnp.concatenate(
                [new_mins[0][None], new_mins[1][None], new_mins[2][None],
                 pad], 0))
            maxs2 = jnp.maximum(maxs, jnp.concatenate(
                [new_maxs[0][None], new_maxs[1][None], new_maxs[2][None],
                 -pad], 0))
            return sums2, mins2, maxs2
        return _maybe(t, carry, go)

    sums, mins, maxs = jax.lax.fori_loop(
        0, ntiles, s1_body,
        (jnp.zeros((8, sp), jnp.float32),
         jnp.full((8, sp), inf, jnp.float32),
         jnp.full((8, sp), -inf, jnp.float32)))
    cnt, seed_cnt = sums[0:1], sums[1:2]
    xmin, ymin, zmin = mins[0:1], mins[1:2], mins[2:3]
    xmax, ymax, zmax = maxs[0:1], maxs[1:2], maxs[2:3]

    # ---- phase 1b: percentile seed threshold (cpp:156-159) --------------
    # Non-adaptive configs: z_th = sorted_z[int(percentile * cnt)] +
    # th_seeds, per node, recomputed at EVERY level from the node's own
    # points (the reference recurses with the child's own percentile).
    # The exact order statistic runs in-kernel — previously this path fell
    # off the fused kernels entirely (round-1 VERDICT item 2).
    if not adaptive:
        k_seed = jnp.floor(jnp.float32(seed_percentile) * cnt)

        def count_round_z(lo_rows, shift, first):
            lo_parts = _split3(lo_rows)

            def body(t, acc):
                def go():
                    sl = pl.ds(t * tile, tile)
                    p = p_ref[:, sl]
                    oht = oht_b(sl)
                    key = _f32_key(p[2:3])
                    a = state_ref[3:4, sl] < trash_f
                    lo_pt = (jnp.zeros_like(key) if first
                             else _gather_lo(lo_parts, oht))
                    boh = _bucket_onehot(key, lo_pt, shift, first, a)
                    return acc + jax.lax.dot_general(
                        boh, oht, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
                return _maybe(t, acc, go)

            return jax.lax.fori_loop(0, ntiles, body,
                                     jnp.zeros((128, sp), jnp.float32))

        zstat = _orderstat_rounds(count_round_z, k_seed, sp)
        zth_row = zstat + jnp.float32(th_seeds)
        zparts = _split3(zth_row)

        def sc_body(t, acc):
            def go():
                sl = pl.ds(t * tile, tile)
                p = p_ref[:, sl]
                oht = oht_b(sl)
                act = act_sl(sl)
                zth_pt = _dot3(zparts, oht, ((1,), (0,)))
                seed = act * (p[2:3] < zth_pt[0:1]).astype(jnp.float32)
                return acc + _dot3(_split3(seed), oht, ((1,), (1,)))
            return _maybe(t, acc, go)

        seed_cnt = jax.lax.fori_loop(
            0, ntiles, sc_body, jnp.zeros((1, sp), jnp.float32))

    # ---- phase 2: early-outs (cpp:111-140, reference order) -------------
    real = tab_ref[2:3, :] > 0.5
    too_small = cnt < 3.0
    area = (xmax - xmin) * (ymax - ymin)
    if is_level0:
        flat_a = jnp.zeros_like(too_small)
    else:
        flat_a = (area < flat_area) & ~too_small
    flat_zm = ((zmax - zmin) < flat_dz) & (cnt > jnp.float32(flat_minpts))
    flat_zm = flat_zm & ~too_small & ~flat_a
    finished = real & (too_small | flat_a | flat_zm)
    label = (flat_a | flat_zm).astype(jnp.float32)
    fit_node = real & ~finished
    deficient = fit_node & (seed_cnt < jnp.float32(min_seed))
    any_def = jnp.sum(deficient.astype(jnp.float32)) > 0.0

    # ---- phase 3: deficient "min_seed lowest-z" fallback (cpp:171-182) --
    def_row = deficient.astype(jnp.bfloat16)

    def trip_cond(st):
        return st[0] & (st[1] < min_seed)

    def trip_body(st):
        _, r = st

        def min_sweep(t, m):
            def go():
                sl = pl.ds(t * tile, tile)
                p = p_ref[:, sl]
                ohb = oht_sl(sl)
                oht = ohb.astype(jnp.bfloat16)
                def_pt = jax.lax.dot_general(
                    def_row, oht, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                cand = ((act_sl(sl) > 0.5) & (def_pt > 0.5)
                        & (state_ref[2:3, sl] < 0.5))
                zc = jnp.where(cand, p[2:3], inf)
                return jnp.minimum(
                    m, jnp.min(jnp.where(ohb, zc, inf), axis=1)[None])
            return _maybe(t, m, go)

        m = jax.lax.fori_loop(0, ntiles, min_sweep,
                              jnp.full((1, sp), inf, jnp.float32))
        m_parts = _split3(jnp.where(jnp.isfinite(m), m, big))

        def imin_sweep(t, mi):
            def go():
                sl = pl.ds(t * tile, tile)
                p = p_ref[:, sl]
                ohb = oht_sl(sl)
                oht = ohb.astype(jnp.bfloat16)
                def_pt = jax.lax.dot_general(
                    def_row, oht, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                cand = ((act_sl(sl) > 0.5) & (def_pt > 0.5)
                        & (state_ref[2:3, sl] < 0.5))
                m_pt = _dot3(m_parts, oht, ((1,), (0,)))
                is_min = cand & (p[2:3] == m_pt)
                ic = jnp.where(is_min, p[6:7], inf)
                return jnp.minimum(
                    mi, jnp.min(jnp.where(ohb, ic, inf), axis=1)[None])
            return _maybe(t, mi, go)

        mi = jax.lax.fori_loop(0, ntiles, imin_sweep,
                               jnp.full((1, sp), inf, jnp.float32))
        mi_parts = _split3(jnp.where(jnp.isfinite(mi), mi, big))

        def pick_sweep(t, _):
            def go():
                sl = pl.ds(t * tile, tile)
                p = p_ref[:, sl]
                ohb = oht_sl(sl)
                oht = ohb.astype(jnp.bfloat16)
                def_pt = jax.lax.dot_general(
                    def_row, oht, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                cand = ((act_sl(sl) > 0.5) & (def_pt > 0.5)
                        & (state_ref[2:3, sl] < 0.5))
                m_pt = _dot3(m_parts, oht, ((1,), (0,)))
                mi_pt = _dot3(mi_parts, oht, ((1,), (0,)))
                pick = cand & (p[2:3] == m_pt) & (p[6:7] == mi_pt)
                state_ref[2:3, sl] = jnp.maximum(
                    state_ref[2:3, sl], pick.astype(jnp.float32))
                return 0
            return _maybe(t, 0, go)

        jax.lax.fori_loop(0, ntiles, pick_sweep, 0)
        return jnp.bool_(True), r + 1

    jax.lax.while_loop(trip_cond, trip_body, (any_def, jnp.int32(0)))

    # ---- phase 4: early-out labels + seed-init (cpp:143-184), fused -----
    # with the first-moment sweep of the fit loop: see seed_tile below.
    t4 = _split3(jnp.concatenate([
        finished.astype(jnp.float32), label,
        fit_node.astype(jnp.float32), deficient.astype(jnp.float32),
        zth_row, jnp.zeros((3, sp), jnp.float32)], axis=0))

    # ---- phase 5: iterative fit (cpp:186-217), with dirty-tile caches ---
    #
    # The convergence loop dominates split-heavy scenes: on a realistic
    # spinning-LiDAR cloud a couple of dense near-field patches need
    # 30-50 iterations while everything else converges in <8, yet a naive
    # loop re-sweeps every tile every iteration.  Each sweep caches its
    # per-tile (nrows, Sp) contribution; a tile is recomputed only when it
    # contains a node whose plane changed in the previous sweep, otherwise
    # the cached block is re-added — bitwise the value a dense sweep would
    # produce (same mask, same plane, same arithmetic, same tile-order
    # summation), so results are EXACTLY those of the dense loop.  (A
    # stale tile is always refreshed in the sweep that finds it stale, so
    # "a contained node changed since the previous sweep" is identical to
    # the version-counter formulation "a contained node's plane changed
    # since this tile's cache was written".)
    #
    # Staleness is decided for ALL tiles at once — one (1,Sp)x(Sp,8*nt)
    # bf16 matmul of the previous sweep's per-node changed flags against
    # the per-tile node-presence scratch, bit-packed into int32 words in
    # SMEM by a handful of cross-lane reductions — so the per-tile test
    # inside the loop is a pure scalar shift/mask.  The former per-tile
    # vector->scalar reduction (jnp.sum(ver > seen) > 0) cost ~133 ns/tile
    # on v5e and dominated converged-tail iterations; the scalar bit test
    # is ~free, leaving tail sweeps at the stale-tile recompute cost only.
    # On azimuth-ordered scans (how spinning sensors actually stream, so
    # patches are near-contiguous) the tail iterations then touch only the
    # stubborn patches' few tiles.  The 'changed' row is per-sweep-valued,
    # not state-valued: it is zeroed at read time for clean tiles.
    fit_row = fit_node.astype(jnp.float32)
    nrows_a = 16 if fast else 8   # cache blocks: sublane offsets must be 8-aligned
    pres_a = 12 if fast else 7    # presence (act-count) row index
    _CH = 5  # index of the 'changed' row
    if not fast:
        # The apply cache is fully written by the force-all seed sweep
        # below, but the m2 cache's first sweep is already staleness-
        # gated: a tile with no active points is never stale, so its
        # block would be read uninitialized.  Its true contribution is
        # exactly zero (no active points), so zero-init is the dense
        # sweep's value.
        mcache_ref[:] = jnp.zeros(mcache_ref.shape, jnp.float32)

    def pack_stale_words(delta_row):
        """Bit-pack per-tile staleness vs `delta_row` into SMEM words.

        delta_row: (1, Sp) 0/1 — nodes whose plane changed in the sweep
        the caches were last written by.  Tile t is stale iff any node
        present in t (pres_ref, 8 identical rows per tile) changed.
        """
        cnt = jax.lax.dot_general(
            delta_row.astype(jnp.bfloat16), pres_ref[:],
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (1, 8*ntiles)
        lane = jax.lax.broadcasted_iota(jnp.int32, cnt.shape, 1)
        t_of = lane >> 3
        rep = (lane & 7) == 0                # one representative lane/tile
        bit = (cnt > 0.0).astype(jnp.int32)
        for i in range(n_words):
            w = jnp.where(rep & ((t_of >> 5) == i),
                          jnp.left_shift(bit, t_of & 31), 0)
            words_ref[i] = jnp.sum(w)

    def cached_sweep(force_all, cache_ref, nrows, pres_row, compute_tile,
                     changed_row=None):
        # force_all=True: first sweep of the loop — compute every tile
        # unconditionally (pres_ref is not yet written).  Otherwise the
        # caller has pack_stale_words()'d the delta row into words_ref.
        # The 'changed' row is per-sweep-valued: scale it to zero when
        # re-adding a clean tile's cache (fresh tiles keep it) — a
        # read-time row scale avoids a sublane-misaligned single-row store
        ridx = jax.lax.broadcasted_iota(jnp.int32, (nrows, 1), 0)

        def body(t, acc):
            def go():
                if force_all:
                    stale = jnp.bool_(True)
                else:
                    word = words_ref[t >> 5]
                    stale = (jnp.right_shift(word, t & 31) & 1) > 0

                @pl.when(stale)
                def _():
                    rows = compute_tile(t)
                    cache_ref[pl.ds(t * nrows, nrows), :] = rows
                    pres = (rows[pres_row : pres_row + 1] > 0.0).astype(
                        jnp.bfloat16)
                    pres_ref[pl.ds(t * 8, 8), :] = jnp.broadcast_to(
                        pres, (8, sp))

                block = cache_ref[pl.ds(t * nrows, nrows), :]
                if changed_row is not None:
                    fresh = jnp.where(stale, 1.0, 0.0)
                    scale = 1.0 - (ridx == changed_row).astype(
                        jnp.float32) * (1.0 - fresh)
                    block = block * scale
                return acc + block

            # dead tiles never write their cache/pres blocks and never add
            # them back: their contribution is exactly zero every sweep
            return _maybe(t, acc, go)

        return jax.lax.fori_loop(0, ntiles, body,
                                 jnp.zeros((nrows, sp), jnp.float32))

    def sweep(tab):
        tparts = _split3(tab)

        def compute_tile(t):
            sl = pl.ds(t * tile, tile)
            p = p_ref[:, sl]
            g = state_ref[0:1, sl]
            act = act_sl(sl)
            gat = gat_via(tparts, t, sl)
            dx, dy, dz = p[0:1] - gat[0:1], p[1:2] - gat[1:2], p[2:3] - gat[2:3]
            dist = jnp.abs(dx * gat[3:4] + dy * gat[4:5] + dz * gat[5:6])
            apply_m = act * gat[6:7]
            new_g = (dist < gat[7:8]).astype(jnp.float32)
            g2 = apply_m * new_g + (1.0 - apply_m) * g
            state_ref[0:1, sl] = g2
            gm = g2 * act
            xg, yg, zg = p[0:1] * gm, p[1:2] * gm, p[2:3] * gm
            rows = [gm, xg, yg, zg, dist * g * act,
                    apply_m * jnp.abs(new_g - g)]
            if fast:
                rows += [p[0:1] * xg, p[1:2] * xg, p[2:3] * xg,
                         p[1:2] * yg, p[2:3] * yg, p[2:3] * zg]
            if fast:
                # act (presence) at row 12, zero-pad the block to 16 rows
                rows += [act] + [jnp.zeros_like(g2)] * 3
            else:
                rows += [jnp.zeros_like(g2), act]   # presence at row 7
            prod = jnp.concatenate(rows, axis=0)
            return acc_via(prod, t, sl)

        return cached_sweep(False, acache_ref, nrows_a, pres_a,
                            compute_tile, changed_row=_CH)

    def m2_sweep(ctab):
        cparts = _split3(ctab)

        def compute_tile(t):
            sl = pl.ds(t * tile, tile)
            p = p_ref[:, sl]
            act = act_sl(sl)
            g = state_ref[0:1, sl] * act
            cg = gat_via(cparts, t, sl)
            dx = (p[0:1] - cg[0:1]) * g
            dy = (p[1:2] - cg[1:2]) * g
            dz = (p[2:3] - cg[2:3]) * g
            prod = jnp.concatenate(
                [dx * dx, dx * dy, dx * dz, dy * dy, dy * dz, dz * dz,
                 jnp.zeros_like(dx), act], axis=0)
            return acc_via(prod, t, sl)

        return cached_sweep(False, mcache_ref, 8, 7, compute_tile)

    def make_tab(m1, with_can):
        gcnt = m1[0:1]
        c = m1[1:4] / jnp.maximum(gcnt, 1.0)
        if fast:
            m2 = _centered_m2(m1)
        else:
            ctab = jnp.concatenate([c, jnp.zeros((5, sp), jnp.float32)],
                                   axis=0)
            m2 = m2_sweep(ctab)
        normal = _plane_rows(m2, gcnt)
        can = fit_row * (gcnt >= 3.0).astype(jnp.float32) if with_can \
            else jnp.zeros((1, sp), jnp.float32)
        return jnp.concatenate([c, normal, can, tau_row], axis=0)

    def seed_tile(t):
        # Phase 4's per-point work (early-out labels + seed-init, all
        # selects in 0/1 f32 arithmetic — Mosaic rejects boolean-valued
        # select_n) fused with the fit loop's first moment sweep: one
        # one-hot generation and one loop pass instead of two.  The old
        # standalone first sweep ran with an all-zero plane table, so its
        # dist and changed rows were exactly 0 and it left g untouched —
        # the rows built here are bitwise that sweep's.
        sl = pl.ds(t * tile, tile)
        p = p_ref[:, sl]
        oht = oht_b(sl)
        g4 = _dot3(t4, oht, ((1,), (0,)))
        fin_pt, lab_pt, fit_pt, def_pt = g4[0:1], g4[1:2], g4[2:3], g4[3:4]
        act = act_sl(sl)
        seed = act * (p[2:3] < g4[4:5]).astype(jnp.float32)
        chosen = state_ref[2:3, sl]
        seed = (def_pt * chosen + (1.0 - def_pt) * seed) * act
        g = state_ref[0:1, sl]
        w_fin = act * fin_pt
        g = w_fin * lab_pt + (1.0 - w_fin) * g
        w_fit = act * fit_pt
        g = w_fit * seed + (1.0 - w_fit) * g
        state_ref[0:1, sl] = g
        state_ref[1:2, sl] = jnp.maximum(state_ref[1:2, sl], w_fin)
        gm = g * act
        xg, yg, zg = p[0:1] * gm, p[1:2] * gm, p[2:3] * gm
        zero = jnp.zeros_like(gm)
        rows = [gm, xg, yg, zg, zero, zero]
        if fast:
            rows += [p[0:1] * xg, p[1:2] * xg, p[2:3] * xg,
                     p[1:2] * yg, p[2:3] * yg, p[2:3] * zg]
            rows += [act, zero, zero, zero]
        else:
            rows += [zero, act]
        prod = jnp.concatenate(rows, axis=0)
        return _dot3(_split3(prod), oht, ((1,), (1,)))

    m1_0 = cached_sweep(True, acache_ref, nrows_a, pres_a, seed_tile,
                        changed_row=_CH)
    # every node's plane table changes from the zero init -> all stale
    delta0 = jnp.ones((1, sp), jnp.float32)

    def fcond(st):
        _, changed, it, _ = st
        return changed & (it < max_iter)

    def fbody(st):
        m1, _, it, delta = st
        pack_stale_words(delta)
        m1n = sweep(make_tab(m1, True))
        delta_n = (m1n[_CH : _CH + 1] > 0.0).astype(jnp.float32)
        return m1n, jnp.sum(m1n[_CH : _CH + 1]) > 0.0, it + 1, delta_n

    m1, _, _, delta = jax.lax.while_loop(
        fcond, fbody, (m1_0, True, jnp.int32(0), delta0))

    # ---- phase 6: final fit, residual, split decision (cpp:219-235) -----
    # NOT convergence-gated like _mega_kernel's final sweep: here the
    # dirty-tile caches already make a converged-state sweep nearly free
    # (delta is all-zero, every tile clean -> pure cache adds), and an
    # A/B on v5e measured the pl.when gate 2-4% SLOWER on the demo scene
    # (branch + stats stash overhead) with no velodyne gain.
    pack_stale_words(delta)
    stats_f = sweep(make_tab(m1, False))
    gcnt = stats_f[0:1]
    resid = stats_f[4:5] / jnp.maximum(gcnt, 1.0)
    resid = jnp.where(gcnt >= 3.0, resid, inf)
    split = fit_node & (resid > tab_ref[3:4, :]) & (cnt >= tab_ref[4:5, :]) \
        & (tab_ref[5:6, :] > 0.5)

    # ---- phase 7: finish non-splitting fit nodes ------------------------
    t7 = jnp.concatenate([
        fit_row, split.astype(jnp.float32),
        jnp.zeros((6, sp), jnp.float32)], axis=0).astype(jnp.bfloat16)

    def s7_body(t, _):
        def go():
            sl = pl.ds(t * tile, tile)
            oht = oht_b(sl)
            g7 = jax.lax.dot_general(t7, oht, (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            fin2 = (act_sl(sl) > 0.5) & (g7[0:1] > 0.5) & (g7[1:2] < 0.5)
            state_ref[1:2, sl] = jnp.maximum(
                state_ref[1:2, sl], fin2.astype(jnp.float32))
            return 0
        return _maybe(t, 0, go)

    jax.lax.fori_loop(0, ntiles, s7_body, 0)

    stats_ref[:] = jnp.concatenate(
        [split.astype(jnp.float32), gcnt, resid, cnt, seed_cnt,
         tau_row, zth_row, jnp.zeros((1, sp), jnp.float32)], axis=0)


def level_megakernel(pts: jax.Array, tables: jax.Array, num_segs: int,
                     max_iter: int, is_level0: bool, min_seed: int,
                     flat_area: float, flat_dz: float, flat_minpts: int,
                     tile: int | None = None, fast: bool = False,
                     adaptive: bool = True, seed_percentile: float = 0.1,
                     th_seeds: float = 0.15, remap: bool = False):
    """Resolve the tile size (override/auto) OUTSIDE the jit cache, then
    dispatch to the compiled kernel — a test's _TILE_OVERRIDE can never
    collide with a previously cached tile=None trace."""
    n = pts.shape[1]
    if tile is None:
        # Prefer the largest divisible tile: per-tile fixed overhead (loop
        # bookkeeping, cache reads, scalar staleness tests) dominates below
        # 8192 (measured v5e: a full sweep at tile=8192 costs ~0.5 ms/batch
        # vs 1.2 at 4096), and the MXU streaming cost is tile-invariant.
        # Dirty-tile granularity coarsens, but the convergence tail stays
        # cheaper in aggregate (t8192 i100: 7.6 ms vs 9.3 same-run; 16384
        # and 32768 regress it: 9.0 / 10.2).
        tile = _TILE_OVERRIDE or next(
            t for t in (8192, 4096, 2048, 1024, 512, 256, 128)
            if n % t == 0)
    sp = sp_width(num_segs)
    # Per-level (Sp, N) bf16 one-hot cache: pays for itself whenever the
    # fit loop runs more than a couple of sweeps (always, in practice) and
    # fits comfortably at level-0 widths; skipped when it would crowd VMEM.
    cache_oht = sp * n * 2 <= 48 * 1024 * 1024 and _ENABLE_OHT_CACHE
    return _level_megakernel_jit(
        pts, tables, num_segs, max_iter, is_level0, min_seed, flat_area,
        flat_dz, flat_minpts, tile, fast, adaptive, seed_percentile,
        th_seeds, remap, cache_oht)


@functools.partial(jax.jit, static_argnames=(
    "num_segs", "max_iter", "is_level0", "min_seed", "flat_area", "flat_dz",
    "flat_minpts", "tile", "fast", "adaptive", "seed_percentile", "th_seeds",
    "remap", "cache_oht"))
def _level_megakernel_jit(pts: jax.Array, tables: jax.Array, num_segs: int,
                          max_iter: int, is_level0: bool, min_seed: int,
                          flat_area: float, flat_dz: float, flat_minpts: int,
                          tile: int, fast: bool = False,
                          adaptive: bool = True, seed_percentile: float = 0.1,
                          th_seeds: float = 0.15, remap: bool = False,
                          cache_oht: bool = True):
    """Run one complete level of the engine in a single kernel launch.

    See the module-level comment above :func:`_level_kernel` for the row
    contracts.  Returns (state (4, N), stats (8, Sp)).  ``fast`` fuses the
    covariance into the apply sweep (one sweep per fit iteration; expects
    patch-center-shifted coordinates — see segment/binning.patch_centers).
    ``adaptive=False`` computes the reference's percentile seed threshold
    in-kernel (cpp:156-159); ``remap=True`` executes the PARENT level's
    splits as a prologue (variance axis, exact median, compact child
    slots, cpp:237-304) — tables row 6 then carries the parent split mask.
    """
    n = pts.shape[1]
    sp = sp_width(num_segs)
    ntiles = n // tile
    nrows_a = 16 if fast else 8
    nrows_m = 8   # m2 caches only used in exact mode (kept 8-aligned)
    return pl.pallas_call(
        functools.partial(
            _level_kernel, sp=sp, tile=tile, max_iter=max_iter,
            is_level0=is_level0, min_seed=min_seed,
            flat_area=float(flat_area), flat_dz=float(flat_dz),
            flat_minpts=flat_minpts, fast=fast, adaptive=adaptive,
            seed_percentile=float(seed_percentile),
            th_seeds=float(th_seeds), remap=remap, trash=num_segs - 1,
            cache_oht=cache_oht),
        grid=(1,),
        in_specs=[
            pl.BlockSpec((8, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, sp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((4, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, sp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((4, n), jnp.float32),
            jax.ShapeDtypeStruct((8, sp), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((ntiles * nrows_a, sp), jnp.float32),  # apply cache
            pltpu.VMEM((ntiles * nrows_m, sp), jnp.float32),  # m2 cache
            pltpu.VMEM((ntiles * 8, sp), jnp.bfloat16),       # node presence
            pltpu.SMEM(((ntiles + 31) // 32,), jnp.int32),    # stale words
            pltpu.SMEM(((ntiles + 31) // 32,), jnp.int32),    # live words
            pltpu.VMEM((sp, n) if cache_oht else (8, 128),
                       jnp.bfloat16),                         # one-hot cache
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interp(),
    )(pts, tables)
