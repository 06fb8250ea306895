"""Pallas TPU kernels for segment reductions and per-point table gathers.

These are the hand-fused versions of segops.SegOps's 'onehot' formulation:
the (N, S) one-hot never exists outside VMEM — each grid step builds the
one-hot for one point tile in registers/VMEM, contracts it on the MXU
against the tile's data channels, and accumulates into an (S, C) VMEM
scratch that is written out once on the last step.  Traffic per pass is
N*(C+1) floats (speed-of-light for the op) instead of the XLA path's
fused-but-wide one-hot reduction.

Reference analogue: the 8 CUDA map kernels + per-patch host loops
(cuda/cuda_wrapper.cu:13-111, src/recursive_patchwork.cpp:360-398); here
one kernel instance covers EVERY node of a level simultaneously.

All kernels are differential-tested against segops.SegOps('scatter')
(tests/test_pallas.py) — the reference's CPU-vs-GPU oracle pattern
(src/test_cuda.cpp:39-56).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["seg_sum_pallas", "seg_gather_pallas", "seg_minmax_pallas"]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _interp() -> bool:
    """Interpreter mode off-TPU (CPU tests run the same kernels)."""
    return jax.default_backend() not in ("tpu", "axon")


def _pick_tile(n: int) -> int:
    for t in (2048, 1024, 512, 256, 128, 8):
        if n % t == 0:
            return t
    return n


# ---------------------------------------------------------------------------
# segment sum: (N, C) x (N,) ids -> (S, C)
# ---------------------------------------------------------------------------

def _seg_sum_kernel(data_ref, seg_ref, out_ref, acc_ref, *, num_segs):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    seg = seg_ref[:, 0]  # (T,)
    ids = jax.lax.broadcasted_iota(jnp.int32, (seg.shape[0], num_segs), 1)
    oh = (seg[:, None] == ids).astype(jnp.float32)  # (T, S)
    acc_ref[:] += jax.lax.dot_general(
        oh, data_ref[:],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("num_segs",))
def seg_sum_pallas(data: jax.Array, seg: jax.Array, num_segs: int) -> jax.Array:
    """(N, C) float32 segment sum over int32 ids in [0, num_segs)."""
    n, c = data.shape
    tile = _pick_tile(n)
    grid = n // tile
    out = pl.pallas_call(
        functools.partial(_seg_sum_kernel, num_segs=num_segs),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (num_segs, c), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((num_segs, c), jnp.float32),
        scratch_shapes=[pltpu.VMEM((num_segs, c), jnp.float32)],
        interpret=_interp(),
    )(data.astype(jnp.float32), seg.astype(jnp.int32)[:, None])
    return out


# ---------------------------------------------------------------------------
# gather: (S, C) table x (N,) ids -> (N, C)
# ---------------------------------------------------------------------------

def _gather_kernel(table_ref, seg_ref, out_ref, *, num_segs):
    seg = seg_ref[:, 0]
    ids = jax.lax.broadcasted_iota(jnp.int32, (seg.shape[0], num_segs), 1)
    oh = (seg[:, None] == ids).astype(jnp.float32)
    out_ref[:] = jax.lax.dot_general(
        oh, table_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=())
def seg_gather_pallas(table: jax.Array, seg: jax.Array) -> jax.Array:
    """Per-point lookup out[i] = table[seg[i]] as a one-hot matmul."""
    num_segs, c = table.shape
    n = seg.shape[0]
    tile = _pick_tile(n)
    grid = n // tile
    return pl.pallas_call(
        functools.partial(_gather_kernel, num_segs=num_segs),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((num_segs, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), jnp.float32),
        interpret=_interp(),
    )(table.astype(jnp.float32), seg.astype(jnp.int32)[:, None])


# ---------------------------------------------------------------------------
# fused masked min+max over multiple channels: (N, C) -> (S, C) mins, maxs
# ---------------------------------------------------------------------------

def _minmax_kernel(vals_ref, seg_ref, mask_ref, min_ref, max_ref,
                   accmin_ref, accmax_ref, *, num_segs):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        accmin_ref[:] = jnp.full_like(accmin_ref, jnp.inf)
        accmax_ref[:] = jnp.full_like(accmax_ref, -jnp.inf)

    seg = seg_ref[:, 0]  # (T,)
    mask = mask_ref[:, 0] > 0  # (T,)
    ids = jax.lax.broadcasted_iota(jnp.int32, (seg.shape[0], num_segs), 1)
    ohb = (seg[:, None] == ids) & mask[:, None]  # (T, S)

    vals = vals_ref[:]  # (T, C)
    c = vals.shape[1]
    for ch in range(c):  # static channel count (3: x, y, z)
        v = vals[:, ch][:, None]  # (T, 1)
        vmin = jnp.min(jnp.where(ohb, v, jnp.inf), axis=0)   # (S,)
        vmax = jnp.max(jnp.where(ohb, v, -jnp.inf), axis=0)  # (S,)
        accmin_ref[ch, :] = jnp.minimum(accmin_ref[ch, :], vmin)
        accmax_ref[ch, :] = jnp.maximum(accmax_ref[ch, :], vmax)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        min_ref[:] = accmin_ref[:]
        max_ref[:] = accmax_ref[:]


@functools.partial(jax.jit, static_argnames=("num_segs",))
def seg_minmax_pallas(vals: jax.Array, seg: jax.Array, mask: jax.Array,
                      num_segs: int):
    """Fused masked per-segment min AND max of C channels in one pass.

    Returns (mins (C, S), maxs (C, S)); empty segments give +inf/-inf.
    """
    n, c = vals.shape
    tile = _pick_tile(n)
    grid = n // tile
    return pl.pallas_call(
        functools.partial(_minmax_kernel, num_segs=num_segs),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((tile, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((c, num_segs), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, num_segs), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((c, num_segs), jnp.float32),
            jax.ShapeDtypeStruct((c, num_segs), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((c, num_segs), jnp.float32),
            pltpu.VMEM((c, num_segs), jnp.float32),
        ],
        interpret=_interp(),
    )(
        vals.astype(jnp.float32),
        seg.astype(jnp.int32)[:, None],
        mask.astype(jnp.int32)[:, None],
    )
