"""Segment primitives: reductions and order statistics over node ids.

These are the TPU-native replacement for the reference's
O(rings*sectors*N) per-patch membership rescans and per-patch std::sort
calls (src/recursive_patchwork.cpp:372-378, 259-268): every patch/node of a
level is processed in one batched pass, with points addressed by a segment
id instead of gathered into per-patch vectors.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["seg_sum", "seg_min", "seg_max", "SegmentSort", "sort_by_segment"]


def seg_sum(data: jax.Array, seg: jax.Array, num_segments: int) -> jax.Array:
    """segment_sum with static segment count; data may be (N,) or (N, C)."""
    return jax.ops.segment_sum(data, seg, num_segments=num_segments)


def seg_min(data: jax.Array, seg: jax.Array, num_segments: int) -> jax.Array:
    return jax.ops.segment_min(data, seg, num_segments=num_segments)


def seg_max(data: jax.Array, seg: jax.Array, num_segments: int) -> jax.Array:
    return jax.ops.segment_max(data, seg, num_segments=num_segments)


class SegmentSort(NamedTuple):
    """Result of a stable (segment, value) sort of N points.

    sorted_seg : (N,) segment id of each sorted slot
    sorted_val : (N,) values in (segment, value) order
    order      : (N,) original index of each sorted slot
    starts     : (S,) first sorted slot of each segment (exclusive cumsum)
    counts     : (S,) number of points per segment
    rank       : (N,) rank of each sorted slot within its segment
    """

    sorted_seg: jax.Array
    sorted_val: jax.Array
    order: jax.Array
    starts: jax.Array
    counts: jax.Array
    rank: jax.Array

    def order_stat(self, k_per_segment: jax.Array) -> jax.Array:
        """Per-segment k-th smallest value (k may differ per segment).

        Undefined (but in-bounds) for empty segments or k >= count — callers
        mask those out.  This is the batched equivalent of the reference's
        per-patch ``std::sort`` + ``sorted[k]`` median / percentile lookups
        (src/recursive_patchwork.cpp:156-159, 253-269).
        """
        n = self.sorted_val.shape[0]
        pos = jnp.clip(self.starts + k_per_segment, 0, n - 1)
        return self.sorted_val[pos]

    def scatter_rank_below(self, k: int) -> jax.Array:
        """Bool mask (original order): point has within-segment rank < k.

        Used for the reference's "3 lowest-z points" seed fallback
        (src/recursive_patchwork.cpp:171-182).
        """
        n = self.sorted_val.shape[0]
        mask_sorted = self.rank < k
        return jnp.zeros((n,), bool).at[self.order].set(mask_sorted)


def sort_by_segment(seg: jax.Array, val: jax.Array, num_segments: int) -> SegmentSort:
    """Stable lexicographic sort by (segment id, value)."""
    n = seg.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    sorted_seg, sorted_val, order = jax.lax.sort(
        (seg.astype(jnp.int32), val, idx), num_keys=2
    )
    counts = seg_sum(jnp.ones((n,), jnp.int32), seg, num_segments)
    starts = jnp.cumsum(counts) - counts
    rank = idx - starts[sorted_seg]
    return SegmentSort(sorted_seg, sorted_val, order, starts, counts, rank)
