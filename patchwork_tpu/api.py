"""High-level user API mirroring the reference class surface.

``RecursivePatchwork`` offers the same entry points as the reference class
(include/recursive_patchwork.hpp:47-87): ``filter_ground_points``,
``sample_ground_and_obstacles``, ``clean_points``, ``rotate_points_2d``,
``remove_ego_vehicle`` — NumPy in, NumPy out — while everything underneath
runs as a single jit-compiled device program per (capacity, config).

Capacity bucketing: point clouds are padded up to power-of-two capacities
so each bucket compiles once and is reused (XLA requires static shapes).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .core.config import PatchworkConfig
from .core.types import GroundResult
from .ops.pointcloud import ego_mask as _ego_mask
from .ops.pointcloud import height_band_mask, rotate_2d
from .ops.sampling import random_subsample_mask
from .segment.engine import filter_ground

__all__ = ["RecursivePatchwork", "sample_ground_and_obstacles_masks"]


def _bucket_capacity(n: int, min_cap: int = 1024) -> int:
    cap = min_cap
    while cap < n:
        cap *= 2
    return cap


def sample_ground_and_obstacles_masks(
    xyz: jax.Array,
    valid: jax.Array,
    cfg: PatchworkConfig,
    target_height,
    base_tol,
    key: jax.Array,
    ground_sample_size: int = 2000,
    ego_radius: float = 2.5,
):
    """Mask-form of the reference's enhanced filtering
    (RecursivePatchwork::sampleGroundAndObstacles, cpp:428-465):
    segment -> drop ego from non-ground -> band-pass |z - target| <= tol ->
    subsample ground for context.

    Returns (selected (N,) bool, result: GroundResult).  ``selected`` marks
    the union of the obstacle band and the ground context sample.  Unlike
    the reference, the segmentation is NOT recomputed twice (the reference
    re-runs filterGroundPoints inside, cpp:432 after main.cpp:268 already
    ran it) — one pass, masks reused.
    """
    res = filter_ground(xyz, valid, cfg)
    non_ground = res.valid & ~res.ground
    obstacles = (
        non_ground
        & _ego_mask(xyz, ego_radius)
        & height_band_mask(
            xyz, target_height - base_tol, target_height + base_tol
        )
    )
    # NOTE: reference band-pass is |z - t| <= tol, identical to the closed
    # height band [t - tol, t + tol].
    ground_sample = random_subsample_mask(key, res.ground, ground_sample_size)
    return obstacles | ground_sample, res


class RecursivePatchwork:
    """Drop-in style replacement for the reference RecursivePatchwork class."""

    def __init__(self, config: PatchworkConfig | None = None):
        self.config = config or PatchworkConfig()
        self._filter_cache = {}
        self._sample_cache = {}

    # -- config (hpp:66-67) --
    def set_config(self, config: PatchworkConfig) -> None:
        self.config = config
        self._filter_cache.clear()
        self._sample_cache.clear()

    def get_config(self) -> PatchworkConfig:
        return self.config

    # -- static utilities (hpp:56-64) --
    @staticmethod
    def clean_points(points: np.ndarray) -> np.ndarray:
        """Drop NaN/inf rows (cpp:19-35)."""
        points = np.asarray(points, np.float32)
        return points[np.isfinite(points).all(axis=1)]

    @staticmethod
    def rotate_points_2d(points: np.ndarray, angle_degrees: float) -> np.ndarray:
        """2D rotation about +Z (cpp:37-54)."""
        return np.asarray(rotate_2d(jnp.asarray(points, jnp.float32), angle_degrees))

    @staticmethod
    def remove_ego_vehicle(points: np.ndarray, radius: float = 2.5) -> np.ndarray:
        """Drop points with 2D distance <= radius (cpp:64-75)."""
        points = np.asarray(points, np.float32)
        keep = np.asarray(_ego_mask(jnp.asarray(points), radius))
        return points[keep]

    # -- compiled paths --
    def _filter_fn(self, capacity: int):
        fn = self._filter_cache.get(capacity)
        if fn is None:
            cfg = self.config

            @jax.jit
            def fn(xyz, valid):
                return filter_ground(xyz, valid, cfg)

            self._filter_cache[capacity] = fn
        return fn

    def _pad(self, points: np.ndarray):
        points = np.asarray(points, np.float32)[:, :3]
        n = len(points)
        cap = _bucket_capacity(n)
        xyz = np.zeros((cap, 3), np.float32)
        xyz[:n] = points
        valid = np.zeros(cap, bool)
        valid[:n] = True
        return jnp.asarray(xyz), jnp.asarray(valid), n

    def segment(self, points: np.ndarray) -> Tuple[GroundResult, int]:
        """Run the engine; returns the mask bundle plus true point count."""
        xyz, valid, n = self._pad(points)
        return self._filter_fn(xyz.shape[0])(xyz, valid), n

    def filter_ground_points(
        self, points: np.ndarray
    ) -> Tuple[np.ndarray, np.ndarray]:
        """(ground_points, non_ground_points) — reference cpp:310-426.

        Non-ground includes finite points beyond the filtering radius,
        exactly like the reference (cpp:414-419); NaN/inf points are
        dropped entirely.
        """
        res, n = self.segment(points)
        pts = np.asarray(points, np.float32)[:, :3]
        g = np.asarray(res.ground)[:n]
        v = np.asarray(res.valid)[:n]
        return pts[g & v], pts[v & ~g]

    def sample_ground_and_obstacles(
        self,
        points: np.ndarray,
        target_height: float = 1.1,
        base_tol: float = 0.5,
        seed: int = 0,
    ) -> np.ndarray:
        """Enhanced filtering (cpp:428-465): obstacle band + ground sample."""
        xyz, valid, n = self._pad(points)
        cap = xyz.shape[0]
        fn = self._sample_cache.get(cap)
        if fn is None:
            cfg = self.config

            @jax.jit
            def fn(xyz, valid, th, tol, key):
                return sample_ground_and_obstacles_masks(
                    xyz, valid, cfg, th, tol, key
                )

            self._sample_cache[cap] = fn
        sel, _ = fn(
            xyz,
            valid,
            jnp.float32(target_height),
            jnp.float32(base_tol),
            jax.random.key(seed),
        )
        pts = np.asarray(points, np.float32)[:, :3]
        return pts[np.asarray(sel)[:n]]
