"""PointCloudProcessor — drop-in style surface of the reference's stateless
utility kit (include/point_cloud_processor.hpp:16-48), NumPy in / NumPy out,
backed by the jit ops in ops/.

For device-resident pipelines use ops/ directly; this class exists so
reference users find every familiar entry point.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .ops.geometry import masked_centroid, masked_covariance
from .ops.pointcloud import (
    distance_band_mask,
    finite_mask,
    height_band_mask,
    plane_distances,
)
from .ops.sampling import random_subsample_mask, voxel_grid_filter

__all__ = ["PointCloudProcessor"]


def _np(points) -> np.ndarray:
    return np.asarray(points, np.float32).reshape(-1, 3)


class PointCloudProcessor:
    """All-static utility kit (reference: point_cloud_processor.cpp)."""

    # -- filtering (cpp:16-56) --
    @staticmethod
    def remove_nan_points(points) -> np.ndarray:
        pts = _np(points)
        return pts[np.asarray(finite_mask(jnp.asarray(pts)))]

    @staticmethod
    def filter_by_distance(points, min_dist: float, max_dist: float) -> np.ndarray:
        pts = _np(points)
        keep = np.asarray(distance_band_mask(jnp.asarray(pts), min_dist, max_dist))
        return pts[keep]

    @staticmethod
    def filter_by_height(points, min_height: float, max_height: float) -> np.ndarray:
        pts = _np(points)
        keep = np.asarray(height_band_mask(jnp.asarray(pts), min_height, max_height))
        return pts[keep]

    # -- statistics (cpp:58-100) --
    @staticmethod
    def compute_centroid(points) -> np.ndarray:
        pts = _np(points)
        if len(pts) == 0:
            return np.zeros(3, np.float32)
        c, _ = masked_centroid(jnp.asarray(pts), jnp.ones(len(pts), bool))
        return np.asarray(c)

    @staticmethod
    def compute_covariance(points, centroid=None) -> np.ndarray:
        pts = _np(points)
        if len(pts) < 2:
            return np.zeros((3, 3), np.float32)
        c = (jnp.asarray(centroid, jnp.float32) if centroid is not None
             else masked_centroid(jnp.asarray(pts), jnp.ones(len(pts), bool))[0])
        return np.asarray(
            masked_covariance(jnp.asarray(pts), jnp.ones(len(pts), bool), c)
        )

    @staticmethod
    def compute_pca(points) -> Tuple[np.ndarray, np.ndarray]:
        """(centroid, eigenvector matrix, ascending-eigenvalue columns).

        Reference computePCA (cpp:88-100) returns Eigen's full eigenvector
        matrix; identity + zero centroid for n < 3.
        """
        pts = _np(points)
        if len(pts) < 3:
            return np.zeros(3, np.float32), np.eye(3, dtype=np.float32)
        c = PointCloudProcessor.compute_centroid(pts)
        cov = PointCloudProcessor.compute_covariance(pts, c)
        vals, vecs = np.linalg.eigh(cov.astype(np.float64))
        return c, vecs.astype(np.float32)

    # -- plane distances (cpp:102-120) --
    @staticmethod
    def compute_point_to_plane_distance(point, plane_point, plane_normal) -> float:
        p = np.asarray(point, np.float32).reshape(1, 3)
        return float(
            plane_distances(
                jnp.asarray(p),
                jnp.asarray(plane_point, jnp.float32),
                jnp.asarray(plane_normal, jnp.float32),
            )[0]
        )

    @staticmethod
    def compute_distances_to_plane(points, plane_point, plane_normal) -> np.ndarray:
        return np.asarray(
            plane_distances(
                jnp.asarray(_np(points)),
                jnp.asarray(plane_point, jnp.float32),
                jnp.asarray(plane_normal, jnp.float32),
            )
        )

    # -- sampling (cpp:122-196) --
    @staticmethod
    def random_subsample(points, target_size: int, seed: int = 0) -> np.ndarray:
        pts = _np(points)
        if len(pts) <= target_size:
            return pts
        sel = np.asarray(
            random_subsample_mask(
                jax.random.key(seed), jnp.ones(len(pts), bool), target_size
            )
        )
        return pts[sel]

    @staticmethod
    def voxel_grid_filter(points, voxel_size: float) -> np.ndarray:
        pts = _np(points)
        if len(pts) == 0 or voxel_size <= 0:
            return pts
        c, v = voxel_grid_filter(jnp.asarray(pts), jnp.ones(len(pts), bool),
                                 voxel_size)
        return np.asarray(c)[np.asarray(v)]

    # -- validity (cpp:228-239) --
    @staticmethod
    def is_valid_point(point) -> bool:
        return bool(np.isfinite(np.asarray(point, np.float32)).all())

    @staticmethod
    def has_valid_points(points) -> bool:
        return bool(np.isfinite(_np(points)).all())
