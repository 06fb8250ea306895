"""Seeded synthetic point-cloud generators.

Same distribution family as the reference's three duplicated generators
(src/main.cpp:48-86, test/test_recursive_patchwork.cpp:12-49,
src/test_cuda.cpp:10-23): 70% ground with z ~ N(0, 0.05^2) over +-50 m,
30% obstacles with z ~ U(0.5, 3) over +-30 m — but seeded (the reference
uses an unseeded std::random_device, making its runs non-reproducible).
"""

from __future__ import annotations

import numpy as np

__all__ = ["demo_point_cloud", "uniform_cube_cloud"]


def demo_point_cloud(
    num_points: int = 10000,
    seed: int = 0,
    ground_fraction: float = 0.7,
    ground_extent: float = 50.0,
    obstacle_extent: float = 30.0,
    ground_sigma_z: float = 0.05,
    obstacle_z: tuple = (0.5, 3.0),
) -> np.ndarray:
    """70/30 ground/obstacle synthetic scan (reference: src/main.cpp:48-86)."""
    rng = np.random.default_rng(seed)
    n_ground = int(num_points * ground_fraction)
    n_obst = num_points - n_ground

    ground = np.empty((n_ground, 3), np.float32)
    ground[:, 0] = rng.uniform(-ground_extent, ground_extent, n_ground)
    ground[:, 1] = rng.uniform(-ground_extent, ground_extent, n_ground)
    ground[:, 2] = rng.normal(0.0, ground_sigma_z, n_ground)

    obst = np.empty((n_obst, 3), np.float32)
    obst[:, 0] = rng.uniform(-obstacle_extent, obstacle_extent, n_obst)
    obst[:, 1] = rng.uniform(-obstacle_extent, obstacle_extent, n_obst)
    obst[:, 2] = rng.uniform(obstacle_z[0], obstacle_z[1], n_obst)

    return np.concatenate([ground, obst]).astype(np.float32)


def demo_labels(num_points: int = 10000, ground_fraction: float = 0.7) -> np.ndarray:
    """True labels for demo_point_cloud rows (ground=True), by construction."""
    n_ground = int(num_points * ground_fraction)
    labels = np.zeros(num_points, bool)
    labels[:n_ground] = True
    return labels


def uniform_cube_cloud(num_points: int = 100000, seed: int = 0, extent: float = 10.0):
    """U(-extent, extent)^3 cloud (reference: src/test_cuda.cpp:10-23)."""
    rng = np.random.default_rng(seed)
    return rng.uniform(-extent, extent, (num_points, 3)).astype(np.float32)
