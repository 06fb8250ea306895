"""World-frame map assembly and export from a finished SLAM session.

The reference's only persisted artifact is a BEV PNG
(src/visualization.cpp:115-135); a mapping pipeline's real deliverable is
the MAP — the aggregated world-frame cloud, the landmark set, and the
trajectory.  This assembles all three from a :class:`LidarOdometry` after
optimization and writes standard interchange formats (npz, ASCII PLY)
that downstream tools (CloudCompare, Open3D, meshlab) open directly.

Device-side: the per-keyframe feature clouds transform into world frame
as ONE batched einsum over the optimized pose stack (no per-frame
dispatch), then an optional voxel de-duplication bounds the map size.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["build_map", "save_map_npz", "save_map_ply"]


def build_map(odo, voxel: Optional[float] = 0.5, include_ground: bool = True):
    """Aggregate a LidarOdometry's keyframe features into world frame.

    Returns a dict: ``points`` (M, 3) world-frame map cloud, ``classes``
    (M,) uint8 (0 = ground, 1 = obstacle), ``trajectory`` (K, 3) keyframe
    positions, ``poses`` (K, 4, 4).  ``voxel`` (meters) de-duplicates the
    aggregated cloud by voxel-grid centroid; None keeps every point.
    """
    from .landmarks import voxel_downsample_host
    from .odometry import _StackedFrames

    k = len(odo.poses)
    poses = np.stack(odo.poses).astype(np.float32)
    if k == 0 or len(odo._frames) == 0:
        return {"points": np.zeros((0, 3), np.float32),
                "classes": np.zeros((0,), np.uint8),
                "trajectory": poses[:, :3, 3] if k else np.zeros((0, 3)),
                "poses": poses}

    frames = odo._frames
    if isinstance(frames, _StackedFrames) and not frames.extra:
        stacked = frames.stacked
    else:
        stacked = {key: jnp.stack([frames[i][key] for i in range(k)])
                   for key in ("obst", "obst_valid", "ground",
                               "ground_valid")}

    pose_dev = jnp.asarray(poses[: int(stacked["obst"].shape[0])])

    @jax.jit
    def to_world(pts, valid, T):
        # world = R p + t, batched over keyframes in one einsum
        w = jnp.einsum("kij,knj->kni", T[:, :3, :3], pts,
                       precision="highest") + T[:, None, :3, 3]
        return w, valid

    groups = [("obst", "obst_valid", 1)]
    if include_ground:
        groups.append(("ground", "ground_valid", 0))
    pts_out, cls_out = [], []
    for key, vkey, cls in groups:
        w, v = to_world(stacked[key], stacked[vkey], pose_dev)
        w = np.asarray(w)[np.asarray(v)]
        if voxel:
            w = voxel_downsample_host(w.astype(np.float32), voxel)
        pts_out.append(w.astype(np.float32))
        cls_out.append(np.full(len(w), cls, np.uint8))

    return {
        "points": np.concatenate(pts_out) if pts_out else
        np.zeros((0, 3), np.float32),
        "classes": np.concatenate(cls_out) if cls_out else
        np.zeros((0,), np.uint8),
        "trajectory": poses[:, :3, 3],
        "poses": poses,
    }


def save_map_npz(path: str, odo, voxel: Optional[float] = 0.5) -> dict:
    """Build + save the map as npz; returns the map dict."""
    m = build_map(odo, voxel=voxel)
    np.savez_compressed(path, **m)
    return m


_CLASS_COLORS = {0: (60, 180, 60), 1: (220, 60, 60)}   # ground, obstacle
_TRAJ_COLOR = (60, 60, 220)


def save_map_ply(path: str, odo, voxel: Optional[float] = 0.5,
                 include_trajectory: bool = True) -> int:
    """Write the world-frame map as ASCII PLY (colored by class, with the
    trajectory as blue points).  Returns the vertex count."""
    m = build_map(odo, voxel=voxel)
    pts = [m["points"]]
    cols = [np.stack([
        np.full(len(m["points"]), _CLASS_COLORS[0][i], np.uint8)
        for i in range(3)], axis=1)]
    cols[0][m["classes"] == 1] = _CLASS_COLORS[1]
    if include_trajectory and len(m["trajectory"]):
        pts.append(m["trajectory"].astype(np.float32))
        cols.append(np.tile(np.asarray(_TRAJ_COLOR, np.uint8),
                            (len(m["trajectory"]), 1)))
    xyz = np.concatenate(pts)
    rgb = np.concatenate(cols)
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n"
                f"element vertex {len(xyz)}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\n"
                "property uchar blue\nend_header\n")
        for (x, y, z), (r, g, b) in zip(xyz, rgb):
            f.write(f"{x:.4f} {y:.4f} {z:.4f} {r} {g} {b}\n")
    return len(xyz)
