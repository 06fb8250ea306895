"""Keyframe pose-graph optimization, vectorized and mesh-shardable.

State: K SE(3) keyframe poses.  Constraints: relative-pose edges
(odometry, loop closures) with 6x6 information matrices.  Gauss-Newton
with right perturbations; per-edge 6-dof Jacobian blocks come from
``jax.jacfwd`` through the residual (exact autodiff through se3 log/exp),
vmapped over all edges at once.

TPU-first structure: the normal equations assemble as segment-sums of
per-edge outer-product blocks into a dense (6K, 6K) system (keyframe
counts here are 10^2-10^3, so the dense solve is tiny next to the edge
math); edge batches shard over the mesh's data axis in the distributed
variant (parallel/), with a psum over partial (H, b) — the same
reduce-then-solve structure as the Schur-complement BA in ba.py.

No reference equivalent (the reference is per-scan segmentation only);
built per BASELINE.json configs[4].
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .se3 import se3_exp, se3_inverse, se3_log

__all__ = ["PoseGraph", "edge_residuals", "optimize_pose_graph", "ate_rmse"]

_F32 = jnp.float32


class PoseGraph(NamedTuple):
    poses: jax.Array     # (K, 4, 4)
    edge_i: jax.Array    # (E,) int32 source keyframe index
    edge_j: jax.Array    # (E,) int32 target keyframe index
    edge_T: jax.Array    # (E, 4, 4) measured T_i^-1 T_j
    edge_info: jax.Array # (E, 6, 6) information (weight) matrices


def edge_residuals(poses: jax.Array, g: PoseGraph) -> jax.Array:
    """(E, 6) twist residuals r_e = log(T_meas^-1 T_i^-1 T_j)."""
    Ti = poses[g.edge_i]
    Tj = poses[g.edge_j]
    return se3_log(se3_inverse(g.edge_T) @ se3_inverse(Ti) @ Tj)


def _edge_jacobians(poses: jax.Array, g: PoseGraph):
    """Per-edge residual + 6x6 Jacobian blocks wrt xi_i, xi_j (autodiff)."""

    def res_one(Ti, Tj, Tm, xi_i, xi_j):
        return se3_log(
            se3_inverse(Tm) @ se3_inverse(Ti @ se3_exp(xi_i)) @ (Tj @ se3_exp(xi_j))
        )

    zeros = jnp.zeros((6,), _F32)

    def one(Ti, Tj, Tm):
        r = res_one(Ti, Tj, Tm, zeros, zeros)
        Ji = jax.jacfwd(lambda xi: res_one(Ti, Tj, Tm, xi, zeros))(zeros)
        Jj = jax.jacfwd(lambda xi: res_one(Ti, Tj, Tm, zeros, xi))(zeros)
        return r, Ji, Jj

    return jax.vmap(one)(poses[g.edge_i], poses[g.edge_j], g.edge_T)


def _normal_equations(poses, g: PoseGraph):
    """Assemble dense H (6K, 6K), b (6K,) from all edges (vectorized)."""
    k = poses.shape[0]
    r, Ji, Jj = _edge_jacobians(poses, g)  # (E,6), (E,6,6), (E,6,6)
    info = g.edge_info

    JiT_I = jnp.einsum("eai,eab->eib", Ji, info, precision="highest")
    JjT_I = jnp.einsum("eai,eab->eib", Jj, info, precision="highest")
    H_ii = jnp.einsum("eib,ebj->eij", JiT_I, Ji, precision="highest")
    H_ij = jnp.einsum("eib,ebj->eij", JiT_I, Jj, precision="highest")
    H_jj = jnp.einsum("eib,ebj->eij", JjT_I, Jj, precision="highest")
    b_i = jnp.einsum("eib,eb->ei", JiT_I, r, precision="highest")
    b_j = jnp.einsum("eib,eb->ei", JjT_I, r, precision="highest")

    H = jnp.zeros((k, 6, k, 6), _F32)
    H = H.at[g.edge_i, :, g.edge_i, :].add(H_ii)
    H = H.at[g.edge_j, :, g.edge_j, :].add(H_jj)
    H = H.at[g.edge_i, :, g.edge_j, :].add(H_ij)
    H = H.at[g.edge_j, :, g.edge_i, :].add(jnp.swapaxes(H_ij, -1, -2))
    b = jnp.zeros((k, 6), _F32)
    b = b.at[g.edge_i].add(b_i)
    b = b.at[g.edge_j].add(b_j)
    return H.reshape(6 * k, 6 * k), b.reshape(6 * k)


def optimize_pose_graph(
    g: PoseGraph,
    iters: int = 10,
    damping: float = 1e-6,
    anchor_weight: float = 1e6,
) -> PoseGraph:
    """Gauss-Newton over all poses; pose 0 is gauge-anchored by a prior."""
    k = g.poses.shape[0]

    def step(poses, _):
        H, b = _normal_equations(poses, g)
        # gauge fixing: strong prior on pose 0 + Levenberg damping
        anchor = jnp.zeros((6 * k,), _F32).at[:6].set(_F32(anchor_weight))
        H = H + jnp.diag(anchor) + damping * jnp.eye(6 * k, dtype=_F32)
        delta = -jnp.linalg.solve(H, b).reshape(k, 6)
        return poses @ se3_exp(delta), None

    poses, _ = jax.lax.scan(step, g.poses, None, length=iters)
    return g._replace(poses=poses)


def ate_rmse(poses: jax.Array, gt_poses: jax.Array) -> jax.Array:
    """Absolute trajectory error (translation RMSE) after aligning the
    first pose (no global alignment; keyframe 0 is the gauge)."""
    align = gt_poses[0] @ se3_inverse(poses[0])
    aligned = align[None] @ poses
    d = aligned[:, :3, 3] - gt_poses[:, :3, 3]
    return jnp.sqrt(jnp.mean(jnp.sum(d * d, axis=-1)))
