"""Masked/batched geometry: centroid, covariance, closed-form 3x3 eigensolve,
PCA plane fits.

The reference eigendecomposes on the host with Eigen's
``SelfAdjointEigenSolver<Matrix3f>`` one patch at a time
(src/recursive_patchwork.cpp:89) — never offloaded.  Here the eigensolve is
a *batched, closed-form* analytic routine over ``(..., 3, 3)`` stacks, pure
elementwise math that XLA fuses onto the VPU, so thousands of patch planes
solve in one shot with no host round-trip.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "masked_centroid",
    "masked_covariance",
    "eigvals3x3",
    "smallest_eigenvector3x3",
    "eigh3x3",
    "fit_plane_masked",
]

_EPS = 1e-12


def masked_centroid(xyz: jax.Array, mask: jax.Array):
    """Mean of the masked points; zero when the mask is empty.

    Reference: PointCloudProcessor::computeCentroid (point_cloud_processor.cpp:58-70).
    Returns (centroid (..., 3), count (...,) float32).
    """
    w = mask.astype(jnp.float32)
    n = jnp.sum(w, axis=-1)
    s = jnp.einsum("...n,...ni->...i", w, xyz, precision="highest")
    c = s / jnp.maximum(n, 1.0)[..., None]
    return jnp.where(n[..., None] > 0, c, 0.0), n


def masked_covariance(xyz: jax.Array, mask: jax.Array, centroid: jax.Array) -> jax.Array:
    """Sample covariance of masked points, normalized by (n - 1).

    Two-pass (centered) accumulation for f32 accuracy, matching the
    reference's two-pass computeCovariance (point_cloud_processor.cpp:72-86),
    which returns zero for n < 2.
    """
    w = mask.astype(jnp.float32)
    n = jnp.sum(w, axis=-1)
    d = (xyz - centroid[..., None, :]) * w[..., None]
    cov = jnp.einsum("...ni,...nj->...ij", d, d, precision="highest")
    cov = cov / jnp.maximum(n - 1.0, 1.0)[..., None, None]
    return jnp.where((n > 1.5)[..., None, None], cov, 0.0)


def eigvals3x3(a: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric (..., 3, 3) matrices, ascending.

    Closed-form trigonometric method (Smith 1961), fully elementwise —
    batches of thousands of patch covariances solve on the VPU in one fused
    pass. Ascending order matches Eigen's SelfAdjointEigenSolver convention
    used by the reference (src/recursive_patchwork.cpp:89-90).
    """
    a = jnp.asarray(a)
    a00, a01, a02 = a[..., 0, 0], a[..., 0, 1], a[..., 0, 2]
    a11, a12, a22 = a[..., 1, 1], a[..., 1, 2], a[..., 2, 2]

    p1 = a01 * a01 + a02 * a02 + a12 * a12
    q = (a00 + a11 + a22) / 3.0
    d0, d1, d2 = a00 - q, a11 - q, a22 - q
    p2 = d0 * d0 + d1 * d1 + d2 * d2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 0.0))
    safe_p = jnp.maximum(p, _EPS)

    # r = det((A - qI) / p) / 2, clipped into acos's domain.
    b00, b11, b22 = d0 / safe_p, d1 / safe_p, d2 / safe_p
    b01, b02, b12 = a01 / safe_p, a02 / safe_p, a12 / safe_p
    detb = (
        b00 * (b11 * b22 - b12 * b12)
        - b01 * (b01 * b22 - b12 * b02)
        + b02 * (b01 * b12 - b11 * b02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    two_pi_3 = jnp.float32(2.0943951023931953)
    e_hi = q + 2.0 * p * jnp.cos(phi)
    e_lo = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    e_mid = 3.0 * q - e_hi - e_lo

    # Degenerate (near-diagonal / isotropic): eigenvalues are the diagonal.
    diag = jnp.stack([a00, a11, a22], axis=-1)
    diag_sorted = jnp.sort(diag, axis=-1)
    vals = jnp.stack([e_lo, e_mid, e_hi], axis=-1)
    return jnp.where((p <= _EPS)[..., None], diag_sorted, vals)


def smallest_eigenvector3x3(a: jax.Array, eig_min: jax.Array) -> jax.Array:
    """Unit eigenvector for the smallest eigenvalue of symmetric 3x3 stacks.

    Rows of (A - eig*I) span the plane orthogonal to the eigenvector; the
    largest cross product of row pairs is the most numerically stable
    choice.  Degenerate matrices fall back to +Z — deliberately the same
    sentinel the reference uses for unfittable patches
    (src/recursive_patchwork.cpp:78-80).
    """
    eye = jnp.eye(3, dtype=a.dtype)
    c = a - eig_min[..., None, None] * eye
    r0, r1, r2 = c[..., 0, :], c[..., 1, :], c[..., 2, :]
    cands = jnp.stack(
        [jnp.cross(r0, r1), jnp.cross(r0, r2), jnp.cross(r1, r2)], axis=-2
    )  # (..., 3 candidates, 3)
    norms = jnp.linalg.norm(cands, axis=-1)
    best = jnp.argmax(norms, axis=-1)
    v = jnp.take_along_axis(cands, best[..., None, None], axis=-2)[..., 0, :]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    v = jnp.where(n > 1e-20, v / jnp.maximum(n, 1e-30), 0.0)
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], a.dtype), v.shape)
    return jnp.where(n > 1e-20, v, fallback)


def eigh3x3(a: jax.Array):
    """(eigenvalues ascending, smallest-eigenvalue eigenvector)."""
    vals = eigvals3x3(a)
    vec = smallest_eigenvector3x3(a, vals[..., 0])
    return vals, vec


def fit_plane_masked(xyz: jax.Array, mask: jax.Array):
    """Batched masked PCA plane fit.

    Reference semantics (RecursivePatchwork::fitPlanePCA,
    src/recursive_patchwork.cpp:77-107): centroid + covariance/(n-1) +
    smallest-eigenvalue eigenvector, normal flipped to +Z, residual = mean
    |point-plane distance| over the masked points; for n < 3 the sentinel
    is centroid 0, normal +Z, residual +inf.

    Returns (centroid (...,3), normal (...,3), residual (...,), n (...,)).
    """
    centroid, n = masked_centroid(xyz, mask)
    cov = masked_covariance(xyz, mask, centroid)
    _, normal = eigh3x3(cov)
    normal = jnp.where(normal[..., 2:3] < 0, -normal, normal)

    d = jnp.abs(jnp.einsum("...ni,...i->...n", xyz - centroid[..., None, :], normal, precision="highest"))
    resid = jnp.sum(d * mask.astype(jnp.float32), axis=-1) / jnp.maximum(n, 1.0)

    bad = n < 3
    centroid = jnp.where(bad[..., None], 0.0, centroid)
    up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], xyz.dtype), normal.shape)
    normal = jnp.where(bad[..., None], up, normal)
    resid = jnp.where(bad, jnp.float32(jnp.inf), resid)
    return centroid, normal, resid, n
