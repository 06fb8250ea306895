"""Batched closed-form 3x3 eigensolve + masked plane fits vs LAPACK."""

import numpy as np
import jax.numpy as jnp

from patchwork_tpu.ops.geometry import (
    eigh3x3,
    eigvals3x3,
    fit_plane_masked,
    masked_centroid,
    masked_covariance,
)
from patchwork_tpu.oracle.reference import fit_plane_pca

RNG = np.random.default_rng(42)


def random_covs(n=500):
    a = RNG.normal(size=(n, 50, 3)).astype(np.float32)
    a = a * RNG.uniform(0.1, 3.0, (n, 1, 3)).astype(np.float32)
    return np.einsum("nki,nkj->nij", a, a) / 50.0


class TestEigh3x3:
    def test_eigenvalues_vs_lapack(self):
        covs = random_covs()
        got = np.asarray(eigvals3x3(jnp.asarray(covs)))
        expect = np.linalg.eigvalsh(covs.astype(np.float64))
        np.testing.assert_allclose(got, expect, atol=5e-4, rtol=1e-3)

    def test_smallest_eigenvector(self):
        covs = random_covs()
        _, vecs = eigh3x3(jnp.asarray(covs))
        vecs = np.asarray(vecs)
        vals64, vecs64 = np.linalg.eigh(covs.astype(np.float64))
        # compare up to sign via |cos| of the angle
        ref = vecs64[:, :, 0]
        cos = np.abs(np.einsum("ni,ni->n", vecs, ref))
        # exclude near-degenerate spectra where the eigenvector is ill-defined
        gap = (vals64[:, 1] - vals64[:, 0]) / np.maximum(vals64[:, 2], 1e-9)
        ok = gap > 1e-3
        assert ok.sum() > 400
        assert (cos[ok] > 0.999).all()

    def test_unit_norm(self):
        covs = random_covs(200)
        _, vecs = eigh3x3(jnp.asarray(covs))
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(vecs), axis=-1), 1.0, atol=1e-5
        )

    def test_degenerate_zero_matrix(self):
        z = jnp.zeros((4, 3, 3), jnp.float32)
        vals, vecs = eigh3x3(z)
        np.testing.assert_allclose(np.asarray(vals), 0.0, atol=1e-7)
        np.testing.assert_allclose(np.asarray(vecs), [[0, 0, 1]] * 4, atol=1e-7)

    def test_diagonal_matrix(self):
        d = np.zeros((1, 3, 3), np.float32)
        d[0] = np.diag([3.0, 1.0, 2.0])
        vals, vec = eigh3x3(jnp.asarray(d))
        np.testing.assert_allclose(np.asarray(vals)[0], [1.0, 2.0, 3.0], atol=1e-5)
        np.testing.assert_allclose(np.abs(np.asarray(vec)[0]), [0, 1, 0], atol=1e-4)


class TestMaskedFits:
    def test_masked_centroid_cov(self):
        pts = RNG.normal(size=(300, 3)).astype(np.float32)
        mask = RNG.random(300) < 0.6
        c, n = masked_centroid(jnp.asarray(pts), jnp.asarray(mask))
        np.testing.assert_allclose(np.asarray(c), pts[mask].mean(0), atol=1e-5)
        assert int(n) == mask.sum()
        cov = masked_covariance(jnp.asarray(pts), jnp.asarray(mask), c)
        np.testing.assert_allclose(
            np.asarray(cov), np.cov(pts[mask].T, ddof=1), atol=1e-4
        )

    def test_fit_plane_matches_oracle(self):
        # tilted noisy plane
        pts = np.empty((500, 3), np.float32)
        pts[:, 0] = RNG.uniform(-5, 5, 500)
        pts[:, 1] = RNG.uniform(-5, 5, 500)
        pts[:, 2] = 0.1 * pts[:, 0] - 0.05 * pts[:, 1] + RNG.normal(0, 0.02, 500)
        mask = np.ones(500, bool)
        c, n, r, cnt = fit_plane_masked(jnp.asarray(pts), jnp.asarray(mask))
        c_o, n_o, r_o = fit_plane_pca(pts)
        np.testing.assert_allclose(np.asarray(c), c_o, atol=1e-4)
        assert abs(np.dot(np.asarray(n), n_o)) > 0.9999
        np.testing.assert_allclose(float(r), r_o, atol=1e-4)
        assert np.asarray(n)[2] > 0  # flipped to +Z

    def test_fit_plane_degenerate(self):
        pts = jnp.zeros((10, 3), jnp.float32)
        mask = jnp.zeros(10, bool).at[:2].set(True)  # n < 3 sentinel
        c, n, r, cnt = fit_plane_masked(pts, mask)
        np.testing.assert_allclose(np.asarray(c), 0.0)
        np.testing.assert_allclose(np.asarray(n), [0, 0, 1])
        assert np.isinf(float(r))
