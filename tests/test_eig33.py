"""Closed-form symmetric 3x3 eigensolver vs jnp.linalg.eigh."""

import jax.numpy as jnp
import numpy as np

from manhattanslam_tpu.ops import eig33


def _random_sym(rng, n):
    A = rng.normal(size=(n, 3, 3)).astype(np.float32)
    return (A + A.transpose(0, 2, 1)) / 2


def test_eigenvalues_match_eigh(rng):
    A = jnp.asarray(_random_sym(rng, 500))
    lam = np.asarray(eig33._eigenvalues(A))
    ref = np.linalg.eigvalsh(np.asarray(A))
    np.testing.assert_allclose(lam, ref, atol=2e-5)


def test_smallest_eigenvector(rng):
    A = jnp.asarray(_random_sym(rng, 500))
    lam, v = eig33.eig33_smallest(A)
    v = np.asarray(v)
    An = np.asarray(A)
    # A v = lam v
    resid = np.linalg.norm(
        np.einsum("nij,nj->ni", An, v) - np.asarray(lam)[:, None] * v, axis=1
    )
    assert resid.max() < 1e-3
    np.testing.assert_allclose(np.linalg.norm(v, axis=1), 1.0, atol=1e-5)


def test_largest_eigenvector(rng):
    A = jnp.asarray(_random_sym(rng, 200))
    lam, v = eig33.eig33_largest(A)
    resid = np.linalg.norm(
        np.einsum("nij,nj->ni", np.asarray(A), np.asarray(v))
        - np.asarray(lam)[:, None] * np.asarray(v),
        axis=1,
    )
    assert resid.max() < 1e-3


def test_plane_scatter_normal(rng):
    """The use-case: normal of a noisy planar scatter matrix."""
    n_true = np.array([0.26726124, 0.53452248, 0.80178373], np.float32)
    basis = np.linalg.svd(np.eye(3) - np.outer(n_true, n_true))[0][:, :2]
    pts = rng.normal(size=(1000, 2)).astype(np.float32) @ basis.T
    pts += rng.normal(0, 1e-3, size=pts.shape).astype(np.float32)
    cov = jnp.asarray((pts.T @ pts / len(pts))[None])
    lam, v = eig33.eig33_smallest(cov)
    v = np.asarray(v)[0]
    assert abs(abs(v @ n_true) - 1) < 1e-3
    assert float(lam[0]) < 1e-4


def test_degenerate_isotropic():
    A = jnp.asarray(np.eye(3, dtype=np.float32)[None] * 2.0)
    lam, v = eig33.eig33_smallest(A)
    np.testing.assert_allclose(np.asarray(lam), [2.0], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(v), axis=1), 1.0)
