"""Closed-form eigen-decomposition for batched symmetric 3x3 matrices.

jnp.linalg.eigh lowers to a LAPACK-style custom call that costs ~2 ms for
the ~2000 tiny matrices in the plane front end; the trigonometric
closed-form below is pure VPU arithmetic (equivalent of the reference's
dedicated 3x3 solver, include/peac/eig33sym.hpp, re-derived from the
standard Cardano/trigonometric method, not ported).

All functions accept (..., 3, 3) symmetric input and are jit/vmap-safe.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-20


def _eigenvalues(A: jnp.ndarray):
    """All three eigenvalues, ascending: (..., 3)."""
    q = jnp.trace(A, axis1=-2, axis2=-1) / 3.0
    I = jnp.eye(3, dtype=A.dtype)
    B = A - q[..., None, None] * I
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, _EPS))
    Bn = B / p[..., None, None]
    r = jnp.clip(jnp.linalg.det(Bn) / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = 2.0 * jnp.pi / 3.0
    lam0 = q + 2.0 * p * jnp.cos(phi + two_pi_3)  # smallest
    lam2 = q + 2.0 * p * jnp.cos(phi)  # largest
    lam1 = 3.0 * q - lam0 - lam2
    return jnp.stack([lam0, lam1, lam2], axis=-1)


def _eigenvector(A: jnp.ndarray, lam: jnp.ndarray) -> jnp.ndarray:
    """Unit eigenvector for eigenvalue lam: null direction of (A - lam I),
    taken as the largest cross product of two rows (numerically robust for
    distinct eigenvalues; degenerate input falls back to +z)."""
    C = A - lam[..., None, None] * jnp.eye(3, dtype=A.dtype)
    r0, r1, r2 = C[..., 0, :], C[..., 1, :], C[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, -1)
    n02 = jnp.sum(c02 * c02, -1)
    n12 = jnp.sum(c12 * c12, -1)
    best = jnp.where(
        (n01 >= n02)[..., None] & (n01 >= n12)[..., None],
        c01,
        jnp.where((n02 >= n12)[..., None], c02, c12),
    )
    nrm = jnp.sqrt(jnp.maximum(jnp.sum(best * best, -1, keepdims=True), _EPS))
    v = best / nrm
    degenerate = jnp.maximum(jnp.maximum(n01, n02), n12) < 1e-18
    fallback = jnp.zeros_like(v).at[..., 2].set(1.0)
    return jnp.where(degenerate[..., None], fallback, v)


def eig33_smallest(A: jnp.ndarray):
    """(smallest eigenvalue (...,), unit eigenvector (..., 3))."""
    lam = _eigenvalues(A)
    return lam[..., 0], _eigenvector(A, lam[..., 0])


def eig33_largest(A: jnp.ndarray):
    """(largest eigenvalue (...,), unit eigenvector (..., 3))."""
    lam = _eigenvalues(A)
    return lam[..., 2], _eigenvector(A, lam[..., 2])
