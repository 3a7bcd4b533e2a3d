"""Pose-from-correspondences RANSAC (device-batched).

Replaces the reference's EPnP+RANSAC relocalizer (PnPsolver.h:60-200,
PnPsolver.cc).  Design deviation, deliberate: the reference inherited
EPnP from ORB-SLAM2's monocular lineage, but in an RGB-D system nearly
every keypoint has depth, so 3D-3D alignment is available: each RANSAC
hypothesis is a closed-form Kabsch solve over 3 correspondences, vmapped
over hundreds of hypotheses at once — no iterative beta refinement, no
Gauss-Newton inside the hypothesis loop, and strictly more constraint per
correspondence.  Inliers are counted by reprojection chi2 like the
reference (scale-aware threshold 5.991, PnPsolver.h:72).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def kabsch(A: jnp.ndarray, B: jnp.ndarray, w: jnp.ndarray | None = None):
    """Rigid transform (R, t) with B ~= A @ R.T + t.  A, B: (n, 3)."""
    if w is None:
        w = jnp.ones(A.shape[0], A.dtype)
    ws = jnp.sum(w).clip(1e-9)
    ca = jnp.sum(A * w[:, None], 0) / ws
    cb = jnp.sum(B * w[:, None], 0) / ws
    H = (A - ca).T @ ((B - cb) * w[:, None])
    U, S, Vt = jnp.linalg.svd(H)
    d = jnp.sign(jnp.linalg.det(Vt.T @ U.T))
    D = jnp.diag(jnp.stack([jnp.ones_like(d), jnp.ones_like(d), d]))
    R = Vt.T @ D @ U.T
    t = cb - R @ ca
    return R, t


@partial(jax.jit, static_argnames=("n_hyp",))
def pose_ransac_3d3d(
    pts_w: jnp.ndarray,
    pts_c: jnp.ndarray,
    uv_obs: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    key: jnp.ndarray,
    n_hyp: int = 256,
    chi2_th: float = 5.991,
) -> dict:
    """RANSAC T_cw from 3D(world)-3D(camera) correspondences.

    pts_w (N,3) map positions; pts_c (N,3) backprojected frame keypoints
    (z>0 required via `valid`); uv_obs (N,2) observed pixels for inlier
    counting.  Returns dict(R, t, inlier_mask, n_inliers, ok).
    """
    N = pts_w.shape[0]
    idx_all = jnp.arange(N)
    p_valid = valid.astype(jnp.float32)
    p_valid = p_valid / jnp.sum(p_valid).clip(1e-9)

    def one_hyp(k):
        sel = jax.random.choice(k, idx_all, (3,), replace=False, p=p_valid)
        R, t = kabsch(pts_w[sel], pts_c[sel])
        return R, t

    keys = jax.random.split(key, n_hyp)
    Rs, ts = jax.vmap(one_hyp)(keys)  # (H,3,3), (H,3)

    # reprojection inliers per hypothesis
    pc = jnp.einsum("hij,nj->hni", Rs, pts_w) + ts[:, None, :]
    z = pc[..., 2]
    zi = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = pc[..., 0] / zi * K[0, 0] + K[0, 2]
    v = pc[..., 1] / zi * K[1, 1] + K[1, 2]
    err2 = (u - uv_obs[None, :, 0]) ** 2 + (v - uv_obs[None, :, 1]) ** 2
    inl = (err2 < chi2_th * 4.0) & (z > 0.05) & valid[None, :]
    n_inl = jnp.sum(inl, -1)  # (H,)
    best = jnp.argmax(n_inl)
    R_b, t_b = Rs[best], ts[best]
    mask_b = inl[best]

    # refit on all inliers (weighted Kabsch)
    R_f, t_f = kabsch(pts_w, pts_c, mask_b.astype(jnp.float32))
    pc2 = pts_w @ R_f.T + t_f
    z2 = pc2[:, 2]
    zi2 = jnp.where(jnp.abs(z2) < 1e-9, 1e-9, z2)
    u2 = pc2[:, 0] / zi2 * K[0, 0] + K[0, 2]
    v2 = pc2[:, 1] / zi2 * K[1, 1] + K[1, 2]
    err2f = (u2 - uv_obs[:, 0]) ** 2 + (v2 - uv_obs[:, 1]) ** 2
    mask_f = (err2f < chi2_th * 4.0) & (z2 > 0.05) & valid
    better = jnp.sum(mask_f) >= jnp.sum(mask_b)
    R_out = jnp.where(better, R_f, R_b)
    t_out = jnp.where(better, t_f, t_b)
    mask_out = jnp.where(better, mask_f, mask_b)
    return {
        "R": R_out,
        "t": t_out,
        "inlier_mask": mask_out,
        "n_inliers": jnp.sum(mask_out),
        "ok": jnp.sum(mask_out) >= 10,
    }
