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


def epnp(Pw: jnp.ndarray, uv: jnp.ndarray, K: jnp.ndarray,
         w: jnp.ndarray | None = None):
    """EPnP pose from 2D-3D correspondences (PnPsolver.h:60-200 parity;
    Lepetit et al.'s formulation with the N=1 beta case, which is what the
    RANSAC hypothesis stage needs — the LM refine downstream replaces the
    reference's iterative beta relinearization).

    TPU-native: the only decomposition is a symmetric 12x12 eigh of M^T M
    for the null-space vector (nonsymmetric eig / SVD of tall M are the
    parts that do not map to the MXU).  Optional per-point weights `w`
    zero out ignored correspondences (all shapes stay static).

    Pw (n,3) world points, uv (n,2) pixels.  Returns (R, t) with
    X_c = R X_w + t.
    """
    n = Pw.shape[0]
    if w is None:
        w = jnp.ones(n, Pw.dtype)
    ws = jnp.sum(w).clip(1e-9)
    c0 = jnp.sum(Pw * w[:, None], 0) / ws
    cen = Pw - c0
    cov = (cen * w[:, None]).T @ cen / ws
    ew, V = jnp.linalg.eigh(cov)  # ascending
    scales = jnp.sqrt(ew.clip(1e-8))
    # world control points: centroid + principal axes (EPnP's choice)
    Cw = jnp.stack(
        [
            c0,
            c0 + scales[2] * V[:, 2],
            c0 + scales[1] * V[:, 1],
            c0 + scales[0] * V[:, 0],
        ]
    )  # (4,3)
    # barycentric coordinates of every point in the control-point frame
    B = (Cw[1:] - Cw[0]).T  # (3,3), well-conditioned by the PCA scaling
    a_rest = jnp.linalg.solve(B, cen.T).T  # (n,3)
    alpha = jnp.concatenate(
        [1.0 - jnp.sum(a_rest, -1, keepdims=True), a_rest], -1
    )  # (n,4)

    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    u, v = uv[:, 0], uv[:, 1]
    # M rows (2 per point): columns 3j..3j+2 hold
    #   [a_j fx, 0, a_j (cx-u)]   and   [0, a_j fy, a_j (cy-v)]
    zero = jnp.zeros_like(alpha)
    Mx = jnp.stack(
        [alpha * fx, zero, alpha * (cx - u)[:, None]], -1
    ).reshape(n, 12)
    My = jnp.stack(
        [zero, alpha * fy, alpha * (cy - v)[:, None]], -1
    ).reshape(n, 12)
    M = jnp.concatenate([Mx * w[:, None], My * w[:, None]], 0)  # (2n,12)
    MtM = M.T @ M
    _, evec = jnp.linalg.eigh(MtM)
    x = evec[:, 0]  # null-space vector: camera control points up to scale
    cc = x.reshape(4, 3)

    # beta (N=1 case): least-squares scale matching control-point distances
    iu, ju = jnp.triu_indices(4, k=1)
    dc = jnp.linalg.norm(cc[iu] - cc[ju], axis=-1)
    dw = jnp.linalg.norm(Cw[iu] - Cw[ju], axis=-1)
    beta = jnp.sum(dc * dw) / jnp.sum(dc * dc).clip(1e-12)
    cc = cc * beta
    pc = alpha @ cc  # camera-frame points
    # cheirality: points must sit in front of the camera
    flip = jnp.sum(pc[:, 2] * w) < 0
    pc = jnp.where(flip, -pc, pc)
    return kabsch(Pw, pc, w)


@partial(jax.jit, static_argnames=("n_hyp", "n_sample"))
def pose_ransac_pnp(
    pts_w: jnp.ndarray,
    uv_obs: jnp.ndarray,
    valid: jnp.ndarray,
    K: jnp.ndarray,
    key: jnp.ndarray,
    n_hyp: int = 128,
    n_sample: int = 6,
    chi2_th: float = 5.991,
) -> dict:
    """RANSAC T_cw from 2D-3D correspondences alone — the depthless
    relocalization path (Tracking.cc:1937-1957 + PnPsolver iterate):
    holes in the depth image at the matched keypoints must not kill a
    relocalization, so no backprojected camera points are required.

    pts_w (N,3) map positions; uv_obs (N,2) observed (undistorted) pixels.
    Returns dict(R, t, inlier_mask, n_inliers, ok).
    """
    N = pts_w.shape[0]
    idx_all = jnp.arange(N)
    p_valid = valid.astype(jnp.float32)
    p_valid = p_valid / jnp.sum(p_valid).clip(1e-9)

    def one_hyp(k):
        sel = jax.random.choice(
            k, idx_all, (n_sample,), replace=False, p=p_valid
        )
        return epnp(pts_w[sel], uv_obs[sel], K)

    keys = jax.random.split(key, n_hyp)
    Rs, ts = jax.vmap(one_hyp)(keys)  # (H,3,3), (H,3)

    pc = jnp.einsum("hij,nj->hni", Rs, pts_w) + ts[:, None, :]
    z = pc[..., 2]
    zi = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
    u = pc[..., 0] / zi * K[0, 0] + K[0, 2]
    v = pc[..., 1] / zi * K[1, 1] + K[1, 2]
    err2 = (u - uv_obs[None, :, 0]) ** 2 + (v - uv_obs[None, :, 1]) ** 2
    inl = (err2 < chi2_th * 4.0) & (z > 0.05) & valid[None, :]
    n_inl = jnp.sum(inl, -1)  # (H,)
    best = jnp.argmax(n_inl)
    R_b, t_b, mask_b = Rs[best], ts[best], inl[best]

    # weighted refit on the best hypothesis's inliers
    R_f, t_f = epnp(pts_w, uv_obs, K, mask_b.astype(pts_w.dtype))
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
