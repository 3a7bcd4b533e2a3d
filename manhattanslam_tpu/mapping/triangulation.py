"""Epipolar matching + two-view triangulation (device ops).

Vectorized equivalent of LocalMapping::CreateNewMapPoints
(LocalMapping.cc:303-522): for a keyframe pair, match unassociated
keypoints along epipolar lines (ORBmatcher::SearchForTriangulation +
CheckDistEpipolarLine, ORBmatcher.cc:257-406,:127-144), then SVD-free
DLT triangulation with the reference's acceptance gates: parallax,
positive depth, reprojection chi2 (5.991 mono / 7.815 stereo), and
scale-consistency ratio.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from manhattanslam_tpu.ops import matching


def fundamental_matrix(T1_cw: jnp.ndarray, T2_cw: jnp.ndarray, K: jnp.ndarray):
    """F12 such that x1^T F12 x2 = 0 (ComputeF12, LocalMapping.cc:624-640)."""
    T12 = T1_cw @ jnp.linalg.inv(T2_cw)
    R12 = T12[:3, :3]
    t12 = T12[:3, 3]
    tx = jnp.array(
        [
            [0.0, -t12[2], t12[1]],
            [t12[2], 0.0, -t12[0]],
            [-t12[1], t12[0], 0.0],
        ]
    )
    Kinv = jnp.linalg.inv(K)
    return Kinv.T @ tx @ R12 @ Kinv


@partial(jax.jit, static_argnames=())
def triangulate_pair(
    kp1: dict,
    kp2: dict,
    T1_cw: jnp.ndarray,
    T2_cw: jnp.ndarray,
    K: jnp.ndarray,
    scale_factor: jnp.ndarray,
) -> dict:
    """Match free keypoints of KF1 against KF2 and triangulate.

    kp{1,2}: dict(xy (N,2) undistorted, desc (N,8), valid (N,) bool —
    unmatched+valid, level (N,), depth (N,), inv_sigma2 (N,)).
    Returns per-KF1-keypoint: idx2, pos_w (N,3), ok (N,).
    """
    F12 = fundamental_matrix(T1_cw, T2_cw, K)

    # epipolar distance of kp2 to the line of kp1: l2 = x1^T F12
    ones1 = jnp.ones((kp1["xy"].shape[0], 1))
    x1h = jnp.concatenate([kp1["xy"], ones1], -1)  # (N1, 3)
    l2 = x1h @ F12  # (N1, 3) line in image 2
    ones2 = jnp.ones((kp2["xy"].shape[0], 1))
    x2h = jnp.concatenate([kp2["xy"], ones2], -1)
    num = jnp.abs(l2 @ x2h.T)  # (N1, N2)
    den = jnp.sqrt(l2[:, 0] ** 2 + l2[:, 1] ** 2).clip(1e-9)[:, None]
    epi_dist = num / den
    # gate: 3.84 sigma of kp2's octave (CheckDistEpipolarLine :143)
    sigma2 = 1.0 / kp2["inv_sigma2"]
    epi_ok = epi_dist < 3.84 * jnp.sqrt(sigma2)[None, :]

    idx2, dist, ok = matching.match_descriptors(
        kp1["desc"], kp2["desc"], kp1["valid"], kp2["valid"],
        max_dist=matching.TH_LOW, extra_mask=epi_ok,
    )

    # triangulate via midpoint of rays (equivalent accuracy to the SVD
    # solve at these baselines, fully batched)
    Kinv = jnp.linalg.inv(K)
    T1_wc = jnp.linalg.inv(T1_cw)
    T2_wc = jnp.linalg.inv(T2_cw)
    r1 = (x1h @ Kinv.T) @ T1_wc[:3, :3].T  # ray dirs world
    r2_all = (x2h @ Kinv.T) @ T2_wc[:3, :3].T
    r2 = r2_all[idx2]
    o1 = T1_wc[:3, 3]
    o2 = T2_wc[:3, 3]

    # closest point between lines o1 + s r1 and o2 + t r2
    w0 = o1 - o2
    a = jnp.sum(r1 * r1, -1)
    b = jnp.sum(r1 * r2, -1)
    c = jnp.sum(r2 * r2, -1)
    d = jnp.sum(r1 * w0, -1)
    e = jnp.sum(r2 * w0, -1)
    denom = a * c - b * b
    s = (b * e - c * d) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    t = (a * e - b * d) / jnp.where(jnp.abs(denom) < 1e-9, 1e-9, denom)
    p1 = o1 + s[:, None] * r1
    p2 = o2 + t[:, None] * r2
    pos_w = 0.5 * (p1 + p2)

    # parallax between rays
    cos_par = b / jnp.sqrt(a * c).clip(1e-9)

    def reproj_ok(T_cw, xy, inv_sigma2, chi_th):
        pc = pos_w @ T_cw[:3, :3].T + T_cw[:3, 3]
        z = pc[:, 2]
        zi = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        u = pc[:, 0] / zi * K[0, 0] + K[0, 2]
        v = pc[:, 1] / zi * K[1, 1] + K[1, 2]
        err = (u - xy[:, 0]) ** 2 + (v - xy[:, 1]) ** 2
        return (z > 0) & (err * inv_sigma2 < chi_th)

    ok = (
        ok
        & (cos_par < 0.9998)  # enough parallax
        & reproj_ok(T1_cw, kp1["xy"], kp1["inv_sigma2"], 5.991)
        & reproj_ok(T2_cw, kp2["xy"][idx2], kp2["inv_sigma2"][idx2], 5.991)
    )

    # scale consistency (LocalMapping.cc:476-501): distance ratio within
    # scale-factor ratio of octave difference
    d1 = jnp.linalg.norm(pos_w - o1, axis=-1)
    d2 = jnp.linalg.norm(pos_w - o2, axis=-1)
    ratio_dist = d1 / d2.clip(1e-9)
    ratio_octave = scale_factor ** (
        kp1["level"].astype(jnp.float32) - kp2["level"][idx2].astype(jnp.float32)
    )
    ok = ok & (ratio_dist > ratio_octave / 1.5) & (ratio_dist < ratio_octave * 1.5)

    return {"idx2": idx2, "pos_w": pos_w, "ok": ok, "dist": dist}


@jax.jit
def fuse_candidates(
    mp_pos: jnp.ndarray,
    mp_desc: jnp.ndarray,
    mp_valid: jnp.ndarray,
    T_cw: jnp.ndarray,
    kf_feats: dict,
    K: jnp.ndarray,
    image_hw_h: jnp.ndarray,
    image_hw_w: jnp.ndarray,
) -> dict:
    """ORBmatcher::Fuse (ORBmatcher.cc:408-546): project map points into a
    keyframe and find the keypoint each lands on (radius 3 px scaled),
    descriptor-gated.  The host merges/adds observations from the result."""
    uv, z = matching.project_points(T_cw, mp_pos, K)
    in_img = (
        (z > 0.05)
        & (uv[:, 0] >= 0) & (uv[:, 0] < image_hw_w)
        & (uv[:, 1] >= 0) & (uv[:, 1] < image_hw_h)
    )
    duv = kf_feats["xy"][None, :, :] - uv[:, None, :]
    rad = 3.0 * 1.2 ** kf_feats["level"].astype(jnp.float32)[None, :]
    near = (jnp.abs(duv[..., 0]) <= rad) & (jnp.abs(duv[..., 1]) <= rad)
    idx, dist, ok = matching.match_descriptors(
        mp_desc, kf_feats["desc"], mp_valid & in_img, kf_feats["valid"],
        max_dist=matching.TH_LOW, extra_mask=near,
    )
    ok = matching.resolve_one_to_one(idx, dist, ok, kf_feats["desc"].shape[0])
    return {"kp_idx": idx, "ok": ok, "dist": dist}


@jax.jit
def triangulate_pairs(kp1, kp2s, T1_cw, T2s_cw, K, scale_factor):
    """triangulate_pair vmapped over a fixed-size stack of neighbor
    keyframes — the per-neighbor dispatch/pull pattern cost one tunnel
    roundtrip per OUTPUT BUFFER per neighbor (~30 ms each on remote
    backends); the batch costs one dispatch and 4 stacked buffers total.
    Padding rows ride with kp2s.valid=False (every match rejects)."""
    return jax.vmap(
        lambda kp2, T2: triangulate_pair(kp1, kp2, T1_cw, T2, K, scale_factor)
    )(kp2s, T2s_cw)


@jax.jit
def fuse_candidates_batch(mp_pos, mp_desc, mp_valid, T_cws, kf_feats_s,
                          K, image_hw_h, image_hw_w):
    """fuse_candidates vmapped over a fixed-size stack of target keyframes
    (shared landmark bank).  Padding rows: kf_feats_s.valid=False."""
    return jax.vmap(
        lambda T, f: fuse_candidates(
            mp_pos, mp_desc, mp_valid, T, f, K, image_hw_h, image_hw_w
        )
    )(T_cws, kf_feats_s)
