"""Jitted match+solve composites for the per-frame tracking hot path.

Each tracker variant in the reference (TrackWithMotionModel,
TrackReferenceKeyFrame, TrackLocalMap, and the Translation* Manhattan
variants, Tracking.cc:846-1430) becomes one fused device program here:
project/match on the MXU -> gather observations -> LM solve.  The host
state machine only sees scalars (inlier counts) and the optimized pose.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from manhattanslam_tpu.ops import lm, matching


class PlaneObs(NamedTuple):
    """Per-frame plane associations (filled by the plane matcher)."""

    pl_w: jnp.ndarray  # (Np, 4) world coeffs of matched map planes
    pl_obs: jnp.ndarray  # (Np, 4) observed camera-frame coeffs
    pl_mask: jnp.ndarray
    par_w: jnp.ndarray
    par_obs: jnp.ndarray
    par_mask: jnp.ndarray
    ver_w: jnp.ndarray
    ver_obs: jnp.ndarray
    ver_mask: jnp.ndarray


def empty_plane_obs(np_: int = 8) -> PlaneObs:
    z = jnp.zeros
    return PlaneObs(
        pl_w=z((np_, 4)), pl_obs=z((np_, 4)), pl_mask=z((np_,), bool),
        par_w=z((np_, 4)), par_obs=z((np_, 4)), par_mask=z((np_,), bool),
        ver_w=z((np_, 4)), ver_obs=z((np_, 4)), ver_mask=z((np_,), bool),
    )


class LineObs(NamedTuple):
    """Per-frame line associations: 2 endpoint rows per matched line."""

    xw: jnp.ndarray  # (2L, 3) world endpoints
    eq: jnp.ndarray  # (2L, 3) observed normalized image-line equation
    info: jnp.ndarray  # (2L,)
    mask: jnp.ndarray  # (2L,)


def empty_line_obs(n_lines: int = 64) -> LineObs:
    z = jnp.zeros
    return LineObs(
        xw=z((2 * n_lines, 3)), eq=z((2 * n_lines, 3)),
        info=z((2 * n_lines,)), mask=z((2 * n_lines,), bool),
    )


def build_point_problem(
    pts_pos: jnp.ndarray,
    kp_idx: jnp.ndarray,
    matched: jnp.ndarray,
    feats: dict,
    plane_obs: PlaneObs,
    line_obs: LineObs,
) -> lm.PoseProblem:
    """Gather matched observations into a PoseProblem.

    Stereo observation (u, v, uR) when the matched keypoint has depth
    (u_right >= 0), mono otherwise — mirroring the edge split at
    Optimizer.cc:108-151.
    """
    uv = feats["xy_und"][kp_idx]
    ur = feats["u_right"][kp_idx]
    info = feats["inv_sigma2"][kp_idx]
    stereo = ur > 0
    obs3 = jnp.concatenate([uv, ur[:, None]], -1)
    return lm.PoseProblem(
        mono_xw=pts_pos,
        mono_obs=uv,
        mono_info=info,
        mono_mask=matched & ~stereo,
        st_xw=pts_pos,
        st_obs=obs3,
        st_info=info,
        st_mask=matched & stereo,
        ln_xw=line_obs.xw,
        ln_eq=line_obs.eq,
        ln_info=line_obs.info,
        ln_mask=line_obs.mask,
        pl_w=plane_obs.pl_w,
        pl_obs=plane_obs.pl_obs,
        pl_mask=plane_obs.pl_mask,
        par_w=plane_obs.par_w,
        par_obs=plane_obs.par_obs,
        par_mask=plane_obs.par_mask,
        ver_w=plane_obs.ver_w,
        ver_obs=plane_obs.ver_obs,
        ver_mask=plane_obs.ver_mask,
    )


def projection_problem(
    pts: dict,
    T_seed: jnp.ndarray,
    feats: dict,
    K: jnp.ndarray,
    radius: jnp.ndarray,
    image_hw: tuple[int, int],
    plane_obs: PlaneObs,
    line_obs: LineObs,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    use_scale_gate: bool = False,
    cand_cap: int = 4096,
) -> tuple[lm.PoseProblem, dict]:
    """Projection matching -> keypoint-indexed PoseProblem (no solve).

    All post-matching work stays in the frustum-compacted candidate set
    (cand_cap wide) — the full bank only sees O(bank) projections and
    O(cand) scatters, never a (bank x keypoints) tensor.
    """
    cam_center = -T_seed[:3, :3].T @ T_seed[:3, 3]
    dist_w = jnp.linalg.norm(pts["pos"] - cam_center[None], axis=-1)
    if use_scale_gate and "max_dist" in pts:
        levels = matching.predict_scale_level(
            dist_w, pts["max_dist"], scale_factor, n_levels
        )
        depth_band = (
            pts["min_dist"] * 0.8,
            pts["max_dist"] * 1.2,
        )
        view = pts["normal"]
    else:
        levels = pts.get("level", jnp.zeros(pts["pos"].shape[0], jnp.int32))
        depth_band = None
        view = None

    m = matching.search_by_projection(
        pts["pos"], pts["desc"], pts["valid"], T_seed, feats, K, image_hw,
        radius=radius, max_dist=matching.TH_HIGH, scale_factor=scale_factor,
        point_levels=levels,
        max_depth_ratio=depth_band, view_dirs=view, cand_cap=cand_cap,
    )
    n_kp = feats["desc"].shape[0]
    n_bank = pts["pos"].shape[0]
    c_bank = m["c_bank"]  # (CAND,) bank id, == n_bank for empty slots
    c_kp = m["c_kp"]
    c_ok = m["c_ok"]
    c_safe = jnp.minimum(c_bank, n_bank - 1)
    if "rot_gate" in pts:
        # rotation-histogram filter over the gated subset (the temporal
        # last-frame block): ORBmatcher::SearchByProjection(Frame, Frame)
        # applies ComputeThreeMaxima to last-frame matches
        # (ORBmatcher.cc:548-678); map points carry no keypoint angle and
        # pass through untouched.
        gated = pts["rot_gate"][c_safe] & (c_bank < n_bank)
        sub = gated & c_ok
        rot_ok = matching.rotation_consistency_mask(
            pts["angle"][c_safe], feats["angle"][c_kp], sub
        )
        c_ok = jnp.where(gated, rot_ok, c_ok)
    # candidate -> keypoint scatter (one-to-one after conflict resolution)
    tgt = jnp.where(c_ok, c_kp, n_kp)
    point_of_kp = (
        jnp.full(n_kp, -1, jnp.int32).at[tgt].max(c_bank, mode="drop")
    )
    matched_kp = point_of_kp >= 0
    pts_kp = pts["pos"][jnp.maximum(point_of_kp, 0)]
    prob = build_point_problem(
        pts_kp, jnp.arange(n_kp, dtype=jnp.int32), matched_kp, feats,
        plane_obs, line_obs,
    )
    ok_bank = jnp.zeros(n_bank, bool).at[
        jnp.where(c_ok, c_bank, n_bank)
    ].set(True, mode="drop")
    aux = {
        "point_of_kp": point_of_kp,
        "matched_kp": matched_kp,
        "kp_idx": m["kp_idx"],
        "match_valid": ok_bank,
        "visible": m["z"] > 0,
        "n_matches": jnp.sum(matched_kp),
    }
    return prob, aux


def _projection_post(out: dict, aux: dict, n_bank: int) -> dict:
    """Attach match bookkeeping to a solve result (shared by the tracker
    variants)."""
    point_of_kp = aux["point_of_kp"]
    matched_kp = aux["matched_kp"]
    kp_inlier = out["inlier_mono"] | out["inlier_st"]  # per keypoint
    # per-keypoint matched map/bank id (post-inlier)
    kp_mp = jnp.where(kp_inlier, point_of_kp, -1)
    # bank-level masks for landmark statistics
    inlier_bank = (
        jnp.zeros(n_bank, bool)
        .at[jnp.maximum(point_of_kp, 0)]
        .max(kp_inlier & matched_kp, mode="drop")
    )
    out.update(
        kp_mp=kp_mp,
        kp_inlier=kp_inlier,
        matched=aux["match_valid"] & inlier_bank,
        pt_inlier=inlier_bank,
        kp_idx=aux["kp_idx"],
        n_matches=aux["n_matches"],
        n_pt_inliers=jnp.sum(kp_inlier & matched_kp),
        visible=aux["visible"],
    )
    return out


@partial(
    jax.jit,
    static_argnames=(
        "image_hw", "scale_factor", "n_levels", "translation_only",
        "use_scale_gate", "n_rounds", "n_iters", "cand_cap", "gauss_newton",
        "use_planes", "use_lines",
    ),
)
def track_projection(
    pts: dict,
    T_seed: jnp.ndarray,
    feats: dict,
    K: jnp.ndarray,
    bf: jnp.ndarray,
    params: lm.SolveParams,
    radius: jnp.ndarray,
    image_hw: tuple[int, int],
    plane_obs: PlaneObs,
    line_obs: LineObs,
    scale_factor: float = 1.2,
    n_levels: int = 8,
    translation_only: bool = False,
    use_scale_gate: bool = False,
    n_rounds: int = 4,
    n_iters: int = 10,
    cand_cap: int = 4096,
    gauss_newton: bool = False,
    use_planes: bool = True,
    use_lines: bool = True,
) -> dict:
    """Project landmark set `pts` with seed pose, match, solve.

    pts: dict with pos/desc/valid (+ optional normal/min_dist/max_dist for
    the local-map viewing gates).
    """
    prob, aux = projection_problem(
        pts, T_seed, feats, K, radius, image_hw, plane_obs, line_obs,
        scale_factor=scale_factor, n_levels=n_levels,
        use_scale_gate=use_scale_gate, cand_cap=cand_cap,
    )
    out = lm.solve_pose(
        prob, T_seed, K, bf, params, translation_only=translation_only,
        n_rounds=n_rounds, n_iters=n_iters, gauss_newton=gauss_newton,
        use_planes=use_planes, use_lines=use_lines,
    )
    return _projection_post(out, aux, pts["pos"].shape[0])


def descriptor_problem(
    pts: dict,
    feats: dict,
    kf_angles: jnp.ndarray,
    plane_obs: PlaneObs,
    line_obs: LineObs,
) -> tuple[lm.PoseProblem, jnp.ndarray, jnp.ndarray]:
    """Pure-descriptor matching -> PoseProblem (no solve).

    Returns (problem, kp_idx, matched) — ORBmatcher::SearchByBoW
    semantics (NN ratio 0.7, TH_LOW, rotation-histogram filter) minus the
    BoW bucketing, which the MXU does not need.
    """
    idx, dist, ok = matching.match_descriptors(
        pts["desc"], feats["desc"], pts["valid"], feats["valid"],
        max_dist=matching.TH_LOW, ratio=0.7,
    )
    ok = matching.rotation_consistency_mask(
        kf_angles, feats["angle"][idx], ok
    )
    ok = matching.resolve_one_to_one(idx, dist, ok, feats["desc"].shape[0])
    prob = build_point_problem(pts["pos"], idx, ok, feats, plane_obs, line_obs)
    return prob, idx, ok


@partial(
    jax.jit,
    static_argnames=(
        "translation_only", "n_rounds", "n_iters", "gauss_newton",
        "use_planes", "use_lines",
    ),
)
def track_descriptors(
    pts: dict,
    T_seed: jnp.ndarray,
    feats: dict,
    kf_angles: jnp.ndarray,
    K: jnp.ndarray,
    bf: jnp.ndarray,
    params: lm.SolveParams,
    plane_obs: PlaneObs,
    line_obs: LineObs,
    translation_only: bool = False,
    n_rounds: int = 4,
    n_iters: int = 10,
    gauss_newton: bool = False,
    use_planes: bool = True,
    use_lines: bool = True,
) -> dict:
    """SearchByBoW-style pure-descriptor matching + solve.

    Used for reference-keyframe tracking and relocalization candidate
    scoring (ORBmatcher::SearchByBoW semantics: NN ratio 0.7, TH_LOW=50,
    rotation-histogram filter) — minus the BoW bucketing, which the MXU
    does not need.
    """
    prob, idx, ok = descriptor_problem(
        pts, feats, kf_angles, plane_obs, line_obs
    )
    out = lm.solve_pose(
        prob, T_seed, K, bf, params, translation_only=translation_only,
        n_rounds=n_rounds, n_iters=n_iters, gauss_newton=gauss_newton,
        use_planes=use_planes, use_lines=use_lines,
    )
    pt_inlier = out["inlier_mono"] | out["inlier_st"]
    out.update(
        kp_idx=idx,
        matched=ok,
        pt_inlier=pt_inlier,
        n_matches=jnp.sum(ok),
        n_pt_inliers=jnp.sum(pt_inlier),
    )
    return out
