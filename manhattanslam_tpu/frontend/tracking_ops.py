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
    (u_right >= 0), mono otherwise — the edge split of Optimizer.cc:108-151,
    expressed as the fused point family's per-row pt_stereo flag.
    """
    uv = feats["xy_und"][kp_idx]
    ur = feats["u_right"][kp_idx]
    info = feats["inv_sigma2"][kp_idx]
    stereo = ur > 0
    obs3 = jnp.concatenate([uv, ur[:, None]], -1)
    return lm.PoseProblem(
        pt_xw=pts_pos,
        pt_obs=obs3,
        pt_info=info,
        pt_stereo=stereo,
        pt_mask=matched,
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
    cand: dict | None = None,
    bank_stats: bool = True,
) -> tuple[lm.PoseProblem, dict]:
    """Projection matching -> keypoint-indexed PoseProblem (no solve).

    All matching work runs in the frustum-compacted candidate set
    (matching.frustum_candidates) — pass `cand` to share ONE compaction
    across a frame's solves; bank_stats=False skips the bank-level
    scatter outputs (candidate solves only need the pose + counts).
    """
    n_kp = feats["desc"].shape[0]
    n_bank = pts["pos"].shape[0]
    if cand is None:
        cand = matching.frustum_candidates(
            pts, T_seed, K, image_hw, cand_cap,
            scale_factor=scale_factor, n_levels=n_levels,
            use_scale_gate=use_scale_gate,
        )
    CAND = cand["pos"].shape[0]
    h, w = image_hw
    uv, z = matching.project_points(T_seed, cand["pos"], K)
    in_img = (
        (z > 0.05)
        & (uv[:, 0] >= 0) & (uv[:, 0] < w)
        & (uv[:, 1] >= 0) & (uv[:, 1] < h)
    )
    c_valid = cand["valid"] & in_img
    rad = radius * scale_factor ** cand["level"].astype(jnp.float32)
    duv = feats["xy_und"][None, :, :] - uv[:, None, :]
    pix_ok = (jnp.abs(duv[..., 0]) <= rad[:, None]) & (
        jnp.abs(duv[..., 1]) <= rad[:, None]
    )
    pix_ok = pix_ok & (
        jnp.abs(feats["level"][None, :] - cand["level"][:, None]) <= 1
    )
    c_kp, c_dist, c_ok = matching.match_descriptors(
        cand["desc"], feats["desc"], c_valid, feats["valid"],
        max_dist=matching.TH_HIGH, extra_mask=pix_ok,
    )
    c_ok = matching.resolve_one_to_one(c_kp, c_dist, c_ok, n_kp)
    if "rot_gate" in cand:
        # rotation-histogram filter over the gated subset (the temporal
        # last-frame block): ORBmatcher::SearchByProjection(Frame, Frame)
        # applies ComputeThreeMaxima to last-frame matches
        # (ORBmatcher.cc:548-678); map points carry no keypoint angle and
        # pass through untouched.
        gated = cand["rot_gate"] & c_valid
        sub = gated & c_ok
        rot_ok = matching.rotation_consistency_mask(
            cand["angle"], feats["angle"][c_kp], sub
        )
        c_ok = jnp.where(gated, rot_ok, c_ok)
    # candidate -> keypoint assignment (one-to-one after conflict
    # resolution; a masked segment reduction, not a serialized scatter)
    tgt = jnp.where(c_ok, c_kp, n_kp)
    cand_of_kp = matching.segment_max(
        jnp.arange(CAND, dtype=jnp.int32), tgt, n_kp, -1
    )
    matched_kp = cand_of_kp >= 0
    safe_c = jnp.maximum(cand_of_kp, 0)
    pts_kp = cand["pos"][safe_c]
    point_of_kp = jnp.where(matched_kp, cand["bank_idx"][safe_c], -1)
    prob = build_point_problem(
        pts_kp, jnp.arange(n_kp, dtype=jnp.int32), matched_kp, feats,
        plane_obs, line_obs,
    )
    aux = {
        "point_of_kp": point_of_kp,
        "matched_kp": matched_kp,
        "visible": cand["visible_bank"],
        "n_matches": jnp.sum(matched_kp),
    }
    if bank_stats:
        tgt_bank = jnp.where(c_ok, cand["bank_idx"], n_bank)
        aux["kp_idx"] = (
            jnp.zeros(n_bank, jnp.int32).at[tgt_bank].set(c_kp, mode="drop")
        )
        aux["match_valid"] = (
            jnp.zeros(n_bank, bool).at[tgt_bank].set(True, mode="drop")
        )
    return prob, aux


def _projection_post(out: dict, aux: dict, n_bank: int) -> dict:
    """Attach match bookkeeping to a solve result (shared by the tracker
    variants).  Bank-level masks only when the problem was built with
    bank_stats=True."""
    point_of_kp = aux["point_of_kp"]
    matched_kp = aux["matched_kp"]
    kp_inlier = out["inlier_pt"]  # per keypoint
    # per-keypoint matched map/bank id (post-inlier)
    kp_mp = jnp.where(kp_inlier, point_of_kp, -1)
    out.update(
        kp_mp=kp_mp,
        kp_inlier=kp_inlier,
        n_matches=aux["n_matches"],
        n_pt_inliers=jnp.sum(kp_inlier & matched_kp),
        visible=aux["visible"],
    )
    if "match_valid" in aux:
        # bank-level masks for landmark statistics
        inlier_bank = (
            jnp.zeros(n_bank, bool)
            .at[jnp.where(kp_inlier & matched_kp, point_of_kp, n_bank)]
            .set(True, mode="drop")
        )
        out.update(
            matched=aux["match_valid"] & inlier_bank,
            pt_inlier=inlier_bank,
            kp_idx=aux["kp_idx"],
        )
    return out


@partial(
    jax.jit,
    static_argnames=(
        "image_hw", "scale_factor", "n_levels", "translation_only",
        "use_scale_gate", "n_rounds", "n_iters", "cand_cap", "gauss_newton",
        "use_planes", "use_lines", "bank_stats",
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
    cand: dict | None = None,
    bank_stats: bool = True,
) -> dict:
    """Project landmark set `pts` with seed pose, match, solve.

    pts: dict with pos/desc/valid (+ optional normal/min_dist/max_dist for
    the local-map viewing gates).  cand: a shared frustum-candidate set
    (matching.frustum_candidates) to reuse across a frame's solves.
    """
    prob, aux = projection_problem(
        pts, T_seed, feats, K, radius, image_hw, plane_obs, line_obs,
        scale_factor=scale_factor, n_levels=n_levels,
        use_scale_gate=use_scale_gate, cand_cap=cand_cap,
        cand=cand, bank_stats=bank_stats,
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
    pt_inlier = out["inlier_pt"]
    out.update(
        kp_idx=idx,
        matched=ok,
        pt_inlier=pt_inlier,
        n_matches=jnp.sum(ok),
        n_pt_inliers=jnp.sum(pt_inlier),
    )
    return out
