"""Per-frame ORB feature extraction: the jitted front-end program.

Re-expresses Frame's parallel extractor threads + bookkeeping
(reference Frame.cc:70-153) as one fixed-shape device program:
pyramid -> dense FAST -> grid top-K -> IC-angle -> steered BRIEF,
then keypoint undistortion, per-keypoint depth and virtual right-image
coordinate (ComputeStereoFromRGBD, Frame.cc:495-513: uR = u - bf/d).

Output is a dict pytree of (max_keypoints,)-shaped arrays with a validity
mask — the TPU-native replacement of the reference's std::vector<KeyPoint>.
"""

from __future__ import annotations

from functools import lru_cache as _lru_cache

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from manhattanslam_tpu.config import SlamConfig
from manhattanslam_tpu.ops import fast as fast_ops
from manhattanslam_tpu.ops import image as image_ops
from manhattanslam_tpu.ops import orb as orb_ops
from manhattanslam_tpu.ops import orb_pallas


def undistort_points(xy: jnp.ndarray, cfg: SlamConfig) -> jnp.ndarray:
    """Iterative inverse of the radial-tangential model (cv::undistortPoints).

    xy: (N, 2) pixel coords in the distorted image -> undistorted pixels.
    """
    cam = cfg.camera
    if not cam.has_distortion:
        return xy
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    k1, k2, k3, p1, p2 = cam.k1, cam.k2, cam.k3, cam.p1, cam.p2
    xd = (xy[:, 0] - cx) / fx
    yd = (xy[:, 1] - cy) / fy
    x, y = xd, yd
    for _ in range(8):
        r2 = x * x + y * y
        k = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
        dy = p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
        x = (xd - dx) / k
        y = (yd - dy) / k
    return jnp.stack([x * fx + cx, y * fy + cy], -1)


def _extract_level(
    level_img: jnp.ndarray,
    n_out: int,
    cfg: SlamConfig,
    use_pallas: bool | None = None,
) -> dict:
    """Extract n_out oriented+described keypoints from one pyramid level."""
    h0, w0 = level_img.shape
    if min(h0, w0) < 2 * orb_ops.EDGE_THRESHOLD + 3:
        # level too small for the 31x31 patch window — no keypoints
        return {
            "xy": jnp.zeros((n_out, 2)),
            "response": jnp.zeros((n_out,)),
            "valid": jnp.zeros((n_out,), bool),
            "angle": jnp.zeros((n_out,)),
            "desc": jnp.zeros((n_out, 8), jnp.uint32),
        }
    score = fast_ops.fast_corners(
        level_img, cell=30, ini_th=cfg.orb.ini_th_fast,
        min_th=cfg.orb.min_th_fast, use_pallas=use_pallas,
    )
    h, w = level_img.shape
    # keep-out border so the orientation/descriptor patch reads are valid
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    b = orb_ops.EDGE_THRESHOLD
    inb = (ys >= b) & (ys < h - b) & (xs >= b) & (xs < w - b)
    score = jnp.where(inb, score, 0.0)

    k_per_cell = max(2, min(8, (4 * n_out) // max((h // 32) * (w // 32), 1) + 1))
    xy, resp, valid = orb_ops.select_grid_topk(score, n_out, cell=32, k_per_cell=k_per_cell)
    if use_pallas is None:
        use_pallas = fast_ops._use_pallas()
    pallas_ok = use_pallas and h >= orb_pallas.PATCH_H and w >= 128
    if pallas_ok:
        # gather-free IC-angle + BRIEF sampling (patch DMA kernels)
        angle = orb_pallas.ic_angle_pallas(level_img, xy)
    else:
        angle = orb_ops.ic_angle(level_img, xy)
    # integer-rounded blur: the reference blurs a CV_8U image so BRIEF
    # compares integer intensities (ORBextractor.cc:850-856); rounding
    # also makes every sampled value exactly bf16-representable, letting
    # the Pallas one-hot row-select matmul run on the MXU in bf16
    # (1 pass instead of the 3-pass f32 decomposition) while staying
    # bit-exact with the jnp gather path
    blurred = jnp.round(image_ops.gaussian_blur(level_img, 7, 2.0))
    if pallas_ok:
        desc = orb_pallas.brief_descriptors_pallas(blurred, xy, angle)
    else:
        desc = orb_ops.brief_descriptors(blurred, xy, angle)
    return {"xy": xy, "response": resp, "valid": valid, "angle": angle, "desc": desc}


@_lru_cache(maxsize=16)
def build_extractor(cfg: SlamConfig, use_pallas: bool | None = None):
    """Returns extract(gray, depth) -> frame-features pytree (jitted).

    gray: (H, W) float32 [0,255]; depth: (H, W) float32 meters (0 invalid).
    """
    n_levels = cfg.orb.n_levels
    scale = cfg.orb.scale_factor
    budgets = cfg.orb.features_per_level()
    cap = cfg.caps.max_keypoints
    H, W = cfg.camera.height, cfg.camera.width
    bf = cfg.camera.bf

    @jax.jit
    def extract(gray: jnp.ndarray, depth: jnp.ndarray) -> dict:
        levels = image_ops.build_pyramid(gray, n_levels, scale)
        parts = []
        for li in range(n_levels):
            out = _extract_level(levels[li], budgets[li], cfg, use_pallas)
            s = float(scale**li)
            parts.append(
                {
                    "xy": out["xy"] * s,  # level-0 (distorted) pixel coords
                    "response": out["response"],
                    "valid": out["valid"],
                    "angle": out["angle"],
                    "desc": out["desc"],
                    "level": jnp.full((budgets[li],), li, jnp.int32),
                }
            )
        feats = {k: jnp.concatenate([p[k] for p in parts]) for k in parts[0]}
        n = feats["xy"].shape[0]
        if n < cap:  # pad to capacity
            padn = cap - n
            feats = {
                k: jnp.pad(v, ((0, padn),) + ((0, 0),) * (v.ndim - 1))
                for k, v in feats.items()
            }
        feats = {k: v[:cap] for k, v in feats.items()}

        # depth lookup at the detected (distorted) position
        xi = jnp.clip(jnp.round(feats["xy"][:, 0]).astype(jnp.int32), 0, W - 1)
        yi = jnp.clip(jnp.round(feats["xy"][:, 1]).astype(jnp.int32), 0, H - 1)
        d = depth[yi, xi]
        feats["depth"] = jnp.where(feats["valid"], d, 0.0)

        # undistorted coordinates (used for projection/matching/optimization)
        feats["xy_und"] = undistort_points(feats["xy"], cfg)
        # virtual right-image u (ComputeStereoFromRGBD): uR = u - bf/d
        feats["u_right"] = jnp.where(
            d > 0, feats["xy_und"][:, 0] - bf / jnp.maximum(d, 1e-6), -1.0
        )
        # scale-sigma info per keypoint (for LM information weights)
        feats["inv_sigma2"] = (1.0 / scale ** (2.0 * feats["level"].astype(jnp.float32)))
        return feats

    return extract


def backproject_keypoints(feats: dict, cfg: SlamConfig) -> jnp.ndarray:
    """Camera-frame 3D points for keypoints with valid depth (else zeros).

    Equivalent of Frame::UnprojectStereo (Frame.cc:515-526).
    """
    cam = cfg.camera
    d = feats["depth"]
    x = (feats["xy_und"][:, 0] - cam.cx) / cam.fx * d
    y = (feats["xy_und"][:, 1] - cam.cy) / cam.fy * d
    pts = jnp.stack([x, y, d], -1)
    return jnp.where((d > 0)[:, None], pts, 0.0)
