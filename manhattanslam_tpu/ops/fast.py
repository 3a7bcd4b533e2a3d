"""FAST-9/16 corner detection as dense vectorized ops.

TPU-native re-expression of the per-cell scalar FAST loops in the reference
extractor (ORBextractor.cc:723-803): instead of iterating 30x30 cells and
calling cv::FAST per cell, we compute a dense corner-score map for the whole
level with 16 shifted comparisons (VPU-friendly), then apply the reference's
per-cell threshold-fallback rule (iniThFAST=20, minThFAST=7) as a mask and
3x3 non-maximum suppression.

Score semantics match OpenCV: score(p) = the largest threshold t for which p
is still a FAST-9 corner = max over the 16 contiguous 9-arcs of the minimum
absolute center-difference along the arc.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from manhattanslam_tpu.ops.image import maxpool3x3, shift2d

# Bresenham circle of radius 3 (16 offsets, clockwise from 12 o'clock),
# (dy, dx) pairs — the standard FAST-9/16 test set.
CIRCLE_OFFSETS: list[tuple[int, int]] = [
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
]
ARC_LEN = 9  # FAST-9: contiguous arc of >= 9 of 16


def fast_score_map(img: jnp.ndarray) -> jnp.ndarray:
    """Dense FAST-9 corner score for every pixel (0 where not a corner).

    img: (H, W) float32 grayscale.
    Returns (H, W) float32 score map; borders (3 px) are zero.
    """
    h, w = img.shape
    # diffs[k] = I(p + offset_k) - I(p)
    diffs = jnp.stack([shift2d(img, dy, dx) for (dy, dx) in CIRCLE_OFFSETS]) - img[None]

    # For each of the 16 starting rotations, the minimum diff along the
    # 9-arc.  A pixel is a bright corner at threshold t iff
    # max_r min_arc(diffs) > t; dark analogously with -diffs.
    def arc_min(d):
        # d: (16, H, W) -> (16, H, W) where out[r] = min_{k<9} d[(r+k) % 16]
        rolled = [jnp.roll(d, -k, axis=0) for k in range(ARC_LEN)]
        return jnp.min(jnp.stack(rolled), axis=0)

    bright_score = jnp.max(arc_min(diffs), axis=0)  # >t means corner at t
    dark_score = jnp.max(arc_min(-diffs), axis=0)
    score = jnp.maximum(bright_score, dark_score)
    score = jnp.maximum(score, 0.0)

    # zero the 3-px border (circle would read out of bounds / zero padding)
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inb = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    return jnp.where(inb, score, 0.0)


def _use_pallas() -> bool:
    try:
        return jax.default_backend() != "cpu"
    except Exception:  # pragma: no cover
        return False


@partial(jax.jit, static_argnames=("cell", "ini_th", "min_th", "use_pallas"))
def fast_corners(
    img: jnp.ndarray, cell: int = 30, ini_th: int = 20, min_th: int = 7,
    use_pallas: bool | None = None,
) -> jnp.ndarray:
    """Corner response map with the reference's per-cell fallback + NMS.

    A pixel survives if its score exceeds iniThFAST, or exceeds minThFAST in
    a cell where no pixel passed iniThFAST (ORBextractor.cc:763-769), and it
    is a 3x3 local maximum.  Returns the masked score map.

    On TPU the dense response comes from the fused Pallas kernel
    (ops/fast_pallas.py, bit-identical); the jnp formulation is the CPU /
    reference path.
    """
    h, w = img.shape
    if use_pallas is None:
        use_pallas = _use_pallas()
    if use_pallas:
        from manhattanslam_tpu.ops.fast_pallas import fast_score_map_pallas

        score = fast_score_map_pallas(img)
    else:
        score = fast_score_map(img)

    # per-cell "any high-threshold corner?" map
    ch, cw = -(-h // cell), -(-w // cell)
    pad_h, pad_w = ch * cell - h, cw * cell - w
    sp = jnp.pad(score, ((0, pad_h), (0, pad_w)))
    cells = sp.reshape(ch, cell, cw, cell)
    has_high = (cells > ini_th).any(axis=(1, 3))  # (ch, cw)
    has_high_full = jnp.repeat(jnp.repeat(has_high, cell, 0), cell, 1)[:h, :w]

    th = jnp.where(has_high_full, float(ini_th), float(min_th))
    passed = score > th

    # non-maximum suppression (3x3)
    is_max = score >= maxpool3x3(score)
    return jnp.where(passed & is_max, score, 0.0)
