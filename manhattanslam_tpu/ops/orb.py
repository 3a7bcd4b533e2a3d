"""Oriented-BRIEF keypoints: grid top-K selection, IC-angle, steered BRIEF.

TPU-native redesign of the reference extractor (ORBextractor.cc):

- The sequential quadtree balancer (DistributeOctTree, :531-721) becomes a
  fixed-shape *grid top-K*: the level is divided into cells, the best K
  corners per cell are kept, then a global top-N by response.  This keeps
  the same spatial-spread intent with static shapes (SURVEY.md section 7
  step 2).
- IC_Angle (:75-99) and the rotated BRIEF sampling (:104-149) become
  batched patch gathers + closed-form moments, vmapped over keypoints.
- The descriptor bit-pair pattern is NOT the OpenCV learned table: we use a
  seeded Gaussian pattern (original BRIEF construction).  The system only
  matches its own descriptors against its own, so self-consistency is what
  matters; bit layout is 256 bits packed into 8 uint32 lanes so Hamming
  distance is 8 XOR+popcounts (ORBmatcher.cc:835-851 equivalent).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

HALF_PATCH = 15  # IC_Angle circular patch radius (ORBextractor.cc HALF_PATCH_SIZE)
EDGE_THRESHOLD = 19  # min distance of a keypoint from the level border
PATTERN_BITS = 256


def _make_pattern(seed: int = 1234) -> np.ndarray:
    """(256, 2, 2) int32 sample-point pairs (y, x), Gaussian sigma=patch/5,
    clipped to the radius-13 disc so any rotation stays inside the 31x31
    patch read window."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(0.0, 31 / 5.0, size=(PATTERN_BITS, 2, 2))
    r = np.sqrt((pts**2).sum(-1, keepdims=True))
    scale = np.minimum(1.0, 13.0 / np.maximum(r, 1e-6))
    return np.round(pts * scale).astype(np.int32)


PATTERN = _make_pattern()  # (256, 2, 2) as (bit, point01, (y, x))


def _circular_umax(radius: int = HALF_PATCH) -> np.ndarray:
    """Per-row max |x| of the circular patch (reference umax, :446-460)."""
    umax = np.zeros(radius + 1, dtype=np.int32)
    for v in range(radius + 1):
        umax[v] = int(np.sqrt(radius * radius - v * v) + 0.5)
    return umax


UMAX = _circular_umax()


def _patch_mask(radius: int = HALF_PATCH) -> np.ndarray:
    """(2r+1, 2r+1) bool mask of the circular patch."""
    d = 2 * radius + 1
    ys, xs = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    mask = np.zeros((d, d), bool)
    for v in range(-radius, radius + 1):
        mask[v + radius, :] = np.abs(xs[v + radius]) <= UMAX[abs(v)]
    return mask


CIRC_MASK = _patch_mask()


def select_grid_topk(
    score: jnp.ndarray, n_out: int, cell: int = 32, k_per_cell: int = 8
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Pick n_out keypoints: top-k_per_cell per cell, then global top-n_out.

    Returns (xy (n_out, 2) float32, response (n_out,), valid (n_out,) bool).
    Invalid slots have response 0.
    """
    h, w = score.shape
    ch, cw = -(-h // cell), -(-w // cell)
    sp = jnp.pad(score, ((0, ch * cell - h), (0, cw * cell - w)))
    cells = sp.reshape(ch, cell, cw, cell).transpose(0, 2, 1, 3).reshape(ch * cw, cell * cell)
    vals, idx = jax.lax.top_k(cells, k_per_cell)  # (ncells, k)
    # recover absolute coordinates
    cy = jax.lax.broadcasted_iota(jnp.int32, (ch * cw, k_per_cell), 0) // cw
    cx = jax.lax.broadcasted_iota(jnp.int32, (ch * cw, k_per_cell), 0) % cw
    py = idx // cell
    px = idx % cell
    ys = cy * cell + py
    xs = cx * cell + px
    flat_v = vals.reshape(-1)
    flat_y = ys.reshape(-1)
    flat_x = xs.reshape(-1)
    n_cand = flat_v.shape[0]
    if n_cand < n_out:
        padn = n_out - n_cand
        flat_v = jnp.pad(flat_v, (0, padn))
        flat_y = jnp.pad(flat_y, (0, padn))
        flat_x = jnp.pad(flat_x, (0, padn))
    top_v, top_i = jax.lax.top_k(flat_v, n_out)
    xy = jnp.stack([flat_x[top_i], flat_y[top_i]], -1).astype(jnp.float32)
    valid = top_v > 0.0
    return xy, top_v, valid


def gather_patches(img: jnp.ndarray, xy: jnp.ndarray, radius: int) -> jnp.ndarray:
    """Gather (N, 2r+1, 2r+1) patches centered at integer xy (x, y).

    One batched gather (advanced indexing) — much faster on TPU than a
    vmapped dynamic_slice per keypoint.
    """
    d = 2 * radius + 1
    h, w = img.shape
    x0 = jnp.clip(xy[:, 0].astype(jnp.int32) - radius, 0, w - d)
    y0 = jnp.clip(xy[:, 1].astype(jnp.int32) - radius, 0, h - d)
    dy = jnp.arange(d)[None, :, None]
    dx = jnp.arange(d)[None, None, :]
    return img[y0[:, None, None] + dy, x0[:, None, None] + dx]


def ic_angle(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Intensity-centroid orientation per keypoint (radians).

    Reference IC_Angle (ORBextractor.cc:75-99): moments over the circular
    radius-15 patch; angle = atan2(m01, m10).

    TPU-native formulation: instead of gathering 31x31 patches (N*961
    scalar gathers — general gathers are the slowest op class on TPU), use
    row prefix sums.  With P = cumsum_x(I) and Q = cumsum_x(x * I), the
    circular row segment [x-u, x+u] of row y+dy contributes
        S  = P[y+dy, x+u] - P[y+dy, x-u-1]            (zeroth moment)
        M  = Q[y+dy, x+u] - Q[y+dy, x-u-1] - x * S    (first moment in x)
    so each (keypoint, dy) needs only 4 gathered scalars — 8x fewer than
    the patch formulation, with identical math.
    """
    r = HALF_PATCH
    h, w = img.shape
    # clip like gather_patches did: keep the window fully inside the image
    x0 = jnp.clip(xy[:, 0].astype(jnp.int32), r, w - r - 1)
    y0 = jnp.clip(xy[:, 1].astype(jnp.int32), r, h - r - 1)

    xs = jnp.arange(w, dtype=jnp.float32)
    # exclusive prefix sums, padded so index 0 means "empty prefix"
    P = jnp.pad(jnp.cumsum(img, axis=1), ((0, 0), (1, 0)))
    Q = jnp.pad(jnp.cumsum(img * xs[None, :], axis=1), ((0, 0), (1, 0)))

    dy = jnp.arange(-r, r + 1)  # (31,)
    u = jnp.asarray(UMAX)[jnp.abs(dy)]  # (31,) per-row half-width
    rows = y0[:, None] + dy[None, :]  # (N, 31)
    hi = x0[:, None] + u[None, :] + 1  # prefix-sum upper index
    lo = x0[:, None] - u[None, :]  # prefix-sum lower index
    S = P[rows, hi] - P[rows, lo]  # (N, 31)
    M = Q[rows, hi] - Q[rows, lo] - x0[:, None].astype(jnp.float32) * S
    m10 = jnp.sum(M, axis=1)
    m01 = jnp.sum(dy[None, :].astype(jnp.float32) * S, axis=1)
    return jnp.arctan2(m01, m10)


def brief_descriptors(
    blurred: jnp.ndarray, xy: jnp.ndarray, angle: jnp.ndarray
) -> jnp.ndarray:
    """Steered BRIEF: (N, 8) uint32 descriptors.

    Rotates the 256-pair pattern by each keypoint angle and compares blurred
    intensities (computeOrbDescriptor equivalent, ORBextractor.cc:104-149).
    """
    pat = jnp.asarray(PATTERN, jnp.float32)  # (256, 2, 2) (y, x)
    ca, sa = jnp.cos(angle), jnp.sin(angle)  # (N,)
    py, px = pat[..., 0], pat[..., 1]  # (256, 2)
    # rotate: x' = x cos - y sin ; y' = x sin + y cos
    rx = px[None] * ca[:, None, None] - py[None] * sa[:, None, None]
    ry = px[None] * sa[:, None, None] + py[None] * ca[:, None, None]
    h, w = blurred.shape
    sx = jnp.clip(jnp.round(xy[:, 0, None, None] + rx), 0, w - 1).astype(jnp.int32)
    sy = jnp.clip(jnp.round(xy[:, 1, None, None] + ry), 0, h - 1).astype(jnp.int32)
    vals = blurred[sy, sx]  # (N, 256, 2) gather
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)  # (N, 256)
    lanes = bits.reshape(-1, 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None]
    return jnp.sum(lanes * weights, axis=-1, dtype=jnp.uint32)  # (N, 8)


def hamming_distance(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(…, 8) uint32 x (…, 8) uint32 -> (…,) int32 popcount Hamming."""
    return jnp.sum(jax.lax.population_count(a ^ b), axis=-1).astype(jnp.int32)


def unpack_descriptor_bits(desc: jnp.ndarray) -> jnp.ndarray:
    """(N, 8) uint32 -> (N, 256) float32 in {0, 1} (for MXU matching)."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (desc[..., None] >> shifts[None, None]) & jnp.uint32(1)
    return bits.reshape(desc.shape[0], 256).astype(jnp.float32)
