"""Pallas TPU kernel for steered-BRIEF sampling.

The jnp formulation (ops/orb.brief_descriptors) samples the blurred image
at 512 rotated pattern positions per keypoint with a fully random 2-D
gather — XLA lowers that to per-element loads, which dominates the whole
fused frame step (~5.6 ms of a ~19 ms step at 640x480 on v5e).

TPU-native reformulation: gathers become DMA + MXU.  Per keypoint,

  1. DMA a (56, 256) patch around the keypoint out of the VMEM-resident
     image (dynamic 2-D slice with an 8-aligned row / 128-aligned lane
     corner, per Mosaic's alignment rules),
  2. one-hot ROW selection as a (512, 56) x (56, 256) MXU matmul,
  3. one-hot COLUMN selection as an elementwise mask + lane reduction.

The patch covers every rotated sample: pattern offsets lie in a radius-22
disc (31x31 pattern rotated), so the aligned 56x256 window around the
keypoint always contains the clipped sample coordinates (keypoints carry
a 19 px EDGE_THRESHOLD border, reference ORBextractor.cc:72).

Bit-exact with the jnp path (same clipping, same rounding); verified by
tests/test_orb_pallas.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from manhattanslam_tpu.ops.orb import PATTERN

PATCH_H = 56  # 8-row aligned corner + radius-22 sample disc + rounding
PATCH_W = 256  # 128-lane aligned corner + radius-22 disc


KP_BLOCK = 8  # keypoints per grid step (sublane-aligned block rows)


def _brief_kernel(corner_ref, img_ref, syr_ref, sxr_ref, out_ref):
    """KP_BLOCK keypoints per grid step: patch DMA + one-hot contractions."""
    i = pl.program_id(0)
    for k in range(KP_BLOCK):
        n = i * KP_BLOCK + k
        y0 = pl.multiple_of(corner_ref[n, 0], 8)
        x0 = pl.multiple_of(corner_ref[n, 1], 128)
        patch = img_ref[pl.ds(y0, PATCH_H), pl.ds(x0, PATCH_W)]  # (56, 256)
        syr = syr_ref[k, :]  # (512,) row index into the patch
        sxr = sxr_ref[k, :]
        rows = jax.lax.broadcasted_iota(jnp.int32, (PATCH_H, 512), 0)
        oh_r = (rows == syr[None, :]).astype(jnp.float32)  # (56, 512)
        # (512, 56) @ (56, 256) on the MXU
        tmp = jax.lax.dot_general(
            oh_r, patch, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (512, 256)
        cols = jax.lax.broadcasted_iota(jnp.int32, (512, PATCH_W), 1)
        oh_c = (cols == sxr[:, None]).astype(jnp.float32)
        out_ref[k, :] = jnp.sum(tmp * oh_c, axis=1)


@partial(jax.jit, static_argnames=("interpret",))
def brief_samples_pallas(
    blurred: jnp.ndarray,
    corner: jnp.ndarray,  # (N, 2) int32 patch top-left (y, x)
    syr: jnp.ndarray,  # (N, 512) int32 row index within patch
    sxr: jnp.ndarray,  # (N, 512) int32 col index within patch
    interpret: bool = False,
) -> jnp.ndarray:
    """(N, 512) sampled intensities."""
    n = corner.shape[0]
    n_pad = -(-n // KP_BLOCK) * KP_BLOCK
    if n_pad != n:
        corner = jnp.pad(corner, ((0, n_pad - n), (0, 0)))
        syr = jnp.pad(syr, ((0, n_pad - n), (0, 0)))
        sxr = jnp.pad(sxr, ((0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        _brief_kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, 512), blurred.dtype),
        grid=(n_pad // KP_BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # corners (whole)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # image (whole)
            pl.BlockSpec((KP_BLOCK, 512), lambda i: (i, 0)),
            pl.BlockSpec((KP_BLOCK, 512), lambda i: (i, 0)),
        ],
        out_specs=pl.BlockSpec((KP_BLOCK, 512), lambda i: (i, 0)),
        interpret=interpret,
    )(corner.astype(jnp.int32), blurred, syr, sxr)
    return out[:n]


def brief_descriptors_pallas(
    blurred: jnp.ndarray,
    xy: jnp.ndarray,
    angle: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """Steered BRIEF via the Pallas sampling kernel — bit-exact with
    ops/orb.brief_descriptors (computeOrbDescriptor equivalent,
    ORBextractor.cc:104-149).  Requires image dims >= (PATCH_H, PATCH_W);
    smaller pyramid levels fall back to the jnp gather path."""
    pat = jnp.asarray(PATTERN, jnp.float32)  # (256, 2, 2) (y, x)
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    py, px = pat[..., 0], pat[..., 1]
    rx = px[None] * ca[:, None, None] - py[None] * sa[:, None, None]
    ry = px[None] * sa[:, None, None] + py[None] * ca[:, None, None]
    h, w = blurred.shape
    # absolute sample coords, clipped exactly like the jnp path
    sx = jnp.clip(jnp.round(xy[:, 0, None, None] + rx), 0, w - 1).astype(jnp.int32)
    sy = jnp.clip(jnp.round(xy[:, 1, None, None] + ry), 0, h - 1).astype(jnp.int32)
    # patch corner per keypoint; samples are within a radius-22 disc of the
    # keypoint, so the (56, 256) window always contains them after clipping.
    # Mosaic requires aligned dynamic-slice starts: the row corner is
    # 8-aligned (56 rows = alignment slack 7 + 22 up + 22 down + rounding)
    # and the column corner 128-aligned (256 cols = 128 slack + disc).
    kx = jnp.round(xy[:, 0]).astype(jnp.int32)
    ky = jnp.round(xy[:, 1]).astype(jnp.int32)
    cy = jnp.clip(((ky - 24) // 8) * 8, 0, h - PATCH_H)
    cx = jnp.clip(((kx - 22) // 128) * 128, 0, w - PATCH_W)
    corner = jnp.stack([cy, cx], -1)
    syr = (sy.reshape(sy.shape[0], -1) - cy[:, None])
    sxr = (sx.reshape(sx.shape[0], -1) - cx[:, None])
    vals = brief_samples_pallas(
        blurred, corner, syr, sxr, interpret=interpret
    ).reshape(-1, 256, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)
    lanes = bits.reshape(-1, 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None]
    return jnp.sum(lanes * weights, axis=-1, dtype=jnp.uint32)
