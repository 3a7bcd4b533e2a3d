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

Bit-exact with the jnp path (same clipping, same rounding) PROVIDED the
image is integer-valued (0..255): the one-hot row-select matmul runs in
bf16 on the MXU (one pass instead of the 3-pass f32 decomposition), which
is exact for 0/1 one-hots and bf16-representable integer intensities.
The production caller guarantees this by integer-rounding the Gaussian
blur (frontend/frame.py), matching the reference's CV_8U blur
(ORBextractor.cc:850-856).  Verified by tests/test_orb_pallas.py.
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


def _pad_aligned(img: jnp.ndarray) -> jnp.ndarray:
    """Pad to 8-row / 128-lane multiples so every dynamic patch corner
    bound is aligned.  Mosaic requires `pl.multiple_of` starts to actually
    hold; with raw image dims the clip upper bounds (h-PATCH_H, w-PATCH_W)
    are unaligned on most pyramid levels, which is UB in the compiled
    kernel (silent DMA round-down -> corrupt descriptors near the
    bottom/right borders).  Padding makes the clip bounds multiples of
    8/128 by construction; padded texels are never *sampled* because the
    callers clip sample indices to the ORIGINAL image dims — they only
    ride along inside patches, masked or unselected."""
    h, w = img.shape
    hp = -(-h // 8) * 8
    wp = -(-w // 128) * 128
    if hp != h or wp != w:
        img = jnp.pad(img, ((0, hp - h), (0, wp - w)))
    return img


def _make_brief_kernel(patch_w: int):
    def _brief_kernel(corner_ref, img_ref, syr_ref, sxr_ref, out_ref):
        """KP_BLOCK keypoints per grid step: patch DMA + one-hot
        contractions.  patch_w == image width means full-width rows (the
        narrow-level variant: the column corner is 0, trivially aligned)."""
        i = pl.program_id(0)
        for k in range(KP_BLOCK):
            n = i * KP_BLOCK + k
            y0 = pl.multiple_of(corner_ref[n, 0], 8)
            x0 = pl.multiple_of(corner_ref[n, 1], 128)
            patch = img_ref[pl.ds(y0, PATCH_H), pl.ds(x0, patch_w)]
            syr = syr_ref[k, :]  # (512,) row index into the patch
            sxr = sxr_ref[k, :]
            rows = jax.lax.broadcasted_iota(jnp.int32, (PATCH_H, 512), 0)
            # bf16 operands: the blurred image is integer-rounded (0..255,
            # all exactly bf16-representable) and the one-hot is 0/1, so a
            # bf16 MXU pass with f32 accumulation is bit-exact while
            # skipping the 3-pass f32 matmul decomposition
            oh_r = (rows == syr[None, :]).astype(jnp.bfloat16)  # (56, 512)
            # (512, 56) @ (56, patch_w) on the MXU
            tmp = jax.lax.dot_general(
                oh_r, patch.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # exact for 0/1 x integer operands; DEFAULT overrides the
                # package-wide "highest" (fp32) which Mosaic rejects on
                # bf16 operands
                precision=jax.lax.Precision.DEFAULT,
            )  # (512, patch_w)
            cols = jax.lax.broadcasted_iota(jnp.int32, (512, patch_w), 1)
            oh_c = (cols == sxr[:, None]).astype(jnp.float32)
            out_ref[k, :] = jnp.sum(tmp * oh_c, axis=1)

    return _brief_kernel


@partial(jax.jit, static_argnames=("patch_w", "interpret"))
def _brief_samples_single(
    blurred: jnp.ndarray,
    corner: jnp.ndarray,  # (N, 2) int32 patch top-left (y, x)
    syr: jnp.ndarray,  # (N, 512) int32 row index within patch
    sxr: jnp.ndarray,  # (N, 512) int32 col index within patch
    patch_w: int = PATCH_W,
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
        _make_brief_kernel(patch_w),
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


def _make_brief_kernel_batched(patch_w: int):
    def _kernel(corner_ref, img_ref, syr_ref, sxr_ref, out_ref):
        """Batched variant: grid (batch, keypoint blocks); each step sees
        one batch element's image block + KP_BLOCK keypoints."""
        for k in range(KP_BLOCK):
            y0 = pl.multiple_of(corner_ref[0, k, 0], 8)
            x0 = pl.multiple_of(corner_ref[0, k, 1], 128)
            patch = img_ref[0, pl.ds(y0, PATCH_H), pl.ds(x0, patch_w)]
            syr = syr_ref[0, k, :]
            sxr = sxr_ref[0, k, :]
            rows = jax.lax.broadcasted_iota(jnp.int32, (PATCH_H, 512), 0)
            # bf16 operands (bit-exact: integer-rounded image, 0/1 one-hot)
            oh_r = (rows == syr[None, :]).astype(jnp.bfloat16)
            tmp = jax.lax.dot_general(
                oh_r, patch.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                # exact for 0/1 x integer operands; DEFAULT overrides the
                # package-wide "highest" (fp32) which Mosaic rejects on
                # bf16 operands
                precision=jax.lax.Precision.DEFAULT,
            )
            cols = jax.lax.broadcasted_iota(jnp.int32, (512, patch_w), 1)
            oh_c = (cols == sxr[:, None]).astype(jnp.float32)
            out_ref[0, k, :] = jnp.sum(tmp * oh_c, axis=1)

    return _kernel


@partial(jax.jit, static_argnames=("patch_w", "interpret"))
def _brief_samples_batched(
    blurred: jnp.ndarray,  # (B, Hp, Wp)
    corner: jnp.ndarray,  # (B, N, 2)
    syr: jnp.ndarray,  # (B, N, 512)
    sxr: jnp.ndarray,
    patch_w: int = PATCH_W,
    interpret: bool = False,
) -> jnp.ndarray:
    b, n = corner.shape[:2]
    n_pad = -(-n // KP_BLOCK) * KP_BLOCK
    if n_pad != n:
        corner = jnp.pad(corner, ((0, 0), (0, n_pad - n), (0, 0)))
        syr = jnp.pad(syr, ((0, 0), (0, n_pad - n), (0, 0)))
        sxr = jnp.pad(sxr, ((0, 0), (0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        _make_brief_kernel_batched(patch_w),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, 512), blurred.dtype),
        grid=(b, n_pad // KP_BLOCK),
        in_specs=[
            pl.BlockSpec(
                (1, KP_BLOCK, 2), lambda bi, i: (bi, i, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1,) + blurred.shape[1:], lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, KP_BLOCK, 512), lambda bi, i: (bi, i, 0)),
            pl.BlockSpec((1, KP_BLOCK, 512), lambda bi, i: (bi, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, KP_BLOCK, 512), lambda bi, i: (bi, i, 0)),
        interpret=interpret,
    )(corner.astype(jnp.int32), blurred, syr, sxr)
    return out[:, :n]


_BRIEF_CV_CACHE: dict = {}


def brief_samples_pallas(
    blurred, corner, syr, sxr, patch_w: int = PATCH_W, interpret: bool = False
):
    """(N, 512) sampled intensities; vmap-batchable via a custom_vmap rule
    that grids over (batch x keypoint block) instead of falling back to
    the jnp gather path."""
    key = (patch_w, bool(interpret))
    f = _BRIEF_CV_CACHE.get(key)
    if f is None:

        @jax.custom_batching.custom_vmap
        def brief_cv(blurred, corner, syr, sxr):
            return _brief_samples_single(
                blurred, corner, syr, sxr, patch_w=key[0], interpret=key[1]
            )

        @brief_cv.def_vmap
        def _rule(axis_size, in_batched, blurred, corner, syr, sxr):  # noqa: ANN001
            args = []
            for a, b_ in zip((blurred, corner, syr, sxr), in_batched):
                if not b_:
                    a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                args.append(a)
            return (
                _brief_samples_batched(
                    *args, patch_w=key[0], interpret=key[1]
                ),
                True,
            )

        _BRIEF_CV_CACHE[key] = f = brief_cv
    return f(blurred, corner, syr, sxr)


def _make_moments_kernel(patch_w: int):
    from manhattanslam_tpu.ops.orb import HALF_PATCH, UMAX

    r = HALF_PATCH

    def _moments_kernel(kp_ref, img_ref, out_ref):
        """IC-angle first moments for KP_BLOCK keypoints per grid step.

        kp_ref (SMEM, (N, 4)): [patch_corner_y, patch_corner_x, kp_y, kp_x]
        out_ref ((KP_BLOCK, 128)): m01 in lane 0, m10 in lane 1.
        """
        i = pl.program_id(0)
        for k in range(KP_BLOCK):
            n = i * KP_BLOCK + k
            y0 = pl.multiple_of(kp_ref[n, 0], 8)
            x0 = pl.multiple_of(kp_ref[n, 1], 128)
            ky = kp_ref[n, 2]
            kx = kp_ref[n, 3]
            patch = img_ref[pl.ds(y0, PATCH_H), pl.ds(x0, patch_w)]
            dy = (
                jax.lax.broadcasted_iota(jnp.int32, (PATCH_H, patch_w), 0)
                + y0 - ky
            )
            dx = (
                jax.lax.broadcasted_iota(jnp.int32, (PATCH_H, patch_w), 1)
                + x0 - kx
            )
            ady = jnp.abs(dy)
            # per-row circular half-width u_max[|dy|] via a constant table
            umax = jnp.zeros_like(dy)
            for a, u in enumerate(UMAX[: r + 1]):
                umax = jnp.where(ady == a, u, umax)
            mask = (ady <= r) & (jnp.abs(dx) <= umax)
            vals = jnp.where(mask, patch, 0.0)
            m01 = jnp.sum(vals * dy.astype(jnp.float32))
            m10 = jnp.sum(vals * dx.astype(jnp.float32))
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            out_ref[k, :] = jnp.where(
                lane == 0, m01, jnp.where(lane == 1, m10, 0.0)
            )[0]

    return _moments_kernel


@partial(jax.jit, static_argnames=("patch_w", "interpret"))
def _ic_moments_single(img, kp, patch_w, interpret=False):
    n = kp.shape[0]
    n_pad = -(-n // KP_BLOCK) * KP_BLOCK
    if n_pad != n:
        kp = jnp.pad(kp, ((0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        _make_moments_kernel(patch_w),
        out_shape=jax.ShapeDtypeStruct((n_pad, 128), img.dtype),
        grid=(n_pad // KP_BLOCK,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((KP_BLOCK, 128), lambda i: (i, 0)),
        interpret=interpret,
    )(kp.astype(jnp.int32), img)
    return out[:n]


def _make_moments_kernel_batched(patch_w: int):
    from manhattanslam_tpu.ops.orb import HALF_PATCH, UMAX

    r = HALF_PATCH

    def _kernel(kp_ref, img_ref, out_ref):
        for k in range(KP_BLOCK):
            y0 = pl.multiple_of(kp_ref[0, k, 0], 8)
            x0 = pl.multiple_of(kp_ref[0, k, 1], 128)
            ky = kp_ref[0, k, 2]
            kx = kp_ref[0, k, 3]
            patch = img_ref[0, pl.ds(y0, PATCH_H), pl.ds(x0, patch_w)]
            dy = (
                jax.lax.broadcasted_iota(jnp.int32, (PATCH_H, patch_w), 0)
                + y0 - ky
            )
            dx = (
                jax.lax.broadcasted_iota(jnp.int32, (PATCH_H, patch_w), 1)
                + x0 - kx
            )
            ady = jnp.abs(dy)
            umax = jnp.zeros_like(dy)
            for a, u in enumerate(UMAX[: r + 1]):
                umax = jnp.where(ady == a, u, umax)
            mask = (ady <= r) & (jnp.abs(dx) <= umax)
            vals = jnp.where(mask, patch, 0.0)
            m01 = jnp.sum(vals * dy.astype(jnp.float32))
            m10 = jnp.sum(vals * dx.astype(jnp.float32))
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
            out_ref[0, k, :] = jnp.where(
                lane == 0, m01, jnp.where(lane == 1, m10, 0.0)
            )[0]

    return _kernel


@partial(jax.jit, static_argnames=("patch_w", "interpret"))
def _ic_moments_batched(img, kp, patch_w, interpret=False):
    b, n = kp.shape[:2]
    n_pad = -(-n // KP_BLOCK) * KP_BLOCK
    if n_pad != n:
        kp = jnp.pad(kp, ((0, 0), (0, n_pad - n), (0, 0)))
    out = pl.pallas_call(
        _make_moments_kernel_batched(patch_w),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, 128), img.dtype),
        grid=(b, n_pad // KP_BLOCK),
        in_specs=[
            pl.BlockSpec(
                (1, KP_BLOCK, 4), lambda bi, i: (bi, i, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1,) + img.shape[1:], lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((1, KP_BLOCK, 128), lambda bi, i: (bi, i, 0)),
        interpret=interpret,
    )(kp.astype(jnp.int32), img)
    return out[:, :n]


_MOMENTS_CV_CACHE: dict = {}


def _ic_moments_pallas(img, kp, patch_w, interpret=False):
    """vmap-batchable IC-moments kernel dispatch (see brief_samples_pallas)."""
    key = (patch_w, bool(interpret))
    f = _MOMENTS_CV_CACHE.get(key)
    if f is None:

        @jax.custom_batching.custom_vmap
        def moments_cv(img, kp):
            return _ic_moments_single(img, kp, key[0], key[1])

        @moments_cv.def_vmap
        def _rule(axis_size, in_batched, img, kp):  # noqa: ANN001
            args = []
            for a, b_ in zip((img, kp), in_batched):
                if not b_:
                    a = jnp.broadcast_to(a[None], (axis_size,) + a.shape)
                args.append(a)
            return _ic_moments_batched(*args, key[0], key[1]), True

        _MOMENTS_CV_CACHE[key] = f = moments_cv
    return f(img, kp)


def ic_angle_pallas(
    img: jnp.ndarray, xy: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """Intensity-centroid orientation via the patch kernel — same math as
    ops/orb.ic_angle (IC_Angle, ORBextractor.cc:75-99): first moments of
    the circular 31x31 patch.  Equal up to f32 summation order."""
    from manhattanslam_tpu.ops.orb import HALF_PATCH

    r = HALF_PATCH
    h, w = img.shape
    # sample centers are clipped against the ORIGINAL dims; the padded
    # texels below only ride along inside patches (masked by the disc)
    x0 = jnp.clip(xy[:, 0].astype(jnp.int32), r, w - r - 1)
    y0 = jnp.clip(xy[:, 1].astype(jnp.int32), r, h - r - 1)
    img = _pad_aligned(img)
    hp, wp = img.shape
    cy = jnp.clip(((y0 - 24) // 8) * 8, 0, hp - PATCH_H)
    if wp >= PATCH_W:
        pw = PATCH_W
        cx = jnp.clip(((x0 - 22) // 128) * 128, 0, wp - PATCH_W)
    else:
        pw = wp
        cx = jnp.zeros_like(x0)
    kp = jnp.stack([cy, cx, y0, x0], -1)
    m = _ic_moments_pallas(img, kp, pw, interpret=interpret)
    return jnp.arctan2(m[:, 0], m[:, 1])


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
    # absolute sample coords, clipped exactly like the jnp path (against
    # the ORIGINAL dims — padded texels are never sampled)
    sx = jnp.clip(jnp.round(xy[:, 0, None, None] + rx), 0, w - 1).astype(jnp.int32)
    sy = jnp.clip(jnp.round(xy[:, 1, None, None] + ry), 0, h - 1).astype(jnp.int32)
    # patch corner per keypoint; samples are within a radius-22 disc of the
    # keypoint, so the (56, 256) window always contains them after clipping.
    # Mosaic requires aligned dynamic-slice starts: the row corner is
    # 8-aligned (56 rows = alignment slack 7 + 22 up + 22 down + rounding)
    # and the column corner 128-aligned (256 cols = 128 slack + disc).
    # The image is padded so the clip UPPER bounds are aligned too.
    blurred = _pad_aligned(blurred)
    hp, wp = blurred.shape
    kx = jnp.round(xy[:, 0]).astype(jnp.int32)
    ky = jnp.round(xy[:, 1]).astype(jnp.int32)
    cy = jnp.clip(((ky - 24) // 8) * 8, 0, hp - PATCH_H)
    if wp >= PATCH_W:
        pw = PATCH_W
        cx = jnp.clip(((kx - 22) // 128) * 128, 0, wp - PATCH_W)
    else:
        # narrow pyramid level: full-width rows, corner at column 0
        pw = wp
        cx = jnp.zeros_like(kx)
    corner = jnp.stack([cy, cx], -1)
    syr = (sy.reshape(sy.shape[0], -1) - cy[:, None])
    sxr = (sx.reshape(sx.shape[0], -1) - cx[:, None])
    vals = brief_samples_pallas(
        blurred, corner, syr, sxr, patch_w=pw, interpret=interpret
    ).reshape(-1, 256, 2)
    bits = (vals[..., 0] < vals[..., 1]).astype(jnp.uint32)
    lanes = bits.reshape(-1, 8, 32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None]
    return jnp.sum(lanes * weights, axis=-1, dtype=jnp.uint32)
