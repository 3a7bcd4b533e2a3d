"""Image primitives: pyramid, separable Gaussian blur, gradients.

Replaces cv::resize / cv::GaussianBlur / cv::Sobel used by the reference
front end (ORBextractor.cc:872-893 pyramid; :850 blur before rBRIEF).
Everything is fixed-shape and jit-friendly.

TPU note: single-channel 2-D convolutions are a trap on the MXU — XLA
pads the 1-element channel dims to the systolic tile, wasting >99% of the
array (measured: a 7-tap separable blur at 640x480 cost ~7 ms as
conv_general_dilated vs ~0.1 ms as shift+add).  So small stencils (blur,
Sobel) are expressed as shifted adds on the VPU, and bilinear resize as
two constant banded-matrix products on the MXU.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def pyramid_shapes(h: int, w: int, n_levels: int, scale: float) -> list[tuple[int, int]]:
    """Static per-level (H, W) like the reference (round(H/scale^i))."""
    return [
        (int(round(h / scale**i)), int(round(w / scale**i))) for i in range(n_levels)
    ]


def _resize_matrix_np(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) linear-interpolation operator with triangle
    antialiasing — identical math to jax.image.resize(method="linear").

    Sample mapping uses half-pixel centers: in = (out + 0.5)/scale - 0.5;
    when downsampling the triangle kernel is widened by 1/scale.
    """
    scale = out_size / in_size
    out_coords = (np.arange(out_size) + 0.5) / scale - 0.5  # (O,)
    kscale = min(scale, 1.0)
    k = np.arange(in_size)[None, :]  # (1, I)
    x = (k - out_coords[:, None]) * kscale
    w = np.maximum(0.0, 1.0 - np.abs(x))
    w = w / np.maximum(w.sum(axis=1, keepdims=True), 1e-12)
    return w.astype(np.float32)


def avgpool2_matrix_np(in_size: int) -> np.ndarray:
    """(in_size//2, in_size) constant operator for 2x2 box downsampling
    (one axis); strided slicing lowers to scalar gathers on TPU, this
    rides the MXU."""
    out = in_size // 2
    m = np.zeros((out, in_size), np.float32)
    idx = np.arange(out)
    m[idx, 2 * idx] = 0.5
    m[idx, 2 * idx + 1] = 0.5
    return m


def stride_select_matrix_np(in_size: int, stride: int) -> np.ndarray:
    """(ceil(in/stride), in) selection operator picking every stride-th
    element (x[::stride] as a matmul)."""
    out = -(-in_size // stride)
    m = np.zeros((out, in_size), np.float32)
    idx = np.arange(out)
    m[idx, stride * idx] = 1.0
    return m


@partial(jax.jit, static_argnames=("out_hw",))
def resize_bilinear(img: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize (jax.image.resize "linear"-equivalent) as two
    constant matrix products: out = R_y @ img @ R_x^T (rides the MXU)."""
    h, w = img.shape
    oh, ow = out_hw
    if (oh, ow) == (h, w):
        return img
    ry = jnp.asarray(_resize_matrix_np(h, oh))
    rx = jnp.asarray(_resize_matrix_np(w, ow))
    return ry @ img @ rx.T


def build_pyramid(img: jnp.ndarray, n_levels: int, scale: float) -> list[jnp.ndarray]:
    """List of n_levels images, level 0 = input.  Successive downscales to
    mirror the reference's level-from-previous-level resize chain."""
    h, w = img.shape
    shapes = pyramid_shapes(h, w, n_levels, scale)
    levels = [img]
    for i in range(1, n_levels):
        levels.append(resize_bilinear(levels[-1], shapes[i]))
    return levels


def _gauss_kernel1d(ksize: int, sigma: float) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2 * sigma**2))
    return (k / k.sum()).astype(np.float32)


def _conv1d_shifts(img: jnp.ndarray, k: np.ndarray, axis: int, pad_mode: str) -> jnp.ndarray:
    """1-D stencil along `axis` as shifted adds (VPU-friendly)."""
    r = len(k) // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (r, r)
    x = jnp.pad(img, pad, mode=pad_mode)
    n = img.shape[axis]
    out = None
    for i, w in enumerate(k):
        sl = [slice(None), slice(None)]
        sl[axis] = slice(i, i + n)
        term = float(w) * x[tuple(sl)]
        out = term if out is None else out + term
    return out


@partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian with reflect padding (cv::BORDER_REFLECT_101-like)."""
    k = _gauss_kernel1d(ksize, sigma)
    x = _conv1d_shifts(img, k, axis=0, pad_mode="reflect")
    return _conv1d_shifts(x, k, axis=1, pad_mode="reflect")


@jax.jit
def sobel(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3x3 Sobel gradients (gx, gy), edge-padded.

    Separable: sobel_x = [1,2,1]^T (smooth along y) x [-1,0,1] (diff along x).
    """
    smooth = np.array([1.0, 2.0, 1.0], np.float32)
    diff = np.array([-1.0, 0.0, 1.0], np.float32)
    sy = _conv1d_shifts(img, smooth, axis=0, pad_mode="edge")
    gx = _conv1d_shifts(sy, diff, axis=1, pad_mode="edge")
    sx = _conv1d_shifts(img, smooth, axis=1, pad_mode="edge")
    gy = _conv1d_shifts(sx, diff, axis=0, pad_mode="edge")
    return gx, gy


def shift2d(img: jnp.ndarray, dy: int, dx: int) -> jnp.ndarray:
    """Shift image so out[y, x] = img[y+dy, x+dx], zero-padded."""
    h, w = img.shape
    out = jnp.zeros_like(img)
    ys0, ys1 = max(dy, 0), min(h + dy, h)
    xs0, xs1 = max(dx, 0), min(w + dx, w)
    if ys0 >= ys1 or xs0 >= xs1:
        return out
    src = img[ys0:ys1, xs0:xs1]
    return out.at[ys0 - dy : ys1 - dy, xs0 - dx : xs1 - dx].set(src)


def maxpool3x3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 max filter (for non-maximum suppression) via shifted maxes."""
    out = x
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            if dy == 0 and dx == 0:
                continue
            h, w = x.shape
            shifted = jnp.full_like(x, -jnp.inf)
            ys0, ys1 = max(dy, 0), min(h + dy, h)
            xs0, xs1 = max(dx, 0), min(w + dx, w)
            shifted = shifted.at[ys0 - dy : ys1 - dy, xs0 - dx : xs1 - dx].set(
                x[ys0:ys1, xs0:xs1]
            )
            out = jnp.maximum(out, shifted)
    return out
