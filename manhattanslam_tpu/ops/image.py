"""Image primitives: pyramid, separable Gaussian blur, gradients.

Replaces cv::resize / cv::GaussianBlur / cv::Sobel used by the reference
front end (ORBextractor.cc:872-893 pyramid; :850 blur before rBRIEF).
Everything is fixed-shape and jit-friendly.
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


def resize_bilinear(img: jnp.ndarray, out_hw: tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize (cv::INTER_LINEAR-like)."""
    return jax.image.resize(img, out_hw, method="linear")


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


@partial(jax.jit, static_argnames=("ksize", "sigma"))
def gaussian_blur(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian with reflect padding (cv::BORDER_REFLECT_101-like)."""
    k = jnp.asarray(_gauss_kernel1d(ksize, sigma))
    r = ksize // 2
    x = jnp.pad(img, ((r, r), (0, 0)), mode="reflect")
    # vertical pass: conv along rows
    x = jax.lax.conv_general_dilated(
        x[None, None], k[None, None, :, None], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    x = jnp.pad(x, ((0, 0), (r, r)), mode="reflect")
    x = jax.lax.conv_general_dilated(
        x[None, None], k[None, None, None, :], (1, 1), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0, 0]
    return x


def sobel(img: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """3x3 Sobel gradients (gx, gy)."""
    kx = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32)
    ky = kx.T
    p = jnp.pad(img, 1, mode="edge")

    def conv(kern):
        return jax.lax.conv_general_dilated(
            p[None, None], kern[None, None], (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )[0, 0]

    return conv(kx), conv(ky)


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
    """3x3 max filter (for non-maximum suppression)."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME"
    )
