"""Pallas TPU kernel for dense FAST-9/16 corner scoring.

The jnp formulation of FAST (ops/fast.py) lowers to ~60 full-image XLA ops
per pyramid level (16 shifted diffs + 2x16x9 circular arc mins); at small
image sizes each op is launch/latency bound, so fusing the whole response
computation into ONE Pallas kernel removes ~500 ops per frame across the
pyramid.

The kernel processes row tiles with a 3-row halo: for each tile it builds
the 16 Bresenham-circle diffs in VMEM and computes

  score(p) = max(0, max_r min_{k<9} d[(r+k)%16])   (bright and dark arcs)

which is exactly the "largest threshold at which p is still a corner"
semantics of ops/fast.fast_score_map.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from manhattanslam_tpu.ops.fast import ARC_LEN, CIRCLE_OFFSETS

TILE_H = 32
HALO = 3


def _fast_kernel(img_ref, out_ref):
    # img_ref: full padded image in VMEM; out_ref: this tile's rows
    i = pl.program_id(0)
    th = out_ref.shape[0]
    w = img_ref.shape[1]
    tile = img_ref[pl.ds(i * th, th + 2 * HALO), :]  # (TILE_H + 6, W)
    center = tile[HALO : HALO + th, :]

    # 16 circle diffs; column shifts via jnp.roll (wrap-around columns are
    # zeroed by the caller's 3-px border mask)
    diffs = []
    for dy, dx in CIRCLE_OFFSETS:
        shifted = tile[HALO + dy : HALO + dy + th, :]
        if dx != 0:
            shifted = jnp.roll(shifted, -dx, axis=1)
        diffs.append(shifted - center)

    def arc_score(ds):
        best = jnp.full((th, w), -jnp.inf)
        for r in range(16):
            m = ds[r]
            for k in range(1, ARC_LEN):
                m = jnp.minimum(m, ds[(r + k) % 16])
            best = jnp.maximum(best, m)
        return best

    bright = arc_score(diffs)
    dark = arc_score([-d for d in diffs])
    out_ref[:] = jnp.maximum(jnp.maximum(bright, dark), 0.0)


def _border_mask(score, h, w):
    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inb = (ys >= HALO) & (ys < h - HALO) & (xs >= HALO) & (xs < w - HALO)
    return jnp.where(inb, score, 0.0)


@partial(jax.jit, static_argnames=("interpret",))
def _fast_single(img: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    h, w = img.shape
    n_tiles = -(-h // TILE_H)
    pad_h = n_tiles * TILE_H - h
    # 3-row halo on top/bottom + pad to a tile multiple
    padded = jnp.pad(img, ((HALO, HALO + pad_h), (0, 0)))

    out = pl.pallas_call(
        _fast_kernel,
        out_shape=jax.ShapeDtypeStruct((n_tiles * TILE_H, w), img.dtype),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],  # whole image
        out_specs=pl.BlockSpec(
            (TILE_H, w), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(padded)
    return _border_mask(out[:h], h, w)


def _fast_kernel_batched(img_ref, out_ref):
    # img_ref: (1, Hp, W) this batch element's padded image; out_ref: tile
    i = pl.program_id(1)
    th = out_ref.shape[1]
    w = img_ref.shape[2]
    tile = img_ref[0, pl.ds(i * th, th + 2 * HALO), :]
    center = tile[HALO : HALO + th, :]
    diffs = []
    for dy, dx in CIRCLE_OFFSETS:
        shifted = tile[HALO + dy : HALO + dy + th, :]
        if dx != 0:
            shifted = jnp.roll(shifted, -dx, axis=1)
        diffs.append(shifted - center)

    def arc_score(ds):
        best = jnp.full((th, w), -jnp.inf)
        for r in range(16):
            m = ds[r]
            for k in range(1, ARC_LEN):
                m = jnp.minimum(m, ds[(r + k) % 16])
            best = jnp.maximum(best, m)
        return best

    bright = arc_score(diffs)
    dark = arc_score([-d for d in diffs])
    out_ref[0] = jnp.maximum(jnp.maximum(bright, dark), 0.0)


@partial(jax.jit, static_argnames=("interpret",))
def _fast_batched(imgs: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Batched dense FAST scores: grid over (batch, row tiles)."""
    b, h, w = imgs.shape
    n_tiles = -(-h // TILE_H)
    pad_h = n_tiles * TILE_H - h
    padded = jnp.pad(imgs, ((0, 0), (HALO, HALO + pad_h), (0, 0)))
    out = pl.pallas_call(
        _fast_kernel_batched,
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * TILE_H, w), imgs.dtype),
        grid=(b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1,) + padded.shape[1:], lambda bi, i: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            )
        ],
        out_specs=pl.BlockSpec(
            (1, TILE_H, w), lambda bi, i: (bi, i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(padded)
    return jax.vmap(lambda s: _border_mask(s[:h], h, w))(out)


@partial(jax.jit, static_argnames=("interpret",))
def fast_score_map_pallas(img: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Dense FAST-9 corner score map via one Pallas kernel.

    Matches ops/fast.fast_score_map (zero 3-px border).  vmap-batchable:
    a custom_vmap rule dispatches to the (batch x tile)-gridded kernel, so
    the batched-replay path keeps the fused kernel instead of falling back
    to the ~60-op jnp formulation.
    """
    return _fast_cv(bool(interpret))(img)


_FAST_CV_CACHE: dict = {}


def _fast_cv(interpret: bool):
    f = _FAST_CV_CACHE.get(interpret)
    if f is not None:
        return f

    @jax.custom_batching.custom_vmap
    def fast_cv(img):
        return _fast_single(img, interpret)

    @fast_cv.def_vmap
    def _rule(axis_size, in_batched, img):  # noqa: ANN001
        if not in_batched[0]:
            img = jnp.broadcast_to(img[None], (axis_size,) + img.shape)
        return _fast_batched(img, interpret), True

    _FAST_CV_CACHE[interpret] = fast_cv
    return fast_cv
