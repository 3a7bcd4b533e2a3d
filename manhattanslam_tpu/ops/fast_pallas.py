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


@partial(jax.jit, static_argnames=("interpret",))
def fast_score_map_pallas(img: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Dense FAST-9 corner score map via one Pallas kernel.

    Matches ops/fast.fast_score_map (zero 3-px border).
    """
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
    score = out[:h]

    ys = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    inb = (ys >= HALO) & (ys < h - HALO) & (xs >= HALO) & (xs < w - HALO)
    return jnp.where(inb, score, 0.0)
