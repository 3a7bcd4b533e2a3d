#!/usr/bin/env python3
"""Time the ORB extractor's internal stages at 640x480 (dev tool)."""

from __future__ import annotations

import time

import numpy as np


def timeit(fn, *args, n=20, warmup=3):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(n)]
    jax.block_until_ready(outs[-1])
    return (time.perf_counter() - t0) / n * 1000


def main():
    import jax
    import jax.numpy as jnp

    import manhattanslam_tpu  # noqa: F401
    from manhattanslam_tpu.config import CameraConfig, SlamConfig
    from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
    from manhattanslam_tpu.frontend.frame import build_extractor
    from manhattanslam_tpu.ops import fast as fast_ops
    from manhattanslam_tpu.ops import image as image_ops
    from manhattanslam_tpu.ops import orb as orb_ops

    W, H = 640, 480
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=525.0, fy=525.0, cx=319.5, cy=239.5,
            k1=0, k2=0, p1=0, p2=0, k3=0, width=W, height=H, bf=40.0,
        )
    )
    print("device:", jax.devices()[0])
    print("budgets:", cfg.orb.features_per_level(), "cap:", cfg.caps.max_keypoints)
    seq = SyntheticSequence(n_frames=2, cam=cfg.camera, view="corner")
    _, gray_np, _ = seq.frame(1)
    gray = jnp.asarray(gray_np)

    # whole extractor, forced leaf by leaf
    extract = build_extractor(cfg)
    depth = jnp.ones((H, W))
    ms = timeit(extract, gray, depth)
    print(f"extract_full       {ms:8.2f} ms")

    pyr = jax.jit(lambda g: image_ops.build_pyramid(g, cfg.orb.n_levels,
                                                    cfg.orb.scale_factor))
    print(f"pyramid            {timeit(pyr, gray):8.2f} ms")
    levels = jax.block_until_ready(pyr(gray))

    lvl0 = levels[0]
    n0 = cfg.orb.features_per_level()[0]

    f_pallas = jax.jit(lambda im: fast_ops.fast_corners(
        im, cell=30, ini_th=20.0, min_th=7.0, use_pallas=True))
    f_jnp = jax.jit(lambda im: fast_ops.fast_corners(
        im, cell=30, ini_th=20.0, min_th=7.0, use_pallas=False))
    print(f"fast_pallas_l0     {timeit(f_pallas, lvl0):8.2f} ms")
    print(f"fast_jnp_l0        {timeit(f_jnp, lvl0):8.2f} ms")
    score = jax.block_until_ready(f_pallas(lvl0))

    tk = jax.jit(lambda s: orb_ops.select_grid_topk(s, n0, cell=32, k_per_cell=8))
    print(f"grid_topk_l0       {timeit(tk, score):8.2f} ms")
    xy, resp, valid = jax.block_until_ready(tk(score))

    ica = jax.jit(lambda im: orb_ops.ic_angle(im, xy))
    print(f"ic_angle_l0        {timeit(ica, lvl0):8.2f} ms")
    angle = jax.block_until_ready(ica(lvl0))

    gb = jax.jit(lambda im: image_ops.gaussian_blur(im, 7, 2.0))
    print(f"gauss_blur_l0      {timeit(gb, lvl0):8.2f} ms")
    blurred = jax.block_until_ready(gb(lvl0))

    bd = jax.jit(lambda im: orb_ops.brief_descriptors(im, xy, angle))
    print(f"brief_l0           {timeit(bd, blurred):8.2f} ms")

    gp = jax.jit(lambda im: orb_ops.gather_patches(im, xy, 15))
    print(f"gather_patches_l0  {timeit(gp, lvl0):8.2f} ms")


if __name__ == "__main__":
    main()
