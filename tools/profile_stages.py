#!/usr/bin/env python3
"""Time each subsystem of the fused frame step separately on the default
device (dev tool)."""

from __future__ import annotations

import time

import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1000


def main():
    import jax
    import jax.numpy as jnp

    import manhattanslam_tpu  # noqa: F401
    from manhattanslam_tpu.config import CameraConfig, SlamConfig
    from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
    from manhattanslam_tpu.frontend import device_tracker as dt
    from manhattanslam_tpu.frontend import tracking_ops
    from manhattanslam_tpu.frontend.frame import build_extractor
    from manhattanslam_tpu.ops import lines as line_ops
    from manhattanslam_tpu.ops import lm
    from manhattanslam_tpu.ops import planes as plane_ops

    W, H = 640, 480
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=525.0, fy=525.0, cx=319.5, cy=239.5,
            k1=0, k2=0, p1=0, p2=0, k3=0, width=W, height=H, bf=40.0,
        )
    )
    print("device:", jax.devices()[0])
    seq = SyntheticSequence(n_frames=2, cam=cfg.camera, view="corner")
    _, gray_np, depth_np = seq.frame(1)
    gray = jnp.asarray(gray_np)
    depth = jnp.asarray(depth_np)

    # --- ORB extraction ---
    extract = build_extractor(cfg)
    print(f"extract_orb        {timeit(extract, gray, depth):8.2f} ms")
    feats = jax.block_until_ready(extract(gray, depth))

    # --- planes ---
    P = cfg.caps.max_planes_frame
    h2, w2 = H // 2, W // 2
    grid_shape = (h2 // plane_ops.BLOCK, w2 // plane_ops.BLOCK)
    K = jnp.asarray(cfg.camera.K)
    ep = jax.jit(lambda d: plane_ops.extract_planes_device(
        d, K, P, cfg.caps.max_plane_points, grid_shape,
        jnp.float32(0.04 * h2 * w2), jnp.float32(cfg.plane.distance_threshold),
    ))
    print(f"extract_planes     {timeit(ep, depth):8.2f} ms")

    # --- lines ---
    dl = jax.jit(lambda g: line_ops.detect_lines(g, cfg.caps.max_lines))
    print(f"detect_lines       {timeit(dl, gray):8.2f} ms")
    det = jax.block_until_ready(dl(gray))
    ld = jax.jit(lambda g: line_ops.line_descriptors(g, det["sp"], det["ep"]))
    print(f"line_descriptors   {timeit(ld, gray):8.2f} ms")
    l3 = jax.jit(lambda d: line_ops.lift_lines_3d(
        d, K, det["sp"], det["ep"], det["valid"]))
    print(f"lift_lines_3d      {timeit(l3, depth):8.2f} ms")

    # --- one LM projection solve (map size = caps) ---
    params = lm.default_params(cfg)
    bf = jnp.float32(cfg.camera.bf)
    hw = (H, W)
    c = cfg.caps
    rng = np.random.default_rng(0)
    n_lm = c.max_map_points + c.max_keypoints
    mp_view = {
        "pos": jnp.asarray(rng.uniform(-3, 3, (n_lm, 3)).astype(np.float32)),
        "desc": jnp.asarray(rng.integers(0, 2**32, (n_lm, 8), dtype=np.uint32)),
        "valid": jnp.ones((n_lm,), bool),
        "normal": jnp.asarray(np.tile([0, 0, 1.0], (n_lm, 1)).astype(np.float32)),
        "min_dist": jnp.zeros((n_lm,)),
        "max_dist": jnp.full((n_lm,), 10.0),
    }
    plane0 = tracking_ops.empty_plane_obs(c.max_planes_frame)
    line0 = tracking_ops.empty_line_obs(c.max_lines)
    T0 = jnp.eye(4, dtype=jnp.float32)

    def solve(T_seed, n_rounds, n_iters):
        return tracking_ops.track_projection(
            mp_view, T_seed, feats, K, bf, params, jnp.float32(10.0), hw,
            plane0, line0, scale_factor=cfg.orb.scale_factor,
            n_levels=cfg.orb.n_levels, use_scale_gate=True,
            n_rounds=n_rounds, n_iters=n_iters,
        )["T"]

    s_short = jax.jit(lambda T: solve(T, 2, 6))
    print(f"solve_2x6          {timeit(s_short, T0):8.2f} ms")
    s_full = jax.jit(lambda T: solve(T, 4, 8))
    print(f"solve_4x8          {timeit(s_full, T0):8.2f} ms")

    # --- full fused step ---
    step = dt.build_frame_step(cfg)
    carry = dt.init_carry(cfg)
    from manhattanslam_tpu.slam_map import SlamMap

    m = SlamMap(cfg)
    m.add_keyframe(np.eye(4, dtype=np.float32), 0.0, 0, jax.device_get(feats))
    view = dt.build_map_view(cfg, m)
    view = dt.set_ref_kf(view, m, 0)

    def full(p, ca):
        r, nc = step(p, ca, view)
        return r["T"]

    packed = jnp.asarray(dt.pack_frame(np.asarray(gray_np), np.asarray(depth_np)))
    print(f"full_step          {timeit(full, packed, carry):8.2f} ms")


if __name__ == "__main__" and __import__("sys").argv[-1] != "extra":
    main()


def extra():
    """Time the pieces not covered by main(): descriptor solve, plane
    association, Manhattan detection."""
    import jax
    import jax.numpy as jnp

    import manhattanslam_tpu  # noqa: F401
    from manhattanslam_tpu.config import CameraConfig, SlamConfig
    from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
    from manhattanslam_tpu.frontend import device_tracker as dt
    from manhattanslam_tpu.frontend import tracking_ops
    from manhattanslam_tpu.frontend.frame import build_extractor
    from manhattanslam_tpu.ops import lm
    from manhattanslam_tpu.slam_map import SlamMap

    W, H = 640, 480
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=525.0, fy=525.0, cx=319.5, cy=239.5,
            k1=0, k2=0, p1=0, p2=0, k3=0, width=W, height=H, bf=40.0,
        )
    )
    print("device:", jax.devices()[0])
    seq = SyntheticSequence(n_frames=2, cam=cfg.camera, view="corner")
    _, gray_np, depth_np = seq.frame(1)
    gray = jnp.asarray(gray_np)
    depth = jnp.asarray(depth_np)
    extract = build_extractor(cfg)
    feats = jax.block_until_ready(extract(gray, depth))
    params = lm.default_params(cfg)
    K = jnp.asarray(cfg.camera.K)
    bf = jnp.float32(cfg.camera.bf)
    c = cfg.caps
    rng = np.random.default_rng(0)

    m = SlamMap(cfg)
    m.add_keyframe(np.eye(4, dtype=np.float32), 0.0, 0, jax.device_get(feats))
    view = dt.build_map_view(cfg, m)
    view = dt.set_ref_kf(view, m, 0)
    plane0 = tracking_ops.empty_plane_obs(c.max_planes_frame)
    line0 = tracking_ops.empty_line_obs(c.max_lines)
    T0 = jnp.eye(4, dtype=jnp.float32)

    ref_view = {
        "pos": jnp.asarray(rng.uniform(-3, 3, (c.max_keypoints, 3)).astype(np.float32)),
        "desc": jnp.asarray(rng.integers(0, 2**32, (c.max_keypoints, 8), dtype=np.uint32)),
        "valid": jnp.ones((c.max_keypoints,), bool),
    }
    td = jax.jit(lambda T: tracking_ops.track_descriptors(
        ref_view, T, feats, jnp.zeros(c.max_keypoints), K, bf, params,
        plane0, line0)["T"])
    print(f"track_descriptors  {timeit(td, T0):8.2f} ms")

    P = c.max_planes_frame
    fpc = jnp.asarray(rng.normal(size=(P, 4)).astype(np.float32))
    fpv = jnp.ones((P,), bool)
    ap = jax.jit(lambda T: dt.associate_planes_device(
        fpc, fpv, T, view, jnp.float32(0.985), jnp.float32(0.05),
        jnp.float32(0.0872), jnp.float32(0.9962)))
    print(f"assoc_planes       {timeit(ap, T0):8.2f} ms")

    assoc = jnp.zeros((P,), jnp.int32)
    dm = jax.jit(lambda: dt.detect_manhattan_device(
        fpc, jnp.ones((P,), jnp.int32), fpv, assoc, view, jnp.float32(0.01)))
    print(f"detect_manhattan   {timeit(dm):8.2f} ms")


if __name__ == "__main__" and __import__("sys").argv[-1] == "extra":
    extra()
