#!/usr/bin/env python3
"""Ablation profile of the fused frame step: monkeypatch one subsystem at
a time with a shape-preserving zero stub and measure the step-time delta.
Zero stubs become XLA constants, so each ablation removes (at least) that
subsystem's compute.  Dev tool; approximate by design."""

from __future__ import annotations

import time

import numpy as np


def zero_stub(real_fn):
    import jax
    import jax.numpy as jnp

    def stub(*a, **k):
        sd = jax.eval_shape(real_fn, *a, **k)
        return jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), sd)

    return stub


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
    from manhattanslam_tpu.ops import lines as line_ops
    from manhattanslam_tpu.ops import planes as plane_ops
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

    ABLATIONS = {
        "full": {},
        "no_extract": {(dt, "build_extractor")},
        "no_lines": {
            (line_ops, "detect_lines"),
            (line_ops, "line_descriptors"),
            (line_ops, "lift_lines_3d"),
        },
        "no_plane_extract": {(plane_ops, "extract_planes_device")},
        "no_plane_assoc": {(dt, "associate_planes_device")},
        "no_manhattan": {(dt, "detect_manhattan_device")},
        "no_line_assoc": {(dt, "associate_lines_device")},
        "no_track_desc": {(tracking_ops, "track_descriptors")},
        "no_proj_solves": {(tracking_ops, "track_projection")},
    }

    import sys as _sys
    only = _sys.argv[1] if len(_sys.argv) > 1 else None
    results = {}
    for name, patches in ABLATIONS.items():
        if only and name not in ("full", only):
            continue
        saved = []
        try:
            for mod, attr in patches:
                real = getattr(mod, attr)
                saved.append((mod, attr, real))
                if attr == "build_extractor":
                    # build_extractor is a factory; stub what it returns
                    def factory(cfg_, use_pallas=None, _real=real):
                        return zero_stub(_real(cfg_, use_pallas))

                    setattr(mod, attr, factory)
                else:
                    setattr(mod, attr, zero_stub(real))
            step = dt.build_frame_step(cfg)
            carry = dt.init_carry(cfg)
            m = SlamMap(cfg)
            # non-empty map view
            rng = np.random.default_rng(0)
            n = 2000
            m.mp_pos[:n] = rng.uniform(-3, 3, (n, 3)).astype(np.float32)
            m.mp_desc[:n] = rng.integers(0, 2**32, (n, 8), dtype=np.uint32)
            m.mp_valid[:n] = True
            m.mp_max_dist[:n] = 10.0
            m.kf_valid[0] = True
            m.n_kf = 1
            view = dt.build_map_view(cfg, m)
            view = dt.set_ref_kf(view, m, 0)

            def full(p, ca):
                r, nc = step(p, ca, view)
                return r["T"], r["n_inliers"]

            packed = jnp.asarray(dt.pack_frame(np.asarray(gray), np.asarray(depth)))
            ms = timeit(full, packed, carry)
            results[name] = ms
            delta = results["full"] - ms if name != "full" else 0.0
            print(f"{name:18s} {ms:8.2f} ms   (saves {delta:7.2f} ms)")
        finally:
            for mod, attr, real in saved:
                setattr(mod, attr, real)


if __name__ == "__main__":
    main()
