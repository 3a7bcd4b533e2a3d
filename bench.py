#!/usr/bin/env python3
"""Benchmark: tracked frames/sec on one chip (north star: 200 fps at 640x480).

Measures BASELINE config 5 — batched multi-sequence replay: 8 synthetic
RGB-D streams tracked in parallel by the fused device step (full front end:
ORB + planes + Manhattan + lines + LM solves) against a map built by a
single-stream SLAM pass.  The per-frame device program is op-count-bound,
so batching B sequences costs ~the wall time of one; throughput is the
honest per-chip frames/sec number.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline = measured fps / 200 (the driver-set target in BASELINE.json;
the reference C++ system claims ~30 fps real-time on a desktop i7).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    import jax
    import jax.numpy as jnp

    import manhattanslam_tpu  # noqa: F401  (matmul precision + XLA cache)
    from manhattanslam_tpu.config import CameraConfig, SlamConfig
    from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
    from manhattanslam_tpu.parallel.mesh import (
        build_throughput_step, init_batched_carry,
    )
    from manhattanslam_tpu.system import System

    W, H = 640, 480
    B = 8  # parallel sequence streams (BASELINE config 5)
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=525.0, fy=525.0, cx=319.5, cy=239.5,
            k1=0, k2=0, p1=0, p2=0, k3=0, width=W, height=H, bf=40.0,
        )
    )
    n_map_frames = 8
    n_timed_steps = 12

    seq = SyntheticSequence(n_frames=n_map_frames + n_timed_steps, cam=cfg.camera,
                            view="corner")
    frames = [seq.frame(i) for i in range(len(seq))]

    # 1) build a map with the single-stream SLAM system
    slam = System(cfg, fast=True, enable_surfels=False)
    for i in range(n_map_frames):
        t, gray, depth = frames[i]
        slam.track(gray, depth, t)

    # 2) batched replay: 8 streams at staggered offsets through the sequence
    step = build_throughput_step(cfg, B)
    carry = init_batched_carry(B)
    view = slam.tracker.view

    def batch_at(i):
        gs, ds = [], []
        for b in range(B):
            _, g, d = frames[(i + b) % len(frames)]
            gs.append(g)
            ds.append(d)
        return jnp.asarray(np.stack(gs)), jnp.asarray(np.stack(ds))

    g0, d0 = batch_at(0)
    out, carry = step(g0, d0, carry, view)  # compile + warm
    jax.block_until_ready(out["T"])

    n_tracked = 0
    t0 = time.perf_counter()
    pending = None
    for i in range(n_timed_steps):
        g, d = batch_at(i)
        out, carry = step(g, d, carry, view)
        if pending is not None:  # one-deep pipeline like the SLAM loop
            n_tracked += int(np.asarray(jnp.sum(pending["tracked_ok"])))
        pending = out
    n_tracked += int(np.asarray(jnp.sum(pending["tracked_ok"])))
    dt_s = time.perf_counter() - t0

    fps = (n_timed_steps * B) / dt_s
    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_sec_640x480_8seq",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 200.0, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
