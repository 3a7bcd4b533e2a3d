#!/usr/bin/env python3
"""Benchmark: tracked frames/sec on one chip (north star: 200 fps at 640x480).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured fps / 200 (the driver-set target in BASELINE.json;
the reference C++ system itself claims ~30 fps real-time on a desktop i7).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> int:
    import manhattanslam_tpu  # noqa: F401  (sets matmul precision)
    from manhattanslam_tpu.config import CameraConfig, SlamConfig
    from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
    from manhattanslam_tpu.system import System

    W, H = 640, 480
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=525.0, fy=525.0, cx=319.5, cy=239.5,
            k1=0, k2=0, p1=0, p2=0, k3=0, width=W, height=H, bf=40.0,
        )
    )
    n_render = 40
    seq = SyntheticSequence(n_frames=n_render, cam=cfg.camera)
    frames = [seq.frame(i) for i in range(n_render)]

    slam = System(cfg, fast=True, pipeline=True)
    # warm-up: first frames trigger XLA compiles
    for i in range(3):
        t, gray, depth = frames[i]
        slam.track(gray, depth, t)

    n_timed = 0
    t0 = time.perf_counter()
    for i in range(3, n_render):
        t, gray, depth = frames[i]
        slam.track(gray, depth, t)
        n_timed += 1
    dt = time.perf_counter() - t0

    fps = n_timed / dt
    print(
        json.dumps(
            {
                "metric": "tracked_frames_per_sec_640x480",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 200.0, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
