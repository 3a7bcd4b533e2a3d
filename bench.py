#!/usr/bin/env python3
"""Benchmark: tracked frames/sec on one chip (north star: 200 fps at 640x480).

Runs the FULL SLAM system (fused device step: ORB + planes + Manhattan +
lines + LM solves, plus keyframing/mapping) over a synthetic 640x480 RGB-D
sequence in pipelined mode (dispatch frame k while pulling frame k-1 —
one-frame latency, reference-style asynchronous mapping).

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
    import manhattanslam_tpu  # noqa: F401  (matmul precision + XLA cache)
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
    chunk = 8
    n_warm = 1 + chunk  # init frame + one full chunk (compiles both paths)
    n_timed = 6 * chunk
    seq = SyntheticSequence(n_frames=n_warm + n_timed, cam=cfg.camera,
                            view="corner")
    frames = [seq.frame(i) for i in range(len(seq))]

    slam = System(cfg, fast=True, pipeline=True, chunk=chunk,
                  enable_surfels=False)
    for i in range(n_warm):  # compiles (persistent cache in .jax_cache)
        t, gray, depth = frames[i]
        slam.track(gray, depth, t)
    slam.tracker.flush()
    n0 = sum(not r.lost for r in slam.tracker.records)

    t0 = time.perf_counter()
    for i in range(n_warm, n_warm + n_timed):
        t, gray, depth = frames[i]
        slam.track(gray, depth, t)
    slam.tracker.flush()
    dt_s = time.perf_counter() - t0

    n_ok = sum(not r.lost for r in slam.tracker.records) - n0
    assert n_ok >= 0.9 * n_timed, f"only {n_ok}/{n_timed} frames tracked"
    fps = n_timed / dt_s
    print(
        json.dumps(
            {
                "metric": "slam_tracked_frames_per_sec_640x480",
                "value": round(fps, 2),
                "unit": "fps",
                "vs_baseline": round(fps / 200.0, 4),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
