#!/usr/bin/env python3
"""Wall-clock breakdown of the CHUNKED pipelined tracking loop (the bench
configuration): where does each chunk's time go?

Phases per chunk: host buffering + pack, upload (jnp.asarray of the
packed stack), dispatch (chunk_step call, async), pull (the blocking
chunk-summary transfer), keyframe machinery (payload pulls + host map
update + view refresh).  Dev tool; run from the repo root with the axon
site on the path:

    PYTHONPATH=/root/repo:/root/.axon_site python tools/profile_chunk.py [chunk]
"""

from __future__ import annotations

import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    import manhattanslam_tpu  # noqa: F401
    from manhattanslam_tpu.config import CameraConfig, SlamConfig
    from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
    from manhattanslam_tpu.frontend import device_tracker as dt
    from manhattanslam_tpu.frontend.fast_tracking import FastTracker
    from manhattanslam_tpu.system import System

    chunk = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    pdepth = int(sys.argv[2]) if len(sys.argv) > 2 else 2  # 0 = no pipeline
    W, H = 640, 480
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=525.0, fy=525.0, cx=319.5, cy=239.5,
            k1=0, k2=0, p1=0, p2=0, k3=0, width=W, height=H, bf=40.0,
        )
    )
    print("device:", jax.devices()[0], " chunk:", chunk)
    n_warm = 1 + 2 * chunk
    n_timed = 4 * chunk
    seq = SyntheticSequence(n_frames=n_warm + n_timed, cam=cfg.camera,
                            view="corner")
    frames = []
    for i in range(len(seq)):
        t, gray, depth = seq.frame(i)
        g8 = np.clip(np.round(gray), 0, 255).astype(np.uint8)
        d16 = np.clip(np.round(depth * 5000.0), 0, 65535).astype(np.uint16)
        frames.append((t, g8, d16))

    slam = System(cfg, fast=True, pipeline=pdepth > 0, chunk=chunk,
                  enable_surfels=False)
    tr: FastTracker = slam.tracker
    if pdepth > 0:
        tr.pipeline_depth = pdepth
    print("pipeline depth:", pdepth)

    t_stats = {"pack": 0.0, "upload": 0.0, "dispatch": 0.0, "pull": 0.0,
               "kf": 0.0, "host": 0.0, "n_kf": 0, "n_chunks": 0}

    orig_pull = dt.pull_chunk_summary
    orig_ckf = FastTracker._create_keyframe

    import manhattanslam_tpu.frontend.fast_tracking as ft

    def timed_pull(result, n_map, n_ml):
        t0 = time.perf_counter()
        out = orig_pull(result, n_map, n_ml)
        t_stats["pull"] += time.perf_counter() - t0
        return out

    def timed_ckf(self, *a, **k):
        t0 = time.perf_counter()
        orig_ckf(self, *a, **k)
        t_stats["kf"] += time.perf_counter() - t0
        t_stats["n_kf"] += 1

    ft.dt.pull_chunk_summary = timed_pull
    FastTracker._create_keyframe = timed_ckf

    # timed dispatch wrapper
    orig_chunk_step = tr.chunk_step

    def timed_chunk_step(g8s, d16s, carry, view):
        t0 = time.perf_counter()
        out = orig_chunk_step(g8s, d16s, carry, view)
        t_stats["dispatch"] += time.perf_counter() - t0
        t_stats["n_chunks"] += 1
        return out

    tr.chunk_step = timed_chunk_step

    # host frame coercion (no-op for sensor-native inputs)
    orig_pack = dt.to_native

    def timed_pack(gray, depth):
        t0 = time.perf_counter()
        out = orig_pack(gray, depth)
        t_stats["pack"] += time.perf_counter() - t0
        return out

    ft.dt.to_native = timed_pack

    for i in range(n_warm):
        t, gray, depth = frames[i]
        slam.track(gray, depth, t)
    tr.flush()

    for k in t_stats:
        t_stats[k] = 0 if isinstance(t_stats[k], int) else 0.0

    t0_all = time.perf_counter()
    for i in range(n_warm, n_warm + n_timed):
        t, gray, depth = frames[i]
        slam.track(gray, depth, t)
    tr.flush()
    total = time.perf_counter() - t0_all

    n = n_timed
    known = sum(t_stats[k] for k in ("pack", "dispatch", "pull", "kf"))
    print(f"frames: {n}, chunks: {t_stats['n_chunks']}, "
          f"keyframes: {t_stats['n_kf']}")
    print(f"total         {total*1000/n:8.2f} ms/frame  ({n/total:.2f} fps)")
    for k in ("pack", "dispatch", "pull", "kf"):
        per_c = t_stats[k] * 1000 / max(t_stats["n_chunks"], 1)
        print(f"  {k:<12}{t_stats[k]*1000/n:8.2f} ms/frame "
              f"({per_c:8.2f} ms/chunk)")
    print(f"  other(host) {(total-known)*1000/n:8.2f} ms/frame")


if __name__ == "__main__":
    main()
