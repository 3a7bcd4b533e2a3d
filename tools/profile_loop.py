#!/usr/bin/env python3
"""Instrument the real System.track loop: where does wall time go?

Breaks each frame into upload / dispatch / pull / keyframe-machinery and
prints totals (dev tool; run from repo root with the axon site on path).
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax

    import manhattanslam_tpu  # noqa: F401
    from manhattanslam_tpu.config import CameraConfig, SlamConfig
    from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
    from manhattanslam_tpu.frontend import device_tracker as dt
    from manhattanslam_tpu.frontend.fast_tracking import FastTracker
    from manhattanslam_tpu.system import System

    W, H = 640, 480
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=525.0, fy=525.0, cx=319.5, cy=239.5,
            k1=0, k2=0, p1=0, p2=0, k3=0, width=W, height=H, bf=40.0,
        )
    )
    n_warm, n_timed = 4, 28
    seq = SyntheticSequence(n_frames=n_warm + n_timed, cam=cfg.camera,
                            view="corner")
    frames = [seq.frame(i) for i in range(len(seq))]

    slam = System(cfg, fast=True, pipeline=False, enable_surfels=False)
    tr: FastTracker = slam.tracker

    # monkeypatch instrumentation
    t_stats = {"upload": 0.0, "dispatch": 0.0, "pull": 0.0, "kf": 0.0,
               "refresh": 0.0, "n_kf": 0, "n": 0}

    orig_pull = dt.pull_summary
    orig_refresh = FastTracker.refresh_view
    orig_ckf = FastTracker._create_keyframe

    def timed_pull(result):
        t0 = time.perf_counter()
        out = orig_pull(result)
        t_stats["pull"] += time.perf_counter() - t0
        return out

    def timed_refresh(self):
        t0 = time.perf_counter()
        orig_refresh(self)
        t_stats["refresh"] += time.perf_counter() - t0

    def timed_ckf(self, *a, **k):
        t0 = time.perf_counter()
        orig_ckf(self, *a, **k)
        t_stats["kf"] += time.perf_counter() - t0
        t_stats["n_kf"] += 1

    dt.pull_summary = timed_pull
    import manhattanslam_tpu.frontend.fast_tracking as ft

    ft.dt.pull_summary = timed_pull
    FastTracker.refresh_view = timed_refresh
    FastTracker._create_keyframe = timed_ckf

    import jax.numpy as jnp

    for i in range(n_warm):
        t, gray, depth = frames[i]
        slam.track(gray, depth, t)

    for k in t_stats:
        t_stats[k] = 0 if isinstance(t_stats[k], int) else 0.0

    t_total0 = time.perf_counter()
    step_t = 0.0
    for i in range(n_warm, n_warm + n_timed):
        t, gray, depth = frames[i]
        # replicate FastTracker.track but timed
        tr.frame_id += 1
        t0 = time.perf_counter()
        pd = jnp.asarray(dt.pack_frame(gray, depth))
        pd.block_until_ready()
        t_stats["upload"] += time.perf_counter() - t0
        t0 = time.perf_counter()
        result, new_carry = tr.step(pd, tr.carry, tr.view)
        t_stats["dispatch"] += time.perf_counter() - t0
        tr.last_result = result
        tr.carry = new_carry
        t0 = time.perf_counter()
        tr._finish_frame(t, result)
        step_t += time.perf_counter() - t0
        t_stats["n"] += 1
    total = time.perf_counter() - t_total0

    n = t_stats["n"]
    print(f"frames: {n}, keyframes: {t_stats['n_kf']}")
    print(f"total           {total*1000/n:8.2f} ms/frame  ({n/total:.2f} fps)")
    print(f"  upload        {t_stats['upload']*1000/n:8.2f} ms/frame")
    print(f"  dispatch      {t_stats['dispatch']*1000/n:8.2f} ms/frame")
    print(f"  finish(total) {step_t*1000/n:8.2f} ms/frame")
    print(f"    pull        {t_stats['pull']*1000/n:8.2f} ms/frame")
    print(f"    kf machinery{t_stats['kf']*1000/n:8.2f} ms/frame "
          f"({t_stats['kf']*1000/max(t_stats['n_kf'],1):.1f} ms/kf)")
    print(f"      refresh   {t_stats['refresh']*1000/n:8.2f} ms/frame "
          f"({t_stats['refresh']*1000/max(t_stats['n_kf'],1):.1f} ms/kf)")


if __name__ == "__main__":
    main()
