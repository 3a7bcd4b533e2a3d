#!/usr/bin/env python3
"""Per-stage wall-clock profile of the fast-tracking frame loop on the
current default device.  Not part of the public API — a dev tool."""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax

    import manhattanslam_tpu  # noqa: F401
    from manhattanslam_tpu.config import CameraConfig, SlamConfig
    from manhattanslam_tpu.datasets.synthetic import SyntheticSequence
    from manhattanslam_tpu.system import System
    from manhattanslam_tpu.frontend import device_tracker as dt

    W, H = 640, 480
    cfg = SlamConfig(
        camera=CameraConfig(
            fx=525.0, fy=525.0, cx=319.5, cy=239.5,
            k1=0, k2=0, p1=0, p2=0, k3=0, width=W, height=H, bf=40.0,
        )
    )
    print("device:", jax.devices()[0])
    n = 24
    seq = SyntheticSequence(n_frames=n, cam=cfg.camera, view="corner")
    frames = [seq.frame(i) for i in range(n)]

    slam = System(cfg, fast=True, pipeline=False, enable_surfels=False)
    tr = slam.tracker

    # instrument the pieces
    import manhattanslam_tpu.frontend.fast_tracking as ft

    times = {"step_dispatch": [], "pull": [], "kf_event": [], "refresh": [],
             "total": []}

    orig_finish = tr._finish_frame
    orig_create = tr._create_keyframe
    orig_refresh = tr.refresh_view

    def timed_create(*a, **k):
        t0 = time.perf_counter()
        orig_create(*a, **k)
        times["kf_event"].append(time.perf_counter() - t0)

    def timed_refresh():
        t0 = time.perf_counter()
        orig_refresh()
        times["refresh"].append(time.perf_counter() - t0)

    tr._create_keyframe = timed_create
    tr.refresh_view = timed_refresh

    for i in range(3):  # warmup/compile
        t, gray, depth = frames[i]
        slam.track(gray, depth, t)

    for k in times:
        times[k].clear()

    n_kf0 = slam.map.n_kf
    import jax.numpy as jnp
    for i in range(3, n):
        t, gray, depth = frames[i]
        t0 = time.perf_counter()
        tr.frame_id += 1
        pd = jnp.asarray(dt.pack_frame(gray, depth))
        t1 = time.perf_counter()
        result, new_carry = tr.step(pd, tr.carry, tr.view)
        tr.last_result = result
        tr.carry = new_carry
        t2 = time.perf_counter()
        s = dt.pull_summary(result)
        t3 = time.perf_counter()
        # emulate the rest of _finish_frame
        ok = bool(s["tracked_ok"])
        assert ok, f"frame {i} lost"
        tr.state = ft.OK
        tr.T_cw = s["T"].astype(np.float32)
        tr.n_inliers = int(s["n_inliers"])
        tr.last_mp_idx = s["kp_mp"]
        m = tr.map
        vis = s["visible"] & m.mp_valid
        m.mp_visible[vis] += 1
        m.mp_found[s["matched"] & vis & s["visible"]] += 1
        if tr._need_new_keyframe(s):
            tr._create_keyframe(t, result, s, None, None)
        tr._record(t, lost=False)
        t4 = time.perf_counter()
        times["step_dispatch"].append(t2 - t1)
        times["pull"].append(t3 - t2)
        times["total"].append(t4 - t0)

    print(f"keyframes created during timed run: {slam.map.n_kf - n_kf0}")
    for k, v in times.items():
        if not v:
            print(f"{k:14s}  (none)")
            continue
        v = np.array(v) * 1000
        print(f"{k:14s}  n={len(v):3d}  median={np.median(v):8.2f} ms  "
              f"mean={v.mean():8.2f} ms  max={v.max():8.2f} ms  "
              f"sum={v.sum():9.1f} ms")


if __name__ == "__main__":
    main()
