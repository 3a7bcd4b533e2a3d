"""Replicate bench.py phase 2 EXACTLY (warm 33 + flush + warmup, then
3x96 timed) to chase the rep-3 loss cascade seen in the bench but not in
tools/debug_walk.py."""
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np
import jax

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
chunk = 16
map_reps, map_timed = 3, 6 * chunk
n_warm2 = 1 + 2 * chunk
seq = SyntheticSequence(
    n_frames=n_warm2 + map_reps * map_timed, cam=cfg.camera, view="walk"
)
frames = []
for i in range(len(seq)):
    t, gray, depth = seq.frame(i)
    g8 = np.clip(np.round(gray), 0, 255).astype(np.uint8)
    d16 = np.clip(np.round(depth * 5000.0), 0, 65535).astype(np.uint16)
    frames.append((t, g8, d16))
print("frames rendered", flush=True)

slam = System(cfg, fast=True, pipeline=True, chunk=chunk, enable_surfels=True)
for i in range(n_warm2):
    t, gray, depth = frames[i]
    if i == 1 + chunk:
        slam.tracker.force_keyframe = True
    slam.track(gray, depth, t)
slam.tracker.flush()
slam.warmup()
print("warm done; kf =", slam.map.n_kf - len(slam.map.kf_free), flush=True)
marks = [time.perf_counter()]
for rep in range(map_reps):
    lo = n_warm2 + rep * map_timed
    for i in range(lo, lo + map_timed):
        t, gray, depth = frames[i]
        slam.track(gray, depth, t)
    marks.append(time.perf_counter())
    n_kf = slam.map.n_kf - len(slam.map.kf_free)
    nlost = sum(1 for r in slam.tracker.frame_log if not r[2])
    print(f"rep {rep}: {map_timed / (marks[-1] - marks[-2]):.2f} fps  "
          f"kf={n_kf}  lost-so-far={nlost}", flush=True)
slam.tracker.flush()

tr = slam.tracker
log = tr.frame_log
lost = [r for r in log if not r[2]]
print(f"LOST {len(lost)}/{len(log)}")
runs = []
for r in lost:
    if runs and r[0] == runs[-1][-1] + 1:
        runs[-1].append(r[0])
    else:
        runs.append([r[0]])
print("loss runs:", [(x[0], x[-1]) for x in runs][:20])
ids = {r[0]: r for r in log}
for x in runs[:6]:
    f0 = x[0]
    ctx = [(f, ids[f][1] if f in ids else None) for f in range(f0 - 4, f0 + 2)]
    print("  around", f0, ctx)
print("HOST-PHASE ms [total, n]:")
for k in sorted(tr.perf):
    print(f"  {k:24s} {1e3 * tr.perf[k]:9.1f}  {tr.perf_n[k]}")
