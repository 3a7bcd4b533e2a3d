"""Diagnose the mapping-regime (walk scene, surfels ON) slowdown seen in
bench.py phase 2: per-chunk wall times + full host-phase breakdown +
keyframe/surfel event costs."""
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
n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 1 + 14 * chunk
seq = SyntheticSequence(n_frames=n_frames, cam=cfg.camera, view="walk")
frames = []
for i in range(len(seq)):
    t, gray, depth = seq.frame(i)
    g8 = np.clip(np.round(gray), 0, 255).astype(np.uint8)
    d16 = np.clip(np.round(depth * 5000.0), 0, 65535).astype(np.uint16)
    frames.append((t, g8, d16))
print("frames rendered", flush=True)

slam = System(cfg, fast=True, pipeline=True, chunk=chunk, enable_surfels=True)
tr = slam.tracker
t_wall0 = time.perf_counter()
t_chunk = time.perf_counter()
kf_prev = 0
for i in range(n_frames):
    t, gray, depth = frames[i]
    if i == 1 + chunk:
        tr.force_keyframe = True
    slam.track(gray, depth, t)
    if (i - 1) % chunk == chunk - 1 and i > 0:
        now = time.perf_counter()
        n_kf = slam.map.n_kf - len(slam.map.kf_free)
        print(
            f"chunk@{i:4d}: {1e3 * (now - t_chunk):8.1f} ms"
            f"  kf={n_kf} (+{n_kf - kf_prev})"
            f"  mp={int(slam.map.mp_valid.sum())}"
            f"  surf={getattr(slam.surfel_mapper, 'n_active', '?')}",
            flush=True,
        )
        t_chunk = now
        kf_prev = n_kf
    if i == 1 + 4 * chunk:
        # after warm chunks: zero the accounting so steady state is clean
        tr.perf.clear()
        tr.perf_n.clear()
        if hasattr(slam, "kf_perf"):
            slam.kf_perf.clear()
        if slam.local_mapper is not None:
            slam.local_mapper.perf.clear()
        t_steady = time.perf_counter()
slam.tracker.flush()
t_wall1 = time.perf_counter()
print("total wall", round(t_wall1 - t_wall0, 1), "s;  steady",
      round(t_wall1 - t_steady, 1), "s")
print("HOST-PHASE ms [total, n]:")
for k in sorted(tr.perf):
    print(f"  {k:24s} {1e3 * tr.perf[k]:9.1f}  {tr.perf_n[k]}")
if slam.local_mapper is not None:
    print("MAPPER-STAGE ms:")
    for k, v in sorted(slam.local_mapper.perf.items()):
        print(f"  {k:24s} {1e3 * v:9.1f}")
if hasattr(slam, "kf_perf"):
    print("KF-BACKEND ms:", {k: round(1e3 * v, 1) for k, v in slam.kf_perf.items()})
sm = slam.surfel_mapper
if sm is not None and hasattr(sm, "perf"):
    print("SURFEL-STAGE ms:", {k: round(1e3 * v, 1) for k, v in sm.perf.items()})

log = tr.frame_log
lost = [r for r in log if not r[2]]
print(f"LOST {len(lost)}/{len(log)} frames")
import collections

runs = []
for r in lost:
    if runs and r[0] == runs[-1][-1] + 1:
        runs[-1].append(r[0])
    else:
        runs.append([r[0]])
print("loss runs (first..last):", [(x[0], x[-1]) for x in runs][:20])
# inlier counts around each loss-run start
ids = {r[0]: r for r in log}
for x in runs[:8]:
    f0 = x[0]
    ctx = [
        (f, ids[f][1] if f in ids else None)
        for f in range(f0 - 3, min(f0 + 3, f0 + len(x) + 1))
    ]
    print("  around", f0, ctx)

# per-frame position error vs GT (est rows only exist for OK frames);
# tracker world = first camera frame, so map est into room coords via
# the first GT pose
est = tr.trajectory_rows()
gt = {round(r[0], 4): r[1] for r in seq.gt_rows()}
T0 = seq.poses[0]
errs = []
for ts, pos, _q in est:
    g = gt.get(round(ts, 4))
    if g is not None:
        p_room = T0[:3, :3] @ pos + T0[:3, 3]
        errs.append((int(round(ts * 30)), float(np.linalg.norm(p_room - g))))
bad = [e for e in errs if e[1] > 0.05]
print(f"frames with pose err > 5 cm: {len(bad)}/{len(errs)}")
print("worst:", sorted(errs, key=lambda e: -e[1])[:10])
# error trace around the first few loss runs
for x in runs[:5]:
    f0 = x[0]
    seg = [e for e in errs if f0 - 5 <= e[0] <= f0 + 5]
    print("  err around", f0, [(f, round(v, 3)) for f, v in seg])
